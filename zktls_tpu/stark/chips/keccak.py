"""Keccak-256 AIR chip: proves the journal's request_hash / response_hash
over bus-bound application-stream bytes.

The reference's journal hashes are keccak256 over alloy primitives
(SURVEY.md §2.3; risc0 ships a dedicated keccak accelerator circuit,
§2.2.C) — previously unproven native computation (VERDICT round-2
missing #6).  This chip closes the loop: the GCM data chip sends every
decrypted application-stream plaintext byte (BUS_HASH_BYTE: obj, dir,
pos, byte — request bytes dir 0, response bytes dir 1, positions assigned
by the stream parser), the chip absorbs them in order into Keccak-f[1600],
applies pad10*1 IN-AIR, and publishes keccak256(stream)
(BUS_HASH_RESULT: obj, dir, digest) which the verifier matches against
the journal's request_hash / response_hash.  Claiming a hash of anything
but the exact decrypted bytes breaks the global bus balance.

Layout: 256-row groups, one group per 136-byte rate block:
  rows 0..16    lane rows — lane ℓ absorbs 8 bytes (per-byte consume
                gates; ungated tail bytes are the pad10*1 padding,
                value-constrained in-AIR); the state changes one lane per
                row
  rows 17..40   the 24 Keccak-f rounds, one per row: θ via 5-bit parity
                decompositions, ρ/π by re-indexing, χ through a
                materialized and-plane W, ι from periodic round-constant
                bit columns
  rows 41..255  idle (state carried; a final block publishes its digest
                at row 41)

Streams are group runs (register semantics like the parser's regions):
sg starts a stream from the zero state, fin marks its final block.  Dead
(live = 0) padding groups run the same constraint system over the empty
absorption (keccak-f of the zero state), so no constraint needs a
live-gate on the hot paths.

State bit order: bit 64·(x + 5y) + z; sponge byte b maps to lane b>>3,
bits 8·(b&7)..8·(b&7)+8 (LSB first) — so digest byte m is state bits
8m..8m+8.
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirBuilder
from ..bus import BUS_HASH_BYTE, BUS_HASH_RESULT, np_bus_inverse_terms
from ..ext_val import ExtVal

__all__ = ["KeccakAir", "keccak_trace", "keccak256_ref", "GROUP_ROWS",
           "RATE"]

P = 2013265921
GROUP_ROWS = 256
RATE = 136
N_ROUNDS = 24

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = [[0, 36, 3, 41, 18],
        [1, 44, 10, 45, 2],
        [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56],
        [27, 20, 39, 8, 14]]


def _lane(x: int, y: int) -> int:
    return x + 5 * y


def _bit(x: int, y: int, z: int) -> int:
    return 64 * _lane(x, y) + z


def _build_b_src() -> list[int]:
    """B-plane wiring: B[y][(2x+3y)%5][z] = T[x][y][(z − r[x][y]) % 64].
    Returns b_src[B bit index] = T bit index."""
    b_src = [0] * 1600
    for x in range(5):
        for y in range(5):
            X, Y = y, (2 * x + 3 * y) % 5
            r = _ROT[x][y]
            for z in range(64):
                b_src[_bit(X, Y, z)] = _bit(x, y, (z - r) % 64)
    return b_src


_B_SRC = _build_b_src()


class _Layout:
    def __init__(self):
        self._n = 0
        self.slices: dict[str, slice] = {}

    def add(self, name: str, count: int = 1) -> None:
        self.slices[name] = slice(self._n, self._n + count)
        self._n += count

    @property
    def width(self) -> int:
        return self._n

    def __getitem__(self, name: str) -> slice:
        return self.slices[name]


def _build_layout() -> _Layout:
    L = _Layout()
    L.add("live")      # group-constant
    L.add("sg")        # stream-start group flag
    L.add("fin")       # stream-final group flag
    L.add("cont")      # (1−sg)·live — continuation marker (degree aid)
    L.add("obj")       # session stream object id (stream register)
    L.add("dirs")      # 0 = request, 1 = response (stream register)
    L.add("blkc")      # block index within the stream (group-constant)
    L.add("g", 8)      # lane-row byte-consumed gates
    L.add("lb", 64)    # lane-row absorbed bits (8 bytes, LSB-first each)
    L.add("A", 1600)   # state bits (value AFTER this row's action)
    L.add("C", 320)    # θ column parities
    L.add("q0", 320)   # parity decomposition bits
    L.add("q1", 320)
    L.add("T", 1600)   # post-θ plane
    L.add("W", 1600)   # χ and-plane: (1 − B[x+1][y][z]) · B[x+2][y][z]
    L.add("ch00", 64)  # lane (0,0) χ output (ι needs a linear operand)
    return L


LAYOUT = _build_layout()


class KeccakAir(Air):
    width = LAYOUT.width
    num_public = 0
    max_constraint_degree = 3
    #: 8 byte-receive invs ‖ result inv ‖ u ‖ acc
    perm_width = 4 * 11
    num_perm_challenges = 2
    has_bus = True

    def periodic_columns(self) -> list:
        z = np.zeros(GROUP_ROWS, dtype=np.uint32)
        p_row0 = z.copy(); p_row0[0] = 1
        p_lane = z.copy(); p_lane[0:17] = 1
        p_lane_nl = z.copy(); p_lane_nl[0:16] = 1    # next row is lane 1..16
        p_lane16 = z.copy(); p_lane16[16] = 1
        p_round = z.copy(); p_round[17:41] = 1
        p_res = z.copy(); p_res[41] = 1
        p_last = z.copy(); p_last[255] = 1
        p_idle = z.copy(); p_idle[41:255] = 1
        lanev = z.copy(); lanev[0:17] = np.arange(17, dtype=np.uint32)
        lsel = np.zeros((17, GROUP_ROWS), dtype=np.uint32)
        for ell in range(17):
            lsel[ell, ell] = 1
        rcbit = np.zeros((64, GROUP_ROWS), dtype=np.uint32)
        for rr in range(N_ROUNDS):
            for zz in range(64):
                rcbit[zz, 17 + rr] = (_RC[rr] >> zz) & 1
        return ([p_row0, p_lane, p_lane_nl, p_lane16, p_round, p_res,
                 p_last, p_idle, lanev] + list(lsel) + list(rcbit))

    # ------------------------------------------------------------------

    def eval(self, b: AirBuilder) -> None:
        L = LAYOUT
        (p_row0, p_lane, p_lane_nl, p_lane16, p_round, p_res, p_last,
         p_idle, lanev) = b.periodic[:9]
        lsel = b.periodic[9:26]
        rcbit = b.periodic[26:90]

        def c(name, i=0):
            return b.local[L[name].start + i]

        def n(name, i=0):
            return b.next[L[name].start + i]

        def Aslice(k, nxt=False):
            src = b.next_group if nxt else b.local_group
            return src(slice(L["A"].start + 64 * k,
                             L["A"].start + 64 * k + 64))

        tr = b.is_transition
        live, sg, fin, cont = c("live"), c("sg"), c("fin"), c("cont")
        for nm in ("live", "sg", "fin", "dirs"):
            b.assert_bool(c(nm))
        b.assert_zero(cont - (1 - sg) * live)
        G8 = b.local_group(L["g"])
        LB = b.local_group(L["lb"])
        A = b.local_group(L["A"])
        NA = b.next_group(L["A"])
        b.assert_zero_vec(G8 * (G8 - 1), 8)
        b.assert_zero_vec(LB * (LB - 1), 64)
        b.assert_zero_vec(A * (A - 1), 1600)
        b.assert_zero_vec(b.local_group(L["q0"])
                          * (b.local_group(L["q0"]) - 1), 320)
        b.assert_zero_vec(b.local_group(L["q1"])
                          * (b.local_group(L["q1"]) - 1), 320)
        # C must be boolean or the parity decomposition is ambiguous
        b.assert_zero_vec(b.local_group(L["C"])
                          * (b.local_group(L["C"]) - 1), 320)
        b.assert_zero_vec((1 - live) * G8, 8)

        # --- group/stream structure ---
        for nm in ("live", "sg", "fin", "obj", "dirs", "blkc"):
            b.assert_zero(tr * (1 - p_last) * (n(nm) - c(nm)))
        b.assert_zero(sg * (1 - live))
        b.assert_zero(fin * (1 - live))
        b.when_first_row(live * (1 - sg))
        b.assert_zero(tr * p_last * n("live") * (1 - live))
        # a final block ends its stream; a non-final block continues it
        b.assert_zero(tr * p_last * n("live") * fin * (1 - n("sg")))
        b.assert_zero(tr * p_last * n("live") * (1 - fin) * n("sg"))
        b.assert_zero(tr * p_last * n("cont") * (n("blkc") - c("blkc") - 1))
        b.assert_zero(sg * c("blkc"))
        b.assert_zero(tr * p_last * n("cont")
                      * (n("obj") - c("obj")))
        b.assert_zero(tr * p_last * n("cont")
                      * (n("dirs") - c("dirs")))
        # a continuation group's predecessor must not be final and must
        # exist: covered by the fin/sg pairing rules above

        # --- state transitions ---
        # stream start: the group's row 0 = lane 0 absorbed into zero
        b.assert_zero_vec(p_row0 * sg * (Aslice(0) - LB), 64)
        for k in range(1, 25):
            b.assert_zero_vec(p_row0 * sg * Aslice(k), 64)
        # lane rows 1..16: lane ℓ xors in, everything else holds
        for ell in range(1, 17):
            NLB = b.next_group(L["lb"])
            b.assert_zero_vec(
                tr * lsel[ell - 1] * (Aslice(ell, nxt=True) - Aslice(ell)
                                      - NLB + 2 * (Aslice(ell) * NLB)), 64)
        for k in range(25):
            # hold on transitions into lane rows other than k, and into
            # row 17 (p_lane16 marks the 16 → 17 transition)
            if 1 <= k <= 16:
                gate = p_lane_nl - lsel[k - 1] + p_lane16
            else:
                gate = p_lane_nl + p_lane16
            b.assert_zero_vec(tr * gate * (Aslice(k, nxt=True) - Aslice(k)),
                              64)
        # idle carry (rows 41..254)
        b.assert_zero_vec(tr * p_idle * (NA - A), 1600)
        # cross-group continuation: row 255 → row 0 absorbs lane 0 into
        # the carried state
        NLB0 = b.next_group(L["lb"])
        b.assert_zero_vec(
            tr * p_last * n("cont") * (Aslice(0, nxt=True) - Aslice(0)
                                       - NLB0 + 2 * (Aslice(0) * NLB0)), 64)
        for k in range(1, 25):
            b.assert_zero_vec(tr * p_last * n("cont")
                              * (Aslice(k, nxt=True) - Aslice(k)), 64)

        # --- pad10*1 ---
        for j in range(7):
            b.assert_zero(c("g", j + 1) * (1 - c("g", j)))
        b.assert_zero(tr * p_lane_nl * n("g", 0) * (1 - c("g", 7)))
        b.assert_zero_vec((1 - fin) * live * (1 - G8) * p_lane, 8)
        # the final block always ends in padding (its last byte is 0x80)
        b.assert_zero(lsel[16] * fin * c("g", 7))

        def byte_expr(j, nxt=False):
            src = b.next_group if nxt else b.local_group
            return b.dot_const(
                src(slice(L["lb"].start + 8 * j, L["lb"].start + 8 * j + 8)),
                [1 << i for i in range(8)])

        for j in range(1, 8):
            expr = byte_expr(j) - (c("g", j - 1) - c("g", j))
            if j == 7:
                expr = expr - 0x80 * lsel[16]
            b.assert_zero(p_lane * live * (1 - c("g", j)) * expr)
        # byte 0: at the group's first lane row the predecessor byte was
        # consumed (previous block full or stream start), so an ungated
        # byte 0 is the first pad byte
        b.assert_zero(p_row0 * live * (1 - c("g", 0))
                      * (byte_expr(0) - 1))
        b.assert_zero(tr * p_lane_nl * (1 - n("g", 0))
                      * (byte_expr(0, nxt=True)
                         - (c("g", 7) - n("g", 0))))

        # --- θ: column parities and the T plane (defined every row) ---
        for x in range(5):
            Cx = b.local_group(slice(L["C"].start + 64 * x,
                                     L["C"].start + 64 * x + 64))
            q0x = b.local_group(slice(L["q0"].start + 64 * x,
                                      L["q0"].start + 64 * x + 64))
            q1x = b.local_group(slice(L["q1"].start + 64 * x,
                                      L["q1"].start + 64 * x + 64))
            total = None
            for y in range(5):
                Ay = Aslice(_lane(x, y))
                total = Ay if total is None else total + Ay
            b.assert_zero_vec(total - Cx - 2 * q0x - 4 * q1x, 64)
        for x in range(5):
            Cm = b.local_group(slice(L["C"].start + 64 * ((x - 1) % 5),
                                     L["C"].start + 64 * ((x - 1) % 5) + 64))
            Cp = b.local_group(slice(L["C"].start + 64 * ((x + 1) % 5),
                                     L["C"].start + 64 * ((x + 1) % 5) + 64))
            Cp1 = Cp.roll(1)       # D bit z uses C[x+1][z−1]
            D = Cm + Cp1 - 2 * (Cm * Cp1)
            for y in range(5):
                k = _lane(x, y)
                Ty = b.local_group(slice(L["T"].start + 64 * k,
                                         L["T"].start + 64 * k + 64))
                Ay = Aslice(k)
                b.assert_zero_vec(Ty - Ay - D + 2 * (Ay * D), 64)

        # --- χ and-plane + round output ---
        def Bbit(i):
            return b.local[L["T"].start + _B_SRC[i]]

        for x in range(5):
            for y in range(5):
                for zz in range(64):
                    i = _bit(x, y, zz)
                    w_i = b.local[L["W"].start + i]
                    b1 = Bbit(_bit((x + 1) % 5, y, zz))
                    b2 = Bbit(_bit((x + 2) % 5, y, zz))
                    b.assert_zero(w_i - b2 + b1 * b2)
        for k in range(25):
            for zz in range(64):
                i = 64 * k + zz
                bb = Bbit(i)
                ww = b.local[L["W"].start + i]
                chi = bb + ww - 2 * (bb * ww)
                if k == 0:
                    ch0 = b.local[L["ch00"].start + zz]
                    b.assert_zero(ch0 - chi)
                    rc = rcbit[zz]
                    b.assert_zero(tr * p_round * (
                        b.next[L["A"].start + zz] - ch0 - rc
                        + 2 * (ch0 * rc)))
                else:
                    b.assert_zero(tr * p_round * (
                        b.next[L["A"].start + i] - chi))

        # --- bus ---
        gamma = b.challenges[0]

        def dpow(i):
            return b.challenges[1 + i]

        pos_base = c("blkc") * RATE + lanev * 8
        u_def = ExtVal.from_base(0)
        for j in range(8):
            fp = (ExtVal.from_base(BUS_HASH_BYTE) + dpow(0) * c("obj")
                  + dpow(1) * c("dirs") + dpow(2) * (pos_base + j)
                  + dpow(3) * byte_expr(j))
            iv = b.perm_ext(j)
            b.assert_ext_zero(iv * (gamma - fp) - 1)
            u_def = u_def - iv * (c("g", j) * p_lane)
        fp_res = (ExtVal.from_base(BUS_HASH_RESULT) + dpow(0) * c("obj")
                  + dpow(1) * c("dirs"))
        for ell in range(16):
            hi = b.dot_const(
                b.local_group(slice(L["A"].start + 8 * (2 * ell),
                                    L["A"].start + 8 * (2 * ell) + 8)),
                [1 << i for i in range(8)])
            lo = b.dot_const(
                b.local_group(slice(L["A"].start + 8 * (2 * ell + 1),
                                    L["A"].start + 8 * (2 * ell + 1) + 8)),
                [1 << i for i in range(8)])
            fp_res = fp_res + dpow(2 + ell) * (hi * 256 + lo)
        iv_res = b.perm_ext(8)
        b.assert_ext_zero(iv_res * (gamma - fp_res) - 1)
        u_def = u_def + iv_res * (fin * p_res)

        u = b.perm_ext(9)
        acc = b.perm_ext(10)
        u_n = b.perm_ext(9, nxt=True)
        acc_n = b.perm_ext(10, nxt=True)
        b.assert_ext_zero(u - u_def)
        b.assert_ext_zero((acc - u) * b.is_first_row)
        b.assert_ext_zero((acc_n - acc - u_n) * b.is_transition)
        for ell in range(4):
            b.when_last_row(acc.c[ell] - b.public[ell])

    # ------------------------------------------------------------------

    def generate_perm_trace(self, main, publics, challenges):
        L = LAYOUT
        nrows = main.shape[0]

        def col(name, i=0):
            return main[:, L[name].start + i].astype(np.uint64)

        r = np.arange(nrows)
        rowm = r % GROUP_ROWS
        p_lane = (rowm < 17).astype(np.uint64)
        p_res = (rowm == 41).astype(np.uint64)
        lanev = np.where(rowm < 17, rowm, 0).astype(np.uint64)
        POW8 = np.array([1 << i for i in range(8)], dtype=np.uint64)
        lb = main[:, L["lb"]].astype(np.uint64)
        parts = []
        u = np.zeros((nrows, 4), dtype=np.uint64)
        pos_base = (col("blkc") * RATE + lanev * 8) % P
        for j in range(8):
            byte = (lb[:, 8 * j : 8 * j + 8] * POW8).sum(axis=1) % P
            pl = np.stack([col("obj"), col("dirs"),
                           (pos_base + j) % P, byte], axis=1)
            iv = np_bus_inverse_terms(challenges, BUS_HASH_BYTE, pl)
            parts.append(iv)
            u = (u + P * np.ones_like(u)
                 - iv.astype(np.uint64) * (col("g", j) * p_lane)[:, None]
                 ) % P
        Ab = main[:, L["A"]].astype(np.uint64)
        limbs = np.zeros((nrows, 16), dtype=np.uint64)
        for ell in range(16):
            hi = (Ab[:, 8 * (2 * ell): 8 * (2 * ell) + 8] * POW8).sum(axis=1)
            lo = (Ab[:, 8 * (2 * ell + 1): 8 * (2 * ell + 1) + 8]
                  * POW8).sum(axis=1)
            limbs[:, ell] = (hi * 256 + lo) % P
        res_pl = np.concatenate(
            [col("obj")[:, None], col("dirs")[:, None], limbs], axis=1)
        iv_res = np_bus_inverse_terms(challenges, BUS_HASH_RESULT, res_pl)
        parts.append(iv_res)
        u = (u + iv_res.astype(np.uint64)
             * (col("fin") * p_res)[:, None]) % P
        acc = np.cumsum(u, axis=0) % P
        parts += [u, acc]
        return np.concatenate(parts, axis=1).astype(np.uint32)


# ---------------------------------------------------------------------------
# reference implementation + witness generation
# ---------------------------------------------------------------------------


def _keccak_f(lanes: list[int]) -> list[int]:
    A = list(lanes)

    def rot(v, k):
        return ((v << k) | (v >> (64 - k))) & (1 << 64) - 1

    for rnd in range(N_ROUNDS):
        C = [A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20]
             for x in range(5)]
        D = [C[(x - 1) % 5] ^ rot(C[(x + 1) % 5], 1) for x in range(5)]
        A = [A[i] ^ D[i % 5] for i in range(25)]
        B = [0] * 25
        for x in range(5):
            for y in range(5):
                B[_lane(y, (2 * x + 3 * y) % 5)] = rot(A[_lane(x, y)],
                                                       _ROT[x][y])
        A = [B[i] ^ ((~B[(i % 5 + 1) % 5 + 5 * (i // 5)])
                     & B[(i % 5 + 2) % 5 + 5 * (i // 5)]) & ((1 << 64) - 1)
             for i in range(25)]
        A[0] ^= _RC[rnd]
    return A


def keccak256_ref(data: bytes) -> bytes:
    """Reference keccak-256 (validated against the guest's keccak in
    tests)."""
    lanes = [0] * 25
    padded = bytearray(data)
    padlen = RATE - (len(data) % RATE)
    padded += b"\x00" * padlen
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    for off in range(0, len(padded), RATE):
        blk = padded[off : off + RATE]
        for ell in range(17):
            lanes[ell] ^= int.from_bytes(blk[8 * ell : 8 * ell + 8],
                                         "little")
        lanes = _keccak_f(lanes)
    out = b"".join(lanes[i].to_bytes(8, "little") for i in range(4))
    return out



def _states_to_columns(states: np.ndarray, out: np.ndarray) -> None:
    """Vectorized fill of A/C/q0/q1/T/W/ch00 for (n, 25) uint64 lane
    snapshots into the (n, width) trace block `out`."""
    L = LAYOUT
    n = states.shape[0]
    shifts = np.arange(64, dtype=np.uint64)
    abits = ((states[:, :, None] >> shifts) & 1).astype(np.uint32)
    out[:, L["A"]] = abits.reshape(n, 1600)
    # θ parities
    lanes_by_x = states.reshape(n, 5, 5)          # [n, y, x]
    colsum = abits.reshape(n, 5, 5, 64).sum(axis=1)   # [n, x, 64]
    cbit = (colsum & 1).astype(np.uint32)
    q = (colsum >> 1).astype(np.uint32)
    out[:, L["C"]] = cbit.reshape(n, 320)
    out[:, L["q0"]] = (q & 1).reshape(n, 320)
    out[:, L["q1"]] = ((q >> 1) & 1).reshape(n, 320)
    # T = A ⊕ D over uint64 lanes
    C64 = np.bitwise_xor.reduce(lanes_by_x, axis=1)   # [n, x]
    rot1 = ((C64 << np.uint64(1)) | (C64 >> np.uint64(63)))
    D = np.zeros_like(C64)
    for x in range(5):
        D[:, x] = C64[:, (x - 1) % 5] ^ rot1[:, (x + 1) % 5]
    T64 = states ^ np.tile(D, 5)
    tbits = ((T64[:, :, None] >> shifts) & 1).astype(np.uint32)
    tflat = tbits.reshape(n, 1600)
    out[:, L["T"]] = tflat
    bflat = tflat[:, _B_SRC_ARR]
    b1 = bflat[:, _CHI_B1]
    b2 = bflat[:, _CHI_B2]
    w = ((1 - b1) * b2).astype(np.uint32)
    out[:, L["W"]] = w
    out[:, L["ch00"]] = bflat[:, :64] ^ w[:, :64]


_B_SRC_ARR = np.array(_B_SRC, dtype=np.int64)
_CHI_B1 = np.zeros(1600, dtype=np.int64)
_CHI_B2 = np.zeros(1600, dtype=np.int64)
for _x in range(5):
    for _y in range(5):
        for _z in range(64):
            _i = _bit(_x, _y, _z)
            _CHI_B1[_i] = _bit((_x + 1) % 5, _y, _z)
            _CHI_B2[_i] = _bit((_x + 2) % 5, _y, _z)


def _lanes_to_bits(lanes: list[int]) -> np.ndarray:
    bits = np.zeros(1600, dtype=np.uint32)
    for k in range(25):
        v = lanes[k]
        for z in range(64):
            bits[64 * k + z] = (v >> z) & 1
    return bits


def _theta_planes(lanes: list[int]):
    C = [lanes[x] ^ lanes[x + 5] ^ lanes[x + 10] ^ lanes[x + 15]
         ^ lanes[x + 20] for x in range(5)]

    def rot(v, k):
        return ((v << k) | (v >> (64 - k))) & (1 << 64) - 1

    D = [C[(x - 1) % 5] ^ rot(C[(x + 1) % 5], 1) for x in range(5)]
    T = [lanes[i] ^ D[i % 5] for i in range(25)]
    return C, T


def _fill_theta_chi(row: np.ndarray, lanes: list[int]) -> None:
    """Fill C/q0/q1/T/W/ch00 for the state `lanes` on one row."""
    L = LAYOUT
    C, T = _theta_planes(lanes)
    for x in range(5):
        colsum = [0] * 64
        for y in range(5):
            v = lanes[_lane(x, y)]
            for z in range(64):
                colsum[z] += (v >> z) & 1
        for z in range(64):
            s = colsum[z]
            cbit = s & 1
            q = (s - cbit) >> 1
            row[L["C"].start + 64 * x + z] = cbit
            row[L["q0"].start + 64 * x + z] = q & 1
            row[L["q1"].start + 64 * x + z] = (q >> 1) & 1
    tbits = np.zeros(1600, dtype=np.uint32)
    for k in range(25):
        v = T[k]
        for z in range(64):
            tbits[64 * k + z] = (v >> z) & 1
    row[L["T"]] = tbits
    # B plane + W + ch00
    bbits = tbits[_B_SRC]
    for x in range(5):
        for y in range(5):
            for z in range(64):
                i = _bit(x, y, z)
                b1 = bbits[_bit((x + 1) % 5, y, z)]
                b2 = bbits[_bit((x + 2) % 5, y, z)]
                row[L["W"].start + i] = (1 - b1) * b2
    for z in range(64):
        bb = bbits[z]
        ww = row[L["W"].start + z]
        row[L["ch00"].start + z] = bb ^ (ww & 1)


def keccak_trace(streams: list[tuple[int, int, bytes]],
                 min_log_n: int = 8):
    """streams: [(obj, dirs, data)] — one sponge per stream.  Returns
    (trace, [])."""
    L = LAYOUT
    groups: list[np.ndarray] = []
    for obj, dirs, data in streams:
        padded = bytearray(data)
        padlen = RATE - (len(data) % RATE)
        padded += b"\x00" * padlen
        padded[len(data)] ^= 0x01
        padded[-1] ^= 0x80
        n_blocks = len(padded) // RATE
        lanes = [0] * 25
        for blk_i in range(n_blocks):
            grp = np.zeros((GROUP_ROWS, L.width), dtype=np.uint32)
            grp[:, L["live"].start] = 1
            grp[:, L["sg"].start] = 1 if blk_i == 0 else 0
            grp[:, L["fin"].start] = 1 if blk_i == n_blocks - 1 else 0
            grp[:, L["cont"].start] = 0 if blk_i == 0 else 1
            grp[:, L["obj"].start] = obj % P
            grp[:, L["dirs"].start] = dirs
            grp[:, L["blkc"].start] = blk_i
            blk = padded[RATE * blk_i : RATE * blk_i + RATE]
            consumed = len(data) - RATE * blk_i    # message bytes left
            row_states = np.zeros((GROUP_ROWS, 25), dtype=np.uint64)
            for ell in range(17):
                for j in range(8):
                    byte_pos = 8 * ell + j
                    byv = blk[byte_pos]
                    for i in range(8):
                        grp[ell, L["lb"].start + 8 * j + i] = (byv >> i) & 1
                    if byte_pos < consumed:
                        grp[ell, L["g"].start + j] = 1
                lanes[ell] ^= int.from_bytes(blk[8 * ell : 8 * ell + 8],
                                             "little")
                row_states[ell] = np.array(lanes, dtype=np.uint64)
            state = list(lanes)
            for rr in range(N_ROUNDS):
                row_states[17 + rr] = np.array(state, dtype=np.uint64)
                state = _keccak_f_round(state, rr)
            lanes = state
            row_states[41:] = np.array(lanes, dtype=np.uint64)[None, :]
            _states_to_columns(row_states, grp)
            groups.append(grp)

    if not groups:
        raise ValueError("need at least one stream")
    full = np.concatenate(groups, axis=0)
    n_real = full.shape[0]
    log_n = max(min_log_n, (n_real - 1).bit_length())
    n = 1 << log_n
    if n > n_real:
        # dead groups: the empty absorption over the zero state
        dead = np.zeros((GROUP_ROWS, L.width), dtype=np.uint32)
        row_states = np.zeros((GROUP_ROWS, 25), dtype=np.uint64)
        state = [0] * 25
        for rr in range(N_ROUNDS):
            row_states[17 + rr] = np.array(state, dtype=np.uint64)
            state = _keccak_f_round(state, rr)
        row_states[41:] = np.array(state, dtype=np.uint64)[None, :]
        _states_to_columns(row_states, dead)
        reps = (n - n_real) // GROUP_ROWS
        full = np.concatenate([full] + [dead] * reps, axis=0)
    return full, []


def _keccak_f_round(lanes: list[int], rnd: int) -> list[int]:
    def rot(v, k):
        return ((v << k) | (v >> (64 - k))) & (1 << 64) - 1

    A = list(lanes)
    C = [A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20]
         for x in range(5)]
    D = [C[(x - 1) % 5] ^ rot(C[(x + 1) % 5], 1) for x in range(5)]
    A = [A[i] ^ D[i % 5] for i in range(25)]
    B = [0] * 25
    for x in range(5):
        for y in range(5):
            B[_lane(y, (2 * x + 3 * y) % 5)] = rot(A[_lane(x, y)],
                                                   _ROT[x][y])
    A = [(B[i] ^ ((~B[(i % 5 + 1) % 5 + 5 * (i // 5)])
                  & B[(i % 5 + 2) % 5 + 5 * (i // 5)])) & ((1 << 64) - 1)
         for i in range(25)]
    A[0] ^= _RC[rnd]
    return A
