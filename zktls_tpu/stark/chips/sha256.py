"""SHA-256 compression AIR chip — the first real workload chip of the
zkTLS proving system (SURVEY.md §7 "minimum end-to-end slice": prove the
transcript-hash computation of the recorded session).

Layout: one row per SHA-256 round, 64 rows per compression, compressions
stacked (padding blocks first, the digest-binding compression last).
32-bit words are represented as two 16-bit limbs (Baby-Bear p < 2^32) and
bit-decomposed where rotations/boolean functions need them.

Column groups (564 total):
  a,b,c,e,f,g       6×32 bit columns (LSB first)
  d,h               2×2 limb columns
  s0,s1,maj,ch      4×32 bit columns — Σ0(a), Σ1(e), Maj(a,b,c), Ch(e,f,g),
                    materialized so downstream sums stay degree 1
  w_win             16×2 limb columns: message-schedule window w[t..t+15]
  w1,w14            2×32 bit columns (bits of w[t+1], w[t+14])
  sig0,sig1         2×32 bit columns — σ0(w[t+1]), σ1(w[t+14])
  sc                2+2 carry bits (schedule addition)
  ce,ca             3+3 each carry bits (e'/a' round additions)
  h_state           8×2 limb columns: the block's input state (constant
                    within each 64-row group)
  hc                8×(3+3) carry bits (Davies-Meyer output addition on the
                    final row)

Periodic columns (no commitment; verifier evaluates them itself):
  k_lo, k_hi (round constants), is_last_round (t=63), is_round0 (t=0).

Public values: the 16 limbs of the final row's Davies-Meyer output — the
digest of the last proven compression.

Scope note (round-1): each 64-row group is proven to be a correct SHA-256
compression of *some* witnessed (state_in, block), and the last group's
output is bound to the public values.  Cross-compression chaining and
binding block contents to the TLS byte stream arrive with the lookup
(LogUp) argument — the same glue the reference uses between its chips
(SURVEY.md §2.2.B "multi-table STARK glued by LogUp-style lookups").
"""

from __future__ import annotations

import numpy as np

from ...guest.crypto.sha256 import _IV, _K  # spec constants
from ..air import Air, AirBuilder

__all__ = ["Sha256Air", "sha256_trace", "ROWS_PER_BLOCK"]

ROWS_PER_BLOCK = 64


# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------


class _Layout:
    def __init__(self):
        self._n = 0
        self.slices: dict[str, slice] = {}

    def add(self, name: str, count: int) -> None:
        self.slices[name] = slice(self._n, self._n + count)
        self._n += count

    @property
    def width(self) -> int:
        return self._n

    def __getitem__(self, name: str) -> slice:
        return self.slices[name]


def _build_layout() -> _Layout:
    L = _Layout()
    for v in ("a", "b", "c", "e", "f", "g"):
        L.add(v, 32)
    L.add("dh", 4)            # d_lo, d_hi, h_lo, h_hi
    for v in ("s0", "s1", "maj", "ch"):
        L.add(v, 32)
    L.add("w_win", 32)        # 16 words × (lo, hi)
    L.add("w1", 32)
    L.add("w14", 32)
    L.add("sig0", 32)
    L.add("sig1", 32)
    L.add("sc", 4)            # schedule carries: lo 2 bits, hi 2 bits
    L.add("ce", 6)            # e' carries: lo 3 bits, hi 3 bits
    L.add("ca", 6)            # a' carries
    L.add("h_state", 16)      # H0..H7 × (lo, hi)
    L.add("hc", 48)           # 8 words × (lo 3 bits, hi 3 bits)
    return L


LAYOUT = _build_layout()


def _xor3(x, y, z):
    """xor of three booleans as a polynomial (degree 3)."""
    return x + y + z - 2 * (x * y + y * z + x * z) + 4 * (x * y * z)


def _xor2(x, y):
    return x + y - 2 * (x * y)


class Sha256Air(Air):
    width = LAYOUT.width
    num_public = 16
    max_constraint_degree = 3

    def periodic_columns(self) -> list:
        k = np.array(_K, dtype=np.uint64)
        k_lo = (k & 0xFFFF).astype(np.uint32)
        k_hi = (k >> 16).astype(np.uint32)
        is_last = np.zeros(64, dtype=np.uint32)
        is_last[63] = 1
        is_r0 = np.zeros(64, dtype=np.uint32)
        is_r0[0] = 1
        return [k_lo, k_hi, is_last, is_r0]

    # ------------------------------------------------------------------

    def eval(self, b: AirBuilder) -> None:
        """Constraints in vectorized-group form: whole 32-lane families are
        asserted as one matrix expression (one fused device op + one
        challenge-power matvec per family), which keeps the prover's XLA
        graph ~100 ops instead of ~15k."""
        L = LAYOUT
        k_lo, k_hi, is_last, is_r0 = b.periodic
        not_last = 1 - is_last

        POW16 = [1 << i for i in range(16)]

        def g(name):
            return b.local_group(L[name])

        def ng(name):
            return b.next_group(L[name])

        def col(name, i=0):
            return b.local[L[name].start + i]

        def ncol(name, i=0):
            return b.next[L[name].start + i]

        def pack(grp, lo=True):
            return b.dot_const(grp[0:16] if lo else grp[16:32], POW16)

        def carry_val(name, off, nb):
            sl = slice(L[name].start + off, L[name].start + off + nb)
            return b.dot_const(b.local_group(sl), [1 << i for i in range(nb)])

        def xor3v(x, y, z):
            return x + y + z - 2 * (x * y + y * z + x * z) + 4 * (x * y * z)

        A, B_, C = g("a"), g("b"), g("c")
        E, F, G_ = g("e"), g("f"), g("g")
        S0, S1, MAJ, CH = g("s0"), g("s1"), g("maj"), g("ch")
        W1, W14 = g("w1"), g("w14")
        SIG0, SIG1 = g("sig0"), g("sig1")

        # --- booleanity (free-witness bits only) ---
        for grp, k in ((A, 32), (B_, 32), (C, 32), (E, 32), (F, 32),
                       (G_, 32), (W1, 32), (W14, 32),
                       (g("sc"), 4), (g("ce"), 6), (g("ca"), 6),
                       (g("hc"), 48)):
            b.assert_zero_vec(grp * (grp - 1), k)

        # --- boolean-function definitions (degree ≤ 3, every row) ---
        # roll(-r)[k] = bits[(k+r) % 32] = rotr by r;  shr via zero mask
        b.assert_zero_vec(
            S1 - xor3v(E.roll(-6), E.roll(-11), E.roll(-25)), 32)
        b.assert_zero_vec(
            S0 - xor3v(A.roll(-2), A.roll(-13), A.roll(-22)), 32)
        b.assert_zero_vec(CH - (E * F + G_ - E * G_), 32)
        b.assert_zero_vec(
            MAJ - (A * B_ + A * C + B_ * C - 2 * (A * B_ * C)), 32)
        shr3 = W1.roll(-3) * b.const_vec([1] * 29 + [0] * 3)
        b.assert_zero_vec(
            SIG0 - xor3v(W1.roll(-7), W1.roll(-18), shr3), 32)
        shr10 = W14.roll(-10) * b.const_vec([1] * 22 + [0] * 10)
        b.assert_zero_vec(
            SIG1 - xor3v(W14.roll(-17), W14.roll(-19), shr10), 32)

        # --- w1/w14 bits pack to window words 1 and 14 ---
        b.assert_zero(pack(W1, True) - col("w_win", 2))
        b.assert_zero(pack(W1, False) - col("w_win", 3))
        b.assert_zero(pack(W14, True) - col("w_win", 28))
        b.assert_zero(pack(W14, False) - col("w_win", 29))

        # --- round-0 rows: working vars equal the block input state ---
        var_lo_hi = [
            (pack(A, True), pack(A, False)),
            (pack(B_, True), pack(B_, False)),
            (pack(C, True), pack(C, False)),
            (col("dh", 0), col("dh", 1)),
            (pack(E, True), pack(E, False)),
            (pack(F, True), pack(F, False)),
            (pack(G_, True), pack(G_, False)),
            (col("dh", 2), col("dh", 3)),
        ]
        for i in range(8):
            b.assert_zero(is_r0 * (var_lo_hi[i][0] - col("h_state", 2 * i)))
            b.assert_zero(is_r0 * (var_lo_hi[i][1] - col("h_state", 2 * i + 1)))

        # --- round additions (transition, not across block boundary) ---
        s1v_lo, s1v_hi = pack(S1, True), pack(S1, False)
        s0v_lo, s0v_hi = pack(S0, True), pack(S0, False)
        chv_lo, chv_hi = pack(CH, True), pack(CH, False)
        majv_lo, majv_hi = pack(MAJ, True), pack(MAJ, False)
        w0_lo, w0_hi = col("w_win", 0), col("w_win", 1)
        h_lo, h_hi = col("dh", 2), col("dh", 3)
        d_lo, d_hi = col("dh", 0), col("dh", 1)
        # t1 = h + Σ1 + ch + K + w
        t1_lo = h_lo + s1v_lo + chv_lo + k_lo + w0_lo
        t1_hi = h_hi + s1v_hi + chv_hi + k_hi + w0_hi
        # e' = d + t1
        NE, NA = ng("e"), ng("a")
        ce_lo = carry_val("ce", 0, 3)
        ce_hi = carry_val("ce", 3, 3)
        b.assert_zero(not_last * (d_lo + t1_lo - pack(NE, True)
                                  - ce_lo * (1 << 16)))
        b.assert_zero(not_last * (d_hi + t1_hi + ce_lo - pack(NE, False)
                                  - ce_hi * (1 << 16)))
        # a' = t1 + t2,  t2 = Σ0 + maj
        ca_lo = carry_val("ca", 0, 3)
        ca_hi = carry_val("ca", 3, 3)
        b.assert_zero(not_last * (t1_lo + s0v_lo + majv_lo - pack(NA, True)
                                  - ca_lo * (1 << 16)))
        b.assert_zero(not_last * (t1_hi + s0v_hi + majv_hi + ca_lo
                                  - pack(NA, False) - ca_hi * (1 << 16)))
        # shifts: b'=a, c'=b, f'=e, g'=f (bitwise), d'=c, h'=g (limbwise)
        b.assert_zero_vec(not_last * (ng("b") - A), 32)
        b.assert_zero_vec(not_last * (ng("c") - B_), 32)
        b.assert_zero_vec(not_last * (ng("f") - E), 32)
        b.assert_zero_vec(not_last * (ng("g") - F), 32)
        b.assert_zero(not_last * (ncol("dh", 0) - pack(C, True)))
        b.assert_zero(not_last * (ncol("dh", 1) - pack(C, False)))
        b.assert_zero(not_last * (ncol("dh", 2) - pack(G_, True)))
        b.assert_zero(not_last * (ncol("dh", 3) - pack(G_, False)))

        # --- message schedule (transition, same gating) ---
        WWIN, NWWIN = g("w_win"), ng("w_win")
        b.assert_zero_vec(not_last * (NWWIN[0:30] - WWIN[2:32]), 30)
        # w[t+16] = σ1(w[t+14]) + w[t+9] + σ0(w[t+1]) + w[t]
        sg0_lo, sg0_hi = pack(SIG0, True), pack(SIG0, False)
        sg1_lo, sg1_hi = pack(SIG1, True), pack(SIG1, False)
        sc_lo = carry_val("sc", 0, 2)
        sc_hi = carry_val("sc", 2, 2)
        b.assert_zero(not_last * (
            sg1_lo + col("w_win", 18) + sg0_lo + w0_lo
            - ncol("w_win", 30) - sc_lo * (1 << 16)))
        b.assert_zero(not_last * (
            sg1_hi + col("w_win", 19) + sg0_hi + w0_hi + sc_lo
            - ncol("w_win", 31) - sc_hi * (1 << 16)))

        # --- block input state persists within the block ---
        b.assert_zero_vec(not_last * (ng("h_state") - g("h_state")), 16)

        # --- final row: Davies-Meyer output equals the public digest ---
        after = [
            (t1_lo + s0v_lo + majv_lo, t1_hi + s0v_hi + majv_hi),  # a*
            (pack(A, True), pack(A, False)),                        # b* = a
            (pack(B_, True), pack(B_, False)),                      # c* = b
            (pack(C, True), pack(C, False)),                        # d* = c
            (d_lo + t1_lo, d_hi + t1_hi),                           # e* = d+t1
            (pack(E, True), pack(E, False)),                        # f* = e
            (pack(F, True), pack(F, False)),                        # g* = f
            (pack(G_, True), pack(G_, False)),                      # h* = g
        ]
        for i in range(8):
            hc_lo = carry_val("hc", 6 * i, 3)
            hc_hi = carry_val("hc", 6 * i + 3, 3)
            b.when_last_row(
                col("h_state", 2 * i) + after[i][0]
                - b.public[2 * i] - hc_lo * (1 << 16))
            b.when_last_row(
                col("h_state", 2 * i + 1) + after[i][1] + hc_lo
                - b.public[2 * i + 1] - hc_hi * (1 << 16))


# ---------------------------------------------------------------------------
# witness generation (vectorized across blocks)
# ---------------------------------------------------------------------------


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def sha256_trace(compressions: list[tuple[bytes, tuple[int, ...]]],
                 min_log_n: int = 6):
    """Build the chip trace.

    compressions: list of (64-byte block, state_in 8×u32), in order; the
    LAST one's output digest becomes the public values.  The trace is
    padded at the FRONT with zero-block compressions to a power-of-two
    height.  Returns (trace (n, width) uint32, public_values list[int]).
    """
    if not compressions:
        raise ValueError("need at least one compression")
    n_real = len(compressions)
    n_rows = n_real * ROWS_PER_BLOCK
    log_n = max(min_log_n, (n_rows - 1).bit_length())
    n = 1 << log_n
    n_blocks = n // ROWS_PER_BLOCK
    pad = n_blocks - n_real
    blocks = [(b"\x00" * 64, (0,) * 8)] * pad + list(compressions)

    B = n_blocks
    # message schedule w[0..80) per block
    w = np.zeros((B, 80), dtype=np.uint64)
    for bidx, (blk, _st) in enumerate(blocks):
        w[bidx, :16] = np.frombuffer(blk, dtype=">u4").astype(np.uint64)
    for t in range(16, 80):
        s0 = _rotr(w[:, t - 15], 7) ^ _rotr(w[:, t - 15], 18) ^ (w[:, t - 15] >> 3)
        s1 = _rotr(w[:, t - 2], 17) ^ _rotr(w[:, t - 2], 19) ^ (w[:, t - 2] >> 10)
        w[:, t] = (w[:, t - 16] + s0 + w[:, t - 7] + s1) & 0xFFFFFFFF

    # round evolution: vars[t] = (a..h) before round t, for t = 0..64
    vars_ = np.zeros((B, 65, 8), dtype=np.uint64)
    state_in = np.array([st for _b, st in blocks], dtype=np.uint64)
    vars_[:, 0, :] = state_in
    K = np.array(_K, dtype=np.uint64)
    for t in range(64):
        a, bb_, c, d, e, f, g, h = (vars_[:, t, i] for i in range(8))
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g) & 0xFFFFFFFF
        t1 = (h + S1 + ch + K[t] + w[:, t]) & 0xFFFFFFFF
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & bb_) ^ (a & c) ^ (bb_ & c)
        t2 = (S0 + maj) & 0xFFFFFFFF
        vars_[:, t + 1] = np.stack(
            [(t1 + t2) & 0xFFFFFFFF, a, bb_, c, (d + t1) & 0xFFFFFFFF,
             e, f, g], axis=1)

    digest = (state_in + vars_[:, 64]) & 0xFFFFFFFF

    # --- fill columns ---
    L = LAYOUT
    trace = np.zeros((n, L.width), dtype=np.uint32)
    t_idx = np.tile(np.arange(64), B)
    b_idx = np.repeat(np.arange(B), 64)

    def setbits(name, words):
        sl = L[name]
        for k in range(32):
            trace[:, sl.start + k] = ((words >> k) & 1).astype(np.uint32)

    va = vars_[b_idx, t_idx]  # (n, 8) current-round vars
    setbits("a", va[:, 0])
    setbits("b", va[:, 1])
    setbits("c", va[:, 2])
    setbits("e", va[:, 4])
    setbits("f", va[:, 5])
    setbits("g", va[:, 6])
    trace[:, L["dh"].start + 0] = (va[:, 3] & 0xFFFF).astype(np.uint32)
    trace[:, L["dh"].start + 1] = (va[:, 3] >> 16).astype(np.uint32)
    trace[:, L["dh"].start + 2] = (va[:, 7] & 0xFFFF).astype(np.uint32)
    trace[:, L["dh"].start + 3] = (va[:, 7] >> 16).astype(np.uint32)

    e_, f_, g_ = va[:, 4], va[:, 5], va[:, 6]
    a_, b2_, c_ = va[:, 0], va[:, 1], va[:, 2]
    S1w = _rotr(e_, 6) ^ _rotr(e_, 11) ^ _rotr(e_, 25)
    chw = (e_ & f_) ^ (~e_ & g_) & 0xFFFFFFFF
    S0w = _rotr(a_, 2) ^ _rotr(a_, 13) ^ _rotr(a_, 22)
    majw = (a_ & b2_) ^ (a_ & c_) ^ (b2_ & c_)
    setbits("s1", S1w)
    setbits("ch", chw)
    setbits("s0", S0w)
    setbits("maj", majw)

    # window + schedule bits
    for j in range(16):
        wj = w[b_idx, t_idx + j]
        trace[:, L["w_win"].start + 2 * j] = (wj & 0xFFFF).astype(np.uint32)
        trace[:, L["w_win"].start + 2 * j + 1] = (wj >> 16).astype(np.uint32)
    w1w = w[b_idx, t_idx + 1]
    w14w = w[b_idx, t_idx + 14]
    setbits("w1", w1w)
    setbits("w14", w14w)
    sg0 = _rotr(w1w, 7) ^ _rotr(w1w, 18) ^ (w1w >> 3)
    sg1 = _rotr(w14w, 17) ^ _rotr(w14w, 19) ^ (w14w >> 10)
    setbits("sig0", sg0)
    setbits("sig1", sg1)

    def setcarry(name, off, nb, vals):
        sl = L[name]
        for i in range(nb):
            trace[:, sl.start + off + i] = ((vals >> i) & 1).astype(np.uint32)

    # schedule carries: w[t+16] addition
    wnew = w[b_idx, t_idx + 16]
    lo_sum = (sg1 & 0xFFFF) + (w[b_idx, t_idx + 9] & 0xFFFF) + \
        (sg0 & 0xFFFF) + (w[b_idx, t_idx] & 0xFFFF)
    sc_lo = (lo_sum - (wnew & 0xFFFF)) >> 16
    hi_sum = (sg1 >> 16) + (w[b_idx, t_idx + 9] >> 16) + (sg0 >> 16) + \
        (w[b_idx, t_idx] >> 16) + sc_lo
    sc_hi = (hi_sum - (wnew >> 16)) >> 16
    setcarry("sc", 0, 2, sc_lo)
    setcarry("sc", 2, 2, sc_hi)

    # round carries: e' and a'
    d_, h_ = va[:, 3], va[:, 7]
    Kt = K[t_idx]
    t1_lo = (h_ & 0xFFFF) + (S1w & 0xFFFF) + (chw & 0xFFFF) + \
        (Kt & 0xFFFF) + (w[b_idx, t_idx] & 0xFFFF)
    t1_hi = (h_ >> 16) + (S1w >> 16) + (chw >> 16) + (Kt >> 16) + \
        (w[b_idx, t_idx] >> 16)
    nxt = vars_[b_idx, t_idx + 1]  # post-round vars
    ne_, na_ = nxt[:, 4], nxt[:, 0]
    ce_lo = ((d_ & 0xFFFF) + t1_lo - (ne_ & 0xFFFF)) >> 16
    ce_hi = ((d_ >> 16) + t1_hi + ce_lo - (ne_ >> 16)) >> 16
    setcarry("ce", 0, 3, ce_lo)
    setcarry("ce", 3, 3, ce_hi)
    ca_lo = (t1_lo + (S0w & 0xFFFF) + (majw & 0xFFFF) - (na_ & 0xFFFF)) >> 16
    ca_hi = (t1_hi + (S0w >> 16) + (majw >> 16) + ca_lo - (na_ >> 16)) >> 16
    setcarry("ca", 0, 3, ca_lo)
    setcarry("ca", 3, 3, ca_hi)

    # block input state
    for i in range(8):
        trace[:, L["h_state"].start + 2 * i] = \
            (state_in[b_idx, i] & 0xFFFF).astype(np.uint32)
        trace[:, L["h_state"].start + 2 * i + 1] = \
            (state_in[b_idx, i] >> 16).astype(np.uint32)

    # Davies-Meyer carries (constrained only on the global last row, but
    # filled everywhere with the row-local would-be values)
    after_lo = np.empty((n, 8), dtype=np.uint64)
    after_hi = np.empty((n, 8), dtype=np.uint64)
    after_lo[:, 0] = t1_lo + (S0w & 0xFFFF) + (majw & 0xFFFF)
    after_hi[:, 0] = t1_hi + (S0w >> 16) + (majw >> 16)
    after_lo[:, 4] = (d_ & 0xFFFF) + t1_lo
    after_hi[:, 4] = (d_ >> 16) + t1_hi
    for i, src in ((1, a_), (2, b2_), (3, c_), (5, e_), (6, f_), (7, g_)):
        after_lo[:, i] = src & 0xFFFF
        after_hi[:, i] = src >> 16
    dig = digest[b_idx]  # (n, 8): digest of the row's own block
    for i in range(8):
        hlo = state_in[b_idx, i] & 0xFFFF
        hhi = state_in[b_idx, i] >> 16
        hc_lo = (hlo + after_lo[:, i] - (dig[:, i] & 0xFFFF)) >> 16
        hc_hi = (hhi + after_hi[:, i] + hc_lo - (dig[:, i] >> 16)) >> 16
        setcarry("hc", 6 * i, 3, hc_lo)
        setcarry("hc", 6 * i + 3, 3, hc_hi)

    public = []
    for i in range(8):
        public.append(int(digest[-1, i] & 0xFFFF))
        public.append(int(digest[-1, i] >> 16))
    return trace, public
