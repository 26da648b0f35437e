"""GHASH AIR chip — proves the GF(2^128) authentication-tag polynomial of
the guest's AES-GCM record decryptions (NIST SP 800-38D; the workload the
reference proves inside its AES-GCM precompiles, SURVEY.md §3.4).

GHASH(h, B_1..B_m):  y_0 = 0;  y_i = (y_{i-1} ⊕ B_i) · h  over GF(2^128)
with the GCM reduction polynomial x^128 + x^7 + x^2 + x + 1 (bit-reversed
convention, mirroring `guest/crypto/gcm.py:_ghash_mul`).  The final y_m is
the pre-whitening tag value S; tag = S ⊕ E_K(J0), where E_K(J0) is an AES
block the AES-128 chip proves.

Layout: one row per multiplier bit — 128 rows per block group.  Each group
performs one shift-and-add multiplication z = x·v:

  row i holds (acc, v, x): acc accumulates Σ x_top·v, v is the h-multiple
  (one GCM "xtime" per row: v' = (v >> 1) ⊕ v_0·(0xE1 << 120)), and x
  shifts left one bit per row so its top bit (column 127) is the bit
  consumed this row.  `t = acc ⊕ x_127·v` is materialized per row to keep
  every constraint at degree ≤ 3; the group's product is t on its last row.

Group chaining: at a group boundary the next group restarts acc = 0 and
v = h, and carries h forward unless the next group starts a new GHASH
computation (its row-0 `es` flag is 1, which frees h — each recorded GCM
event contributes one event).  The next group's multiplicand x_row0 is the
witnessed y_prev ⊕ B_i; the data block B_i is recoverable as
x_row0 ⊕ t_prev_last (binding B_i to the transcript bytes crosses chips
via LogUp buses, same round-1 scope note as the SHA-256/AES chips).

Bit convention: column k of a 128-bit group is the coefficient of 2^k of
the big-endian integer (so byte j of the 16-byte string is columns
[8·(15−j), 8·(15−j)+8)).  The global last row binds the final event's S
as 16 public-value bytes.
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirBuilder

__all__ = ["GhashAir", "ghash_trace", "ROWS_PER_BLOCK"]

ROWS_PER_BLOCK = 128

# 0xE1 << 120: the feedback bits of the GCM reduction (integer bit indices)
_E1_BITS = frozenset({127, 126, 125, 120})
POW8 = [1 << i for i in range(8)]


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
    L.add("acc", 128)   # running product accumulator
    L.add("v", 128)     # current h-multiple (shifted per row)
    L.add("x", 128)     # remaining multiplicand bits (shifts left per row)
    L.add("t", 128)     # acc ⊕ x_127·v (materialized; degree control)
    L.add("h", 128)     # the event's hash key, carried through the event
    L.add("es", 1)      # event-start flag (read at group row 0)
    return L


LAYOUT = _build_layout()


class GhashAir(Air):
    width = LAYOUT.width
    num_public = 16  # final event's GHASH output S, big-endian bytes
    max_constraint_degree = 3

    def periodic_columns(self) -> list:
        is_glast = np.zeros(ROWS_PER_BLOCK, dtype=np.uint32)
        is_glast[ROWS_PER_BLOCK - 1] = 1
        return [is_glast]

    def eval(self, b: AirBuilder) -> None:
        L = LAYOUT
        is_glast = b.periodic[0]
        within = 1 - is_glast  # rows 0..126 of each group transition inward

        def loc(name, i):
            return b.local[L[name].start + i]

        def nxt(name, i):
            return b.next[L[name].start + i]

        ACC = b.local_group(L["acc"])
        V = b.local_group(L["v"])
        X = b.local_group(L["x"])
        T = b.local_group(L["t"])
        H = b.local_group(L["h"])
        es = loc("es", 0)
        es_next = b.next[L["es"].start]

        # --- booleanity ---
        for grp in (ACC, V, X, T, H):
            b.assert_zero_vec(grp * (grp - 1), 128)
        b.assert_bool(es)

        # --- t = acc ⊕ (x_127 · v): xor with one operand gated by a bit —
        # a + b·v − 2·a·b·v, degree 3, defined on every row ---
        bit = loc("x", 127)
        b.assert_zero_vec(T - (ACC + bit * V - 2 * (ACC * (bit * V))), 128)

        # --- within-group transitions (gate: 1 − is_glast; the global last
        # row is a group-last row, so the wrap row is excluded) ---
        NACC = b.next_group(L["acc"])
        NX = b.next_group(L["x"])
        NV = b.next_group(L["v"])
        NH = b.next_group(L["h"])

        # acc' = t
        b.assert_zero_vec(within * (NACC - T), 128)
        # x' = x << 1  (column k of x' = column k−1 of x; column 0 = 0)
        x_shift = X.roll(1)  # out[k] = x[k-1]; out[0] = x[127] (masked below)
        mask = b.const_vec([0] + [1] * 127)
        b.assert_zero_vec(within * (NX - mask * x_shift), 128)
        # v' = (v >> 1) ⊕ v_0·E1:  column k of v>>1 is v[k+1] (v[128] = 0)
        v0 = loc("v", 0)
        for k in range(128):
            vshift = loc("v", k + 1) if k < 127 else None
            if k in _E1_BITS:
                if vshift is None:
                    expr = nxt("v", k) - v0
                else:
                    expr = nxt("v", k) - (vshift + v0 - 2 * (vshift * v0))
            else:
                expr = nxt("v", k) - (vshift if vshift is not None else 0)
            b.assert_zero(within * expr)
        # h carries within the group
        b.assert_zero_vec(within * (NH - H), 128)

        # --- group boundary (gate: is_glast · is_transition) ---
        G = is_glast * b.is_transition
        b.assert_zero_vec(G * NACC, 128)           # next acc = 0
        b.assert_zero_vec(G * (NV - NH), 128)      # next v = next h
        # h continuity across groups of one event: free only when the next
        # group starts a new event.  At the wrap row next = row 0, whose
        # es = 1 (first group always starts an event), so no is_transition
        # gate is needed to keep degree ≤ 3.
        b.assert_zero_vec(is_glast * (1 - es_next) * (NH - H), 128)

        # --- first row: first group starts an event with acc = 0, v = h ---
        b.assert_zero_vec(b.is_first_row * ACC, 128)
        b.assert_zero_vec(b.is_first_row * (V - H), 128)
        b.when_first_row(es - 1)

        # --- public binding: the global last row's t is the final S ---
        for j in range(16):
            sl = L["t"].start + 8 * (15 - j)
            byte = b.dot_const(b.local_group(slice(sl, sl + 8)), POW8)
            b.when_last_row(byte - b.public[j])


# ---------------------------------------------------------------------------
# witness generation
# ---------------------------------------------------------------------------


def _int_to_bits(v: int) -> np.ndarray:
    """(128,) uint32 array, index k = coefficient of 2^k."""
    return np.array([(v >> k) & 1 for k in range(128)], dtype=np.uint32)


def ghash_trace(events: list[tuple[int, list[int]]], min_log_n: int = 7):
    """Build the chip trace from (h, [block ints]) events — each event is
    one GHASH computation over its block sequence.  Front-padded with
    all-zero event groups; the LAST event's final S binds as public values.

    Returns (trace (n, width) uint32, public_values list[int] 16 bytes).
    """
    if not events or not any(blks for _h, blks in events):
        raise ValueError("need at least one event with one block")
    groups: list[tuple[int, int, int]] = []  # (h, x_in, es)
    final_s = 0
    for h, blocks in events:
        y = 0
        for gi_, blk in enumerate(blocks):
            groups.append((h, y ^ blk, 1 if gi_ == 0 else 0))
            y = _ghash_mul_ref(y ^ blk, h)
        final_s = y

    n_rows = len(groups) * ROWS_PER_BLOCK
    log_n = max(min_log_n, (n_rows - 1).bit_length())
    n = 1 << log_n
    pad = n // ROWS_PER_BLOCK - len(groups)
    groups = [(0, 0, 1)] * pad + groups

    L = LAYOUT
    trace = np.zeros((n, L.width), dtype=np.uint32)
    E1 = 0xE1 << 120
    M128 = (1 << 128) - 1
    for gidx, (h, x_in, es) in enumerate(groups):
        base = gidx * ROWS_PER_BLOCK
        acc, v, x = 0, h, x_in
        h_bits = _int_to_bits(h)
        for r in range(ROWS_PER_BLOCK):
            row = base + r
            bit = (x >> 127) & 1
            t = acc ^ (v if bit else 0)
            trace[row, L["acc"]] = _int_to_bits(acc)
            trace[row, L["v"]] = _int_to_bits(v)
            trace[row, L["x"]] = _int_to_bits(x)
            trace[row, L["t"]] = _int_to_bits(t)
            trace[row, L["h"]] = h_bits
            if r == 0:
                trace[row, L["es"].start] = es
            acc = t
            v = (v >> 1) ^ (E1 if v & 1 else 0)
            x = (x << 1) & M128

    public = list(final_s.to_bytes(16, "big"))
    return trace, public


def _ghash_mul_ref(x: int, h: int) -> int:
    from ...guest.crypto.gcm import _ghash_mul

    return _ghash_mul(x, h)


def gcm_event_ghash(ev) -> tuple[int, list[int]]:
    """The (h, blocks) GHASH computation of one recorded GCMEvent: blocks
    over AAD ‖ CT (zero-padded 16-byte blocks) ‖ the 128-bit length block.
    Reproduces `guest/crypto/gcm.py:AESGCM._ghash` exactly."""
    from ...guest.crypto.aes import AES

    h = int.from_bytes(AES(ev.key).encrypt_block(b"\x00" * 16), "big")
    blocks: list[int] = []
    for data in (ev.aad, ev.ciphertext):
        for i in range(0, len(data), 16):
            blocks.append(int.from_bytes(
                data[i : i + 16].ljust(16, b"\x00"), "big"))
    lens = (len(ev.aad) * 8).to_bytes(8, "big") \
        + (len(ev.ciphertext) * 8).to_bytes(8, "big")
    blocks.append(int.from_bytes(lens, "big"))
    return h, blocks
