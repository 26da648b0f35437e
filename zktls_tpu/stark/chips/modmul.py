"""ModMul AIR chip — proves batches of 256-bit modular multiplications
a · b ≡ r (mod m), the witness stream of every elliptic-curve operation
the guest performs (ECDHE shared-secret derivation, ECDSA certificate /
ServerKeyExchange verification, secp256k1 origin recovery — the workload
of the reference's `sp1-curves` bigint/EC precompile chips, SURVEY.md
§2.2.B; events recorded by `guest/crypto/modmul.py`).

One event per row.  Operands are witnessed as 32 byte-limbs (little-
endian); the modulus is selected from a fixed per-chip set by boolean
one-hot flags, so its limbs are constraint *constants*, not columns.

**Identity in point-evaluation form.**  With limb polynomials
a(x) = Σ aᵢxⁱ etc. and the carry polynomial c(x) = Σ cₖxᵏ (deg ≤ 61,
cₖ the signed carry of coefficient k), correctness is the polynomial
identity

    a(x)·b(x) − q(x)·m(x) − r(x) = (256 − x)·c(x)

(q the witnessed quotient).  Both sides have degree ≤ 62, so agreement at
the 63 points x = 1..63 forces coefficient-wise equality
tₖ = 256·cₖ − cₖ₋₁ over Baby-Bear; byte range checks bound
|tₖ| < 2²¹ and |cₖ| < 2¹⁶, so each congruence is an integer equality,
and evaluating at x = 256 telescopes to a·b = q·m + r exactly — i.e.
r ≡ a·b (mod m) with a, b, q, r < 2²⁵⁶.  (r < m canonicity is not
asserted; the chip proves congruence.)  Each point check is a handful of
`dot_const` row-reductions, keeping the traced constraint graph ~50×
smaller than coefficient-wise convolution.

Carries are offset-encoded as two bytes (cₖ + 2¹⁵ = lo + 256·hi).  Every
limb and carry byte is range-checked against the periodic byte table with
one LogUp argument; committed inverse columns are **paired** —
w = 1/((γ−v₁)(γ−v₂)) with the degree-3 check w·(γ−v₁)·(γ−v₂) = 1 and the
degree-2 running-sum term (2γ−v₁−v₂)·w — halving the permutation width.
All 126 pair checks evaluate as ONE wide ExtVal expression over strided
perm-column groups (builder.perm_ext_group).

The global last row binds its result r as 32 public-value bytes (the
chronologically final EC product of the execution); rows are front-padded
with 0·0 ≡ 0 (mod M₀) events.  Binding each event's operands to the
consuming chip crosses chips via LogUp buses (round-1 scope note shared
with the SHA-256/AES chips).
"""

from __future__ import annotations

import numpy as np

from ...guest.crypto.ec import P256, SECP256K1
from ...ops.field_ref import P
from ..air import Air, AirBuilder
from ..ext_val import ExtVal

__all__ = ["ModMul256Air", "modmul_trace", "MODULI_256"]

LIMBS = 32                 # 8-bit limbs per operand
N_COEFF = 2 * LIMBS - 1    # product coefficients k = 0..62
N_CARRY = N_COEFF - 1      # carry polynomial degree ≤ 61 (c₆₂ ≡ 0 implicit)
OFFSET = 1 << 15           # carry offset encoding

#: the modulus set of the 256-bit chip: the base and scalar fields of the
#: curves the guest uses at this width (P-384 gets its own wider chip).
MODULI_256: list[int] = [P256.p, P256.n, SECP256K1.p, SECP256K1.n]

_MOD_LIMBS = [[(m >> (8 * i)) & 0xFF for i in range(LIMBS)]
              for m in MODULI_256]

#: evaluation points of the polynomial identity (63 distinct points for
#: the degree-62 identity)
EVAL_POINTS = list(range(1, N_COEFF + 1))


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
    L.add("a", LIMBS)
    L.add("b", LIMBS)
    L.add("r", LIMBS)
    L.add("q", LIMBS)
    L.add("c_lo", N_CARRY)     # carry bytes (offset encoding)
    L.add("c_hi", N_CARRY)
    L.add("f", len(MODULI_256))  # one-hot modulus flags
    L.add("mult", 1)           # byte-table multiplicity
    return L


LAYOUT = _build_layout()

# looked-up byte columns: a ‖ b ‖ r ‖ q ‖ c_lo ‖ c_hi — contiguous from 0
N_LOOKUP_VALUES = 4 * LIMBS + 2 * N_CARRY          # 252
N_PAIRS = N_LOOKUP_VALUES // 2                     # 126

# per-point constant weights, precomputed mod P
_POW_A = [[pow(x, i, P) for i in range(LIMBS)] for x in EVAL_POINTS]
_POW_C = [[pow(x, k, P) for k in range(N_CARRY)] for x in EVAL_POINTS]
_POW_C256 = [[256 * pow(x, k, P) % P for k in range(N_CARRY)]
             for x in EVAL_POINTS]
_M_AT = [[sum(ml[i] * pow(x, i, P) for i in range(LIMBS)) % P
          for ml in _MOD_LIMBS] for x in EVAL_POINTS]
_C_OFFSET_AT = [OFFSET * sum(pow(x, k, P) for k in range(N_CARRY)) % P
                for x in EVAL_POINTS]


class ModMul256Air(Air):
    width = LAYOUT.width
    num_public = LIMBS  # final event's r, little-endian bytes
    max_constraint_degree = 3
    # pair inverses ‖ table inverse ‖ running sum
    perm_width = 4 * (N_PAIRS + 2)
    num_perm_challenges = 1  # γ (plain byte range lookup, no tuple δ)

    def periodic_columns(self) -> list:
        return [np.arange(256, dtype=np.uint32)]

    def eval(self, b: AirBuilder) -> None:
        L = LAYOUT
        gamma = b.challenges[0]
        nf = len(MODULI_256)

        A = b.local_group(L["a"])
        B = b.local_group(L["b"])
        R = b.local_group(L["r"])
        Q = b.local_group(L["q"])
        F = b.local_group(L["f"])
        CLO = b.local_group(L["c_lo"])
        CHI = b.local_group(L["c_hi"])

        # --- modulus selection: one-hot flags ---
        b.assert_zero_vec(F * (F - 1), nf)
        b.assert_zero(b.dot_const(F, [1] * nf) - 1)

        # --- the point-evaluated limb identity ---
        for t, x in enumerate(EVAL_POINTS):
            a_x = b.dot_const(A, _POW_A[t])
            b_x = b.dot_const(B, _POW_A[t])
            q_x = b.dot_const(Q, _POW_A[t])
            r_x = b.dot_const(R, _POW_A[t])
            m_x = b.dot_const(F, _M_AT[t])
            c_x = (b.dot_const(CLO, _POW_C[t])
                   + b.dot_const(CHI, _POW_C256[t])
                   - _C_OFFSET_AT[t])
            b.assert_zero(a_x * b_x - q_x * m_x - r_x
                          - ((256 - x) % P) * c_x)

        # --- public binding: global last row's r ---
        for j in range(LIMBS):
            b.when_last_row(R[j] - b.public[j])

        # --- LogUp byte range check: ONE wide expression over all pairs ---
        V = b.local_group(slice(0, N_LOOKUP_VALUES))
        V1, V2 = V[0::2], V[1::2]
        W = b.perm_ext_group(N_PAIRS)
        G1 = gamma - ExtVal.from_base(V1)
        G2 = gamma - ExtVal.from_base(V2)
        pair_check = W * (G1 * G2) - 1
        for limb in pair_check.limbs():
            b.assert_zero_vec(limb, N_PAIRS)

        t_col = b.periodic[0]
        mult = b.local[L["mult"].start]
        mult_next = b.next[L["mult"].start]
        inv_t = b.perm_ext(N_PAIRS)
        inv_t_n = b.perm_ext(N_PAIRS, nxt=True)
        s = b.perm_ext(N_PAIRS + 1)
        s_next = b.perm_ext(N_PAIRS + 1, nxt=True)
        b.assert_ext_zero(inv_t * (gamma - ExtVal.from_base(t_col)) - 1)

        def row_term(V1v, V2v, Wv, mult_v, table_inv):
            # Σ_pairs (2γ − v₁ − v₂)·w  −  mult · inv_t
            prod = (gamma * 2 - ExtVal.from_base(V1v + V2v)) * Wv
            total = ExtVal(*[b.dot_const(limb, [1] * N_PAIRS)
                             for limb in prod.limbs()])
            return total - mult_v * table_inv

        term_first = row_term(V1, V2, W, mult, inv_t)
        b.assert_ext_zero((s - term_first) * b.is_first_row)
        Vn = b.next_group(slice(0, N_LOOKUP_VALUES))
        Wn = b.perm_ext_group(N_PAIRS, nxt=True)
        term_next = row_term(Vn[0::2], Vn[1::2], Wn, mult_next, inv_t_n)
        b.assert_ext_zero((s_next - s - term_next) * b.is_transition)
        b.assert_ext_zero(s * b.is_last_row)

    def generate_perm_trace(self, main, public_values, challenges):
        from ..lookup import np_ext_mul, np_logup_terms

        gamma = challenges[0]
        n = main.shape[0]
        L = LAYOUT
        P_ = P

        vals = main[:, :N_LOOKUP_VALUES].astype(np.uint64)
        inv = np_logup_terms(gamma, vals.reshape(-1), None, None, None)
        inv = inv.reshape(n, N_LOOKUP_VALUES, 4)      # 1/(γ−v)
        # paired commitment: w = inv₁ · inv₂
        w = np_ext_mul(
            inv[:, 0::2, :].reshape(-1, 4),
            inv[:, 1::2, :].reshape(-1, 4),
        ).reshape(n, N_PAIRS, 4)

        t_in = np.arange(n, dtype=np.uint64) % 256
        inv_t = np_logup_terms(gamma, t_in, None, None, None)  # (n, 4)

        mult = main[:, L["mult"].start].astype(np.uint64)
        term = inv.sum(axis=1) % P_                  # Σ 1/(γ−v) per row
        m_it = (inv_t.astype(np.uint64) * mult[:, None]) % P_
        term = (term + P_ - m_it) % P_
        s = np.cumsum(term.astype(object), axis=0) % P_

        out = np.zeros((n, self.perm_width), dtype=np.uint32)
        out[:, : 4 * N_PAIRS] = w.reshape(n, -1)
        out[:, 4 * N_PAIRS : 4 * N_PAIRS + 4] = inv_t
        out[:, 4 * (N_PAIRS + 1):] = s.astype(np.uint64)
        return out


# ---------------------------------------------------------------------------
# witness generation
# ---------------------------------------------------------------------------


def _limbs(v: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(LIMBS, "little"), dtype=np.uint8)


def modmul_trace(events, min_log_n: int = 8):
    """Build the chip trace from ModMulEvents (a, b, r, m).  Front-padded
    with 0·0 ≡ 0 (mod M₀) rows; the LAST event's r binds as public values.
    Returns (trace (n, width) uint32, public_values list[int] 32 bytes)."""
    events = list(events)
    if not events:
        raise ValueError("need at least one event")
    mod_index = {m: i for i, m in enumerate(MODULI_256)}
    for ev in events:
        if ev.m not in mod_index:
            raise ValueError(f"modulus not in chip set: {hex(ev.m)}")
        if not (0 <= ev.a < ev.m and 0 <= ev.b < ev.m and 0 <= ev.r < 1 << 256):
            raise ValueError("operands out of range")

    n = 1 << max(min_log_n, (len(events) - 1).bit_length())
    pad = n - len(events)

    L = LAYOUT
    trace = np.zeros((n, L.width), dtype=np.uint32)
    trace[:pad, L["f"].start] = 1  # padding rows select M₀

    a_l = np.zeros((n, LIMBS), dtype=np.int64)
    b_l = np.zeros((n, LIMBS), dtype=np.int64)
    r_l = np.zeros((n, LIMBS), dtype=np.int64)
    q_l = np.zeros((n, LIMBS), dtype=np.int64)
    m_l = np.zeros((n, LIMBS), dtype=np.int64)
    m_l[:pad] = _limbs(MODULI_256[0]).astype(np.int64)

    for idx, ev in enumerate(events):
        row = pad + idx
        q, r_chk = divmod(ev.a * ev.b, ev.m)
        if r_chk != ev.r:
            raise ValueError("inconsistent event: a·b mod m != r")
        a_l[row] = _limbs(ev.a).astype(np.int64)
        b_l[row] = _limbs(ev.b).astype(np.int64)
        r_l[row] = _limbs(ev.r).astype(np.int64)
        q_l[row] = _limbs(q).astype(np.int64)
        m_l[row] = _limbs(ev.m).astype(np.int64)
        trace[row, L["f"].start + mod_index[ev.m]] = 1

    trace[:, L["a"]] = a_l
    trace[:, L["b"]] = b_l
    trace[:, L["r"]] = r_l
    trace[:, L["q"]] = q_l

    # vectorized carry computation: t (n, 63) via per-row convolutions
    conv_ab = _batch_conv(a_l, b_l)
    conv_qm = _batch_conv(q_l, m_l)
    t = conv_ab - conv_qm
    t[:, :LIMBS] -= r_l
    carries = np.zeros((n, N_CARRY), dtype=np.int64)
    c_prev = np.zeros(n, dtype=np.int64)
    for k in range(N_COEFF):
        d = t[:, k] + c_prev
        assert (d % 256 == 0).all(), "carry chain broke (bad witness)"
        c_prev = d // 256
        if k < N_CARRY:
            carries[:, k] = c_prev
    assert (c_prev == 0).all(), "final carry nonzero (bad witness)"
    assert (np.abs(carries) < OFFSET).all(), "carry out of encoding range"
    enc = carries + OFFSET
    trace[:, L["c_lo"]] = (enc & 0xFF).astype(np.uint32)
    trace[:, L["c_hi"]] = (enc >> 8).astype(np.uint32)

    # byte-table multiplicities over every looked-up column
    lookup_vals = trace[:, :N_LOOKUP_VALUES].reshape(-1)
    counts = np.bincount(lookup_vals, minlength=256)
    trace[:256, L["mult"].start] = counts[:256].astype(np.uint32)

    public = [int(v) for v in r_l[n - 1]]
    return trace, public


def _batch_conv(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Row-wise full convolution of (n, LIMBS) int64 arrays → (n, 2L−1)."""
    n = x.shape[0]
    out = np.zeros((n, N_COEFF), dtype=np.int64)
    for i in range(LIMBS):
        out[:, i : i + LIMBS] += x[:, i : i + 1] * y
    return out
