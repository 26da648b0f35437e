"""Baby-Bear field arithmetic as vectorized JAX/XLA ops (uint32 lanes).

This replaces the reference's native field kernels (risc0-sys C++/CUDA
`fp.h` Baby-Bear ops and Plonky3's Montgomery arithmetic, SURVEY.md §2.2).

TPU design notes (the SURVEY §7 "hard part #3" — 31-bit modular mul with no
native 32×32→64):
  * elements live in **Montgomery form** (x·2^32 mod p) as uint32 arrays —
    same representation Plonky3 uses at rest;
  * the 64-bit product is assembled from 16-bit limb partial products, each
    of which fits exactly in a uint32 lane on the VPU;
  * Montgomery reduction needs only hi(m·p) where the low half cancels by
    construction, so the carry is simply (lo != 0).

All functions are shape-polymorphic, jit-friendly, and differentiable-free
(integer) — they fuse into surrounding XLA computations.  Scalar semantics
are property-tested against zktls_tpu.ops.field_ref.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .field_ref import P as _P_INT

__all__ = [
    "P", "MONT_R", "MONT_R2", "to_mont", "from_mont", "add", "sub", "neg",
    "mul", "mul_plain", "pow_const", "inv", "sum_mod", "dot_mod",
]

# NOTE: kept as plain Python ints (weak-typed literals) rather than device
# scalars so Pallas kernels using these ops don't capture device constants.
P = _P_INT
NPRIME = (-pow(_P_INT, -1, 1 << 32)) % (1 << 32)  # -p^-1 mod 2^32
MONT_R = (1 << 32) % _P_INT
MONT_R2 = (MONT_R * MONT_R) % _P_INT

_U16 = 0xFFFF


def _mul64(a, b):
    """Full 32×32→64 product as (hi, lo) uint32 pairs, via 16-bit limbs.
    `a` must be a uint32 array; `b` may be an array or a static int (static
    operands stay Python literals so Pallas kernels capture no constants)."""
    a0 = a & _U16
    a1 = a >> 16
    if isinstance(b, int):
        b0, b1 = b & 0xFFFF, b >> 16
    else:
        b0 = b & _U16
        b1 = b >> 16
    ll = a0 * b0          # < 2^32, exact
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & _U16) + (hl & _U16)          # < 3·2^16
    lo = (mid << 16) | (ll & _U16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def _mont_reduce(hi, lo):
    """(hi·2^32 + lo) · 2^-32 mod p, inputs from a product of elements < p."""
    m = (lo * NPRIME).astype(jnp.uint32)          # wrapping mul
    mp_hi, _mp_lo = _mul64(m, P)
    # lo + (m·p mod 2^32) ≡ 0 (mod 2^32): carry out is 1 unless lo == 0
    carry = (lo != 0).astype(jnp.uint32)
    t = hi + mp_hi + carry                         # < 2p
    return jnp.where(t >= P, t - P, t)


def mul(a, b):
    """Montgomery product: mont(a)·mont(b) -> mont(a·b)."""
    hi, lo = _mul64(a, b)
    return _mont_reduce(hi, lo)


def add(a, b):
    s = a.astype(jnp.uint32) + b.astype(jnp.uint32)  # < 2p < 2^32
    return jnp.where(s >= P, s - P, s)


def sub(a, b):
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    return jnp.where(a >= b, a - b, a + (P - b))


def neg(a):
    a = a.astype(jnp.uint32)
    return jnp.where(a == 0, a, P - a)


def to_mont(x):
    """Plain uint32 (< p) -> Montgomery form."""
    r2 = jnp.full(jnp.shape(x), MONT_R2, dtype=jnp.uint32)
    return mul(x.astype(jnp.uint32), r2)


def from_mont(x):
    """Montgomery form -> plain uint32."""
    return _mont_reduce(jnp.zeros_like(x, dtype=jnp.uint32), x.astype(jnp.uint32))


def mul_plain(a, b):
    """Product of *plain*-form operands -> plain form (2 reductions)."""
    return from_mont(mul(to_mont(a), b.astype(jnp.uint32)))


def pow_const(x, e: int):
    """x^e for a static exponent (square-and-multiply unrolled at trace
    time); x in Montgomery form."""
    one = jnp.full(jnp.shape(x), MONT_R % _P_INT, dtype=jnp.uint32)  # mont(1)
    result = one
    base = x
    while e:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(x):
    """Field inverse via Fermat (x^(p-2)); x in Montgomery form."""
    return pow_const(x, _P_INT - 2)


def sum_mod(x, axis=None):
    """Sum of field elements along an axis with exact modular reduction.

    uint32 sums overflow, so accumulate in two uint32 halves is awkward —
    instead reduce in uint64 via pairwise folding: XLA on TPU emulates u64,
    so keep it simple with a float-free tree reduction in u32 chunks of 2.
    """
    x = x.astype(jnp.uint32)
    if axis is None:
        x = x.reshape(-1)
        axis = 0
    # move axis to front, then tree-reduce pairwise (log n adds, each mod p)
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    # pad to a power of two with zeros
    pot = 1 << (n - 1).bit_length() if n > 1 else 1
    if pot != n:
        pad = jnp.zeros((pot - n,) + x.shape[1:], dtype=jnp.uint32)
        x = jnp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = add(x[:half], x[half:])
    return x[0]


def dot_mod(a, b, axis=-1):
    """Field inner product along an axis (Montgomery operands)."""
    return sum_mod(mul(a, b), axis=axis)


def matmul_mod(v, w_np):
    """Exact Baby-Bear matrix product on the MXU: (N, k) field values ×
    (k, m) plain integer constants → (N, m) mod p, same representation as
    the input (the map is linear, so Montgomery-form inputs yield
    Montgomery-form outputs).

    The 31-bit modular matmul has no native integer path wider than int8
    on the MXU, so both operands are decomposed into base-128 digits
    (5 × 7-bit, int8-safe) and the 25 digit products are accumulated into
    9 diagonal partials T_s = Σ_{i+j=s} D_i·E_j in int32 (exact while
    5·k·127² < 2³¹, i.e. k < 26 000), then recombined as
    Σ_s T_s·128^s mod p with one Montgomery multiply per diagonal —
    SURVEY.md §7 hard-part #3 ("31-bit modular mul on TPU") applied to
    the AIR chips' constant-weight dot banks."""
    import jax
    import numpy as _np

    k = v.shape[-1]
    if 5 * k * 127 * 127 >= (1 << 31):
        raise ValueError("matmul_mod: k too large for exact int32 matmul")
    w_np = _np.asarray(w_np, dtype=_np.int64) % _P_INT
    digs_w = [jnp.asarray(((w_np >> (7 * j)) & 127).astype(_np.int8))
              for j in range(5)]
    vi = v.astype(jnp.int32)
    digs_v = [((vi >> (7 * i)) & 127).astype(jnp.int8) for i in range(5)]
    t = [None] * 9
    for i in range(5):
        for j in range(5):
            prod = jax.lax.dot_general(
                digs_v[i], digs_w[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = i + j
            t[s] = prod if t[s] is None else t[s] + prod
    # Σ_s T_s·128^s mod p: C_s = 128^s·R mod p so mul() (x·y·R⁻¹) yields
    # T_s·128^s exactly (T_s < p, so it is a valid field element)
    out = None
    for s in range(9):
        c_s = jnp.uint32((pow(128, s, _P_INT) * MONT_R) % _P_INT)
        term = mul(t[s].astype(jnp.uint32),
                   jnp.broadcast_to(c_s, t[s].shape))
        out = term if out is None else add(out, term)
    return out


def matmul_mod_rt(v, w):
    """matmul_mod with RUNTIME plain-integer weights: (N, k) Montgomery
    field values × (k, m) plain uint32 device array → (N, m) Montgomery.
    Same base-128 digit decomposition as matmul_mod, but the weight digits
    are computed in-graph — used by the constraint-VM fold, whose α-power
    matrix changes every proof."""
    import jax

    k = v.shape[-1]
    if 5 * k * 127 * 127 >= (1 << 31):
        raise ValueError("matmul_mod_rt: k too large for exact int32 matmul")
    wi = w.astype(jnp.int32)
    digs_w = [((wi >> (7 * j)) & 127).astype(jnp.int8) for j in range(5)]
    vi = v.astype(jnp.int32)
    digs_v = [((vi >> (7 * i)) & 127).astype(jnp.int8) for i in range(5)]
    t = [None] * 9
    for i in range(5):
        for j in range(5):
            prod = jax.lax.dot_general(
                digs_v[i], digs_w[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = i + j
            t[s] = prod if t[s] is None else t[s] + prod
    out = None
    for s in range(9):
        c_s = jnp.uint32((pow(128, s, _P_INT) * MONT_R) % _P_INT)
        term = mul(t[s].astype(jnp.uint32),
                   jnp.broadcast_to(c_s, t[s].shape))
        out = term if out is None else add(out, term)
    return out


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------


def np_to_mont(x: np.ndarray) -> np.ndarray:
    """Numpy-side conversion (exact, for constants baked at trace time)."""
    return ((x.astype(np.uint64) * np.uint64(MONT_R)) % np.uint64(_P_INT)).astype(
        np.uint32
    )


def np_from_mont(x: np.ndarray) -> np.ndarray:
    rinv = pow(MONT_R, -1, _P_INT)
    return ((x.astype(np.uint64) * np.uint64(rinv)) % np.uint64(_P_INT)).astype(
        np.uint32
    )
