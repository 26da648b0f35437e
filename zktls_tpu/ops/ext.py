"""Quartic-extension arithmetic on device: F_p4 = F_p[x]/(x^4 - 11) as
(..., 4) uint32 Montgomery arrays.

STARK challenges, the folded constraint accumulator, the DEEP composition
polynomial and all FRI layers live in the extension field (soundness
~|F|^4 ≈ 2^124, matching the reference engines' quartic extensions —
SURVEY.md §2.2.B "p3-field quartic ext", §2.2.C "deg-4 ext field").
Semantics property-tested against zktls_tpu.ops.field_ref.Fp4.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import babybear as bb
from .field_ref import P, W_EXT, Fp4

__all__ = [
    "ext_add", "ext_sub", "ext_neg", "ext_mul", "ext_scale", "ext_inv",
    "ext_zeros", "ext_from_base", "ext_const", "to_fp4", "from_fp4",
]

_W_MONT = int(bb.np_to_mont(np.array([W_EXT], dtype=np.uint32))[0])


def ext_zeros(shape) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (4,), dtype=jnp.uint32)


def ext_from_base(x: jnp.ndarray) -> jnp.ndarray:
    """Base elements (..., ) -> ext (..., 4) with zero high coefficients."""
    z = jnp.zeros(x.shape + (3,), dtype=jnp.uint32)
    return jnp.concatenate([x[..., None], z], axis=-1)


def ext_const(v: Fp4, shape=()) -> jnp.ndarray:
    """Broadcast a host Fp4 constant to a device ext array (Montgomery)."""
    m = bb.np_to_mont(np.array(v.c, dtype=np.uint32))
    return jnp.broadcast_to(jnp.asarray(m), tuple(shape) + (4,))


def ext_add(a, b):
    return bb.add(a, b)


def ext_sub(a, b):
    return bb.sub(a, b)


def ext_neg(a):
    return bb.neg(a)


def ext_scale(a, s):
    """ext (..., 4) times base (...,) or scalar."""
    if not hasattr(s, "shape") or s.ndim < a.ndim:
        s = jnp.broadcast_to(jnp.asarray(s, dtype=jnp.uint32), a.shape[:-1])
    return bb.mul(a, s[..., None])


def ext_mul(a, b):
    """Schoolbook product with x^4 -> W fold: 16 base muls + folds."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mul
    add = bb.add
    w = jnp.uint32(_W_MONT)

    def wmul(x):
        return m(x, jnp.broadcast_to(w, x.shape))

    c0 = add(m(a0, b0), wmul(add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(add(m(a0, b1), m(a1, b0)), wmul(add(m(a2, b3), m(a3, b2))))
    c2 = add(add(m(a0, b2), add(m(a1, b1), m(a2, b0))), wmul(m(a3, b3)))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def ext_pow(a, e: int):
    out = ext_from_base(jnp.full(a.shape[:-1], bb.MONT_R % P, dtype=jnp.uint32))
    base = a
    while e:
        if e & 1:
            out = ext_mul(out, base)
        base = ext_mul(base, base)
        e >>= 1
    return out


def ext_inv(a):
    """Inverse via the norm map: a^-1 = conj(a) / N(a), N(a) ∈ F_p.
    conj(a) = a^p · a^(p²) · a^(p³) computed with Frobenius twists."""
    f1 = pow(W_EXT, (P - 1) // 4, P)
    tw = bb.np_to_mont(np.array(
        [[1, f1, f1 * f1 % P, f1 * f1 % P * f1 % P],
         [1, f1 * f1 % P, pow(f1, 4, P), pow(f1, 6, P)],
         [1, pow(f1, 3, P), pow(f1, 6, P), pow(f1, 9, P)]], dtype=np.uint32))

    def frob(x, k):
        return bb.mul(x, jnp.asarray(tw[k - 1])[(None,) * (x.ndim - 1)])

    a_p = frob(a, 1)
    a_p2 = frob(a, 2)
    a_p3 = frob(a, 3)
    conj = ext_mul(ext_mul(a_p, a_p2), a_p3)
    norm = ext_mul(a, conj)[..., 0]  # lands in the base field
    ninv = bb.inv(norm)
    return ext_scale(conj, ninv)


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------


def to_fp4(arr) -> Fp4:
    """Single ext element (4,) Montgomery device array -> host Fp4."""
    plain = bb.np_from_mont(np.asarray(arr))
    return Fp4(*[int(x) for x in plain])


def from_fp4(v: Fp4) -> np.ndarray:
    return bb.np_to_mont(np.array(v.c, dtype=np.uint32))
