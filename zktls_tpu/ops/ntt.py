"""Number-theoretic transform (radix-2) and low-degree extension over
Baby-Bear, batched over trace columns — the LDE engine of the prover.

Replaces the reference's NTT/LDE hot loops (risc0-sys CUDA NTT kernels and
Plonky3 p3-dft, SURVEY.md §2.2).  Design:

  * data layout (n, C): the transform runs along axis 0 simultaneously for
    all C columns — the VPU vectorizes across columns, XLA fuses the
    butterfly arithmetic;
  * one bit-reversal gather up front (static permutation baked at trace
    time), then log2(n) DIT stages expressed as reshapes + slices — no
    dynamic indexing inside the loop, everything static for XLA;
  * all values in Montgomery form; twiddle tables are precomputed on host
    (numpy, exact) per size and cached.

The multi-chip sharded variant (butterfly all-to-all over ICI) lives in
zktls_tpu.parallel.ntt.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import babybear as bb
from .field_ref import P, two_adic_root

__all__ = ["ntt", "intt", "coset_lde", "bitrev_indices", "eval_domain"]


@lru_cache(maxsize=None)
def bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage twiddle tables, Montgomery form.  Stage s (half-block m=2^s)
    uses w_{2m}^j for j in [0, m)."""
    root = two_adic_root(log_n)
    if inverse:
        root = pow(root, P - 2, P)
    tables = []
    for s in range(log_n):
        m = 1 << s
        w_m = pow(root, 1 << (log_n - 1 - s), P)  # order 2m
        tw = np.empty(m, dtype=np.uint64)
        acc = 1
        for j in range(m):
            tw[j] = acc
            acc = acc * w_m % P
        tables.append(bb.np_to_mont(tw.astype(np.uint32)))
    return tuple(tables)


@lru_cache(maxsize=None)
def _ntt_fn(log_n: int, inverse: bool):
    """Build the jitted size-2^log_n transform (cached; jax.jit re-traces per
    column count automatically).  The bit-reversal permutation and the
    twiddle tables enter as ARGUMENTS, not closure constants — at 2^25
    they are hundreds of MB, and baking them into the program made the
    serialized executable exceed the remote-compile transport limit."""
    n = 1 << log_n
    n_inv_m = int(bb.np_to_mont(
        np.array([pow(n, P - 2, P)], dtype=np.uint32))[0])

    @jax.jit
    def f(x, rev, tws):
        cols = x.shape[1]
        x = x[rev]
        for s in range(log_n):
            m = 1 << s
            tw = tws[s][None, :, None]                  # (1, m, 1)
            v = x.reshape(n // (2 * m), 2, m, cols)
            a = v[:, 0]
            b = bb.mul(v[:, 1], tw)
            x = jnp.stack([bb.add(a, b), bb.sub(a, b)], axis=1).reshape(n, cols)
        if inverse:
            x = bb.mul(x, jnp.full_like(x, n_inv_m))
        return x

    return f


@lru_cache(maxsize=None)
def _ntt_args_dev_cached(log_n: int, inverse: bool):
    rev = jnp.asarray(bitrev_indices(log_n))
    tws = tuple(jnp.asarray(t) for t in _twiddles(log_n, inverse))
    return rev, tws


def _ntt_args_dev(log_n: int, inverse: bool):
    """(rev, twiddles) argument pytree per size.  Device-resident at top
    level (avoids a host→device upload per call); under an enclosing jit
    trace it returns HOST numpy instead — materializing device arrays
    mid-trace would cache leaked tracers (they become embedded constants
    of the outer program, which is fine at the inner-transform sizes the
    four-step split produces)."""
    from jax._src import core as _core

    if not _core.trace_state_clean():
        return bitrev_indices(log_n), tuple(_twiddles(log_n, inverse))
    return _ntt_args_dev_cached(log_n, inverse)


@lru_cache(maxsize=None)
def _four_step_tw(log_n: int, inverse: bool) -> np.ndarray:
    """(n1, n2) twiddle matrix w_n^{j2·k1} for the four-step split,
    Montgomery form (host-cached; enters device as an argument)."""
    log1 = (log_n + 1) // 2
    n1, n2 = 1 << log1, 1 << (log_n - log1)
    w = two_adic_root(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    base = np.empty(n1, dtype=np.uint64)
    acc = 1
    for k1 in range(n1):
        base[k1] = acc
        acc = acc * w % P
    tw = np.empty((n1, n2), dtype=np.uint64)
    tw[:, 0] = 1
    for j2 in range(1, n2):
        tw[:, j2] = tw[:, j2 - 1] * base % P
    return bb.np_to_mont(tw.astype(np.uint32))


_FOUR_STEP_LOG = 23


def _ntt_four_step(x: jnp.ndarray, log_n: int, inverse: bool) -> jnp.ndarray:
    """n = n1·n2 split: column NTTs (size n1), twiddle multiply, row NTTs
    (size n2).  Each compiled program is a sub-size transform — the
    tunneled compile service cannot build the monolithic ≥2^25 program."""
    n = 1 << log_n
    cols = x.shape[1]
    log1 = (log_n + 1) // 2
    n1, n2 = 1 << log1, 1 << (log_n - log1)
    a = x.reshape(n1, n2 * cols)
    a = ntt(a, inverse=inverse)                      # size-n1 transforms
    tw = jnp.asarray(_four_step_tw(log_n, inverse))  # (n1, n2)
    a = bb.mul(a.reshape(n1, n2, cols), tw[:, :, None])
    a = jnp.transpose(a, (1, 0, 2)).reshape(n2, n1 * cols)
    a = ntt(a, inverse=inverse)                      # size-n2 transforms
    # in-order output: element [k2, k1] sits at index k1 + n1·k2 — the
    # C-order reshape of the (n2, n1) layout is exactly that
    return a.reshape(n, cols)


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order -> in-order NTT along axis 0; x is (n,) or (n, C) in
    Montgomery form.  inverse=True includes the 1/n scaling (distributed
    across the sub-transforms on the four-step path)."""
    import os as _os

    n = x.shape[0]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    if log_n >= int(_os.environ.get("ZKTLS_NTT_FOUR_STEP_LOG",
                                    _FOUR_STEP_LOG)):
        out = _ntt_four_step(x, log_n, inverse)
    else:
        rev, tws = _ntt_args_dev(log_n, inverse)
        out = _ntt_fn(log_n, inverse)(x, rev, tws)
    return out[:, 0] if squeeze else out


def intt(x: jnp.ndarray) -> jnp.ndarray:
    return ntt(x, inverse=True)


@lru_cache(maxsize=None)
def _coset_powers(log_n: int, shift: int) -> np.ndarray:
    n = 1 << log_n
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * shift % P
    return bb.np_to_mont(out.astype(np.uint32))


def coset_lde(values: jnp.ndarray, log_blowup: int, shift: int) -> jnp.ndarray:
    """Low-degree extension: interpret `values` (n, C) as evaluations on the
    size-n subgroup, return evaluations on the coset shift·H of the size
    n·2^log_blowup subgroup.  Montgomery in/out."""
    n = values.shape[0]
    log_n = n.bit_length() - 1
    coeffs = intt(values)
    # scale coefficient k by shift^k, zero-pad to the extended size
    scale = jnp.asarray(_coset_powers(log_n, shift))
    if coeffs.ndim == 2:
        scale = scale[:, None]
    coeffs = bb.mul(coeffs, scale)
    pad_shape = ((1 << log_blowup) * n - n,) + coeffs.shape[1:]
    coeffs = jnp.concatenate([coeffs, jnp.zeros(pad_shape, jnp.uint32)], axis=0)
    return ntt(coeffs)


def coeffs_to_coset_evals(coeffs: jnp.ndarray, log_blowup: int,
                          shift: int) -> jnp.ndarray:
    """Coefficients (n, C) of a degree-<n polynomial -> evaluations on the
    coset shift·H of the size n·2^log_blowup subgroup.  Montgomery in/out."""
    n = coeffs.shape[0]
    log_n = n.bit_length() - 1
    scale = jnp.asarray(_coset_powers(log_n, shift))
    if coeffs.ndim == 2:
        scale = scale[:, None]
    coeffs = bb.mul(coeffs, scale)
    pad_shape = ((1 << log_blowup) * n - n,) + coeffs.shape[1:]
    coeffs = jnp.concatenate([coeffs, jnp.zeros(pad_shape, jnp.uint32)], axis=0)
    return ntt(coeffs)


def coset_coeffs(values: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Interpolate values (N, C) on the coset shift·H_N back to coefficients
    (undoes the coset scaling).  Montgomery in/out."""
    n = values.shape[0]
    log_n = n.bit_length() - 1
    coeffs = intt(values)
    shift_inv = pow(shift, P - 2, P)
    unscale = jnp.asarray(_coset_powers(log_n, shift_inv))
    if coeffs.ndim == 2:
        unscale = unscale[:, None]
    return bb.mul(coeffs, unscale)


@lru_cache(maxsize=None)
def eval_domain(log_n: int, shift: int = 1) -> np.ndarray:
    """The points shift·w^i of the evaluation domain, plain form (host)."""
    n = 1 << log_n
    w = two_adic_root(log_n)
    out = np.empty(n, dtype=np.uint32)
    acc = shift % P
    for i in range(n):
        out[i] = acc
        acc = acc * w % P
    return out
