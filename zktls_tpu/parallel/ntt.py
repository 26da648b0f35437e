"""Multi-chip NTT: the four-step (Cooley–Tukey n = n1·n2) factorization with
the inter-step transpose expressed as a sharding constraint — XLA lowers it
to an all-to-all over ICI.  This is the north-star distributed kernel of
BASELINE.json ("radix-2 NTT/LDE with butterfly stages exchanged all-to-all
across a multi-host TPU slice").

Derivation (forward transform, natural-order input and output):
  j = j1 + n1·j2,  k = k2 + n2·k1
  X[n2·k1 + k2] = NTT_n1^{(j1)} [ w^{j1·k2} · NTT_n2^{(j2)} x[j1 + n1·j2] ]

so with M[j1, j2] = x[j1 + n1·j2]:
  step 1: column NTTs of M along j2 (each row independently — local per
          device when rows j1 are sharded);
  step 2: twiddle multiply by w^{j1·k2};
  step 3: row NTTs along j1 — requires the transpose: the sharding
          constraint moves the data (all-to-all), the NTT is then local.

The result equals zktls_tpu.ops.ntt.ntt exactly (tested element-wise).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import babybear as bb
from ..ops.field_ref import P as FIELD_P, two_adic_root
from ..ops.ntt import _ntt_fn, _twiddles, bitrev_indices


@lru_cache(maxsize=None)
def _ntt_args_np(log_n: int):
    """HOST-side (rev, twiddles) argument pytree per size.  Numpy on
    purpose: _local_ntt is called inside the sharded-LDE jit trace, and
    device arrays materialized there would leak tracers into the
    lru_cache (ops.ntt._ntt_args_dev is for top-level callers only)."""
    return bitrev_indices(log_n), tuple(_twiddles(log_n, False))


def _local_ntt(log_n: int, x):
    """Size-2^log_n forward transform with its argument pytree (the
    bit-reversal and twiddles enter as arguments since the huge-domain
    rework — see ops/ntt._ntt_fn)."""
    rev, tws = _ntt_args_np(log_n)
    return _ntt_fn(log_n, False)(x, rev, tws)

__all__ = ["ntt_sharded", "make_ntt_sharded"]


@lru_cache(maxsize=None)
def _twiddle_matrix(log_n1: int, log_n2: int, inverse: bool) -> np.ndarray:
    """w^{±j1·k2} as an (n1, n2) Montgomery matrix."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = two_adic_root(log_n1 + log_n2)
    if inverse:
        w = pow(w, FIELD_P - 2, FIELD_P)
    out = np.empty((n1, n2), dtype=np.uint64)
    row = np.empty(n2, dtype=np.uint64)
    for j1 in range(n1):
        wj = pow(w, j1, FIELD_P)
        acc = 1
        for k2 in range(n2):
            row[k2] = acc
            acc = acc * wj % FIELD_P
        out[j1] = row
    return bb.np_to_mont(out.astype(np.uint32))


def _four_step(x: jnp.ndarray, log_n1: int, log_n2: int,
               shard_spec=None) -> jnp.ndarray:
    """x: (n,) Montgomery.  Returns the (I)NTT in natural order."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = n1 * n2
    m = x.reshape(n2, n1).T            # M[j1, j2] = x[j1 + n1 j2]
    if shard_spec is not None:
        m = jax.lax.with_sharding_constraint(m, shard_spec)
    # step 1: NTT along j2 for every j1 row -> transform columns of M^T
    a = _local_ntt(log_n2, m.T).T   # (n1, n2), rows j1, cols k2
    # step 2: twiddles
    tw = jnp.asarray(_twiddle_matrix(log_n1, log_n2, False))
    b = bb.mul(a, tw)
    # step 3: NTT along j1 (the sharded dimension — constraint forces the
    # all-to-all here)
    if shard_spec is not None:
        b = jax.lax.with_sharding_constraint(b, shard_spec)
    o = _local_ntt(log_n1, b)       # rows k1, cols k2
    return o.reshape(n)                 # X[n2·k1 + k2] row-major


def _four_step_inverse_fix(x, log_n1, log_n2, shard_spec):
    """Inverse NTT via forward four-step on the inverse root: the step-1/3
    sub-transforms must also use inverse roots, so run the forward algorithm
    on index-reversed input instead: INTT(x)[k] = NTT(x)[-k] / n."""
    fwd = _four_step(x, log_n1, log_n2, shard_spec=shard_spec)
    n = x.shape[0]
    idx = jnp.concatenate([jnp.array([0], jnp.int32),
                           jnp.arange(n - 1, 0, -1, dtype=jnp.int32)])
    n_inv_m = jnp.uint32(pow(n, FIELD_P - 2, FIELD_P) * bb.MONT_R % FIELD_P)
    return bb.mul(fwd[idx], jnp.broadcast_to(n_inv_m, (n,)))


def make_ntt_sharded(mesh: Mesh, axis: str = "ntt"):
    """Returns a jitted sharded-NTT callable for the given mesh axis."""

    def ntt_fn(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
        n = x.shape[0]
        log_n = n.bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("size must be a power of two")
        log_n1 = log_n // 2
        log_n2 = log_n - log_n1
        spec = NamedSharding(mesh, P(axis, None))
        if inverse:
            return _four_step_inverse_fix(x, log_n1, log_n2, spec)
        return _four_step(x, log_n1, log_n2, spec)

    return jax.jit(ntt_fn, static_argnames=("inverse",))


def ntt_sharded(x: jnp.ndarray, mesh: Mesh, axis: str = "ntt",
                inverse: bool = False) -> jnp.ndarray:
    return make_ntt_sharded(mesh, axis)(x, inverse=inverse)


# ---------------------------------------------------------------------------
# column-batched sharded transforms + the machine-prover LDE entry point
# ---------------------------------------------------------------------------


def _four_step_cols(x: jnp.ndarray, log_n1: int, log_n2: int,
                    shard_spec) -> jnp.ndarray:
    """(n, C) four-step NTT along axis 0: identical math to _four_step,
    with the column axis riding along (replicated across the mesh; the j1
    axis is sharded so step 3 forces the all-to-all)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = n1 * n2
    C = x.shape[1]
    m = x.reshape(n2, n1, C).transpose(1, 0, 2)     # M[j1, j2, c]
    if shard_spec is not None:
        m = jax.lax.with_sharding_constraint(m, shard_spec)
    # step 1: NTT along j2 (axis 1) — flatten (j1, c) into the batch
    a = _local_ntt(log_n2, m.transpose(1, 0, 2).reshape(n2, n1 * C))
    a = a.reshape(n2, n1, C).transpose(1, 0, 2)     # (j1, k2, c)
    tw = jnp.asarray(_twiddle_matrix(log_n1, log_n2, False))[:, :, None]
    b = bb.mul(a, tw)
    if shard_spec is not None:
        b = jax.lax.with_sharding_constraint(b, shard_spec)
    # step 3: NTT along j1 (axis 0)
    o = _local_ntt(log_n1, b.reshape(n1, n2 * C))
    return o.reshape(n1, n2, C).reshape(n, C)       # X[n2 k1 + k2, c]


def make_coset_lde_sharded(mesh: Mesh, axis: str = "ntt"):
    """A drop-in replacement for ops.ntt.coset_lde whose two transforms
    run as sharded four-step NTTs over the mesh axis — the intra-proof
    model-parallel LDE of the machine prover (BASELINE north-star).
    Bit-identical to the local coset_lde (pure integer math)."""
    from ..ops.ntt import _coset_powers

    def lde_fn(values: jnp.ndarray, log_blowup: int,
               shift: int) -> jnp.ndarray:
        n, C = values.shape
        log_n = n.bit_length() - 1
        spec_small = NamedSharding(mesh, P(axis, None, None))
        l1 = log_n // 2
        # inverse NTT via the forward four-step on index-reversed input
        fwd = _four_step_cols(values, l1, log_n - l1, spec_small)
        idx = jnp.concatenate([jnp.array([0], jnp.int32),
                               jnp.arange(n - 1, 0, -1, dtype=jnp.int32)])
        n_inv_m = jnp.uint32(pow(n, FIELD_P - 2, FIELD_P)
                             * bb.MONT_R % FIELD_P)
        coeffs = bb.mul(fwd[idx], jnp.broadcast_to(n_inv_m, (n, C)))
        scale = jnp.asarray(_coset_powers(log_n, shift))[:, None]
        coeffs = bb.mul(coeffs, scale)
        big = (1 << log_blowup) * n
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((big - n, C), jnp.uint32)], axis=0)
        log_big = big.bit_length() - 1
        lb1 = log_big // 2
        spec_big = NamedSharding(mesh, P(axis, None, None))
        return _four_step_cols(coeffs, lb1, log_big - lb1, spec_big)

    return jax.jit(lde_fn, static_argnames=("log_blowup", "shift"))
