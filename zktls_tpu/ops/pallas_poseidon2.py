"""Poseidon2 as a hand-written Pallas TPU kernel.

The batched XLA version (zktls_tpu.ops.poseidon2.permute_batch) round-trips
HBM between fused op groups; this kernel keeps the whole sponge state in
VMEM for all RF+RP rounds — one HBM read and one write per hash, the
Merkle-commit hot loop at speed-of-light memory traffic (the analogue of
risc0-sys' fused CUDA poseidon_fold kernels, SURVEY.md §2.2.C).

Layout: states are processed TRANSPOSED, (16, B) — the 16 sponge lanes sit
on the sublane axis and the batch rides the 128-wide lane axis, so every
round op is sublane-indexed arithmetic over full vector registers, with no
lane-crossing reshapes (Mosaic-friendly).  The grid tiles the batch.

Correctness is property-tested against the scalar reference on CPU via
interpret mode; on TPU it lowers to a real Mosaic kernel.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import babybear as bb
from .field_ref import P
from .poseidon2 import get_params

__all__ = ["permute_batch_pallas"]

BLOCK = 512  # batch elements per grid cell (16·512·4B = 32 KB in VMEM)


def _kernel_factory(width: int):
    p = get_params(width)
    ext_rc = bb.np_to_mont(np.array(p.external_rc, dtype=np.uint32))
    int_rc = bb.np_to_mont(np.array(p.internal_rc, dtype=np.uint32))
    diag = bb.np_to_mont(np.array(p.diag, dtype=np.uint32))
    half = p.rf // 2

    def sbox(x):
        x2 = bb.mul(x, x)
        x4 = bb.mul(x2, x2)
        return bb.mul(bb.mul(x4, x2), x)

    def external_matrix(s):
        # s: (width, B); M4 block mixing along the sublane axis
        blocks = []
        for i in range(0, width, 4):
            x0, x1, x2, x3 = s[i], s[i + 1], s[i + 2], s[i + 3]
            t0123 = bb.add(bb.add(x0, x1), bb.add(x2, x3))
            y0 = bb.add(t0123, bb.add(x0, bb.add(x1, x1)))
            y1 = bb.add(t0123, bb.add(x1, bb.add(x2, x2)))
            y2 = bb.add(t0123, bb.add(x2, bb.add(x3, x3)))
            y3 = bb.add(t0123, bb.add(x3, bb.add(x0, x0)))
            blocks.append((y0, y1, y2, y3))
        sums = [blocks[0][j] for j in range(4)]
        for blk in blocks[1:]:
            sums = [bb.add(a, b) for a, b in zip(sums, blk)]
        rows = []
        for blk in blocks:
            for j in range(4):
                rows.append(bb.add(blk[j], sums[j]))
        return jnp.stack(rows, axis=0)

    def kernel(x_ref, erc_ref, irc_ref, diag_ref, o_ref):
        s = x_ref[:]                     # (width, BLOCK) uint32 Montgomery
        s = external_matrix(s)
        for r in range(p.rf + p.rp):
            if r < half or r >= half + p.rp:
                er = r if r < half else r - p.rp
                s = bb.add(s, erc_ref[:, er][:, None])
                s = sbox(s)
                s = external_matrix(s)
            else:
                ir = r - half
                lane0 = sbox(bb.add(s[0], irc_ref[0, ir]))
                s = jnp.concatenate([lane0[None, :], s[1:]], axis=0)
                tot = s[0]
                for i in range(1, width):
                    tot = bb.add(tot, s[i])
                s = bb.add(tot[None, :], bb.mul(s, diag_ref[:, 0][:, None]))
        o_ref[:] = s

    return kernel


@lru_cache(maxsize=None)
def _permute_fn_pallas(width: int, interpret: bool):
    kernel = _kernel_factory(width)
    p = get_params(width)
    erc = np.ascontiguousarray(
        bb.np_to_mont(np.array(p.external_rc, dtype=np.uint32)).T)  # (w, rf)
    irc = bb.np_to_mont(
        np.array(p.internal_rc, dtype=np.uint32))[None, :]          # (1, rp)
    diag = bb.np_to_mont(
        np.array(p.diag, dtype=np.uint32))[:, None]                 # (w, 1)

    @jax.jit
    def f(states_t: jnp.ndarray) -> jnp.ndarray:
        # states_t: (width, B) with B a multiple of BLOCK
        b = states_t.shape[1]
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((width, b), jnp.uint32),
            grid=(b // BLOCK,),
            in_specs=[
                pl.BlockSpec((width, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(erc.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(irc.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(diag.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((width, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(states_t, jnp.asarray(erc), jnp.asarray(irc), jnp.asarray(diag))

    return f


def permute_batch_pallas(states: jnp.ndarray, *, interpret: bool | None = None
                         ) -> jnp.ndarray:
    """Drop-in for poseidon2.permute_batch: (N, width) Montgomery in/out."""
    n, width = states.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = (-n) % BLOCK
    x = states.T
    if pad:
        x = jnp.concatenate([x, jnp.zeros((width, pad), jnp.uint32)], axis=1)
    out = _permute_fn_pallas(width, bool(interpret))(x)
    return out[:, :n].T
