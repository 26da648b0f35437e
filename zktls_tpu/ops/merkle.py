"""Merkle-tree commitment over Poseidon2 (MMCS-style), batched on TPU.

Replaces the reference's Merkle commit kernels (Plonky3 p3-merkle-tree /
risc0-zkp Merkle with Poseidon2 hash suite, SURVEY.md §2.2).  Scheme:

  * leaf = sponge-hash of a matrix row (rate 16, capacity 8, width-24
    permutation; zero-padded final block, digest = first 8 lanes);
  * node = 2-to-1 compression: permute(left ‖ right), first 8 lanes;
  * layers are halved bottom-up with one batched permutation call per level.

All device arrays are Montgomery-form uint32.  The host-side scalar path
(`hash_row_ints`, `compress_ints`) mirrors the exact same scheme for the
verifier and is property-tested against the batched kernels.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from . import babybear as bb
from .field_ref import P
from .poseidon2 import Poseidon2, permute_batch as _permute_batch_xla

if os.environ.get("ZKTLS_PALLAS"):
    # opt-in: the hand-written Pallas kernel as the Merkle sponge
    # (zktls_tpu.ops.pallas_poseidon2 — bit-identical outputs, so proofs
    # are unchanged; the XLA path stays the default because the axon
    # remote-compile path for Mosaic kernels has variable availability)
    from .pallas_poseidon2 import permute_batch_pallas as permute_batch
else:
    permute_batch = _permute_batch_xla

__all__ = [
    "DIGEST_WIDTH", "RATE", "hash_rows", "compress_level", "MerkleTree",
    "hash_row_ints", "compress_ints",
]

DIGEST_WIDTH = 8
#: leaf sponge: width-24 permutation, rate 16, capacity 8 — half the
#: permutations per row of the width-16 sponge (the Merkle leaf hash is the
#: prover's biggest Poseidon2 consumer)
LEAF_WIDTH = 24
LEAF_RATE = 16
#: node compression + challenger: width 16
RATE = 8
WIDTH = 16

#: Batch-shape quantum: every Poseidon2 permute call runs at exactly this
#: row count (inputs are sliced/padded to it), so tree levels of any size —
#: and every tree in the prover — reuse ONE compiled program per sponge
#: width.  Vital when XLA compilation is remote/expensive.
CHUNK = int(os.environ.get("ZKTLS_MERKLE_CHUNK", "8192"))


from functools import lru_cache

import jax


@lru_cache(maxsize=None)
def _hash_chunk_fn(w: int):
    """One compiled program per row width: the FULL rate-16 sponge over a
    (CHUNK, w) slice — a single device dispatch per chunk (remote dispatch
    and compile latency both matter on the tunneled TPU)."""

    @jax.jit
    def f(rows):
        n_blocks = -(-w // LEAF_RATE)
        state = jnp.zeros((CHUNK, LEAF_WIDTH), dtype=jnp.uint32)
        for i in range(n_blocks):
            chunk = rows[:, i * LEAF_RATE : (i + 1) * LEAF_RATE]
            if chunk.shape[1] < LEAF_RATE:
                pad = jnp.zeros((CHUNK, LEAF_RATE - chunk.shape[1]),
                                jnp.uint32)
                chunk = jnp.concatenate([chunk, pad], axis=1)
            absorbed = bb.add(state[:, :LEAF_RATE], chunk)
            state = jnp.concatenate([absorbed, state[:, LEAF_RATE:]], axis=1)
            state = permute_batch(state)
        return state[:, :DIGEST_WIDTH]

    return f


def hash_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Hash each row of (N, W) to an (N, 8) digest (Montgomery in/out)."""
    n, w = rows.shape
    fn = _hash_chunk_fn(w)
    if n == CHUNK:
        return fn(rows)
    outs = []
    for start in range(0, n, CHUNK):
        part = rows[start : start + CHUNK]
        if part.shape[0] < CHUNK:
            part = jnp.concatenate(
                [part, jnp.zeros((CHUNK - part.shape[0], w), jnp.uint32)],
                axis=0)
            outs.append(fn(part)[: n - start])
        else:
            outs.append(fn(part))
    return jnp.concatenate(outs, axis=0)


@jax.jit
def _compress_chunk(pairs: jnp.ndarray) -> jnp.ndarray:
    return permute_batch(pairs)[:, :DIGEST_WIDTH]


def compress_level(digests: jnp.ndarray) -> jnp.ndarray:
    """(2k, 8) sibling digests -> (k, 8) parents (permute(l ‖ r)[:8])."""
    n = digests.shape[0]
    if n % 2:
        raise ValueError("level size must be even")
    pairs = digests.reshape(n // 2, 2 * DIGEST_WIDTH)
    k = pairs.shape[0]
    if k == CHUNK:
        return _compress_chunk(pairs)
    outs = []
    for start in range(0, k, CHUNK):
        part = pairs[start : start + CHUNK]
        if part.shape[0] < CHUNK:
            part = jnp.concatenate(
                [part, jnp.zeros((CHUNK - part.shape[0], WIDTH), jnp.uint32)],
                axis=0)
            outs.append(_compress_chunk(part)[: k - start])
        else:
            outs.append(_compress_chunk(part))
    return jnp.concatenate(outs, axis=0)


@lru_cache(maxsize=None)
def _tree_fn(n: int, w: int):
    """Fully-fused Merkle tree for a (n, w) matrix: leaf sponge + EVERY
    compression level in ONE compiled program — one device dispatch per
    tree instead of ~log2(n) (dispatch latency through the tunneled TPU
    dominates the r3 prove profile).  The leaf sponge runs under lax.map
    over CHUNK-row slices so the traced graph stays one chunk body."""

    def sponge(rows):
        n_blocks = -(-w // LEAF_RATE)
        k = rows.shape[0]
        state = jnp.zeros((k, LEAF_WIDTH), dtype=jnp.uint32)
        for i in range(n_blocks):
            chunk = rows[:, i * LEAF_RATE : (i + 1) * LEAF_RATE]
            if chunk.shape[1] < LEAF_RATE:
                pad = jnp.zeros((k, LEAF_RATE - chunk.shape[1]),
                                jnp.uint32)
                chunk = jnp.concatenate([chunk, pad], axis=1)
            absorbed = bb.add(state[:, :LEAF_RATE], chunk)
            state = jnp.concatenate([absorbed, state[:, LEAF_RATE:]],
                                    axis=1)
            state = permute_batch(state)
        return state[:, :DIGEST_WIDTH]

    @jax.jit
    def f(rows):
        if n <= CHUNK:
            leaf = sponge(rows)
        else:
            leaf = jax.lax.map(
                sponge, rows.reshape(n // CHUNK, CHUNK, w)
            ).reshape(n, DIGEST_WIDTH)
        levels = [leaf]
        cur = leaf
        while cur.shape[0] > 1:
            pairs = cur.reshape(cur.shape[0] // 2, 2 * DIGEST_WIDTH)
            cur = permute_batch(pairs)[:, :DIGEST_WIDTH]
            levels.append(cur)
        return tuple(levels)

    return f


class MerkleTree:
    """Bottom-up tree over row digests; retains every level for openings.

    Layout: level[0] = leaf digests (natural row order), level[k] halves
    level[k-1] by compressing adjacent pairs (2i, 2i+1).  Finished levels
    are pulled to host (plain form) once, so root/open() cost no device
    round-trips — query assembly opens hundreds of paths."""

    def __init__(self, rows: jnp.ndarray):
        n = rows.shape[0]
        if n & (n - 1):
            raise ValueError("leaf count must be a power of two")
        if os.environ.get("ZKTLS_FUSED_TREE", "1") != "0":
            self.levels = list(_tree_fn(n, int(rows.shape[1]))(rows))
        else:
            device_levels = [hash_rows(rows)]
            while device_levels[-1].shape[0] > 1:
                device_levels.append(compress_level(device_levels[-1]))
            self.levels = device_levels  # Montgomery, device (for reuse)
        self._levels_np = None

    @classmethod
    def from_levels(cls, levels) -> "MerkleTree":
        """Wrap pre-computed device levels (e.g. from a fused program)."""
        t = cls.__new__(cls)
        t.levels = list(levels)
        t._levels_np = None
        return t

    @classmethod
    def from_np_levels(cls, levels_np) -> "MerkleTree":
        """Wrap plain-form HOST levels (batched single-transfer pulls)."""
        t = cls.__new__(cls)
        t.levels = None
        t._levels_np = list(levels_np)
        return t

    @property
    def levels_np(self):
        """Host copies, pulled lazily on first access — construction is
        pure async dispatch, so independent trees (one per chip, possibly
        on different devices) build concurrently."""
        if self._levels_np is None:
            self._levels_np = [
                bb.np_from_mont(np.asarray(level)) for level in self.levels
            ]
            self.levels = None   # free the device copies (HBM pressure)
        return self._levels_np

    @property
    def root(self) -> np.ndarray:
        """Root digest as plain-form numpy (8,)."""
        return self.levels_np[-1][0]

    def open(self, index: int) -> list[np.ndarray]:
        """Sibling path (plain form) for a leaf index."""
        path = []
        for level in self.levels_np[:-1]:
            path.append(level[index ^ 1])
            index >>= 1
        return path


# ---------------------------------------------------------------------------
# host-side scalar mirror (verifier)
# ---------------------------------------------------------------------------

_perm = None
_perm24 = None


def _permute_ints(state: list[int]) -> list[int]:
    global _perm
    if _perm is None:
        _perm = Poseidon2(WIDTH)
    return _perm.permute_ints(state)


def hash_row_ints(row: list[int]) -> list[int]:
    global _perm24
    if _perm24 is None:
        _perm24 = Poseidon2(LEAF_WIDTH)
    state = [0] * LEAF_WIDTH
    n_blocks = -(-len(row) // LEAF_RATE) if row else 1
    for i in range(n_blocks):
        chunk = row[i * LEAF_RATE : (i + 1) * LEAF_RATE]
        chunk = list(chunk) + [0] * (LEAF_RATE - len(chunk))
        state = [
            (state[j] + chunk[j]) % P if j < LEAF_RATE else state[j]
            for j in range(LEAF_WIDTH)
        ]
        state = _perm24.permute_ints(state)
    return state[:DIGEST_WIDTH]


def compress_ints(left: list[int], right: list[int]) -> list[int]:
    return _permute_ints(list(left) + list(right))[:DIGEST_WIDTH]


def verify_path(leaf_digest: list[int], index: int, path: list, root: list[int]
                ) -> bool:
    node = list(leaf_digest)
    for sibling in path:
        sib = [int(x) for x in sibling]
        if index & 1:
            node = compress_ints(sib, node)
        else:
            node = compress_ints(node, sib)
        index >>= 1
    return node == [int(x) for x in root]
