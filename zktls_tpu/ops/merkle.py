"""Merkle-tree commitment over Poseidon2 (MMCS-style), batched on TPU.

Replaces the reference's Merkle commit kernels (Plonky3 p3-merkle-tree /
risc0-zkp Merkle with Poseidon2 hash suite, SURVEY.md §2.2).  Scheme:

  * leaf = sponge-hash of a matrix row (rate 8, capacity 8, width-16
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
from .poseidon2 import Poseidon2, permute_batch

__all__ = [
    "DIGEST_WIDTH", "RATE", "hash_rows", "compress_level", "MerkleTree",
    "hash_row_ints", "compress_ints",
]

DIGEST_WIDTH = 8
RATE = 8
WIDTH = 16

#: Batch-shape quantum: every Poseidon2 permute call runs at exactly this
#: row count (inputs are sliced/padded to it), so tree levels of any size —
#: and every tree in the prover — reuse ONE compiled program per sponge
#: width.  Vital when XLA compilation is remote/expensive.
CHUNK = int(os.environ.get("ZKTLS_MERKLE_CHUNK", "8192"))


def _permute_chunked(states: jnp.ndarray) -> jnp.ndarray:
    """Width-16 permutation of (M, 16), executed in fixed-(CHUNK, 16)
    slices so only one program shape is ever compiled."""
    m = states.shape[0]
    if m == CHUNK:
        return permute_batch(states)
    outs = []
    for start in range(0, m, CHUNK):
        part = states[start : start + CHUNK]
        if part.shape[0] < CHUNK:
            pad = jnp.zeros((CHUNK - part.shape[0], WIDTH), jnp.uint32)
            part = jnp.concatenate([part, pad], axis=0)
            outs.append(permute_batch(part)[: m - start])
        else:
            outs.append(permute_batch(part))
    return jnp.concatenate(outs, axis=0)


def hash_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Hash each row of (N, W) to an (N, 8) digest (Montgomery in/out)."""
    n, w = rows.shape
    n_blocks = -(-w // RATE)
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
    for i in range(n_blocks):
        chunk = rows[:, i * RATE : (i + 1) * RATE]
        if chunk.shape[1] < RATE:
            pad = jnp.zeros((n, RATE - chunk.shape[1]), dtype=jnp.uint32)
            chunk = jnp.concatenate([chunk, pad], axis=1)
        absorbed = bb.add(state[:, :RATE], chunk)
        state = jnp.concatenate([absorbed, state[:, RATE:]], axis=1)
        state = _permute_chunked(state)
    return state[:, :DIGEST_WIDTH]


def compress_level(digests: jnp.ndarray) -> jnp.ndarray:
    """(2k, 8) sibling digests -> (k, 8) parents."""
    n = digests.shape[0]
    if n % 2:
        raise ValueError("level size must be even")
    pairs = digests.reshape(n // 2, 2 * DIGEST_WIDTH)
    return _permute_chunked(pairs)[:, :DIGEST_WIDTH]


class MerkleTree:
    """Bottom-up tree over row digests; retains every level for openings.

    Layout: level[0] = leaf digests (natural row order), level[k] halves
    level[k-1] by compressing adjacent pairs (2i, 2i+1)."""

    def __init__(self, rows: jnp.ndarray):
        n = rows.shape[0]
        if n & (n - 1):
            raise ValueError("leaf count must be a power of two")
        self.levels = [hash_rows(rows)]
        while self.levels[-1].shape[0] > 1:
            self.levels.append(compress_level(self.levels[-1]))

    @property
    def root(self) -> np.ndarray:
        """Root digest as plain-form numpy (8,)."""
        return np.asarray(bb.from_mont(self.levels[-1][0]))

    def open(self, index: int) -> list[np.ndarray]:
        """Sibling path (plain form) for a leaf index."""
        path = []
        for level in self.levels[:-1]:
            path.append(np.asarray(bb.from_mont(level[index ^ 1])))
            index >>= 1
        return path


# ---------------------------------------------------------------------------
# host-side scalar mirror (verifier)
# ---------------------------------------------------------------------------

_perm = None


def _permute_ints(state: list[int]) -> list[int]:
    global _perm
    if _perm is None:
        _perm = Poseidon2(WIDTH)
    return _perm.permute_ints(state)


def hash_row_ints(row: list[int]) -> list[int]:
    state = [0] * WIDTH
    n_blocks = -(-len(row) // RATE) if row else 1
    for i in range(n_blocks):
        chunk = row[i * RATE : (i + 1) * RATE]
        chunk = list(chunk) + [0] * (RATE - len(chunk))
        state = [
            (state[j] + chunk[j]) % P if j < RATE else state[j]
            for j in range(WIDTH)
        ]
        state = _permute_ints(state)
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
