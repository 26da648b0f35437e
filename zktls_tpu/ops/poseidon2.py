"""Poseidon2 permutation over Baby-Bear (width 16 and 24) — the STARK stack's
algebraic hash, used for Merkle/MMCS commitments and the Fiat-Shamir
challenger.

Replaces the reference's Poseidon2 kernels (risc0-sys CUDA poseidon rounds,
Plonky3 p3-poseidon2; SURVEY.md §2.2).  Structure follows the Poseidon2
paper (Grassi–Khovratovich–Schofnegger 2023):

  * external (full) rounds: add round constants, x^7 S-box on every lane,
    multiply by M_E = circ(2·M4, M4, …, M4) with the paper's M4;
  * internal (partial) rounds: constant + S-box on lane 0 only, multiply by
    M_I = J + diag(d) (all-ones plus diagonal);
  * d = 7 because gcd(7, p−1) = 1 for Baby-Bear (3 and 5 divide p−1).

Round counts follow the paper's recommendation for 31-bit fields at 128-bit
security: RF = 8, RP = 13 (width 16) / RP = 21 (width 24).

**Parameter provenance**: the reference's exact constants live in external
crates not present in the snapshot (SURVEY.md marks them [K]); this
framework generates its own instance deterministically from a SHA-256
counter stream (seed string below), identically re-derivable by any
verifier.  The diagonal entries additionally guarantee M_I is invertible.

Two implementations, property-tested against each other:
  * `Poseidon2.permute_ints` — host-side scalar reference (challenger);
  * `permute_batch` — vectorized JAX (N, t) batch for TPU Merkle hashing.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import babybear as bb
from .field_ref import P

__all__ = ["Poseidon2", "poseidon2", "permute_batch", "M4"]

M4 = [
    [2, 3, 1, 1],
    [1, 2, 3, 1],
    [1, 1, 2, 3],
    [3, 1, 1, 2],
]

_SEED_FMT = "zktls-tpu poseidon2 babybear w{width} v1"


def _constant_stream(seed: str):
    """Deterministic field elements via SHA-256(counter) with rejection
    sampling (each 4-byte BE word accepted iff < p)."""
    counter = 0
    while True:
        block = hashlib.sha256(f"{seed}/{counter}".encode()).digest()
        counter += 1
        for i in range(0, 32, 4):
            v = int.from_bytes(block[i : i + 4], "big")
            if v < P:
                yield v


@dataclass(frozen=True)
class Poseidon2Params:
    width: int
    rf: int          # external rounds (split rf/2 begin, rf/2 end)
    rp: int          # internal rounds
    external_rc: tuple  # (rf, width)
    internal_rc: tuple  # (rp,)
    diag: tuple      # (width,) internal diagonal


@lru_cache(maxsize=None)
def get_params(width: int) -> Poseidon2Params:
    if width not in (16, 24):
        raise ValueError("supported widths: 16, 24")
    rf = 8
    rp = 13 if width == 16 else 21
    stream = _constant_stream(_SEED_FMT.format(width=width))
    external = tuple(
        tuple(next(stream) for _ in range(width)) for _ in range(rf)
    )
    internal = tuple(next(stream) for _ in range(rp))
    # Diagonal for M_I = J + diag(d): invertible iff det != 0; rejection-
    # sample until the explicit determinant check passes (d_i != 0 and
    # 1 + sum(1/d_i) != 0 gives det = prod(d_i)·(1 + sum 1/d_i) != 0).
    while True:
        diag = tuple(next(stream) for _ in range(width))
        if any(d == 0 for d in diag):
            continue
        s = sum(pow(d, P - 2, P) for d in diag) % P
        if (1 + s) % P != 0:
            break
    return Poseidon2Params(width, rf, rp, external, internal, diag)


# ---------------------------------------------------------------------------
# host-side scalar reference
# ---------------------------------------------------------------------------


def _sbox(x: int) -> int:
    x2 = x * x % P
    x4 = x2 * x2 % P
    return x4 * x2 % P * x % P


def _m4_block(x: list[int]) -> list[int]:
    return [
        (2 * x[0] + 3 * x[1] + x[2] + x[3]) % P,
        (x[0] + 2 * x[1] + 3 * x[2] + x[3]) % P,
        (x[0] + x[1] + 2 * x[2] + 3 * x[3]) % P,
        (3 * x[0] + x[1] + x[2] + 2 * x[3]) % P,
    ]


def _external_matrix(state: list[int]) -> list[int]:
    t = len(state)
    blocks = [_m4_block(state[i : i + 4]) for i in range(0, t, 4)]
    sums = [sum(b[j] for b in blocks) % P for j in range(4)]
    return [
        (blocks[i // 4][i % 4] + sums[i % 4]) % P for i in range(t)
    ]


class Poseidon2:
    """Host-side scalar Poseidon2 (plain-form ints).  Routes through the
    native C kernel when available (same injected parameters, ~100×
    faster — the verifier/challenger hot loop)."""

    def __init__(self, width: int = 16):
        self.params = get_params(width)
        from ..utils.native import get_native

        self._native = get_native() if width in (16, 24) else None

    def permute_ints(self, state: list[int]) -> list[int]:
        p = self.params
        if len(state) != p.width:
            raise ValueError(f"state width must be {p.width}")
        if self._native is not None:
            out = self._native.permute_batch(
                np.array([state], dtype=np.uint32), width=p.width)
            return [int(x) for x in out[0]]
        s = [x % P for x in state]
        half = p.rf // 2
        s = _external_matrix(s)  # initial linear layer (paper §3)
        for r in range(half):
            s = [(x + c) % P for x, c in zip(s, p.external_rc[r])]
            s = [_sbox(x) for x in s]
            s = _external_matrix(s)
        for r in range(p.rp):
            s[0] = _sbox((s[0] + p.internal_rc[r]) % P)
            tot = sum(s) % P
            s = [(tot + d * x) % P for x, d in zip(s, p.diag)]
        for r in range(half, p.rf):
            s = [(x + c) % P for x, c in zip(s, p.external_rc[r])]
            s = [_sbox(x) for x in s]
            s = _external_matrix(s)
        return s


def poseidon2(state: list[int], width: int = 16) -> list[int]:
    return Poseidon2(width).permute_ints(state)


# ---------------------------------------------------------------------------
# TPU batched implementation
# ---------------------------------------------------------------------------


def _sbox_batch(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    return bb.mul(bb.mul(x4, x2), x)


def _external_matrix_batch(s):
    """s: (N, t) Montgomery.  M4 entries are tiny, so use adds/doublings —
    no field muls."""
    n, t = s.shape
    v = s.reshape(n, t // 4, 4)
    x0, x1, x2, x3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    t01 = bb.add(x0, x1)
    t23 = bb.add(x2, x3)
    t0123 = bb.add(t01, t23)
    # y0 = 2x0+3x1+x2+x3 = t0123 + x0 + 2*x1 ; y1 = x0+2x1+3x2+x3 = t0123+x1+2x2
    y0 = bb.add(t0123, bb.add(x0, bb.add(x1, x1)))
    y1 = bb.add(t0123, bb.add(x1, bb.add(x2, x2)))
    y2 = bb.add(t0123, bb.add(x2, bb.add(x3, x3)))
    y3 = bb.add(t0123, bb.add(x3, bb.add(x0, x0)))
    u = jnp.stack([y0, y1, y2, y3], axis=2)  # (N, t/4, 4)
    sums = u[:, 0]
    for i in range(1, t // 4):
        sums = bb.add(sums, u[:, i])
    out = bb.add(u, sums[:, None, :])
    return out.reshape(n, t)


@lru_cache(maxsize=None)
def _permute_fn(width: int):
    p = get_params(width)
    ext_rc = bb.np_to_mont(np.array(p.external_rc, dtype=np.uint32))  # (rf,t)
    int_rc = bb.np_to_mont(np.array(p.internal_rc, dtype=np.uint32))  # (rp,)
    diag = bb.np_to_mont(np.array(p.diag, dtype=np.uint32))           # (t,)
    half = p.rf // 2

    @jax.jit
    def f(s):
        # s: (N, width) Montgomery.  Rounds run under fori_loop so the
        # traced graph is one round body, not rf+rp unrolled copies —
        # Merkle tree levels retrace this per batch shape, so graph size
        # directly multiplies into XLA compile time.
        erc = jnp.asarray(ext_rc)
        irc = jnp.asarray(int_rc)
        dg = jnp.asarray(diag)[None, :]

        def ext_round(r, st):
            st = bb.add(st, erc[r][None, :])
            st = _sbox_batch(st)
            return _external_matrix_batch(st)

        def int_round(r, st):
            lane0 = _sbox_batch(bb.add(st[:, 0], irc[r]))
            st = jnp.concatenate([lane0[:, None], st[:, 1:]], axis=1)
            tot = bb.sum_mod(st, axis=1)
            return bb.add(tot[:, None], bb.mul(st, dg))

        s = _external_matrix_batch(s)
        s = jax.lax.fori_loop(0, half, ext_round, s)
        s = jax.lax.fori_loop(0, p.rp, int_round, s)
        s = jax.lax.fori_loop(half, p.rf, ext_round, s)
        return s

    return f


def permute_batch(states: jnp.ndarray, width: int | None = None) -> jnp.ndarray:
    """Vectorized Poseidon2: states (N, width) uint32 Montgomery form."""
    if width is None:
        width = int(states.shape[-1])
    if states.shape[-1] != width:
        raise ValueError("state width mismatch")
    return _permute_fn(width)(states)
