"""Fused on-device FRI: every fold layer, Merkle tree, Fiat-Shamir
absorb/sample, the grinding search and the query-index draws of the
machine proof's FRI phase run as ONE compiled XLA program.

Why: the r3 profile showed the FRI phase costing 20.3 s of a 65.6 s prove
for ~2 ms of actual TPU compute — the per-layer host round-trips (root
pull → challenger absorb → beta sample → fold dispatch) serialize through
the tunneled device, so dispatch latency dominates.  The reference hides
the same latency by keeping its fold/query loop inside one CUDA stream
(risc0-sys `fri_fold` kernels, SURVEY.md §2.2.C); the XLA-native
equivalent is tracing the whole walk into one program.

The Fiat-Shamir challenger is emulated in-graph (`DevChallenger`): the
duplex sponge's BUFFER COUNTS are static at trace time (the absorb/sample
schedule of a FRI walk is fixed by the geometry), so only the state vector
is traced.  Montgomery form is a ring isomorphism for the Poseidon2
permutation (adds, constant mults, x^7 — constants are stored in mont
form), so `permute_batch(mont(x)) == mont(permute_ints(x))` exactly and
the device transcript matches the host verifier's bit for bit.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import babybear as bb
from ..ops import ext as ex
from ..ops.field_ref import P
from ..ops.merkle import DIGEST_WIDTH, LEAF_RATE, LEAF_WIDTH, MerkleTree
from ..ops.poseidon2 import permute_batch

__all__ = ["DevChallenger", "fused_fri"]

RATE = 8
WIDTH = 16


class DevChallenger:
    """Trace-time mirror of stark.challenger.Challenger.

    state: (16,) uint32 Montgomery vector (traced); buffer fill levels are
    Python ints — static, because the caller's absorb/sample schedule is
    static.  sample() pops output lanes high-to-low exactly like the host
    `output_buf.pop()`."""

    def __init__(self, state_mont, buffered=(), n_out: int = 0):
        self.state = state_mont
        self.buf = list(buffered)
        self.out_n = n_out

    def _duplex(self) -> None:
        st = self.state
        if self.buf:
            st = st.at[: len(self.buf)].set(jnp.stack(self.buf))
            self.buf = []
        self.state = permute_batch(st[None, :])[0]
        self.out_n = RATE

    def observe(self, v) -> None:
        """v: scalar uint32 Montgomery traced value."""
        self.out_n = 0
        self.buf.append(v)
        if len(self.buf) == RATE:
            self._duplex()

    def observe_many(self, vec) -> None:
        for i in range(vec.shape[0]):
            self.observe(vec[i])

    def sample(self):
        if self.buf or self.out_n == 0:
            self._duplex()
        self.out_n -= 1
        return self.state[self.out_n]

    def sample_ext(self):
        return jnp.stack([self.sample() for _ in range(4)])

    def sample_bits_plain(self, bits: int):
        """Plain-form sample truncated to `bits` (the host sample_bits)."""
        return bb.from_mont(self.sample()[None])[0] & ((1 << bits) - 1)


def _leaf_hash(rows):
    """(k, w≤16) rows -> (k, 8) digests: one width-24 sponge block."""
    k, w = rows.shape
    state = jnp.zeros((k, LEAF_WIDTH), dtype=jnp.uint32)
    chunk = rows
    if w < LEAF_RATE:
        chunk = jnp.concatenate(
            [chunk, jnp.zeros((k, LEAF_RATE - w), jnp.uint32)], axis=1)
    state = jnp.concatenate(
        [bb.add(state[:, :LEAF_RATE], chunk), state[:, LEAF_RATE:]], axis=1)
    return permute_batch(state)[:, :DIGEST_WIDTH]


def _tree_levels(rows):
    """All Merkle levels of (k, w) rows, inside the current trace."""
    levels = [_leaf_hash(rows)]
    cur = levels[0]
    while cur.shape[0] > 1:
        pairs = cur.reshape(cur.shape[0] // 2, 2 * DIGEST_WIDTH)
        cur = permute_batch(pairs)[:, :DIGEST_WIDTH]
        levels.append(cur)
    return levels


def _grind(ch: DevChallenger, pow_bits: int):
    """In-graph grinding: find a witness w such that observing w leaves the
    next sample with pow_bits trailing zeros.  Any valid witness is
    accepted by the verifier, so the device need not match the host's
    candidate order."""
    base = ch.state
    nbuf = len(ch.buf)
    if nbuf >= RATE:
        raise AssertionError("challenger buffer cannot be full here")
    buf = jnp.stack(ch.buf) if ch.buf else None
    batch = 1 << min(pow_bits + 3, 18)
    mask = np.uint32((1 << pow_bits) - 1)

    def body(carry):
        offset, _w, _found = carry
        states = jnp.broadcast_to(base[None, :], (batch, WIDTH))
        if buf is not None:
            states = states.at[:, :nbuf].set(
                jnp.broadcast_to(buf[None, :], (batch, nbuf)))
        cands32 = (jnp.arange(batch, dtype=jnp.uint32) + offset) % P
        states = states.at[:, nbuf].set(bb.to_mont(cands32))
        out = bb.from_mont(permute_batch(states)[:, 7])
        hits = (out & mask) == 0
        idx = jnp.argmax(hits)
        found = hits[idx]
        return (offset + batch, cands32[idx], found)

    def cond(carry):
        return ~carry[2]

    _off, witness, _found = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False)))
    # check_witness semantics: observe the witness, consume one sample
    ch.observe(bb.to_mont(witness[None])[0])
    ch.sample()
    return witness


@lru_cache(maxsize=None)
def _inv_arrays(log_N_max: int, shift: int, final_size: int) -> tuple:
    """Device 1/(2x) tables for every fold layer — geometry-fixed, so
    computed once per process (the r3-style per-prove recomputation was
    ~100k host field inversions, seconds of pure Python every proof)."""
    from .prover import _inv_2x

    out = []
    cur_shift = shift
    cur_log = log_N_max
    size = 1 << log_N_max
    while size > final_size:
        out.append(jnp.asarray(_inv_2x(cur_log, cur_shift)))
        cur_shift = cur_shift * cur_shift % P
        cur_log -= 1
        size //= 2
    return tuple(out)


@lru_cache(maxsize=None)
def _fused_fri_fn(log_N_max: int, joiner_logs: tuple, final_size: int,
                  pow_bits: int, num_queries: int, shift: int,
                  n_buf: int):
    """One compiled program for the whole FRI phase of a given geometry.

    joiner_logs: sorted-descending logs (excluding log_N_max) at which a
    DEEP composite joins the fold chain."""
    n_layers = 0
    size = 1 << log_N_max
    while size > final_size:
        size //= 2
        n_layers += 1

    def f(state_plain, buf_plain, deep_arrays, inv_2x_arrays):
        ch = DevChallenger(
            bb.to_mont(state_plain),
            [bb.to_mont(buf_plain)[i] for i in range(n_buf)])
        deep_by_log = dict(zip((log_N_max,) + joiner_logs, deep_arrays))
        cur = deep_by_log[log_N_max]
        cur_log = log_N_max
        all_levels = []
        layer_vals = []
        inv2_m = jnp.uint32((pow(2, P - 2, P) * bb.MONT_R) % P)
        for ell in range(n_layers):
            half = (1 << cur_log) // 2
            rows = jnp.concatenate([cur[:half], cur[half:]], axis=1)
            levels = _tree_levels(rows)
            all_levels.append(levels)
            layer_vals.append(cur)
            ch.observe_many(levels[-1][0])
            beta = ch.sample_ext()
            a, b_ = cur[:half], cur[half:]
            even = ex.ext_scale(ex.ext_add(a, b_),
                                jnp.broadcast_to(inv2_m, (half,)))
            odd = ex.ext_scale(ex.ext_sub(a, b_), inv_2x_arrays[ell])
            beta_b = jnp.broadcast_to(beta[None, :], (half, 4))
            cur = ex.ext_add(even, ex.ext_mul(beta_b, odd))
            cur_log -= 1
            if cur_log in deep_by_log:
                cur = ex.ext_add(cur, deep_by_log[cur_log])
        for i in range(final_size):
            for limb in range(4):
                ch.observe(cur[i, limb])
        if pow_bits:
            witness = _grind(ch, pow_bits)
        else:
            # check_witness(0, 0): observe(0), no sample taken
            ch.observe(bb.to_mont(jnp.zeros((1,), jnp.uint32))[0])
            witness = jnp.uint32(0)
        indices = jnp.stack([ch.sample_bits_plain(log_N_max)
                             for _ in range(num_queries)])
        flat_levels = tuple(lv for levels in all_levels for lv in levels)
        return flat_levels, tuple(layer_vals), cur, witness, indices

    return jax.jit(f)


def fused_fri(ch, deep_by_log: dict, config, log_N_max: int):
    """Run the whole FRI phase on device.  `ch` is the host Challenger at
    the end of the DEEP stage; on return its transcript state is DEAD (the
    proof's remaining fields all come from this call's outputs).

    Returns (fri_trees, fri_layer_arrays, final_vals, pow_witness,
    query_indices) matching the host loop in machine.prove_machine."""
    joiner_logs = tuple(sorted((k for k in deep_by_log if k != log_N_max),
                               reverse=True))
    n_buf = len(ch.input_buf)
    fn = _fused_fri_fn(log_N_max, joiner_logs, config.fri_final_size,
                       config.pow_bits, config.num_queries, config.shift,
                       n_buf)
    inv_arrays = _inv_arrays(log_N_max, config.shift,
                             config.fri_final_size)
    state_plain = jnp.asarray(np.array(ch.state, dtype=np.uint32))
    buf_plain = jnp.asarray(np.array(
        [v % P for v in ch.input_buf] + [0] * (8 - n_buf),
        dtype=np.uint32)[:max(n_buf, 1)])
    deep_arrays = tuple(deep_by_log[k]
                        for k in (log_N_max,) + joiner_logs)
    flat_levels, layer_vals, final, witness, indices = fn(
        state_plain, buf_plain, deep_arrays, tuple(inv_arrays))
    # pull ALL tree levels in ONE device->host transfer (the per-level
    # pulls were ~130 tunnel round-trips ≈ 20 s of the r4 prove profile)
    shapes = [lv.shape for lv in flat_levels]
    flat_cat = _concat_levels(tuple(shapes))(flat_levels)
    host_flat = bb.np_from_mont(np.asarray(flat_cat))
    host_levels = []
    pos = 0
    for shp in shapes:
        cnt = shp[0] * shp[1]
        host_levels.append(host_flat[pos : pos + cnt].reshape(shp))
        pos += cnt
    # level counts are geometry-determined: layer ell has 2^(log-1) leaf
    # pairs -> log2(half)+1 levels
    trees = []
    pos = 0
    cur_log = log_N_max
    size = 1 << log_N_max
    while size > config.fri_final_size:
        cnt = (cur_log - 1) + 1
        trees.append(
            MerkleTree.from_np_levels(host_levels[pos:pos + cnt]))
        pos += cnt
        cur_log -= 1
        size //= 2
    assert pos == len(host_levels)
    return (trees, list(layer_vals), final, int(witness),
            [int(v) for v in np.asarray(indices)])


@lru_cache(maxsize=None)
def _concat_levels(shapes: tuple):
    @jax.jit
    def f(levels):
        return jnp.concatenate([lv.reshape(-1) for lv in levels])

    return f
