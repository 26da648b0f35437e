"""The uni-STARK prover: trace -> proof, with all field-parallel work on the
accelerator.

Pipeline (replacing the reference's per-shard core STARK,
SURVEY.md §3.2/§3.3 "trace gen → Merkle commit → quotient → FRI"):

  1. LDE-commit the trace on the coset shift·H_N (Poseidon2 Merkle);
  2. fold all AIR constraints with powers of α (sampled by the Poseidon2
     duplex challenger) and divide by Z_H pointwise → quotient;
  3. split the quotient into `blowup` degree-<n chunks, commit;
  4. open everything at the out-of-domain point ζ (and g·ζ for next-row
     values) via coefficient-form evaluation;
  5. build the DEEP composition polynomial and run FRI (fold-by-2 with
     pair-leaf Merkle commitments per layer) down to a small final layer;
  6. grind the optional proof-of-work and answer Fiat-Shamir queries with
     Merkle openings.

Every array step (NTT, hashing, constraint fold, DEEP, FRI folds) is
batched JAX on device; only the transcript and proof assembly run on host.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import babybear as bb
from ..ops import ext as ex
from ..ops.field_ref import Fp4, P, batch_inverse, two_adic_root
from ..ops.merkle import MerkleTree
from ..ops.ntt import (
    coeffs_to_coset_evals,
    coset_coeffs,
    coset_lde,
    eval_domain,
    intt,
)
from .air import Air
from .challenger import Challenger
from .config import DEFAULT_CONFIG, StarkConfig, selector_arrays
from .proof import FriStep, QueryProof, StarkProof

__all__ = ["prove"]


def _count_constraints(air: Air, public_values: list[int]) -> int:
    """Dry-run the AIR on scalar zeros to learn the constraint count."""
    from .air import AirBuilder, scalar_vec_hooks

    zero = Fp4(0)
    counter = [0]

    def fold(expr):
        counter[0] += 1

    from .ext_val import ExtVal

    builder = AirBuilder(
        local=[zero] * air.width, next=[zero] * air.width,
        public=[Fp4(int(v)) for v in public_values],
        is_first_row=zero, is_last_row=zero, is_transition=zero, _fold=fold,
        periodic=[zero] * len(air.periodic_columns()),
        perm_local=[zero] * air.perm_width,
        perm_next=[zero] * air.perm_width,
        challenges=[ExtVal.from_fp4(Fp4(0))
                    for _ in range(air.num_perm_challenges)],
        **scalar_vec_hooks(fold, lambda v: Fp4(v)),
    )
    air.eval(builder)
    return counter[0]


@jax.jit
def _ext_evals_jit(coeffs: jnp.ndarray, zpows: jnp.ndarray) -> jnp.ndarray:
    prod = bb.mul(coeffs[:, :, None], zpows[:, None, :])  # (n, C, 4)
    return bb.sum_mod(prod, axis=0)  # (C, 4)


def _ext_evals_at(coeffs: jnp.ndarray, zpows: jnp.ndarray) -> np.ndarray:
    """Evaluate base-coefficient polynomials at an extension point.
    coeffs (n, C) Montgomery, zpows (n, 4) Montgomery powers of the point.
    Returns (C, 4) plain-form numpy."""
    return bb.np_from_mont(np.asarray(_ext_evals_jit(coeffs, zpows)))


def _zeta_powers(zeta: Fp4, n: int) -> jnp.ndarray:
    from .lookup import np_ext_powers

    return jnp.asarray(bb.np_to_mont(
        np_ext_powers(zeta, n).astype(np.uint32)))


def _pair_rows(values: jnp.ndarray) -> jnp.ndarray:
    """FRI layer values (N, 4) -> Merkle rows (N/2, 8): leaf j holds
    (f[j], f[j+N/2])."""
    half = values.shape[0] // 2
    return jnp.concatenate([values[:half], values[half:]], axis=1)


@jax.jit
def _fold_layer_jit(values: jnp.ndarray, beta_arr: jnp.ndarray,
                    inv_2x: jnp.ndarray) -> jnp.ndarray:
    """One FRI fold: f'(x²) = (f(x)+f(−x))/2 + β·(f(x)−f(−x))/(2x)."""
    half = values.shape[0] // 2
    a, b = values[:half], values[half:]
    inv2_m = jnp.uint32((pow(2, P - 2, P) * bb.MONT_R) % P)
    even = ex.ext_scale(ex.ext_add(a, b), jnp.broadcast_to(inv2_m, (half,)))
    odd = ex.ext_scale(ex.ext_sub(a, b), inv_2x)
    beta_b = jnp.broadcast_to(beta_arr[None, :], (half, 4))
    return ex.ext_add(even, ex.ext_mul(beta_b, odd))


def _fold_layer(values: jnp.ndarray, beta: Fp4, inv_2x: np.ndarray
                ) -> jnp.ndarray:
    return _fold_layer_jit(values, jnp.asarray(ex.from_fp4(beta)),
                           jnp.asarray(inv_2x))


@lru_cache(maxsize=None)
def _quotient_fn(air: Air, log_n: int, log_blowup: int):
    """Jitted quotient evaluation for (air, domain size): evaluates every
    constraint vectorized over the commit domain, folds with the α-power
    array, divides by Z_H.  Traced once per shape, reused across proofs."""
    N = 1 << (log_n + log_blowup)
    w = air.width

    from .air import AirBuilder, BBCol

    from .ext_val import ExtVal

    @jax.jit
    def f(lde, perm_lde, chal_m, apow_m, public_m, is_first, is_last,
          is_trans, inv_zh, periodic_stack):
        next_lde = jnp.roll(lde, -(1 << log_blowup), axis=0)
        next_perm = jnp.roll(perm_lde, -(1 << log_blowup), axis=0)
        idx = [0]
        acc_arr = [ex.ext_zeros((N,))]

        def fold(expr):
            a = jnp.broadcast_to(apow_m[idx[0]][None, :], (N, 4))
            acc_arr[0] = ex.ext_add(acc_arr[0], ex.ext_scale(a, expr.arr))
            idx[0] += 1

        mats = {"local": lde, "next": next_lde}

        def fold_vec(expr):
            arr = expr.arr
            if arr.ndim == 1:
                return fold(expr)
            k = arr.shape[1]
            sl = apow_m[idx[0] : idx[0] + k]                 # static idx
            contrib = jnp.stack(
                [bb.sum_mod(bb.mul(arr, sl[None, :, ell]), axis=1)
                 for ell in range(4)], axis=-1)              # (N, 4)
            acc_arr[0] = ex.ext_add(acc_arr[0], contrib)
            idx[0] += k

        def group(seq, sl: slice):
            # `seq` is one of the builder's column lists; recover the matrix
            if seq is builder.local:
                src = mats["local"]
            elif seq is builder.next:
                src = mats["next"]
            elif seq is builder.perm_local:
                src = perm_lde
            elif seq is builder.perm_next:
                src = next_perm
            else:
                raise ValueError(
                    "group() got a column list that is none of local/next/"
                    "perm_local/perm_next")
            return BBCol(src[:, sl])

        def const_vec(values):
            vals = bb.np_to_mont(np.array(list(values), dtype=np.uint32))
            return BBCol(jnp.asarray(vals)[None, :])

        def dot_const(g, weights):
            w_row = bb.np_to_mont(np.array(list(weights), dtype=np.uint32))
            prod = bb.mul(g.arr, jnp.asarray(w_row)[None, :])
            return BBCol(bb.sum_mod(prod, axis=1))

        def mat_const(g, weights_2d):
            w_arr = np.asarray(weights_2d)
            if w_arr.shape[0] != g.arr.shape[-1]:
                raise ValueError(
                    f"mat_const: group width {g.arr.shape[-1]} vs "
                    f"{w_arr.shape[0]} weight rows")
            return BBCol(bb.matmul_mod(g.arr, w_arr))

        builder = AirBuilder(
            local=[BBCol(lde[:, j]) for j in range(w)],
            next=[BBCol(next_lde[:, j]) for j in range(w)],
            public=[
                BBCol(jnp.broadcast_to(public_m[i], (N,)))
                for i in range(public_m.shape[0])
            ],
            is_first_row=BBCol(is_first),
            is_last_row=BBCol(is_last),
            is_transition=BBCol(is_trans),
            _fold=fold,
            periodic=[BBCol(periodic_stack[i])
                      for i in range(periodic_stack.shape[0])],
            perm_local=[BBCol(perm_lde[:, j])
                        for j in range(perm_lde.shape[1])],
            perm_next=[BBCol(next_perm[:, j])
                       for j in range(perm_lde.shape[1])],
            challenges=[
                ExtVal(*[BBCol(jnp.broadcast_to(chal_m[i, ell], (N,)))
                         for ell in range(4)])
                for i in range(chal_m.shape[0])
            ],
            _fold_vec=fold_vec,
            _group=group,
            _const_vec=const_vec,
            _dot_const=dot_const,
            _mat_const=mat_const,
        )
        air.eval(builder)
        return ex.ext_scale(acc_arr[0], inv_zh)

    return f


@lru_cache(maxsize=None)
def _deep_fn(log_N: int, w_z: int, w_gz: int):
    """Jitted DEEP composition in matvec form:

      Σ_j β^j (V_j(x) − v_j)  =  (Σ_j β^j V_j(x))  −  (Σ_j β^j v_j)

    so each opening group costs 4 modular matvecs (one per extension limb)
    plus a broadcast constant.  The ζ-group matrix is [trace ‖ perm ‖
    quotient] columns, the g·ζ-group is [trace ‖ perm]."""

    @jax.jit
    def f(mat_z, mat_gz, bpow_m, ev_z, ev_gz, inv_x_zeta, inv_x_gzeta):
        N = mat_z.shape[0]
        b_z = bpow_m[:w_z]
        b_gz = bpow_m[w_z : w_z + w_gz]

        def group_numer(mat, betas, evals):
            comb = jnp.stack(
                [bb.dot_mod(mat, jnp.broadcast_to(betas[None, :, ell],
                                                  mat.shape), axis=1)
                 for ell in range(4)], axis=-1)     # (N, 4)
            prod = ex.ext_mul(betas[None, :, :], evals[None, :, :])
            const = bb.sum_mod(prod[0], axis=0)     # (4,)
            return ex.ext_sub(comb, jnp.broadcast_to(const[None, :], (N, 4)))

        numer_z = group_numer(mat_z, b_z, ev_z)
        numer_gz = group_numer(mat_gz, b_gz, ev_gz)
        return ex.ext_add(
            ex.ext_mul(numer_z, inv_x_zeta),
            ex.ext_mul(numer_gz, inv_x_gzeta),
        )

    return f


def _grind_device(ch: Challenger, pow_bits: int) -> int:
    """Proof-of-work grinding, batched on device: try candidate witnesses in
    one permutation batch instead of a sequential host loop (~2^pow_bits
    tries).  Mirrors Challenger.observe(w); sample_bits(pow_bits) == 0:
    the candidate joins the pending input buffer, the duplex permutes, and
    the check reads rate lane 7 (the first popped output)."""
    from ..ops.poseidon2 import permute_batch

    base = np.array(ch.state, dtype=np.uint32)
    buf = [v % P for v in ch.input_buf]
    if len(buf) >= 8:
        raise AssertionError("challenger buffer cannot be full here")
    batch = 1 << min(pow_bits + 3, 18)
    mask = (1 << pow_bits) - 1
    offset = 0
    # Expected tries ≈ 2^pow_bits; the probability of needing more than
    # 2^(pow_bits+16) is ~e^-65536 — treat exceeding it as a bug, not luck.
    max_offset = 1 << (pow_bits + 16)
    while offset < max_offset:
        states = np.tile(base, (batch, 1))
        if buf:
            states[:, : len(buf)] = np.array(buf, dtype=np.uint32)
        cands = (np.arange(batch, dtype=np.uint64) + offset) % P
        states[:, len(buf)] = cands.astype(np.uint32)
        out = bb.np_from_mont(np.asarray(
            permute_batch(bb.to_mont(jnp.asarray(states)))))
        hits = np.nonzero((out[:, 7] & mask) == 0)[0]
        if hits.size:
            return int(cands[hits[0]])
        offset += batch
    raise AssertionError(
        f"grinding found no witness in 2^{pow_bits + 16} tries — "
        "challenger/permute mismatch, not bad luck")


def _inv_2x(log_size: int, shift: int) -> np.ndarray:
    """Montgomery (N/2,) array of 1/(2·x_j) for the layer domain."""
    xs = eval_domain(log_size, shift)[: (1 << log_size) // 2]
    invs = batch_inverse([2 * int(x) % P for x in xs])
    return bb.np_to_mont(np.array(invs, dtype=np.uint32))


def prove(air: Air, trace: np.ndarray, public_values: list[int] | None = None,
          config: StarkConfig = DEFAULT_CONFIG,
          timings: dict | None = None) -> StarkProof:
    import time as _time

    def _mark(label, _t=[None]):
        if timings is None:
            return
        now = _time.time()
        if _t[0] is not None:
            timings[label] = round(now - _t[0], 3)
        _t[0] = now

    _mark(None)
    public_values = [int(v) % P for v in (public_values or [])]
    n, w = trace.shape
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("trace height must be a power of two")
    if w != air.width:
        raise ValueError(f"trace width {w} != air width {air.width}")
    if air.max_constraint_degree + 1 > config.blowup:
        raise ValueError(
            f"constraint degree {air.max_constraint_degree} needs blowup "
            f"> {air.max_constraint_degree}"
        )
    N = n << config.log_blowup
    s = config.shift
    g = two_adic_root(log_n)

    # 1. trace LDE + commit ------------------------------------------------
    trace_m = bb.to_mont(jnp.asarray(trace))
    lde = coset_lde(trace_m, config.log_blowup, s)          # (N, w)
    trace_tree = MerkleTree(lde)
    trace_root = [int(x) for x in trace_tree.root]
    _mark("lde_commit")

    ch = Challenger()
    ch.observe_bytes(air.name.encode())
    ch.observe(log_n)
    ch.observe_many(public_values)
    ch.observe_many(trace_root)

    # 1b. LogUp permutation trace (second commitment round) ----------------
    challenges: list[Fp4] = []
    perm_root: list[int] | None = None
    perm_tree = None
    if air.perm_width:
        challenges = [ch.sample_ext()
                      for _ in range(air.num_perm_challenges)]
        perm_np = air.generate_perm_trace(trace, public_values, challenges)
        if perm_np.shape != (n, air.perm_width):
            raise ValueError("generate_perm_trace returned wrong shape")
        perm_m = bb.to_mont(jnp.asarray(perm_np))
        perm_lde = coset_lde(perm_m, config.log_blowup, s)
        perm_tree = MerkleTree(perm_lde)
        perm_root = [int(x) for x in perm_tree.root]
        ch.observe_many(perm_root)
    else:
        perm_m = jnp.zeros((n, 0), jnp.uint32)
        perm_lde = jnp.zeros((N, 0), jnp.uint32)
    chal_m = jnp.asarray(bb.np_to_mont(np.array(
        [c.c for c in challenges], dtype=np.uint32).reshape(-1, 4)))

    # 2. quotient ----------------------------------------------------------
    alpha = ch.sample_ext()
    use_vm = __import__("os").environ.get("ZKTLS_QUOTIENT", "vm") != "xla"
    if use_vm:
        from .lowering import eval_quotient_vm, lower_air

        n_constraints = lower_air(
            air, len(public_values), len(challenges)).n_constraints
    else:
        n_constraints = _count_constraints(air, public_values)
    apow = np.empty((max(n_constraints, 1), 4), dtype=np.uint32)
    acc = Fp4(1)
    for i in range(n_constraints):
        apow[i] = acc.c
        acc = acc * alpha

    sels_np = selector_arrays(log_n, config.log_blowup, s)
    sels_m = {
        k: bb.to_mont(jnp.asarray(sels_np[k]))
        for k in ("is_first_row", "is_last_row", "is_transition")
    }
    inv_zh_m = bb.to_mont(jnp.asarray(sels_np["inv_z_h"]))

    # periodic columns: evaluate each period-m pattern on the commit coset
    # (period becomes m·blowup there) and tile — no commitment needed
    periodic_cols = []
    for pattern in air.periodic_columns():
        m = len(pattern)
        s_m = pow(s, n // m, P)
        vals = coset_lde(
            bb.to_mont(jnp.asarray(np.asarray(pattern, dtype=np.uint32))),
            config.log_blowup, s_m,
        )  # (m·blowup,)
        periodic_cols.append(jnp.tile(vals, N // vals.shape[0]))
    periodic_stack = (
        jnp.stack(periodic_cols, axis=0) if periodic_cols
        else jnp.zeros((0, N), jnp.uint32)
    )

    if use_vm:
        quotient_vals = eval_quotient_vm(
            air, lde, perm_lde, challenges, public_values, apow,
            sels_m, inv_zh_m, periodic_stack, config.log_blowup)  # (N, 4)
    else:
        apow_m = jnp.asarray(bb.np_to_mont(apow))
        quotient_fn = _quotient_fn(air, log_n, config.log_blowup)
        quotient_vals = quotient_fn(
            lde, perm_lde, chal_m, apow_m,
            jnp.asarray(bb.np_to_mont(np.array(public_values,
                                               dtype=np.uint32))),
            sels_m["is_first_row"], sels_m["is_last_row"],
            sels_m["is_transition"], inv_zh_m, periodic_stack,
        )  # (N, 4)

    # 3. split + commit quotient ------------------------------------------
    q_coeffs = coset_coeffs(quotient_vals, s)                # (N, 4)
    chunks = [q_coeffs[k * n : (k + 1) * n] for k in range(config.blowup)]
    q_cols = jnp.concatenate(
        [coeffs_to_coset_evals(c, config.log_blowup, s) for c in chunks],
        axis=1,
    )  # (N, blowup*4)
    quotient_tree = MerkleTree(q_cols)
    quotient_root = [int(x) for x in quotient_tree.root]
    ch.observe_many(quotient_root)
    _mark("quotient")

    # 4. out-of-domain openings -------------------------------------------
    zeta = ch.sample_ext()
    g_zeta = zeta * g
    zpows = _zeta_powers(zeta, n)
    gzpows = _zeta_powers(g_zeta, n)
    trace_coeffs = intt(trace_m)                              # (n, w)
    tl = _ext_evals_at(trace_coeffs, zpows)                   # (w, 4)
    tn = _ext_evals_at(trace_coeffs, gzpows)
    qe = np.concatenate(
        [_ext_evals_at(c, zpows) for c in chunks], axis=0
    )  # (blowup*4, 4)
    if air.perm_width:
        perm_coeffs = intt(perm_m)
        pl = _ext_evals_at(perm_coeffs, zpows)                # (pw, 4)
        pn = _ext_evals_at(perm_coeffs, gzpows)
    else:
        pl = np.zeros((0, 4), dtype=np.uint32)
        pn = np.zeros((0, 4), dtype=np.uint32)
    trace_local_evals = [Fp4(*[int(x) for x in row]) for row in tl]
    trace_next_evals = [Fp4(*[int(x) for x in row]) for row in tn]
    perm_local_evals = [Fp4(*[int(x) for x in row]) for row in pl]
    perm_next_evals = [Fp4(*[int(x) for x in row]) for row in pn]
    quotient_evals = [Fp4(*[int(x) for x in row]) for row in qe]
    for v in (trace_local_evals + trace_next_evals + perm_local_evals
              + perm_next_evals + quotient_evals):
        ch.observe_ext(v)
    _mark("ood_openings")

    # 5. DEEP composition --------------------------------------------------
    # β-power ordering: ζ-group [trace ‖ perm ‖ quotient], then g·ζ-group
    # [trace ‖ perm] (the verifier mirrors this exactly)
    beta = ch.sample_ext()
    pw = air.perm_width
    w_z = w + pw + q_cols.shape[1]
    w_gz = w + pw
    n_terms = w_z + w_gz
    bpow = np.empty((n_terms, 4), dtype=np.uint32)
    acc = Fp4(1)
    for i in range(n_terms):
        bpow[i] = acc.c
        acc = acc * beta
    bpow_m = jnp.asarray(bb.np_to_mont(bpow))

    x_m = bb.to_mont(jnp.asarray(sels_np["x"]))               # (N,)
    x_ext = ex.ext_from_base(x_m)                             # (N, 4)
    zeta_arr = jnp.broadcast_to(jnp.asarray(ex.from_fp4(zeta)), (N, 4))
    gzeta_arr = jnp.broadcast_to(jnp.asarray(ex.from_fp4(g_zeta)), (N, 4))
    inv_x_zeta = ex.ext_inv(ex.ext_sub(x_ext, zeta_arr))
    inv_x_gzeta = ex.ext_inv(ex.ext_sub(x_ext, gzeta_arr))

    mat_z = jnp.concatenate([lde, perm_lde, q_cols], axis=1)
    mat_gz = jnp.concatenate([lde, perm_lde], axis=1)
    ev_z = jnp.asarray(bb.np_to_mont(
        np.concatenate([tl, pl, qe], axis=0).astype(np.uint32)))
    ev_gz = jnp.asarray(bb.np_to_mont(
        np.concatenate([tn, pn], axis=0).astype(np.uint32)))

    deep = _deep_fn(log_n + config.log_blowup, w_z, w_gz)(
        mat_z, mat_gz, bpow_m, ev_z, ev_gz, inv_x_zeta, inv_x_gzeta
    )  # (N, 4)
    _mark("deep")

    # 6. FRI ---------------------------------------------------------------
    fri_roots: list[list[int]] = []
    fri_trees: list[MerkleTree] = []
    fri_layers_dev: list[jnp.ndarray] = []   # Montgomery, device
    cur = deep
    cur_shift = s
    cur_log = log_n + config.log_blowup
    while (1 << cur_log) > config.fri_final_size:
        rows = _pair_rows(cur)
        tree = MerkleTree(rows)
        root = [int(x) for x in tree.root]
        fri_trees.append(tree)
        fri_roots.append(root)
        fri_layers_dev.append(cur)
        ch.observe_many(root)
        beta_l = ch.sample_ext()
        cur = _fold_layer(cur, beta_l, _inv_2x(cur_log, cur_shift))
        cur_shift = cur_shift * cur_shift % P
        cur_log -= 1
    final_plain = bb.np_from_mont(np.asarray(cur))
    fri_final = [Fp4(*[int(x) for x in row]) for row in final_plain]
    for v in fri_final:
        ch.observe_ext(v)
    _mark("fri")

    # 7. grinding + queries ------------------------------------------------
    pow_witness = 0
    if config.pow_bits:
        pow_witness = _grind_device(ch, config.pow_bits)
    ch.check_witness(config.pow_bits, pow_witness)

    # sample all query indices first, then gather ONLY the queried rows from
    # device (pulling whole matrices costs seconds of transfer; the queried
    # rows are a few hundred KB)
    log_N = log_n + config.log_blowup
    q_indices = [ch.sample_bits(log_N) for _ in range(config.num_queries)]
    qi = jnp.asarray(np.array(q_indices, dtype=np.int32))
    trace_rows = bb.np_from_mont(np.asarray(lde[qi]))
    quot_rows = bb.np_from_mont(np.asarray(q_cols[qi]))
    perm_rows = (bb.np_from_mont(np.asarray(perm_lde[qi]))
                 if air.perm_width else None)
    # per-layer FRI pair gathers: one indexed read per layer for all queries
    fri_pairs: list[np.ndarray] = []
    qq_per_layer: list[list[int]] = []
    cur_qs = list(q_indices)
    for ell, layer_vals in enumerate(fri_layers_dev):
        size = 1 << (log_N - ell)
        half = size // 2
        js = [q % half for q in cur_qs]
        idx = jnp.asarray(np.array(js + [j + half for j in js],
                                   dtype=np.int32))
        pulled = bb.np_from_mont(np.asarray(layer_vals[idx]))
        fri_pairs.append(pulled)
        qq_per_layer.append(js)
        cur_qs = js

    queries = []
    for qi_pos, q in enumerate(q_indices):
        steps = []
        for ell, tree in enumerate(fri_trees):
            js = qq_per_layer[ell]
            j = js[qi_pos]
            nq = config.num_queries
            pair = (
                Fp4(*[int(x) for x in fri_pairs[ell][qi_pos]]),
                Fp4(*[int(x) for x in fri_pairs[ell][nq + qi_pos]]),
            )
            steps.append(FriStep(pair=pair, path=[
                [int(x) for x in d] for d in tree.open(j)
            ]))
        queries.append(QueryProof(
            index=q,
            trace_row=[int(x) for x in trace_rows[qi_pos]],
            trace_path=[[int(x) for x in d] for d in trace_tree.open(q)],
            quotient_row=[int(x) for x in quot_rows[qi_pos]],
            quotient_path=[[int(x) for x in d] for d in quotient_tree.open(q)],
            fri_steps=steps,
            perm_row=([int(x) for x in perm_rows[qi_pos]]
                      if perm_rows is not None else []),
            perm_path=([[int(x) for x in d] for d in perm_tree.open(q)]
                       if perm_tree is not None else []),
        ))

    _mark("queries")
    return StarkProof(
        air_name=air.name,
        log_n=log_n,
        public_values=public_values,
        trace_root=trace_root,
        quotient_root=quotient_root,
        trace_local_evals=trace_local_evals,
        trace_next_evals=trace_next_evals,
        quotient_evals=quotient_evals,
        fri_roots=fri_roots,
        fri_final=fri_final,
        pow_witness=pow_witness,
        queries=queries,
        perm_root=perm_root,
        perm_local_evals=perm_local_evals,
        perm_next_evals=perm_next_evals,
    )
