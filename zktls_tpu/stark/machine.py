"""The machine STARK: every chip of the guest workload proven in ONE proof.

This is the framework analogue of the reference's multi-table shard proof
(sp1-core-machine: one STARK over many chips glued by LogUp-style lookup
arguments, SURVEY.md §2.2.B), replacing round-1's independent per-chip
uni-STARK proofs.  What "one proof" buys:

  * a single Fiat-Shamir transcript that observes the **binding bytes**
    (the journal) before anything else — a machine proof is cryptographically
    bound to its journal and cannot be replayed against another;
  * shared lookup/bus challenges (γ, δ) sampled once after all main-trace
    commitments, enabling the global LogUp bus (stark/bus.py) whose
    cumulative sums must cancel across chips and verifier-side public
    messages;
  * a single mixed-height batch FRI: each chip's DEEP composition enters
    the fold chain at the layer matching its commitment-domain size
    (chip i commits on the coset shift^(2^kᵢ)·H, kᵢ = log(N_max/Nᵢ), so a
    folded layer's domain coincides exactly with the next smaller chip's),
    amortizing FRI cost and proof size across the whole chip set.

Transcript order (prover/verifier mirror exactly):
  header(binding, chip names/sizes/publics) → trace roots → γ, δ →
  perm roots + bus sums → α → quotient roots → ζ → OOD evals → β →
  FRI roots/folds → final layer → grinding → query indices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..core import cbor
from ..ops import babybear as bb
from ..ops import ext as ex
from ..ops.field_ref import Fp4, P, two_adic_root
from ..ops.merkle import MerkleTree, hash_row_ints, verify_path
from ..ops.ntt import coeffs_to_coset_evals, coset_coeffs, coset_lde, intt
from .air import Air
from .bus import MAX_PAYLOAD, bus_term, delta_powers
from .challenger import Challenger
from .config import DEFAULT_CONFIG, StarkConfig, selector_arrays
from .proof import FriStep
from .prover import (
    _count_constraints,
    _deep_fn,
    _ext_evals_at,
    _fold_layer,
    _grind_device,
    _inv_2x,
    _pair_rows,
    _quotient_fn,
    _zeta_powers,
)
from .verifier import VerificationError, _eval_periodic, _final_low_degree

__all__ = [
    "ChipInstance", "ChipProof", "ChipOpening", "MachineQuery",
    "MachineProof", "prove_machine", "verify_machine", "preprocessed_root",
    "MACHINE_DOMAIN_TAG",
]

MACHINE_DOMAIN_TAG = b"zktls-tpu-machine-v2"

_EXT_BASIS = [Fp4(1), Fp4(0, 1), Fp4(0, 0, 1), Fp4(0, 0, 0, 1)]


@dataclass
class ChipInstance:
    """One chip's contribution to a machine proof."""

    air: Air
    trace: np.ndarray        # (n, air.width) plain uint32
    publics: list[int]       # main public values (bus sum appended later)
    #: fixed columns (n, air.preprocessed_width) for preprocessed chips —
    #: a deterministic function of the statement, NOT prover-chosen; its
    #: commitment root belongs in the verifying key
    preprocessed: np.ndarray | None = None


@dataclass
class ChipProof:
    name: str
    log_n: int
    publics: list[int]
    bus_sum: list[int]       # 4 base limbs of the chip's cumulative bus sum
    trace_root: list[int]
    quotient_root: list[int]
    perm_root: list[int] | None
    tl: list[Fp4]
    tn: list[Fp4]
    pl: list[Fp4]
    pn: list[Fp4]
    qe: list[Fp4]
    #: preprocessed-column openings at ζ / g·ζ (empty unless the chip has
    #: preprocessed columns; the ROOT they commit to lives in the vk)
    el: list[Fp4] = field(default_factory=list)
    en: list[Fp4] = field(default_factory=list)


@dataclass
class ChipOpening:
    trace_row: list[int]
    trace_path: list[list[int]]
    quotient_row: list[int]
    quotient_path: list[list[int]]
    perm_row: list[int] = field(default_factory=list)
    perm_path: list[list[int]] = field(default_factory=list)
    pre_row: list[int] = field(default_factory=list)
    pre_path: list[list[int]] = field(default_factory=list)


@dataclass
class MachineQuery:
    index: int
    openings: list[ChipOpening]     # one per chip, machine order
    fri_steps: list[FriStep]


@dataclass
class MachineProof:
    chips: list[ChipProof]
    fri_roots: list[list[int]]
    fri_final: list[Fp4]
    pow_witness: int
    queries: list[MachineQuery]

    def to_bytes(self) -> bytes:
        def e(v: Fp4):
            return list(v.c)

        return cbor.dumps({
            "v": 2,
            "chips": [{
                "name": c.name, "log_n": c.log_n, "public": c.publics,
                "bus": c.bus_sum, "tr": c.trace_root, "qr": c.quotient_root,
                "pr": c.perm_root, "tl": [e(v) for v in c.tl],
                "tn": [e(v) for v in c.tn], "pl": [e(v) for v in c.pl],
                "pn": [e(v) for v in c.pn], "qe": [e(v) for v in c.qe],
                "el": [e(v) for v in c.el], "en": [e(v) for v in c.en],
            } for c in self.chips],
            "fri_roots": self.fri_roots,
            "fri_final": [e(v) for v in self.fri_final],
            "pow": self.pow_witness,
            "queries": [{
                "i": q.index,
                "ops": [{
                    "tr": o.trace_row, "tp": o.trace_path,
                    "qr": o.quotient_row, "qp": o.quotient_path,
                    "pr": o.perm_row, "pp": o.perm_path,
                    "er": o.pre_row, "ep": o.pre_path,
                } for o in q.openings],
                "fs": [{"p": [e(s.pair[0]), e(s.pair[1])], "mp": s.path}
                       for s in q.fri_steps],
            } for q in self.queries],
        })

    @classmethod
    def from_bytes(cls, data: bytes) -> "MachineProof":
        obj = cbor.loads(data)

        def d(v) -> Fp4:
            return Fp4(*v)

        return cls(
            chips=[ChipProof(
                name=c["name"], log_n=c["log_n"], publics=c["public"],
                bus_sum=c["bus"], trace_root=c["tr"], quotient_root=c["qr"],
                perm_root=c["pr"], tl=[d(v) for v in c["tl"]],
                tn=[d(v) for v in c["tn"]], pl=[d(v) for v in c["pl"]],
                pn=[d(v) for v in c["pn"]], qe=[d(v) for v in c["qe"]],
                el=[d(v) for v in c.get("el", [])],
                en=[d(v) for v in c.get("en", [])],
            ) for c in obj["chips"]],
            fri_roots=obj["fri_roots"],
            fri_final=[d(v) for v in obj["fri_final"]],
            pow_witness=obj["pow"],
            queries=[MachineQuery(
                index=q["i"],
                openings=[ChipOpening(
                    trace_row=o["tr"], trace_path=o["tp"],
                    quotient_row=o["qr"], quotient_path=o["qp"],
                    perm_row=o.get("pr", []), perm_path=o.get("pp", []),
                    pre_row=o.get("er", []), pre_path=o.get("ep", []),
                ) for o in q["ops"]],
                fri_steps=[FriStep(pair=(d(s["p"][0]), d(s["p"][1])),
                                   path=s["mp"]) for s in q["fs"]],
            ) for q in obj["queries"]],
        )


# ---------------------------------------------------------------------------
# shared transcript header
# ---------------------------------------------------------------------------


def _machine_order(items, log_n_of, name_of):
    """Canonical chip order: largest commitment domain first (FRI joins
    smaller chips at later layers), ties by name."""
    return sorted(items, key=lambda it: (-log_n_of(it), name_of(it)))


def _observe_header(ch: Challenger, binding: bytes, entries) -> None:
    """entries: (name, log_n, publics[, preprocessed_root]) per chip — a
    chip's vk-committed preprocessed root (when present) is bound into
    the transcript before anything is sampled."""
    ch.observe_bytes(MACHINE_DOMAIN_TAG)
    ch.observe_bytes(binding)
    ch.observe(len(entries))
    for entry in entries:
        name, log_n, publics = entry[0], entry[1], entry[2]
        pre_root = entry[3] if len(entry) > 3 else None
        ch.observe_bytes(name.encode())
        ch.observe(log_n)
        ch.observe(len(publics))
        ch.observe_many(publics)
        if pre_root:
            ch.observe_many(pre_root)


def _sample_challenges(ch: Challenger) -> list[Fp4]:
    gamma = ch.sample_ext()
    delta = ch.sample_ext()
    return [gamma] + delta_powers(delta, MAX_PAYLOAD)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def prove_machine(chips: list[ChipInstance], binding: bytes,
                  config: StarkConfig = DEFAULT_CONFIG,
                  timings: dict | None = None,
                  devices: list | None = None,
                  mesh=None, ntt_axis: str = "ntt") -> MachineProof:
    """devices: optional jax.Device list — chips are placed round-robin and
    their commit/quotient work runs concurrently (async dispatch per
    device); the shared FRI runs on devices[0].  mesh: optional
    jax.sharding.Mesh with an `ntt_axis` axis — the LARGEST chips' trace
    LDEs then run as sharded four-step NTTs (butterfly all-to-all over
    ICI, parallel/ntt.py), the intra-proof model-parallel axis.  Proof
    bytes are identical to the single-device result (pure field
    arithmetic)."""
    import time as _time

    def _mark(label, _t=[None]):
        if timings is None:
            return
        now = _time.time()
        if _t[0] is not None:
            timings[label] = round(
                timings.get(label, 0.0) + now - _t[0], 3)
        _t[0] = now

    _mark(None)
    if not chips:
        raise ValueError("machine proof needs at least one chip")
    names = [c.air.name for c in chips]
    if len(set(names)) != len(names):
        raise ValueError("duplicate chip names in machine proof")

    # per-chip geometry
    metas = []
    for inst in chips:
        n, w = inst.trace.shape
        log_n = n.bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("trace height must be a power of two")
        if w != inst.air.width:
            raise ValueError(
                f"{inst.air.name}: trace width {w} != air width "
                f"{inst.air.width}")
        if inst.air.max_constraint_degree + 1 > config.blowup:
            raise ValueError(f"{inst.air.name}: constraint degree too high")
        pre_w = getattr(inst.air, "preprocessed_width", 0)
        if pre_w:
            if inst.preprocessed is None or \
                    inst.preprocessed.shape != (n, pre_w):
                raise ValueError(
                    f"{inst.air.name}: preprocessed trace must be "
                    f"({n}, {pre_w})")
        elif inst.preprocessed is not None:
            raise ValueError(
                f"{inst.air.name}: unexpected preprocessed trace")
        metas.append((inst, log_n))
    metas = _machine_order(metas, lambda m: m[1], lambda m: m[0].air.name)
    log_N_max = metas[0][1] + config.log_blowup
    if (1 << (metas[-1][1] + config.log_blowup)) <= config.fri_final_size:
        raise ValueError(
            "smallest chip domain must exceed fri_final_size; lower "
            "fri_final_size or raise the chip's min trace height")

    # per-chip coset shift: s^(2^k) so the chip's domain coincides with the
    # FRI layer of matching size
    shifts = {}
    for inst, log_n in metas:
        k = log_N_max - (log_n + config.log_blowup)
        shifts[inst.air.name] = pow(config.shift, 1 << k, P)

    # 0. preprocessed commits — fixed columns, committed before the
    # transcript starts; their roots are vk material and are bound into
    # the header (the verifier checks openings against the SAME roots
    # supplied out-of-band, so a forged preprocessed matrix cannot match)
    import jax as _jax

    pre_parts: dict[str, dict] = {}
    for inst, log_n in metas:
        if getattr(inst.air, "preprocessed_width", 0):
            k = log_N_max - (log_n + config.log_blowup)
            s_i = pow(config.shift, 1 << k, P)
            pre_m = bb.to_mont(jnp.asarray(inst.preprocessed))
            pre_lde = coset_lde(pre_m, config.log_blowup, s_i)
            pre_tree = MerkleTree(pre_lde)
            pre_parts[inst.air.name] = {
                "pre_m": pre_m, "pre_lde": pre_lde, "pre_tree": pre_tree,
                "pre_root": [int(x) for x in pre_tree.root]}

    ch = Challenger()
    _observe_header(
        ch, binding,
        [(inst.air.name, log_n, [int(v) % P for v in inst.publics],
          pre_parts.get(inst.air.name, {}).get("pre_root"))
         for inst, log_n in metas])

    # 1. main-trace commits: dispatch every chip's LDE + tree first (they
    # run concurrently — across devices when a device list is given), then
    # observe the roots in canonical order

    def _place(arr, idx):
        if devices:
            return _jax.device_put(arr, devices[idx % len(devices)])
        return arr

    lde_sharded = None
    if mesh is not None and ntt_axis in getattr(mesh, "shape", {}) \
            and mesh.shape[ntt_axis] > 1:
        from ..parallel.ntt import make_coset_lde_sharded

        lde_sharded = make_coset_lde_sharded(mesh, ntt_axis)

    # HBM guard: above ~2.5 GB of committed extensions, serialize the
    # per-chip device work — concurrent NTT/tree temporaries for every
    # chip at once crashed the worker on multi-transcript batches
    total_lde_bytes = sum(
        (1 << (log_n + config.log_blowup)) * (inst.air.width
                                              + inst.air.perm_width
                                              + 4 * config.blowup) * 4
        for inst, log_n in metas)
    serial_commit = total_lde_bytes > float(
        os.environ.get("ZKTLS_SERIAL_COMMIT_BYTES", "2.5e9"))

    per = {}
    for idx, (inst, log_n) in enumerate(metas):
        name = inst.air.name
        s_i = shifts[name]
        trace_m = bb.to_mont(_place(jnp.asarray(inst.trace), idx))
        if lde_sharded is not None and log_n == metas[0][1]:
            # widest domain: shard the LDE's NTTs over the ntt mesh axis
            # (the trace enters mesh-replicated; the in-fn sharding
            # constraints distribute the butterfly stages)
            from jax.sharding import NamedSharding, PartitionSpec

            trace_m = _jax.device_put(
                trace_m, NamedSharding(mesh, PartitionSpec()))
            lde = lde_sharded(trace_m, config.log_blowup, s_i)
            # downstream stages (trees, quotient) run per-chip on one
            # device: gather the sharded extension back
            home = (devices[idx % len(devices)] if devices
                    else list(mesh.devices.flat)[0])
            lde = _jax.device_put(lde, home)
            trace_m = _jax.device_put(trace_m, home)
        else:
            lde = coset_lde(trace_m, config.log_blowup, s_i)
        tree = MerkleTree(lde)
        per[name] = {
            "inst": inst, "log_n": log_n, "s": s_i, "trace_m": trace_m,
            "lde": lde, "trace_tree": tree, "dev_idx": idx,
            **pre_parts.get(name, {}),
        }
        if serial_commit:
            # finish this chip (and free its temporaries) before the next
            root = [int(x) for x in tree.root]
            per[name]["trace_root"] = root
    def _spill(d, keys):
        # host-spill mode: very large chips keep their committed
        # extensions on HOST (Montgomery numpy) and stream blocks back up
        # on demand (quotient blocks, chunked DEEP) — the full-scale
        # recursion VM chip (2^23 rows, 14+ GB of matrices) cannot keep
        # everything resident on one 16 GB chip
        limit = float(os.environ.get("ZKTLS_SPILL_BYTES", "4e9"))
        if devices or mesh is not None:
            return
        total = sum(int(np.prod(d[k].shape)) * 4 for k in keys if k in d)
        if total <= limit:
            return
        for k in keys:
            if k in d and not isinstance(d[k], np.ndarray):
                d[k] = np.asarray(d[k])
        for tk in ("trace_tree", "pre_tree", "perm_tree", "q_tree"):
            t = d.get(tk)
            if t is not None and getattr(t, "levels", None) is not None:
                t.levels_np
                t.levels = None

    for inst, log_n in metas:
        d = per[inst.air.name]
        if "trace_root" not in d:
            d["trace_root"] = [int(x) for x in d["trace_tree"].root]
        ch.observe_many(d["trace_root"])
        _spill(d, ("lde", "pre_lde"))
    _mark("lde_commit")

    # 2. machine challenges + perm commits + bus sums --------------------
    challenges = _sample_challenges(ch)
    for inst, log_n in metas:
        name = inst.air.name
        d = per[name]
        air = inst.air
        n = 1 << log_n
        if air.perm_width:
            kw = ({"preprocessed": inst.preprocessed}
                  if inst.preprocessed is not None else {})
            perm_np = air.generate_perm_trace(
                inst.trace, [int(v) % P for v in inst.publics], challenges,
                **kw)
            if perm_np.shape != (n, air.perm_width):
                raise ValueError(f"{name}: bad perm trace shape")
            perm_m = bb.to_mont(_place(jnp.asarray(perm_np), d["dev_idx"]))
            perm_lde = coset_lde(perm_m, config.log_blowup, d["s"])
            perm_tree = MerkleTree(perm_lde)
            if serial_commit:
                perm_tree.root
            if getattr(air, "has_bus", False):
                # the accumulator is the LAST extension element of the perm
                # trace; its final row is the chip's cumulative bus sum
                bus_sum = [int(v) for v in perm_np[-1, -4:]]
            else:
                bus_sum = [0, 0, 0, 0]
        else:
            perm_m = jnp.zeros((n, 0), jnp.uint32)
            perm_lde = jnp.zeros((n << config.log_blowup, 0), jnp.uint32)
            perm_tree = None
            bus_sum = [0, 0, 0, 0]
        d.update(perm_m=perm_m, perm_lde=perm_lde, perm_tree=perm_tree,
                 bus_sum=bus_sum)
    for inst, log_n in metas:
        d = per[inst.air.name]
        if inst.air.perm_width:
            perm_root = [int(x) for x in d["perm_tree"].root]
            ch.observe_many(perm_root)
            ch.observe_many(d["bus_sum"])
        else:
            perm_root = None
        d["perm_root"] = perm_root
        _spill(d, ("lde", "pre_lde", "perm_lde"))
    chal_m = jnp.asarray(bb.np_to_mont(np.array(
        [c.c for c in challenges], dtype=np.uint32).reshape(-1, 4)))
    _mark("perm_commit")

    # 3. quotients --------------------------------------------------------
    alpha = ch.sample_ext()
    for inst, log_n in metas:
        name = inst.air.name
        d = per[name]
        air = inst.air
        n = 1 << log_n
        N = n << config.log_blowup
        s_i = d["s"]
        publics_full = [int(v) % P for v in inst.publics] + d["bus_sum"]
        d["publics_full"] = publics_full
        use_vm = os.environ.get("ZKTLS_QUOTIENT", "vm") != "xla"
        if use_vm:
            from .lowering import eval_quotient_vm, lower_air

            n_constraints = lower_air(
                air, len(publics_full), len(challenges)).n_constraints
        else:
            n_constraints = _count_constraints_machine(air, publics_full,
                                                       challenges)
        from .lookup import np_ext_powers

        apow = np_ext_powers(alpha, max(n_constraints, 1)).astype(
            np.uint32)

        sels_np = selector_arrays(log_n, config.log_blowup, s_i)
        sels_m = {k: bb.to_mont(_place(jnp.asarray(sels_np[k]),
                                       d["dev_idx"]))
                  for k in ("is_first_row", "is_last_row", "is_transition")}
        inv_zh_m = bb.to_mont(_place(jnp.asarray(sels_np["inv_z_h"]),
                                     d["dev_idx"]))
        d["sels_np"] = sels_np

        periodic_cols = []
        for pattern in air.periodic_columns():
            m = len(pattern)
            s_m = pow(s_i, n // m, P)
            vals = coset_lde(
                bb.to_mont(jnp.asarray(np.asarray(pattern,
                                                  dtype=np.uint32))),
                config.log_blowup, s_m)
            periodic_cols.append(jnp.tile(vals, N // vals.shape[0]))
        periodic_stack = (jnp.stack(periodic_cols, axis=0) if periodic_cols
                          else jnp.zeros((0, N), jnp.uint32))

        if use_vm:
            quotient_vals = eval_quotient_vm(
                air, d["lde"], d["perm_lde"], challenges, publics_full,
                apow, sels_m, inv_zh_m, periodic_stack, config.log_blowup,
                pre_lde=d.get("pre_lde"))
        elif getattr(air, "preprocessed_width", 0):
            raise ValueError(
                f"{name}: preprocessed chips need the constraint-VM "
                "quotient path (unset ZKTLS_QUOTIENT=xla)")
        else:
            apow_m = jnp.asarray(bb.np_to_mont(apow))
            quotient_fn = _quotient_fn(air, log_n, config.log_blowup)
            quotient_vals = quotient_fn(
                d["lde"], d["perm_lde"], chal_m, apow_m,
                jnp.asarray(bb.np_to_mont(np.array(publics_full,
                                                   dtype=np.uint32))),
                sels_m["is_first_row"], sels_m["is_last_row"],
                sels_m["is_transition"], inv_zh_m, periodic_stack)

        q_coeffs = coset_coeffs(quotient_vals, s_i)
        chunks = [q_coeffs[k * n : (k + 1) * n]
                  for k in range(config.blowup)]
        q_cols = jnp.concatenate(
            [coeffs_to_coset_evals(c, config.log_blowup, s_i)
             for c in chunks], axis=1)
        q_tree = MerkleTree(q_cols)
        if serial_commit:
            q_tree.root
        d.update(q_cols=q_cols, q_chunks=chunks, q_tree=q_tree)
    for inst, log_n in metas:
        d = per[inst.air.name]
        q_root = [int(x) for x in d["q_tree"].root]
        ch.observe_many(q_root)
        d["q_root"] = q_root
        _spill(d, ("lde", "pre_lde", "perm_lde", "q_cols"))
    _mark("quotient")

    # 4. out-of-domain openings -------------------------------------------
    zeta = ch.sample_ext()
    for inst, log_n in metas:
        name = inst.air.name
        d = per[name]
        n = 1 << log_n
        g = two_adic_root(log_n)
        g_zeta = zeta * g
        zpows = _zeta_powers(zeta, n)
        gzpows = _zeta_powers(g_zeta, n)
        trace_coeffs = intt(d["trace_m"])
        tl = _ext_evals_at(trace_coeffs, zpows)
        tn = _ext_evals_at(trace_coeffs, gzpows)
        qe = np.concatenate(
            [_ext_evals_at(c, zpows) for c in d["q_chunks"]], axis=0)
        if inst.air.perm_width:
            perm_coeffs = intt(d["perm_m"])
            pl = _ext_evals_at(perm_coeffs, zpows)
            pn = _ext_evals_at(perm_coeffs, gzpows)
        else:
            pl = np.zeros((0, 4), dtype=np.uint32)
            pn = np.zeros((0, 4), dtype=np.uint32)
        if "pre_m" in d:
            pre_coeffs = intt(d["pre_m"])
            el = _ext_evals_at(pre_coeffs, zpows)
            en = _ext_evals_at(pre_coeffs, gzpows)
        else:
            el = np.zeros((0, 4), dtype=np.uint32)
            en = np.zeros((0, 4), dtype=np.uint32)
        d["evals"] = {k: [Fp4(*[int(x) for x in row]) for row in arr]
                      for k, arr in (("tl", tl), ("tn", tn), ("pl", pl),
                                     ("pn", pn), ("qe", qe), ("el", el),
                                     ("en", en))}
        d["evals_np"] = {"tl": tl, "tn": tn, "pl": pl, "pn": pn, "qe": qe,
                         "el": el, "en": en}
        d["g_zeta"] = g_zeta
        for k in ("tl", "tn", "pl", "pn", "qe", "el", "en"):
            for v in d["evals"][k]:
                ch.observe_ext(v)
        # HBM lifetime: the coefficient forms and raw mont traces are done
        # (batch8's fully-materialized working set crashed the worker)
        d.pop("trace_m", None)
        d.pop("perm_m", None)
        d.pop("pre_m", None)
        d.pop("q_chunks", None)
    _mark("ood_openings")

    # 5. DEEP composition per chip, grouped by domain size ------------------
    beta = ch.sample_ext()
    # global β-power budget: per chip, ζ-group [trace‖perm‖quot] then
    # g·ζ-group [trace‖perm]
    total_terms = 0
    for inst, log_n in metas:
        d = per[inst.air.name]
        pw = inst.air.perm_width
        ew = getattr(inst.air, "preprocessed_width", 0)
        w = inst.air.width
        d["w_z"] = w + ew + pw + int(d["q_cols"].shape[1])
        d["w_gz"] = w + ew + pw
        d["beta_off"] = total_terms
        total_terms += d["w_z"] + d["w_gz"]
    from .lookup import np_ext_powers

    bpow_all = bb.np_to_mont(np_ext_powers(beta, total_terms).astype(
        np.uint32))

    deep_by_log: dict[int, jnp.ndarray] = {}
    for inst, log_n in metas:
        name = inst.air.name
        d = per[name]
        log_N = log_n + config.log_blowup
        N = 1 << log_N
        sels_np = d["sels_np"]
        x_m = bb.to_mont(jnp.asarray(sels_np["x"]))
        x_ext = ex.ext_from_base(x_m)
        zeta_arr = jnp.broadcast_to(jnp.asarray(ex.from_fp4(zeta)), (N, 4))
        gzeta_arr = jnp.broadcast_to(
            jnp.asarray(ex.from_fp4(d["g_zeta"])), (N, 4))
        inv_x_zeta = ex.ext_inv(ex.ext_sub(x_ext, zeta_arr))
        inv_x_gzeta = ex.ext_inv(ex.ext_sub(x_ext, gzeta_arr))
        pre_lde_d = d.get("pre_lde",
                          jnp.zeros((N, 0), jnp.uint32))
        env = d["evals_np"]
        chip_bytes = N * 4 * (2 * (inst.air.width
                              + getattr(inst.air, "preprocessed_width", 0)
                              + inst.air.perm_width)
                              + int(d["q_cols"].shape[1]))
        if chip_bytes > float(os.environ.get("ZKTLS_CHUNKED_DEEP_BYTES",
                                             "2e9")):
            # large chip: evaluate the DEEP matvecs per source matrix
            # instead of concatenating them — the concat DOUBLES the
            # chip's resident HBM right when everything else is live
            # (the full-scale recursion VM chip OOMed here)
            deep = _deep_chunked(
                log_N,
                [(d["lde"], env["tl"], env["tn"]),
                 (pre_lde_d, env["el"], env["en"]),
                 (d["perm_lde"], env["pl"], env["pn"]),
                 (d["q_cols"], env["qe"], None)],
                bpow_all, d["beta_off"], d["w_z"],
                inv_x_zeta, inv_x_gzeta)
        else:
            mat_z = jnp.concatenate([d["lde"], pre_lde_d, d["perm_lde"],
                                     d["q_cols"]], axis=1)
            mat_gz = jnp.concatenate([d["lde"], pre_lde_d,
                                      d["perm_lde"]], axis=1)
            ev_z = jnp.asarray(bb.np_to_mont(np.concatenate(
                [env["tl"], env["el"], env["pl"], env["qe"]],
                axis=0).astype(np.uint32)))
            ev_gz = jnp.asarray(bb.np_to_mont(np.concatenate(
                [env["tn"], env["en"], env["pn"]],
                axis=0).astype(np.uint32)))
            bslice = jnp.asarray(
                bpow_all[d["beta_off"]
                         : d["beta_off"] + d["w_z"] + d["w_gz"]])
            deep = _deep_fn(log_N, d["w_z"], d["w_gz"])(
                mat_z, mat_gz, bslice, ev_z, ev_gz, inv_x_zeta,
                inv_x_gzeta)
        if devices:
            deep = _jax.device_put(deep, devices[0])
        if log_N in deep_by_log:
            deep_by_log[log_N] = ex.ext_add(deep_by_log[log_N], deep)
        else:
            deep_by_log[log_N] = deep
    _mark("deep")

    # 6. mixed-height FRI ---------------------------------------------------
    if os.environ.get("ZKTLS_FUSED_FRI", "1") != "0":
        # the whole FRI phase — trees, Fiat-Shamir, folds, grinding and
        # query draws — as ONE device program (stark/fri_device.py); the
        # host challenger is not advanced (nothing samples after this)
        from .fri_device import fused_fri

        fri_trees, fri_layers_dev, final_dev, pow_witness, q_indices = \
            fused_fri(ch, deep_by_log, config, log_N_max)
        fri_roots = [[int(x) for x in t.root] for t in fri_trees]
        final_plain = bb.np_from_mont(np.asarray(final_dev))
        fri_final = [Fp4(*[int(x) for x in row]) for row in final_plain]
        _mark("fri")
    else:
        fri_roots = []
        fri_trees = []
        fri_layers_dev = []
        cur = deep_by_log[log_N_max]
        cur_shift = config.shift
        cur_log = log_N_max
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
            if cur_log in deep_by_log:
                cur = ex.ext_add(cur, deep_by_log[cur_log])
        final_plain = bb.np_from_mont(np.asarray(cur))
        fri_final = [Fp4(*[int(x) for x in row]) for row in final_plain]
        for v in fri_final:
            ch.observe_ext(v)
        _mark("fri")

        # 7. grinding + queries ---------------------------------------------
        pow_witness = 0
        if config.pow_bits:
            pow_witness = _grind_device(ch, config.pow_bits)
        ch.check_witness(config.pow_bits, pow_witness)

        q_indices = [ch.sample_bits(log_N_max)
                     for _ in range(config.num_queries)]

    # gather queried rows per chip (index = q mod N_i)
    rows_by_chip = {}
    for inst, log_n in metas:
        name = inst.air.name
        d = per[name]
        N_i = 1 << (log_n + config.log_blowup)
        idx_np = np.array([q % N_i for q in q_indices], dtype=np.int32)
        idx = (idx_np if isinstance(d["lde"], np.ndarray)
               else jnp.asarray(idx_np))

        def _rows(mat):
            if isinstance(mat, np.ndarray):
                return bb.np_from_mont(mat[idx_np])
            return bb.np_from_mont(np.asarray(mat[idx]))

        rows_by_chip[name] = {
            "idx": [int(j) for j in idx_np],
            "trace": _rows(d["lde"]),
            "quot": _rows(d["q_cols"]),
            "perm": (_rows(d["perm_lde"])
                     if inst.air.perm_width else None),
            "pre": (_rows(d["pre_lde"]) if "pre_lde" in d else None),
        }

    # per-layer FRI pair gathers
    fri_pairs: list[np.ndarray] = []
    qq_per_layer: list[list[int]] = []
    cur_qs = list(q_indices)
    for ell, layer_vals in enumerate(fri_layers_dev):
        size = 1 << (log_N_max - ell)
        half = size // 2
        js = [q % half for q in cur_qs]
        idx = jnp.asarray(np.array(js + [j + half for j in js],
                                   dtype=np.int32))
        fri_pairs.append(bb.np_from_mont(np.asarray(layer_vals[idx])))
        qq_per_layer.append(js)
        cur_qs = js

    queries = []
    nq = config.num_queries
    for qi_pos, q in enumerate(q_indices):
        openings = []
        for inst, log_n in metas:
            name = inst.air.name
            d = per[name]
            rc = rows_by_chip[name]
            j = rc["idx"][qi_pos]
            openings.append(ChipOpening(
                trace_row=[int(x) for x in rc["trace"][qi_pos]],
                trace_path=[[int(x) for x in h]
                            for h in d["trace_tree"].open(j)],
                quotient_row=[int(x) for x in rc["quot"][qi_pos]],
                quotient_path=[[int(x) for x in h]
                               for h in d["q_tree"].open(j)],
                perm_row=([int(x) for x in rc["perm"][qi_pos]]
                          if rc["perm"] is not None else []),
                perm_path=([[int(x) for x in h]
                            for h in d["perm_tree"].open(j)]
                           if d["perm_tree"] is not None else []),
                pre_row=([int(x) for x in rc["pre"][qi_pos]]
                         if rc["pre"] is not None else []),
                pre_path=([[int(x) for x in h]
                           for h in d["pre_tree"].open(j)]
                          if "pre_tree" in d else []),
            ))
        steps = []
        for ell, tree in enumerate(fri_trees):
            j = qq_per_layer[ell][qi_pos]
            pair = (Fp4(*[int(x) for x in fri_pairs[ell][qi_pos]]),
                    Fp4(*[int(x) for x in fri_pairs[ell][nq + qi_pos]]))
            steps.append(FriStep(pair=pair, path=[
                [int(x) for x in h] for h in tree.open(j)]))
        queries.append(MachineQuery(index=q, openings=openings,
                                    fri_steps=steps))
    _mark("queries")

    proof = MachineProof(
        chips=[ChipProof(
            name=inst.air.name, log_n=log_n,
            publics=[int(v) % P for v in inst.publics],
            bus_sum=per[inst.air.name]["bus_sum"],
            trace_root=per[inst.air.name]["trace_root"],
            quotient_root=per[inst.air.name]["q_root"],
            perm_root=per[inst.air.name]["perm_root"],
            **per[inst.air.name]["evals"],
        ) for inst, log_n in metas],
        fri_roots=fri_roots,
        fri_final=fri_final,
        pow_witness=pow_witness,
        queries=queries,
    )
    return proof


def preprocessed_root(air: Air, preprocessed: np.ndarray, log_n_max: int,
                      log_n: int,
                      config: StarkConfig = DEFAULT_CONFIG) -> list[int]:
    """The vk commitment of a chip's preprocessed matrix: LDE on the
    chip's machine coset (determined by its height relative to the
    machine's largest) + Merkle root.  Deterministic — computed once at
    setup and distributed with the verifying key."""
    k = (log_n_max + config.log_blowup) - (log_n + config.log_blowup)
    s_i = pow(config.shift, 1 << k, P)
    pre_m = bb.to_mont(jnp.asarray(preprocessed))
    return [int(x)
            for x in MerkleTree(coset_lde(pre_m, config.log_blowup,
                                          s_i)).root]


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _deep_part_fn(log_N: int, w: int):
    """One source matrix's contribution to a DEEP numerator:
    Σ_j β_j·V_j(x) − Σ_j β_j·v_j, jitted per (domain, width)."""
    import jax as _jax

    @_jax.jit
    def f(mat, betas, evals):
        N = mat.shape[0]
        comb = jnp.stack(
            [bb.dot_mod(mat, jnp.broadcast_to(betas[None, :, ell],
                                              mat.shape), axis=1)
             for ell in range(4)], axis=-1)
        prod = ex.ext_mul(betas[None, :, :], evals[None, :, :])
        const = bb.sum_mod(prod[0], axis=0)
        return ex.ext_sub(comb, jnp.broadcast_to(const[None, :], (N, 4)))

    return f


def _deep_chunked(log_N, parts, bpow_all, beta_off, w_z,
                  inv_x_zeta, inv_x_gzeta):
    """DEEP composition without concatenating the source matrices: each
    (matrix, ζ-evals, g·ζ-evals) part contributes its β-sliced matvec to
    the ζ / g·ζ numerators independently.  β ordering matches _deep_fn:
    ζ-group [trace ‖ pre ‖ perm ‖ quotient] at offsets [beta_off, …),
    g·ζ-group [trace ‖ pre ‖ perm] continuing at beta_off + w_z."""
    num_z = None
    num_gz = None
    off_z = beta_off
    off_gz = beta_off + w_z
    for mat, ev_z_np, ev_gz_np in parts:
        w = int(mat.shape[1])
        if w == 0:
            continue
        betas_z = jnp.asarray(bpow_all[off_z : off_z + w])
        ev_z = jnp.asarray(bb.np_to_mont(
            np.asarray(ev_z_np).astype(np.uint32)))
        part = _deep_part_fn(log_N, w)(mat, betas_z, ev_z)
        num_z = part if num_z is None else ex.ext_add(num_z, part)
        off_z += w
        if ev_gz_np is not None:
            betas_gz = jnp.asarray(bpow_all[off_gz : off_gz + w])
            ev_gz = jnp.asarray(bb.np_to_mont(
                np.asarray(ev_gz_np).astype(np.uint32)))
            part = _deep_part_fn(log_N, w)(mat, betas_gz, ev_gz)
            num_gz = part if num_gz is None else ex.ext_add(num_gz, part)
            off_gz += w
    return ex.ext_add(ex.ext_mul(num_z, inv_x_zeta),
                      ex.ext_mul(num_gz, inv_x_gzeta))


def _count_constraints_machine(air: Air, publics_full: list[int],
                               challenges: list[Fp4]) -> int:
    """Constraint count with the machine challenge vector (chips may fold
    differently per challenge count, so count with the real vector)."""
    from .air import AirBuilder, scalar_vec_hooks
    from .ext_val import ExtVal

    zero = Fp4(0)
    counter = [0]

    def fold(expr):
        counter[0] += 1

    builder = AirBuilder(
        local=[zero] * air.width, next=[zero] * air.width,
        public=[Fp4(int(v)) for v in publics_full],
        is_first_row=zero, is_last_row=zero, is_transition=zero, _fold=fold,
        periodic=[zero] * len(air.periodic_columns()),
        perm_local=[zero] * air.perm_width,
        perm_next=[zero] * air.perm_width,
        challenges=[ExtVal.from_fp4(c) for c in challenges],
        pre_local=[zero] * getattr(air, "preprocessed_width", 0),
        pre_next=[zero] * getattr(air, "preprocessed_width", 0),
        **scalar_vec_hooks(fold, lambda v: Fp4(v)),
    )
    air.eval(builder)
    return counter[0]


# ---------------------------------------------------------------------------
# verifier (pure host Python, mirrors the transcript exactly)
# ---------------------------------------------------------------------------


def _check(cond: bool, what: str) -> None:
    if not cond:
        raise VerificationError(what)


def verify_machine(airs: list[Air], proof: MachineProof, binding: bytes,
                   public_messages: list[tuple] | None = None,
                   config: StarkConfig = DEFAULT_CONFIG,
                   preprocessed_roots: dict[str, list[int]] | None = None,
                   ) -> bool:
    """Verify a machine proof.

    public_messages: the verifier-side bus messages, each (tag, payload)
    or (tag, payload, mult).  mult = −1 (default) means the verifier
    RECEIVES the message (a chip must have sent it — e.g. the journal
    digest the SHA chip published); mult = +1 means the verifier SENDS it
    (a chip must consume it — e.g. the journal's GCM record headers the
    control chip accounts against).  The global bus balance
    Σ chip bus sums + Σ mult/(γ−fp(msg)) must be zero; any missing, extra
    or altered message breaks it.

    preprocessed_roots: vk material — chip name → Merkle root of the
    chip's FIXED column matrix (machine.preprocessed_root).  Required for
    every chip whose air has preprocessed_width > 0; the proof's
    preprocessed openings are checked against these trusted roots, never
    against prover-supplied ones.
    Raises VerificationError on failure; returns True on success.
    """
    public_messages = public_messages or []
    preprocessed_roots = preprocessed_roots or {}
    air_by_name = {a.name: a for a in airs}
    _check(len(air_by_name) == len(airs), "duplicate airs")
    # multiset equality: a proof must contain EVERY air exactly once — a
    # duplicate chip name would otherwise silently displace another air's
    # constraints (undetectable via the bus for busless chips)
    _check(sorted(c.name for c in proof.chips) == sorted(air_by_name),
           "chip name multiset != air set")
    expect_order = _machine_order(
        proof.chips, lambda c: c.log_n + config.log_blowup,
        lambda c: c.name)
    _check([c.name for c in proof.chips] ==
           [c.name for c in expect_order], "chip order not canonical")

    log_N_max = proof.chips[0].log_n + config.log_blowup
    N_max = 1 << log_N_max
    s = config.shift

    # geometry + shifts
    geo = []
    for cp in proof.chips:
        air = air_by_name[cp.name]
        log_N = cp.log_n + config.log_blowup
        # mirror the prover's geometry check (prove_machine): a chip whose
        # commitment domain does not exceed fri_final_size would never join
        # the FRI walk, leaving its OOD evals and bus sum unbound to any
        # commitment — reject outright.
        _check((1 << log_N) > config.fri_final_size,
               f"{cp.name}: commitment domain (2^{log_N}) must exceed "
               "fri_final_size")
        k = log_N_max - log_N
        s_i = pow(s, 1 << k, P)
        n = 1 << cp.log_n
        _check(len(cp.publics) == air.num_public,
               f"{cp.name}: bad public count")
        _check(len(cp.tl) == air.width and len(cp.tn) == air.width,
               f"{cp.name}: bad trace eval count")
        _check(len(cp.pl) == air.perm_width and
               len(cp.pn) == air.perm_width,
               f"{cp.name}: bad perm eval count")
        _check(len(cp.qe) == 4 * config.blowup,
               f"{cp.name}: bad quotient eval count")
        _check((cp.perm_root is not None) == bool(air.perm_width),
               f"{cp.name}: perm root mismatch")
        _check(len(cp.bus_sum) == 4, f"{cp.name}: bad bus sum")
        if not getattr(air, "has_bus", False):
            _check(cp.bus_sum == [0, 0, 0, 0],
                   f"{cp.name}: non-zero bus sum on busless chip")
        ew = getattr(air, "preprocessed_width", 0)
        _check(len(cp.el) == ew and len(cp.en) == ew,
               f"{cp.name}: bad preprocessed eval count")
        if ew:
            _check(cp.name in preprocessed_roots,
                   f"{cp.name}: verifying key missing preprocessed root")
        geo.append((cp, air, n, log_N, s_i))

    # --- transcript replay -------------------------------------------------
    ch = Challenger()
    _observe_header(ch, binding,
                    [(cp.name, cp.log_n, cp.publics,
                      preprocessed_roots.get(cp.name))
                     for cp in proof.chips])
    for cp in proof.chips:
        ch.observe_many(cp.trace_root)
    challenges = _sample_challenges(ch)
    for cp, air, *_ in geo:
        if air.perm_width:
            ch.observe_many(cp.perm_root)
            ch.observe_many(cp.bus_sum)
    alpha = ch.sample_ext()
    for cp in proof.chips:
        ch.observe_many(cp.quotient_root)
    zeta = ch.sample_ext()
    for cp in proof.chips:
        for v in (cp.tl + cp.tn + cp.pl + cp.pn + cp.qe + cp.el + cp.en):
            ch.observe_ext(v)
    beta = ch.sample_ext()
    fold_betas = []
    n_layers = 0
    size = N_max
    while size > config.fri_final_size:
        size //= 2
        n_layers += 1
    _check(len(proof.fri_roots) == n_layers, "bad FRI layer count")
    _check(len(proof.fri_final) == size, "bad FRI final size")
    for root in proof.fri_roots:
        ch.observe_many(root)
        fold_betas.append(ch.sample_ext())
    for v in proof.fri_final:
        ch.observe_ext(v)
    _check(ch.check_witness(config.pow_bits, proof.pow_witness),
           "grinding check failed")
    _check(len(proof.queries) == config.num_queries, "bad query count")
    query_indices = [ch.sample_bits(log_N_max)
                     for _ in range(config.num_queries)]

    # --- global bus balance --------------------------------------------------
    total = Fp4(0)
    for cp in proof.chips:
        total = total + Fp4(*cp.bus_sum)
    for entry in public_messages:
        tag, payload = entry[0], entry[1]
        mult = entry[2] if len(entry) > 2 else -1
        total = total + mult * bus_term(challenges, tag, payload)
    _check(total == Fp4(0), "global bus imbalance")

    # --- per-chip DEEP-ALI constraint identity at ζ -------------------------
    for cp, air, n, log_N, s_i in geo:
        # every chip's TRACE domain is the plain subgroup H_n (only the
        # commitment coset shift s_i varies), so selectors and periodic
        # interpolants are the same as the uni-STARK verifier's
        g = two_adic_root(cp.log_n)
        z_h = zeta**n - 1
        g_last = pow(g, n - 1, P)
        sels = {
            "is_first_row": z_h / (zeta - 1),
            "is_last_row": z_h / (zeta - g_last),
            "is_transition": zeta - g_last,
        }
        periodic_at_zeta = [
            _eval_periodic(pattern, zeta, n)
            for pattern in air.periodic_columns()]
        publics_full = list(cp.publics) + list(cp.bus_sum)
        folded = air.fold_constraints_scalar(
            cp.tl, cp.tn, publics_full, sels, alpha,
            periodic=periodic_at_zeta, perm_local=cp.pl, perm_next=cp.pn,
            challenges=challenges, pre_local=cp.el, pre_next=cp.en)
        zeta_n = zeta**n
        q_at_zeta = Fp4(0)
        zpow = Fp4(1)
        for k in range(config.blowup):
            chunk = Fp4(0)
            for ell in range(4):
                chunk = chunk + _EXT_BASIS[ell] * cp.qe[4 * k + ell]
            q_at_zeta = q_at_zeta + zpow * chunk
            zpow = zpow * zeta_n
        _check(folded == z_h * q_at_zeta,
               f"{cp.name}: constraint identity failed at zeta")

    # --- per-query checks ----------------------------------------------------
    joiners_by_log: dict[int, list] = {}
    for entry in geo:
        joiners_by_log.setdefault(entry[3], []).append(entry)

    # vectorized DEEP prep: global β powers + per-chip eval vectors
    # (the per-column Python fold was the dominant verify cost)
    from .lookup import np_ext_mul, np_ext_powers

    total_terms = 0
    deep_prep = {}
    for cp, air, n, log_N, s_i in geo:
        ew = getattr(air, "preprocessed_width", 0)
        w_z = air.width + ew + air.perm_width + 4 * config.blowup
        w_gz = air.width + ew + air.perm_width
        ev_z = np.array(
            [list(v.c) for v in (cp.tl + cp.el + cp.pl + cp.qe)],
            dtype=np.uint64)
        ev_gz = np.array([list(v.c) for v in (cp.tn + cp.en + cp.pn)],
                         dtype=np.uint64)
        deep_prep[cp.name] = (total_terms, w_z, w_gz, ev_z, ev_gz)
        total_terms += w_z + w_gz
    bpow_np = np_ext_powers(beta, max(total_terms, 1))

    for mq, expect_index in zip(proof.queries, query_indices):
        _check(mq.index == expect_index, "query index mismatch")
        q = mq.index
        _check(len(mq.openings) == len(geo), "bad opening count")
        # Merkle checks + per-chip reduced openings r_i(x) with GLOBAL
        # β-power offsets (equivalent to local powers rescaled by the
        # running β accumulator)
        scaled: dict[int, Fp4] = {}
        for (cp, air, n, log_N, s_i), op in zip(geo, mq.openings):
            N_i = 1 << log_N
            j = q % N_i
            w = air.width
            pw = air.perm_width
            _check(len(op.trace_row) == w, f"{cp.name}: bad trace row")
            _check(len(op.quotient_row) == 4 * config.blowup,
                   f"{cp.name}: bad quotient row")
            _check(verify_path(
                hash_row_ints([v % P for v in op.trace_row]), j,
                op.trace_path, cp.trace_root),
                f"{cp.name}: trace Merkle path failed")
            _check(verify_path(
                hash_row_ints([v % P for v in op.quotient_row]), j,
                op.quotient_path, cp.quotient_root),
                f"{cp.name}: quotient Merkle path failed")
            if pw:
                _check(len(op.perm_row) == pw, f"{cp.name}: bad perm row")
                _check(verify_path(
                    hash_row_ints([v % P for v in op.perm_row]), j,
                    op.perm_path, cp.perm_root),
                    f"{cp.name}: perm Merkle path failed")
            ew = getattr(air, "preprocessed_width", 0)
            if ew:
                _check(len(op.pre_row) == ew,
                       f"{cp.name}: bad preprocessed row")
                _check(verify_path(
                    hash_row_ints([v % P for v in op.pre_row]), j,
                    op.pre_path, preprocessed_roots[cp.name]),
                    f"{cp.name}: preprocessed Merkle path failed "
                    "(vk root)")
            x = Fp4(s_i * pow(two_adic_root(log_N), j, P) % P)
            g = two_adic_root(cp.log_n)
            g_zeta = zeta * g
            off, w_z, w_gz, ev_z, ev_gz = deep_prep[cp.name]
            row_z = np.array(
                [v % P for v in (list(op.trace_row) + list(op.pre_row)
                                 + list(op.perm_row)
                                 + list(op.quotient_row))],
                dtype=np.uint64)
            diff_z = (P - ev_z) % P
            diff_z[:, 0] = (diff_z[:, 0] + row_z) % P
            terms = np_ext_mul(bpow_np[off : off + w_z], diff_z)
            num_z = Fp4(*[int(v) for v in terms.sum(axis=0) % P])
            row_gz = row_z[: w_gz]
            diff_gz = (P - ev_gz) % P
            diff_gz[:, 0] = (diff_gz[:, 0] + row_gz) % P
            terms = np_ext_mul(bpow_np[off + w_z : off + w_z + w_gz],
                               diff_gz)
            num_gz = Fp4(*[int(v) for v in terms.sum(axis=0) % P])
            r = num_z / (x - zeta) + num_gz / (x - g_zeta)
            scaled[log_N] = scaled.get(log_N, Fp4(0)) + r
        # FRI walk with joiners
        v = Fp4(0)
        qq = q
        cur_shift = s
        for ell, step in enumerate(mq.fri_steps):
            log_l = log_N_max - ell
            size_l = 1 << log_l
            if log_l in scaled:
                v = v + scaled[log_l]
            half = size_l // 2
            j = qq % half
            row = [c for val in step.pair for c in val.c]
            _check(verify_path(hash_row_ints(row), j, step.path,
                               proof.fri_roots[ell]),
                   f"FRI layer {ell} Merkle path failed")
            mine = step.pair[0] if qq < half else step.pair[1]
            _check(mine == v, f"FRI layer {ell} value mismatch")
            x_j = Fp4(cur_shift * pow(two_adic_root(log_l), j, P) % P)
            a, b_ = step.pair
            v = (a + b_) / 2 + fold_betas[ell] * (a - b_) / (2 * x_j)
            cur_shift = cur_shift * cur_shift % P
            qq = j
        _check(v == proof.fri_final[qq], "FRI final value mismatch")

    _final_low_degree(proof.fri_final, config, log_N_max, n_layers)
    return True
