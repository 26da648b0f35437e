"""Full-scale recursion compress on the TPU: prove the fixture's 10-chip
machine proof, build the complete verifier-VM program, and prove the
outer (VM + sponge) machine — the round-5 'recursion at scale' datapoint.

Writes COMPRESS_SCALE.json at the repo root with timings/sizes, so the
bench and the docs can cite a measured number.
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("ZKTLS_SERIAL_COMMIT_BYTES", "1.2e9")

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

# the axon tunnel makes every compile a network round-trip; the
# persistent cache is the difference between minutes and an hour cold
try:
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def wait_device(tries=60):
    for i in range(tries):
        try:
            return jax.devices()[0]
        except Exception as e:
            print(f"device wait {i}: {e}", flush=True)
            time.sleep(10)
    raise SystemExit("no device")


STATE = pathlib.Path("/tmp/compress_state")


def main():
    # two phases in SEPARATE processes: the tunneled worker does not
    # reliably release the inner prove's buffers (and a failed compile
    # wedges the helper), so the outer prove needs a fresh process
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase == "all":
        import subprocess

        r = subprocess.run([sys.executable, __file__, "inner"])
        if r.returncode != 0:
            raise SystemExit(r.returncode)
        # the tunneled compile helper dies (HTTP 500) when asked to
        # compile while the worker carries a large live working set —
        # but every completed compile persists in the cache, so each
        # fresh-process retry gets strictly further until the whole
        # pipeline is warm
        for attempt in range(10):
            r = subprocess.run([sys.executable, __file__, "outer"])
            if r.returncode == 0:
                return
            print(f"outer attempt {attempt + 1} failed "
                  f"(rc {r.returncode}); retrying fresh", flush=True)
            time.sleep(30)
        raise SystemExit(1)

    out = {}
    if STATE.with_suffix(".json").exists() and phase == "outer":
        out = json.loads(STATE.with_suffix(".json").read_text())
    dev = wait_device()
    out["device"] = str(dev)
    print("device:", dev, flush=True)

    from zktls_tpu.core.legacy import LegacyGuestInput
    from zktls_tpu.guest.program import run_guest
    from zktls_tpu.provers.stark import (
        StarkGuestProver,
        build_chip_instances,
        journal_airs,
        journal_public_messages,
    )
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.machine import MachineProof, prove_machine

    inner_q = int(os.environ.get("ZKTLS_COMPRESS_INNER_Q", "36"))
    cfg = StarkConfig(num_queries=inner_q)

    if phase == "inner":
        fx = ROOT.parent / ("reference/crates/guest-prover-sp1/testdata/"
                            "guest_input0.cbor")
        gi = LegacyGuestInput.from_cbor(fx.read_bytes()).to_guest_input()
        t0 = time.time()
        gout = run_guest(gi)
        chips = build_chip_instances(gout)
        out["witness_s"] = round(time.time() - t0, 2)
        out["chips"] = {c.air.name: [int(c.trace.shape[0]),
                                     int(c.trace.shape[1])]
                        for c in chips}
        t0 = time.time()
        proof = prove_machine(chips, binding=gout.journal, config=cfg)
        out["inner_prove_s"] = round(time.time() - t0, 2)
        out["inner_q"] = inner_q
        print("inner proved:", out["inner_prove_s"], "s", flush=True)
        STATE.with_suffix(".proof").write_bytes(proof.to_bytes())
        STATE.with_suffix(".journal").write_bytes(gout.journal)
        STATE.with_suffix(".json").write_text(json.dumps(out))
        return

    # phase == "outer"
    proof = MachineProof.from_bytes(STATE.with_suffix(".proof").read_bytes())
    journal = STATE.with_suffix(".journal").read_bytes()

    class _G:
        pass

    gout = _G()
    gout.journal = journal

    from zktls_tpu.stark.recursion import (
        MachineShape,
        build_program,
        _outer_chips,
        _vk_from_prog,
        _session_messages,
    )
    from zktls_tpu.stark.machine import verify_machine

    airs = journal_airs(gout.journal, proof)
    msgs = journal_public_messages(gout.journal)
    shape = MachineShape.of(proof)
    t0 = time.time()
    prog = build_program(airs, shape, gout.journal, msgs, cfg,
                         proof=proof)
    out["program_build_s"] = round(time.time() - t0, 2)
    out["n_instrs"] = len(prog.instrs)
    out["n_pubs"] = len(prog.pub_values)
    out["sp16_rows"] = len(prog.sp_rows[16])
    out["sp24_rows"] = len(prog.sp_rows[24])
    print("program:", out["n_instrs"], "instrs in",
          out["program_build_s"], "s", flush=True)

    t0 = time.time()
    ochips = _outer_chips(prog)
    out["outer_tracegen_s"] = round(time.time() - t0, 2)
    out["outer_chips"] = {c.air.name: [int(c.trace.shape[0]),
                                       int(c.trace.shape[1])]
                          for c in ochips}
    print("outer chips:", out["outer_chips"], flush=True)
    # partial record: the program-scale numbers stand even if the outer
    # prove attempt dies warming the compile cache
    out["outer_prove_s"] = None
    (ROOT / "COMPRESS_SCALE.json").write_text(json.dumps(out, indent=2))
    timings = {}
    outer_binding = gout.journal + shape.to_bytes()
    t0 = time.time()
    outer = prove_machine(ochips, binding=outer_binding, config=cfg,
                          timings=timings)
    out["outer_prove_s"] = round(time.time() - t0, 2)
    out["outer_stages"] = timings
    out["outer_proof_bytes"] = len(outer.to_bytes())
    print("outer proved:", out["outer_prove_s"], "s", flush=True)

    # fast-path verification against the derived vk
    vk = _vk_from_prog(prog, shape, cfg)
    t0 = time.time()
    ok = verify_machine(
        __import__("zktls_tpu.stark.recursion",
                   fromlist=["outer_airs"]).outer_airs(),
        outer, binding=outer_binding,
        public_messages=_session_messages(shape, gout.journal, msgs),
        config=cfg,
        preprocessed_roots={"VmAir": list(vk.program_root)})
    out["outer_verify_s"] = round(time.time() - t0, 2)
    out["outer_verify_ok"] = bool(ok)
    print("outer verified:", ok, out["outer_verify_s"], "s", flush=True)

    (ROOT / "COMPRESS_SCALE.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    STATE.with_suffix(".json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
