"""Route Z: bit-exact zkVM compatibility track (SURVEY.md §7 step 10).

The reference proves its guest as RISC-V execution inside SP1/RISC0
(`sp1-core-executor`, `risc0-circuit-rv32im` — SURVEY.md §2.2.B/C).  Full
receipt compatibility ("exported verifiers accept proofs unchanged")
requires reproducing those circuits and transcripts exactly; the first
rung is an RV32IM executor that can load and run the released guest ELFs.

Round-2 state: ELF32 loader + full RV32IM interpreter with cycle/segment
accounting and a pluggable syscall surface, validated against
hand-assembled programs (the released zktls guest ELFs live in a GitHub
release this offline environment cannot fetch — SURVEY.md §2.2.A; once
network exists, `run_elf` is the entry point to diff instruction counts
and journals against the native replay).
"""

from .executor import Machine, run_elf  # noqa: F401
