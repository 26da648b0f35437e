"""zktls_tpu — a TPU-native zkTLS proving framework.

A from-scratch reimplementation of the capabilities of the3cloud/zktls
(reference mounted read-only at /root/reference) with the CUDA RISC-V zkVM
provers (SP1 / RISC0) replaced by a JAX/XLA/Pallas Baby-Bear STARK stack.

Package layout:
  core/      data model (Request / GuestInput / tapes) + bit-exact CBOR/JSON
             codecs  (reference: external crate zktls-program-core, wire
             formats recovered in SURVEY.md §2.3)
  host/      TLS input builder: records a live TLS session into replayable
             (stream, random, time) tapes (reference: crates/input-builder)
  guest/     guest semantics: deterministic TLS replay from the tapes —
             handshake key derivation, record decryption, transcript hashing,
             certificate checks, response filtering, journal emission
             (reference: external zkvm-programs guest ELFs, SURVEY.md §3.4)
  ops/       TPU compute kernels (jnp + Pallas): Baby-Bear field arithmetic,
             NTT/LDE, Poseidon2, SHA-256, FRI folding
  stark/     the STARK protocol: AIR abstraction, Merkle/MMCS commitment,
             Fiat-Shamir challenger, quotient/DEEP-ALI, FRI, prover, verifier
             (replaces Plonky3 p3-* / risc0-zkp + their CUDA kernels)
  models/    AIR chips for the zkTLS guest workload (SHA-256, AES-GCM, ...)
  parallel/  device-mesh sharding: multi-chip NTT, distributed proving
  provers/   ZkProver implementations (mock, tpu-stark) mirroring the
             reference's SP1GuestProver/Risc0GuestProver adapters
  utils/     logging, profiling, misc
"""

__version__ = "0.1.0"
