"""SNARK wrap subsystem: BN254 pairing curve + Groth16, the framework's
counterpart of the reference's stark→snark stage (`sp1-recursion-gnark-ffi`
Groth16 over BN254, `risc0-groth16` circom/rapidsnark — SURVEY.md §2.2.B/C).

Round-2 state: the proving system (R1CS → QAP → Groth16 over BN254) is
complete and self-contained; the round-3 work is the verifier-circuit
compiler that arithmetizes the machine-STARK verifier so the wrap makes
the STARK itself on-chain checkable.
"""
