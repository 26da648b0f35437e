"""Constraint-VM lowering equivalence tests.

The VM path (stark/lowering.py) must produce BYTE-IDENTICAL proofs to the
direct XLA-traced quotient path (`prover._quotient_fn`): same constraint
fold (identical α-power ordering), same quotient values, hence the same
Fiat-Shamir transcript, FRI walk, and query openings.
"""

import os

import numpy as np
import pytest

from zktls_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.lowering import lower_air
from zktls_tpu.stark.prover import prove

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=2, fri_final_size=8)


def _prove_bytes(backend: str, air, trace, pub):
    os.environ["ZKTLS_QUOTIENT"] = backend
    try:
        return prove(air, trace, pub, CFG).to_bytes()
    finally:
        os.environ.pop("ZKTLS_QUOTIENT", None)


def test_vm_matches_xla_fibonacci():
    air = FibonacciAir()
    trace, pub = fibonacci_trace(6)
    assert _prove_bytes("vm", air, trace, pub) == \
        _prove_bytes("xla", air, trace, pub)


def test_vm_matches_xla_bytes_chip():
    # a chip with LogUp permutation columns + challenges
    from zktls_tpu.stark.chips.bytes_table import (
        ByteRangeAir,
        byte_range_trace,
    )

    air = ByteRangeAir()
    rng = np.random.default_rng(7)
    values = [int(v) for v in rng.integers(0, 256, size=60)]
    trace = byte_range_trace(values)
    assert _prove_bytes("vm", air, trace, []) == \
        _prove_bytes("xla", air, trace, [])


def test_plan_shape_sanity():
    air = FibonacciAir()
    plan = lower_air(air, air.num_public, 0)
    assert plan.n_constraints > 0
    assert plan.w_u > 0
    # constraint count must match the scalar dry-run counter
    from zktls_tpu.stark.prover import _count_constraints

    assert plan.n_constraints == _count_constraints(
        air, [0] * air.num_public)
