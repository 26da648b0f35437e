"""XOR nibble-table chip: standalone machine proof where the verifier
consumes lookups as public messages."""

import numpy as np
import pytest

from zktls_tpu.stark.bus import BUS_XOR
from zktls_tpu.stark.chips.xor_table import (
    XorTableAir,
    xor_table_trace,
    xor_use_counts,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import (
    ChipInstance,
    MachineProof,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0, fri_final_size=16)

PAIRS = [(3, 5), (3, 5), (0, 0), (15, 9), (7, 7)]


def _msgs(pairs):
    return [(BUS_XOR, [x, y, x ^ y], -1) for x, y in pairs]


def test_xor_table_proves_and_verifies():
    trace, publics = xor_table_trace(xor_use_counts(PAIRS))
    chips = [ChipInstance(air=XorTableAir(), trace=trace, publics=publics)]
    proof = prove_machine(chips, binding=b"xor", config=CFG)
    mp = MachineProof.from_bytes(proof.to_bytes())
    assert verify_machine([XorTableAir()], mp, binding=b"xor",
                          public_messages=_msgs(PAIRS), config=CFG)


def test_xor_table_rejects_wrong_lookup():
    trace, publics = xor_table_trace(xor_use_counts(PAIRS))
    chips = [ChipInstance(air=XorTableAir(), trace=trace, publics=publics)]
    proof = prove_machine(chips, binding=b"xor", config=CFG)
    bad = [(BUS_XOR, [3, 5, 7], -1)] + _msgs(PAIRS[1:])  # 3^5 == 6, not 7
    with pytest.raises(VerificationError):
        verify_machine([XorTableAir()], MachineProof.from_bytes(
            proof.to_bytes()), binding=b"xor", public_messages=bad,
            config=CFG)
