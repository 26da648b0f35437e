"""LogUp lookup argument: two-round commitment, extension-valued
constraints, and multiset soundness (fast paths; the full prove/verify of
the byte chip runs under ZKTLS_SLOW_TESTS and in development drives)."""

import os

import numpy as np
import pytest

from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.chips.bytes_table import ByteRangeAir, byte_range_trace
from zktls_tpu.stark.debug import check_trace
from zktls_tpu.stark.ext_val import ExtVal
from zktls_tpu.stark.lookup import fp4_batch_inverse, logup_perm_columns

AIR = ByteRangeAir()
GAMMA = Fp4(998877, 123, 456, 789)


def test_ext_val_algebra_matches_fp4():
    a = Fp4(3, 1, 4, 1)
    b = Fp4(2, 7, 1, 8)
    ea = ExtVal.from_fp4(a)
    eb = ExtVal.from_fp4(b)
    prod = ea * eb
    # evaluate the ExtVal product over plain ints and compare with Fp4
    want = a * b
    got = Fp4(*[int(x) for x in prod.limbs()])
    assert got == want
    assert Fp4(*[int(x) for x in (ea + eb).limbs()]) == a + b
    assert Fp4(*[int(x) for x in (ea - eb).limbs()]) == a - b
    # scalar (base) multiplication
    assert Fp4(*[int(x) for x in (ea * 7).limbs()]) == a * 7


def test_fp4_batch_inverse():
    vals = [Fp4(i + 1, i, 2 * i, 3) for i in range(50)]
    invs = fp4_batch_inverse(vals)
    for v, iv in zip(vals, invs):
        assert v * iv == Fp4(1)


def test_logup_columns_balance():
    values = [5, 5, 9, 0]
    n = 256
    table = [i % 256 for i in range(n)]
    mults = [0] * n
    mults[5] = 2
    mults[9] = 1
    mults[0] = 1 + (n - len(values))  # padding zeros count too
    padded = values + [0] * (n - len(values))
    cols = logup_perm_columns(padded, table, mults, GAMMA)
    # final running sum vanishes exactly when the multiset balances
    assert list(cols[-1, 8:12]) == [0, 0, 0, 0]
    # unbalanced multiplicities leave a nonzero sum
    mults[9] = 0
    cols2 = logup_perm_columns(padded, table, mults, GAMMA)
    assert list(cols2[-1, 8:12]) != [0, 0, 0, 0]


def test_byte_range_constraints():
    trace = byte_range_trace([1, 2, 3, 255, 128, 128])
    perm = AIR.generate_perm_trace(trace, [], [GAMMA])
    assert check_trace(AIR, trace, [], perm_trace=perm,
                       challenges=[GAMMA]) == []


def test_byte_range_rejects_out_of_range():
    trace = byte_range_trace([1, 700])
    perm = AIR.generate_perm_trace(trace, [], [GAMMA])
    fails = check_trace(AIR, trace, [], perm_trace=perm, challenges=[GAMMA])
    assert fails  # the final balance constraint breaks


def test_byte_range_rejects_forged_multiplicity():
    trace = byte_range_trace([1, 2, 3])
    trace[5, 1] += 1  # inflate a multiplicity
    perm = AIR.generate_perm_trace(trace, [], [GAMMA])
    fails = check_trace(AIR, trace, [], perm_trace=perm, challenges=[GAMMA])
    assert fails


@pytest.mark.skipif(not os.environ.get("ZKTLS_SLOW_TESTS"),
                    reason="full two-round STARK; set ZKTLS_SLOW_TESTS=1")
def test_full_prove_verify_logup():
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.prover import prove
    from zktls_tpu.stark.verifier import VerificationError, verify

    cfg = StarkConfig(log_blowup=2, num_queries=10, fri_final_size=32)
    proof = prove(AIR, byte_range_trace([9, 200, 17]), [], cfg)
    assert verify(AIR, proof, cfg)
    bad = prove(AIR, byte_range_trace([9, 300]), [], cfg)
    with pytest.raises(VerificationError):
        verify(AIR, bad, cfg)
