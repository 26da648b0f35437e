"""EC schedule chip: recorded mulmod events composed into proven
double-and-add ladders (the reference's sp1-curves EC precompile
composition, SURVEY.md §2.2.B) — the ECDHE pair d·G / d·S shares its
secret scalar structurally (dual lanes), the verifier pins the public
base G and receives both results, and tampering anything (result point,
scalar bit, a consumed statement) breaks the proof."""

import pytest

from zktls_tpu.guest.crypto.ec import P256
from zktls_tpu.guest.crypto.modmul import recording
from zktls_tpu.models.modmul_chip import modmul_instances
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.bus import (
    BUS_EC_RESULT,
    MAX_PAYLOAD,
    delta_powers,
)
from zktls_tpu.stark.chips.ec import (
    EcScheduleAir,
    LadderJob,
    ec_base_message,
    ec_result_payload,
    ec_schedule_trace,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.debug import check_trace
from zktls_tpu.stark.machine import (
    ChipInstance,
    prove_machine,
    verify_machine,
)
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                  fri_final_size=64)
CHALS = [Fp4(222, 111, 7, 3)] + delta_powers(Fp4(919, 29, 5, 8),
                                             MAX_PAYLOAD)

D = 0xBEEF1234ABCD           # 48-bit scalar keeps the test fast
G = P256.g
S = P256.mul(99991, G)       # stand-in for a server key-exchange point


def _setup():
    with recording() as rec:
        pub = P256.mul(D, G)
        pre = P256.mul(D, S)
    job = LadderJob(P256, D, G, S, pb1=True, bid1=7, rid1=1, rid2=2,
                    mres1=1, mres2=1)
    trace, consumed = ec_schedule_trace([job])
    return rec, trace, consumed, pub, pre


def _messages(pub, pre):
    nb = (D % P256.n).bit_length()
    return [ec_base_message(7, P256, G),
            (BUS_EC_RESULT, ec_result_payload(1, P256, nb, pub), -1),
            (BUS_EC_RESULT, ec_result_payload(2, P256, nb, pre), -1)]


def test_ladder_trace_satisfies_air():
    _rec, trace, _consumed, _pub, _pre = _setup()
    air = EcScheduleAir()
    perm = air.generate_perm_trace(trace, [], CHALS)
    bus = [int(x) for x in perm[-1, -4:]]
    assert check_trace(air, trace, bus, perm_trace=perm,
                       challenges=CHALS) == []


def test_consumed_statements_all_recorded():
    rec, _trace, consumed, _pub, _pre = _setup()
    keys = {(e.a, e.b, e.r, e.m) for e in rec.events}
    assert all(k in keys for k in consumed)
    # the ladder consumes every recorded event of the two scalar muls
    assert sum(consumed.values()) == len(rec.events)


@pytest.fixture(scope="module")
def proved():
    rec, trace, consumed, pub, pre = _setup()
    chips = modmul_instances(rec.events, sends=consumed)
    chips.append(ChipInstance(air=EcScheduleAir(), trace=trace,
                              publics=[]))
    proof = prove_machine(chips, binding=b"ec-schedule", config=CFG)
    return [c.air for c in chips], proof, pub, pre


def test_machine_roundtrip(proved):
    airs, proof, pub, pre = proved
    assert verify_machine(airs, proof, binding=b"ec-schedule",
                          public_messages=_messages(pub, pre),
                          config=CFG)


def test_wrong_result_point_rejected(proved):
    airs, proof, pub, pre = proved
    fake = P256.mul(3, G)
    with pytest.raises(VerificationError):
        verify_machine(airs, proof, binding=b"ec-schedule",
                       public_messages=_messages(pub, fake), config=CFG)


def test_wrong_base_rejected(proved):
    airs, proof, pub, pre = proved
    msgs = _messages(pub, pre)
    msgs[0] = ec_base_message(7, P256, P256.mul(5, G))
    with pytest.raises(VerificationError):
        verify_machine(airs, proof, binding=b"ec-schedule",
                       public_messages=msgs, config=CFG)


def test_truncated_ladder_visible_in_nbits(proved):
    airs, proof, pub, pre = proved
    nb = (D % P256.n).bit_length()
    msgs = [ec_base_message(7, P256, G),
            (BUS_EC_RESULT, ec_result_payload(1, P256, nb - 1, pub), -1),
            (BUS_EC_RESULT, ec_result_payload(2, P256, nb, pre), -1)]
    with pytest.raises(VerificationError):
        verify_machine(airs, proof, binding=b"ec-schedule",
                       public_messages=msgs, config=CFG)


def test_generator_pinned_base():
    """gb=1 pins the start addend to the curve generator in-chip (no
    verifier declaration needed) and marks the result payload."""
    air = EcScheduleAir()
    job = LadderJob(P256, D, G, S, pb1=False, gb1=True, rid1=1, rid2=2,
                    mres1=0, mres2=0)
    with recording():
        trace, _ = ec_schedule_trace([job])
    perm = air.generate_perm_trace(trace, [], CHALS)
    bus = [int(x) for x in perm[-1, -4:]]
    assert check_trace(air, trace, bus, perm_trace=perm,
                       challenges=CHALS) == []
    # claiming gb over a non-generator base is rejected at witness time
    with pytest.raises(ValueError, match="not G"):
        ec_schedule_trace([LadderJob(P256, D, S, None, pb1=False,
                                     gb1=True)])
    # forging the gb flag in the trace breaks the start-pin constraint
    from zktls_tpu.stark.chips.ec import LAYOUT

    job2 = LadderJob(P256, D, S, None, pb1=False)
    trace2, _ = ec_schedule_trace([job2])
    trace2[0, LAYOUT["gb1"].start] = 1
    perm2 = air.generate_perm_trace(trace2, [], CHALS)
    bus2 = [int(x) for x in perm2[-1, -4:]]
    assert check_trace(air, trace2, bus2, perm_trace=perm2,
                       challenges=CHALS) != []


def test_flipped_bit_breaks_air():
    from zktls_tpu.stark.chips.ec import LAYOUT

    _rec, trace, _consumed, _pub, _pre = _setup()
    air = EcScheduleAir()
    trace = trace.copy()
    row = 5
    trace[row, LAYOUT["b"].start] ^= 1
    perm = air.generate_perm_trace(trace, [], CHALS)
    bus = [int(x) for x in perm[-1, -4:]]
    assert check_trace(air, trace, bus, perm_trace=perm,
                       challenges=CHALS) != []
