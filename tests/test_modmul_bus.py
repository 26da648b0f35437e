"""BUS_MODMUL composition: fixed-moduli ModMul chips publish their proven
statements on the global bus with witnessed multiplicities, so consumer
chips (EC schedule, Poly1305 accounting) and the verifier can pin a
computation to *recorded, proven* modular multiplications.

Reference behavior matched: sp1-curves' precompile chips expose their
events to the CPU chip via lookups (SURVEY.md §2.2.B); here the analogue
is the machine's global LogUp bus (stark/bus.py BUS_MODMUL).
"""

import random

import pytest

from zktls_tpu.guest.crypto.modmul import ModMulEvent
from zktls_tpu.models.modmul_chip import modmul_instances
from zktls_tpu.stark.bus import BUS_MODMUL
from zktls_tpu.stark.chips.modmul import (
    MODULI_256,
    modmul_send_payload,
)
from zktls_tpu.stark.config import StarkConfig
from zktls_tpu.stark.machine import prove_machine, verify_machine
from zktls_tpu.stark.verifier import VerificationError

CFG = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                  fri_final_size=64)


def _events(n=5, seed=7):
    rng = random.Random(seed)
    evs = []
    for _ in range(n):
        m = rng.choice(MODULI_256)
        a, b = rng.randrange(m), rng.randrange(m)
        evs.append(ModMulEvent(a, b, a * b % m, m))
    return evs


@pytest.fixture(scope="module")
def proved():
    evs = _events()
    key = (evs[2].a, evs[2].b, evs[2].r, evs[2].m)
    chips = modmul_instances(evs, sends={key: 1})
    proof = prove_machine(chips, binding=b"modmul-bus", config=CFG)
    return evs, chips, proof


def test_verifier_receives_sent_statement(proved):
    evs, chips, proof = proved
    msgs = [(BUS_MODMUL,
             modmul_send_payload(evs[2].a, evs[2].b, evs[2].r, evs[2].m),
             -1)]
    assert verify_machine([c.air for c in chips], proof,
                          binding=b"modmul-bus", public_messages=msgs,
                          config=CFG)


def test_unsent_statement_breaks_balance(proved):
    evs, chips, proof = proved
    # receiving a DIFFERENT (even recorded) statement than the one sent
    msgs = [(BUS_MODMUL,
             modmul_send_payload(evs[1].a, evs[1].b, evs[1].r, evs[1].m),
             -1)]
    with pytest.raises(VerificationError):
        verify_machine([c.air for c in chips], proof,
                       binding=b"modmul-bus", public_messages=msgs,
                       config=CFG)


def test_tampered_result_breaks_balance(proved):
    evs, chips, proof = proved
    ev = evs[2]
    msgs = [(BUS_MODMUL,
             modmul_send_payload(ev.a, ev.b, (ev.r + 1) % ev.m, ev.m),
             -1)]
    with pytest.raises(VerificationError):
        verify_machine([c.air for c in chips], proof,
                       binding=b"modmul-bus", public_messages=msgs,
                       config=CFG)


def test_unrecorded_consumption_rejected_at_witness_time():
    evs = _events()
    m = MODULI_256[0]
    with pytest.raises(ValueError, match="no recorded event"):
        modmul_instances(evs, sends={(3, 4, 12, m): 1})
