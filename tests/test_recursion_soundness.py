"""Adversarial tests for the recursion chips' soundness constraints
(round-5 fixes of the round-4 advisor findings): the verifier-VM opcode
one-hot discipline, dead-row bus gating, and the sponge chain-uniqueness
/ absorb-mode pinning that keep Fiat-Shamir challenges attached to the
witnessed commitments."""

import numpy as np
import pytest

from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.stark.chips.sponge import (
    Sponge16Air,
    SpongeRow,
    sponge_trace,
)
from zktls_tpu.stark.chips.vm import LAYOUT as VL, Instr, VmAir, \
    vm_preprocessed, vm_trace
from zktls_tpu.stark.debug import check_trace

CHALLENGES = [Fp4(3, 1, 4, 1), Fp4(2, 7, 1, 8)] + [
    Fp4(2, 7, 1, 8) ** k for k in range(2, 37)]

_PROG = [Instr(op="const", io1=1, imm=(5, 0, 0, 0), m1=1),
         Instr(op="add", ia=1, ib=1, io1=2, ra=1, rb=1, m1=1),
         Instr(op="pub", io1=3, imm=(0, 0, 0, 0), m1=1),
         Instr(op="azero", ia=4, ra=1)]
_VALUES = {1: (5, 0, 0, 0), 2: (10, 0, 0, 0), 3: (42, 0, 0, 0),
           4: (0, 0, 0, 0)}


def _vm_check(trace, pre=None):
    air = VmAir()
    if pre is None:
        pre = vm_preprocessed(_PROG)
    perm = air.generate_perm_trace(trace, [], CHALLENGES,
                                   preprocessed=pre)
    pubs = [int(v) for v in perm[-1, -4:]]
    return check_trace(air, trace, pubs, perm_trace=perm,
                       challenges=CHALLENGES, preprocessed=pre)


def _vm_trace():
    trace, _ = vm_trace(_PROG, _VALUES)
    return trace


def test_vm_honest_trace_satisfies_constraints():
    assert _vm_check(_vm_trace()) == []


def test_vm_forged_const_output_rejected():
    """The program is vk-committed (preprocessed): a prover can only
    choose the witness columns, and a const row's output must equal its
    committed immediate."""
    trace = _vm_trace()
    trace[0, VL["o1"].start] = 12345
    assert _vm_check(trace) != []


def test_vm_silenced_assertion_rejected():
    """An azero row's operand is constrained to zero — feeding it a
    nonzero value (to smuggle a failed verifier check) violates the
    gated constraint."""
    trace = _vm_trace()
    trace[3, VL["a"].start] = 77
    assert _vm_check(trace) != []


def test_vm_pub_high_limbs_rejected():
    """PUB rows carry base values: non-zero high limbs are rejected (the
    bus message only pins limb 0)."""
    trace = _vm_trace()
    trace[2, VL["o1"].start + 2] = 9
    assert _vm_check(trace) != []


# ---------------------------------------------------------------------------


def _sp_rows():
    return [
        SpongeRow(1, 0, {0: 11, 1: 22}, {0: 1}, True),
        SpongeRow(1, 1, {0: 33}, {1: 1}, False),
        SpongeRow(2, 0, {0: 44}, {0: 1}, False),
    ]


def _sp_check(air, trace):
    perm = air.generate_perm_trace(trace, [], CHALLENGES)
    pubs = [int(v) for v in perm[-1, -4:]]
    return check_trace(air, trace, pubs, perm_trace=perm,
                       challenges=CHALLENGES)


def test_sponge_honest_trace_satisfies_constraints():
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    assert _sp_check(air, trace) == []


def test_sponge_mid_chain_fresh_rejected():
    """fresh ⇒ seq == 0: a mid-chain row flagged fresh would restart the
    duplex from the zero state, soaking absorbs detached from the chain."""
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    L = air.L
    trace[1, L["fresh"].start] = 1
    trace[1, L["sp"]] = 0
    assert _sp_check(air, trace) != []


def test_sponge_forked_chain_nc2_rejected():
    """nc = 2 forks a chain into two branches; nc is now boolean."""
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    trace[0, air.L["nc"].start] = 2
    assert _sp_check(air, trace) != []


def test_sponge_duplicate_sid_seq_rejected():
    """A parallel chain re-using an existing (sid, seq) would let the
    prover choose which branch serves each challenge; the dense stride-1
    sid discipline forbids any repeat."""
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    L = air.L
    # duplicate (sid=1, seq=1) in the padding area as a live row
    trace[3, L["live"].start] = 1
    trace[3, L["sid"].start] = 1
    trace[3, L["seq"].start] = 1
    assert _sp_check(air, trace) != []


def test_sponge_live_after_dead_rejected():
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    L = air.L
    trace[3, L["live"].start] = 0
    trace[4, L["live"].start] = 1
    assert _sp_check(air, trace) != []


def test_sponge_absorb_mode_pinned_by_bus():
    """Flipping a row's absorb mode (overwrite ↔ additive) changes its
    HABS fingerprints: the am bit is part of the bus payload, so the
    program — not the prover — controls the mode."""
    air = Sponge16Air()
    trace, _, _ = sponge_trace(air, _sp_rows())
    p1 = air.generate_perm_trace(trace, [], CHALLENGES)
    t2 = trace.copy()
    t2[0, air.L["am"].start] = 1
    p2 = air.generate_perm_trace(t2, [], CHALLENGES)
    # absorb inverse columns differ => the bus no longer balances against
    # the VM's habs sends
    assert not np.array_equal(p1, p2)
    assert int(p1[-1, -4]) != int(p2[-1, -4])


def test_sponge_trace_discipline_check():
    with pytest.raises(ValueError):
        sponge_trace(Sponge16Air(), [
            SpongeRow(1, 0, {}, {}, False),
            SpongeRow(3, 0, {}, {}, False),   # sid gap
        ])
    with pytest.raises(ValueError):
        sponge_trace(Sponge16Air(), [
            SpongeRow(1, 0, {}, {}, True),
            SpongeRow(1, 2, {}, {}, False),   # seq skip
        ])
