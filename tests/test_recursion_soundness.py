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
from zktls_tpu.stark.chips.vm import LAYOUT as VL, OP_IDX, Instr, VmAir, \
    vm_trace
from zktls_tpu.stark.debug import check_trace

CHALLENGES = [Fp4(3, 1, 4, 1), Fp4(2, 7, 1, 8)] + [
    Fp4(2, 7, 1, 8) ** k for k in range(2, 37)]


def _vm_check(trace):
    air = VmAir()
    perm = air.generate_perm_trace(trace, [], CHALLENGES)
    pubs = [int(v) for v in perm[-1, -4:]]
    return check_trace(air, trace, pubs, perm_trace=perm,
                       challenges=CHALLENGES)


def _vm_trace():
    prog = [Instr(op="const", io1=1, imm=(5, 0, 0, 0), m1=1),
            Instr(op="add", ia=1, ib=1, io1=2, ra=1, rb=1, m1=1),
            Instr(op="azero", ia=3, ra=1)]
    values = {1: (5, 0, 0, 0), 2: (10, 0, 0, 0), 3: (0, 0, 0, 0)}
    trace, _ = vm_trace(prog, values)
    return trace


def test_vm_honest_trace_satisfies_constraints():
    assert _vm_check(_vm_trace()) == []


def test_vm_live_row_without_opcode_rejected():
    """A live row with ALL op flags zero (op_id = 0 = const by sum) used
    to leave its output unconstrained — now Σ s_i == live forbids it."""
    trace = _vm_trace()
    trace[0, VL["s"]] = 0                     # strip the const flag
    trace[0, VL["o1"].start] = 12345          # forge the constant
    assert _vm_check(trace) != []


def test_vm_doubled_opcode_flag_rejected():
    """azero encoded as s_sel = 2 (op_id 2·4 = 8 = azero) silenced the
    assertion pre-fix; flag booleanity now rejects it."""
    trace = _vm_trace()
    row = 2                                   # the azero row
    trace[row, VL["s"]] = 0
    trace[row, VL["s"].start + OP_IDX["sel"]] = 2
    trace[row, VL["a"].start] = 77            # non-zero "asserted" value
    assert _vm_check(trace) != []


def test_vm_dead_row_bus_fields_rejected():
    """Dead rows could send/receive arbitrary dataflow messages through
    ungated multiplicities; (1 − live)·m == 0 now forbids it."""
    trace = _vm_trace()
    dead = 5                                  # beyond the 3 live rows
    assert trace[dead, VL["live"].start] == 0
    trace[dead, VL["m1"].start] = 1
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
