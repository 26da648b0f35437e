"""ChaCha20-Poly1305 record binding (round-5, VERDICT item #4): a live
0x1303 loopback session records, replays, and builds the FULL binding
chip set — ChaCha20 keystream chip, ChaCha record-control chip (journal
headers + parser records + in-circuit Poly1305 tag check over recorded
ModMul statements), stream parser, ChaCha data chip (keystream xor +
filtered-range matching), xor table and keccak — with the global machine
bus balancing against the journal's public messages, and tampering
rejected at the bus level."""

import pathlib
import sys

import pytest

from zktls_tpu.guest.program import run_guest
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.provers.stark import (
    build_chip_instances,
    journal_public_messages,
)
from zktls_tpu.stark.bus import MAX_PAYLOAD, bus_term, delta_powers
from zktls_tpu.stark.debug import check_trace

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from test_suites import (  # noqa: E402,F401  (cert_pair is a fixture)
    _machine_balance,
    _record_session,
    cert_pair,
)

CHALLENGES = [Fp4(61, 2, 9, 30)] + delta_powers(Fp4(19, 23, 4, 7),
                                                MAX_PAYLOAD)


@pytest.fixture(scope="module")
def chacha13_out(cert_pair):
    gi = _record_session(cert_pair, offered=[0x1303])
    out = run_guest(gi, require_trust_anchor=False)
    assert out.replay.cipher_suite.id == 0x1303
    return out


def test_chacha13_full_balance_and_airs(chacha13_out):
    out = chacha13_out
    assert out.gcm_metas, "1.3 ChaCha session should carry record metas"
    from zktls_tpu.stark.chips.gcm_control import parse_gcm_records
    from zktls_tpu.guest.journal import decode_journal

    recs = parse_gcm_records(decode_journal(out.journal)["gcm_records"])
    assert recs and all(r["cha"] for r in recs)
    chips, total = _machine_balance(out)
    names = {c.air.name for c in chips}
    assert {"ChaCha20Air", "ChaChaControlAir", "ChaChaDataAir",
            "StreamParserAir", "XorTableAir", "KeccakAir"} <= names
    assert not ({"GhashAir", "GcmControlAir", "GcmDataAir",
                 "Aes128Air"} & names)
    assert total == Fp4(0), "global bus imbalance"
    # every new chip's trace satisfies its AIR on the live witness
    for name in ("ChaCha20Air", "ChaChaControlAir", "ChaChaDataAir"):
        ci = next(c for c in chips if c.air.name == name)
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, CHALLENGES)
        pubs = list(ci.publics) + [int(v) for v in perm[-1, -4:]]
        assert check_trace(ci.air, ci.trace, pubs, perm_trace=perm,
                           challenges=CHALLENGES) == [], name


def _balance_with_journal(out, journal):
    chips = build_chip_instances(out)
    total = Fp4(0)
    for ci in chips:
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, CHALLENGES)
        total = total + Fp4(*[int(v) for v in perm[-1, -4:]])
    for tag, payload, mult in journal_public_messages(journal):
        t = bus_term(CHALLENGES, tag, payload)
        total = total + (t if mult > 0 else Fp4(0) - t)
    return total


def test_chacha13_tamper_rejected(chacha13_out):
    out = chacha13_out
    from zktls_tpu.guest.journal import decode_journal

    j = decode_journal(out.journal)
    # flip one byte of a record tag in the journal: the control chip's
    # header receive no longer matches the verifier's message
    recs = bytearray(j["gcm_records"])
    recs[14] ^= 1
    bad = out.journal.replace(bytes(j["gcm_records"]), bytes(recs))
    assert bad != out.journal
    assert _balance_with_journal(out, bad) != Fp4(0)
    # flip one filtered-response byte: the data chip's filtered receive
    # no longer matches the decrypted plaintext at that position
    if j["filtered_contents"] and j["filtered_contents"][0]:
        c0 = bytes(j["filtered_contents"][0])
        flipped = bytes([c0[0] ^ 1]) + c0[1:]
        bad2 = out.journal.replace(c0, flipped, 1)
        assert bad2 != out.journal
        assert _balance_with_journal(out, bad2) != Fp4(0)


def test_chacha13_journal_requires_binding_chips(chacha13_out):
    """A proof that omits the ChaCha control chip is rejected before
    verification even starts."""
    from types import SimpleNamespace

    from zktls_tpu.provers.stark import journal_airs
    from zktls_tpu.stark.verifier import VerificationError

    chips = build_chip_instances(chacha13_out)
    ok = SimpleNamespace(chips=[SimpleNamespace(name=c.air.name)
                                for c in chips])
    journal_airs(chacha13_out.journal, ok)   # complete set passes
    missing = SimpleNamespace(chips=[
        SimpleNamespace(name=c.air.name) for c in chips
        if c.air.name != "ChaChaControlAir"])
    with pytest.raises(VerificationError):
        journal_airs(chacha13_out.journal, missing)


def test_chacha12_full_balance(cert_pair):
    """0xCCA8 (TLS 1.2 ChaCha): the parser's nonce-less walk (cnl
    register) + the 1.2 AAD path of the control chip bind the records
    end to end, exactly like 0x1303."""
    gi = _record_session(cert_pair,
                         tls12_ciphers="ECDHE-RSA-CHACHA20-POLY1305")
    out = run_guest(gi, require_trust_anchor=False)
    assert out.replay.cipher_suite.id == 0xCCA8
    from zktls_tpu.guest.journal import decode_journal
    from zktls_tpu.stark.chips.gcm_control import parse_gcm_records

    recs = parse_gcm_records(decode_journal(out.journal)["gcm_records"])
    assert recs and all(r["cha"] and not r["v13"] for r in recs)
    chips, total = _machine_balance(out)
    names = {c.air.name for c in chips}
    assert {"ChaCha20Air", "ChaChaControlAir", "ChaChaDataAir",
            "StreamParserAir", "KeccakAir"} <= names
    assert total == Fp4(0), "global bus imbalance"
    for name in ("ChaChaControlAir", "StreamParserAir", "ChaChaDataAir"):
        ci = next(c for c in chips if c.air.name == name)
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, CHALLENGES)
        pubs = list(ci.publics) + [int(v) for v in perm[-1, -4:]]
        assert check_trace(ci.air, ci.trace, pubs, perm_trace=perm,
                           challenges=CHALLENGES) == [], name
