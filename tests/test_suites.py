"""SHA-384 / AES-256 suite surface (round-4, VERDICT item #4): live
loopback sessions negotiating 0xC030 (TLS 1.2 ECDHE-RSA-AES256-GCM-SHA384)
and 0x1302 (TLS 1.3 AES-256-GCM-SHA384) record, replay, build the full
chip set (SHA-512 + AES-256 chips included) and the global machine bus
balances against the journal's public messages."""

import datetime
import socket
import ssl
import threading

import pytest

from zktls_tpu.core.types import Request, RequestInfo
from zktls_tpu.guest.program import run_guest
from zktls_tpu.host.input_builder import TLSInputBuilder
from zktls_tpu.ops.field_ref import Fp4
from zktls_tpu.provers.stark import (
    build_chip_instances,
    journal_public_messages,
)
from zktls_tpu.stark.bus import MAX_PAYLOAD, bus_term, delta_powers

RESPONSE = b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello"


@pytest.fixture(scope="module")
def cert_pair(tmp_path_factory):
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    tmp = tmp_path_factory.mktemp("suites")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder().subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=30))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    certfile = tmp / "cert.pem"
    keyfile = tmp / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    return certfile, keyfile


def _record_session(cert_pair, tls12_ciphers=None, offered=None):
    certfile, keyfile = cert_pair
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    if tls12_ciphers:
        ctx.minimum_version = ssl.TLSVersion.TLSv1_2
        ctx.maximum_version = ssl.TLSVersion.TLSv1_2
        ctx.set_ciphers(tls12_ciphers)
    else:
        ctx.minimum_version = ssl.TLSVersion.TLSv1_3
        ctx.maximum_version = ssl.TLSVersion.TLSv1_3
    ctx.load_cert_chain(certfile, keyfile)
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        try:
            tls = ctx.wrap_socket(conn, server_side=True)
            while b"\r\n\r\n" not in tls.recv(4096):
                pass
            tls.sendall(RESPONSE)
            tls.unwrap()
        except Exception:
            pass
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    req = Request(version=1, request_info=RequestInfo(
        request=b"GET / HTTP/1.1\r\nHost: localhost\r\n"
                b"Connection: close\r\n\r\n",
        remote_addr=f"127.0.0.1:{port}", server_name="localhost"))
    import zktls_tpu.host.recorder as rec_mod

    saved = rec_mod._OFFERED_SUITES
    if offered:
        rec_mod._OFFERED_SUITES = offered
    try:
        gi = TLSInputBuilder().build_input(req)
    finally:
        rec_mod._OFFERED_SUITES = saved
    t.join(timeout=10)
    srv.close()
    return gi


def _machine_balance(out):
    challenges = [Fp4(61, 2, 9, 30)] + delta_powers(Fp4(19, 23, 4, 7),
                                                    MAX_PAYLOAD)
    chips = build_chip_instances(out)
    total = Fp4(0)
    for ci in chips:
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, challenges)
        total = total + Fp4(*[int(v) for v in perm[-1, -4:]])
    for tag, payload, mult in journal_public_messages(out.journal):
        t = bus_term(challenges, tag, payload)
        total = total + (t if mult > 0 else Fp4(0) - t)
    return chips, total


def test_tls12_aes256_sha384_full_balance(cert_pair):
    gi = _record_session(cert_pair,
                         tls12_ciphers="ECDHE-RSA-AES256-GCM-SHA384")
    out = run_guest(gi, require_trust_anchor=False)
    assert out.replay.cipher_suite.id == 0xC030
    assert out.replay.sha512_recorder is not None
    assert out.replay.sha512_recorder.events
    chips, total = _machine_balance(out)
    names = {c.air.name for c in chips}
    assert {"Sha512Air", "Aes256Air", "GhashAir", "GcmControlAir",
            "StreamParserAir", "GcmDataAir", "KeccakAir"} <= names
    assert "Aes128Air" not in names
    assert total == Fp4(0), "global bus imbalance"


def test_tls13_aes256_sha384_full_balance(cert_pair):
    gi = _record_session(cert_pair, offered=[0x1302])
    out = run_guest(gi, require_trust_anchor=False)
    assert out.replay.cipher_suite.id == 0x1302
    assert out.v13
    chips, total = _machine_balance(out)
    names = {c.air.name for c in chips}
    assert {"Sha512Air", "Aes256Air"} <= names
    assert total == Fp4(0), "global bus imbalance"


def test_chacha_suites_chip_coverage(cert_pair):
    """ChaCha20-Poly1305 sessions (0xCCA8 / 0x1303): record, replay, and
    the keystream blocks + Poly1305 tag multiplications become provable
    events (ChaCha20 chip + ModMul over 2^130−5)."""
    from zktls_tpu.guest.crypto.chacha import P1305
    from zktls_tpu.stark.debug import check_trace

    for kwargs, want in (
            (dict(tls12_ciphers="ECDHE-RSA-CHACHA20-POLY1305"), 0xCCA8),
            (dict(offered=[0x1303]), 0x1303)):
        gi = _record_session(cert_pair, **kwargs)
        out = run_guest(gi, require_trust_anchor=False)
        assert out.replay.cipher_suite.id == want
        assert out.replay.chacha_events, "no ChaCha events recorded"
        assert any(ev.m == P1305 for ev in out.modmul_events), \
            "no Poly1305 mulmods recorded"
        chips = build_chip_instances(out)
        names = {c.air.name for c in chips}
        assert "ChaCha20Air" in names
        # the chip's trace satisfies its AIR on the real session witness
        ci = next(c for c in chips if c.air.name == "ChaCha20Air")
        challenges = [Fp4(61, 2, 9, 30)] + delta_powers(
            Fp4(19, 23, 4, 7), MAX_PAYLOAD)
        perm = ci.air.generate_perm_trace(ci.trace, [], challenges)
        pubs = [int(v) for v in perm[-1, -4:]]
        assert check_trace(ci.air, ci.trace, pubs, perm_trace=perm,
                           challenges=challenges) == []


@pytest.mark.skipif(
    not __import__("os").environ.get("ZKTLS_SLOW_TESTS"),
    reason="full multi-chip machine prove per suite (XLA compiles are "
           "minutes on CPU); set ZKTLS_SLOW_TESTS=1")
@pytest.mark.parametrize("kwargs,want", [
    (dict(tls12_ciphers="ECDHE-RSA-AES256-GCM-SHA384"), 0xC030),
    (dict(offered=[0x1302]), 0x1302),
    (dict(offered=[0x1303]), 0x1303),
])
def test_suite_machine_prove_roundtrip(cert_pair, kwargs, want):
    """VERDICT round-4 item #5: one full prove_machine → verify_machine
    per new suite on a recorded loopback session (small FRI config), not
    just a balance check — and a tampered journal byte is rejected."""
    from zktls_tpu.provers.stark import StarkGuestProver
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.verifier import VerificationError

    gi = _record_session(cert_pair, **kwargs)
    cfg = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                      fri_final_size=64)
    prover = StarkGuestProver(cfg)
    import zktls_tpu.guest.program as prog

    out = run_guest(gi, require_trust_anchor=False)
    assert out.replay.cipher_suite.id == want
    from zktls_tpu.stark.machine import prove_machine, verify_machine
    from zktls_tpu.provers.stark import (
        build_chip_instances,
        journal_airs,
        journal_public_messages,
    )

    chips = build_chip_instances(out)
    proof = prove_machine(chips, binding=out.journal, config=cfg)
    assert verify_machine(
        journal_airs(out.journal, proof), proof, binding=out.journal,
        public_messages=journal_public_messages(out.journal), config=cfg)
    bad = bytearray(out.journal)
    bad[40] ^= 1
    with pytest.raises(VerificationError):
        verify_machine(
            journal_airs(bytes(bad), proof), proof, binding=bytes(bad),
            public_messages=journal_public_messages(bytes(bad)),
            config=cfg)


def test_sha512_chip_machine_prove(cert_pair):
    """A small REAL machine proof containing the SHA-512 chip verifies
    (and a tampered SHA-512 digest chain is rejected by constraints)."""
    from zktls_tpu.guest.crypto.sha512 import SHA512Recorder
    from zktls_tpu.stark.chips.sha512 import Sha512Air, sha512_trace
    from zktls_tpu.stark.config import StarkConfig
    from zktls_tpu.stark.machine import (
        ChipInstance,
        prove_machine,
        verify_machine,
    )
    from zktls_tpu.stark.bus import BUS_SHA512_RESULT

    rec = SHA512Recorder()
    d = rec.new384(b"suite surface round 4" * 10).digest(result_tag=9)
    trace, _ = sha512_trace(rec.events)
    cfg = StarkConfig(log_blowup=2, num_queries=8, pow_bits=0,
                      fri_final_size=16)
    inst = ChipInstance(air=Sha512Air(), trace=trace, publics=[])
    proof = prove_machine([inst], binding=b"sha512", config=cfg)
    limbs = []
    for w in rec.events[-1].state_out:
        for part in range(4):
            limbs.append((w >> (16 * part)) & 0xFFFF)
    msgs = [(BUS_SHA512_RESULT, [9] + limbs, -1)]
    assert verify_machine([Sha512Air()], proof, binding=b"sha512",
                          public_messages=msgs, config=cfg)
    # a wrong digest limb leaves the published message unconsumed
    bad = [(BUS_SHA512_RESULT, [9] + [(limbs[0] + 1) % 65536] + limbs[1:],
            -1)]
    from zktls_tpu.stark.verifier import VerificationError

    with pytest.raises(VerificationError):
        verify_machine([Sha512Air()], proof, binding=b"sha512",
                       public_messages=bad, config=cfg)
