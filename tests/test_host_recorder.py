"""Loopback recording test: record a REAL TLS session against a local
OpenSSL server, then replay the tape through the guest — proving that the
recorder and the replayer are exact mirrors (the reference can only test
this against live httpbin.org; handler.rs:118-150)."""

import datetime
import socket
import ssl
import threading

import pytest

from zktls_tpu.core.types import (
    OffsetTemplate,
    PrefixTemplate,
    RegexTemplate,
    Request,
    RequestInfo,
)
from zktls_tpu.guest.program import run_guest
from zktls_tpu.guest.replay import replay_session
from zktls_tpu.host.input_builder import TLSInputBuilder

RESPONSE_BODY = b"Hello, recorded world!"
RESPONSE = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nContent-Length: "
    + str(len(RESPONSE_BODY)).encode()
    + b"\r\nConnection: close\r\n\r\n"
    + RESPONSE_BODY
)


@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    """A one-connection-at-a-time TLS 1.2 server with a self-signed cert."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    tmp = tmp_path_factory.mktemp("tls")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=30))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    certfile = tmp / "cert.pem"
    keyfile = tmp / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.maximum_version = ssl.TLSVersion.TLSv1_2
    ctx.set_ciphers("ECDHE-RSA-AES128-GCM-SHA256")
    ctx.load_cert_chain(certfile, keyfile)

    listener = socket.create_server(("127.0.0.1", 0))
    port = listener.getsockname()[1]
    stop = threading.Event()

    def serve():
        listener.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = listener.accept()
            except TimeoutError:
                continue
            try:
                tls = ctx.wrap_socket(conn, server_side=True)
                data = b""
                while b"\r\n\r\n" not in data:
                    chunk = tls.recv(65536)
                    if not chunk:
                        break
                    data += chunk
                tls.sendall(RESPONSE)
                tls.unwrap()  # send close_notify
            except Exception:
                pass
            finally:
                conn.close()

    thread = threading.Thread(target=serve, daemon=True)
    thread.start()
    yield port, str(certfile)
    stop.set()
    thread.join(timeout=2)
    listener.close()


def _request(port: int, templates=()) -> Request:
    return Request(
        version=1,
        request_info=RequestInfo(
            request=b"GET / HTTP/1.1\r\nHost: localhost\r\n"
                    b"Connection: close\r\n\r\n",
            remote_addr=f"localhost:{port}",
            server_name="localhost",
        ),
        response_template=list(templates),
    )


def test_record_and_replay_loopback(tls_server):
    port, _cafile = tls_server
    gi = TLSInputBuilder().build_input(_request(port))
    assert gi.response.response == RESPONSE
    # the recorded tape replays through the guest with every check passing
    res = replay_session(gi.response)
    assert res.all_checks_pass(), res.checks
    assert res.cipher_suite.id == 0xC02F
    assert res.request_plaintext == gi.request.request_info.request
    assert res.response_plaintext == RESPONSE
    # and the full guest emits a journal for it (loopback certs are
    # self-signed, so skip the trust-anchor requirement here; anchoring is
    # covered by the fixture-chain tests)
    out = run_guest(gi, require_trust_anchor=False)
    assert out.journal


def test_record_with_templates(tls_server):
    port, _ = tls_server
    templates = [
        OffsetTemplate(begin=9, length=6),                # "200 OK"
        PrefixTemplate(prefix=b"Content-Type: ", length=10),
        RegexTemplate(regex=r"Hello, [a-z]+ world!"),
    ]
    gi = TLSInputBuilder().build_input(_request(port, templates))
    assert gi.response.filtered_responses[0] == b"200 OK"
    assert gi.response.filtered_responses[1] == b"text/plain"
    assert gi.response.filtered_responses[2] == RESPONSE_BODY
    res = replay_session(gi.response)
    assert res.all_checks_pass(), res.checks


def test_recording_is_fresh_each_time(tls_server):
    port, _ = tls_server
    a = TLSInputBuilder().build_input(_request(port))
    b = TLSInputBuilder().build_input(_request(port))
    # fresh randomness every session, both replayable
    assert a.response.random != b.response.random
    assert replay_session(a.response).all_checks_pass()
    assert replay_session(b.response).all_checks_pass()


@pytest.fixture(scope="module")
def tls13_server(tmp_path_factory):
    """Same loopback server but TLS 1.3 (OpenSSL default modern stack)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    tmp = tmp_path_factory.mktemp("tls13")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=30))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    certfile = tmp / "cert.pem"
    keyfile = tmp / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_3
    ctx.maximum_version = ssl.TLSVersion.TLSv1_3
    ctx.load_cert_chain(certfile, keyfile)

    listener = socket.create_server(("127.0.0.1", 0))
    port = listener.getsockname()[1]
    stop = threading.Event()

    def serve():
        listener.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = listener.accept()
            except TimeoutError:
                continue
            try:
                tls = ctx.wrap_socket(conn, server_side=True)
                data = b""
                while b"\r\n\r\n" not in data:
                    chunk = tls.recv(65536)
                    if not chunk:
                        break
                    data += chunk
                tls.sendall(RESPONSE)
                tls.unwrap()
            except Exception:
                pass
            finally:
                conn.close()

    thread = threading.Thread(target=serve, daemon=True)
    thread.start()
    yield port, str(certfile)
    stop.set()
    thread.join(timeout=2)
    listener.close()


def test_record_and_replay_tls13(tls13_server):
    port, _ = tls13_server
    gi = TLSInputBuilder().build_input(_request(port))
    assert gi.response.response == RESPONSE
    res = replay_session(gi.response)
    assert res.all_checks_pass(), res.checks
    assert res.version == 0x0304
    assert res.cipher_suite.tls13
    assert res.curve_name == "x25519"
    assert res.checks["certificate_verify"]
    assert res.response_plaintext == RESPONSE
    assert res.request_plaintext == gi.request.request_info.request
    out = run_guest(gi, require_trust_anchor=False)
    assert out.journal


def test_tls13_tamper_detected(tls13_server):
    port, _ = tls13_server
    gi = TLSInputBuilder().build_input(_request(port))
    from zktls_tpu.guest.replay import ReplayError

    bad = bytearray(gi.response.stream)
    bad[-25] ^= 1
    gi.response.stream = bytes(bad)
    # the flipped byte lands either in ciphertext (AEAD failure -> Replay-
    # Error) or in a tape length header (framing ValueError) — both reject
    with pytest.raises((ReplayError, ValueError)):
        replay_session(gi.response)


def test_tls13_machine_chips_balance(tls13_server):
    """Round-3 binding on a LIVE TLS 1.3 session: the full chip set
    (parser, GCM data, xor, keccak included) builds from a recorded 1.3
    loopback session and its global bus balances against the journal's
    public messages — the identity verify_machine enforces."""
    from zktls_tpu.ops.field_ref import Fp4
    from zktls_tpu.provers.stark import (
        build_chip_instances,
        journal_public_messages,
    )
    from zktls_tpu.stark.bus import MAX_PAYLOAD, bus_term, delta_powers

    import zktls_tpu.host.recorder as rec_mod

    port, _ = tls13_server
    # force TLS_AES_128_GCM_SHA256 (the server would otherwise pick
    # ChaCha20, which replays but has no chips yet)
    saved = rec_mod._OFFERED_SUITES
    rec_mod._OFFERED_SUITES = [0x1301]
    try:
        gi = TLSInputBuilder().build_input(_request(port))
    finally:
        rec_mod._OFFERED_SUITES = saved
    out = run_guest(gi, require_trust_anchor=False)
    assert out.v13
    assert out.replay.gcm_events, "expected an AES-GCM 1.3 session"
    chips = build_chip_instances(out)
    names = {c.air.name for c in chips}
    assert {"StreamParserAir", "GcmDataAir", "XorTableAir",
            "KeccakAir"} <= names
    challenges = [Fp4(61, 2, 9, 30)] + delta_powers(Fp4(19, 23, 4, 7),
                                                    MAX_PAYLOAD)
    total = Fp4(0)
    for ci in chips:
        perm = ci.air.generate_perm_trace(ci.trace, ci.publics, challenges)
        total = total + Fp4(*[int(v) for v in perm[-1, -4:]])
    for tag, payload, mult in journal_public_messages(out.journal):
        t = bus_term(challenges, tag, payload)
        total = total + (t if mult > 0 else Fp4(0) - t)
    assert total == Fp4(0)
