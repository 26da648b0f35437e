"""Prover-service tests: the framework's network proving mode (the
reference's moongate RPC / Bonsai path, SURVEY.md §2.4 'Remote proving')
exercised against an in-process HTTP service with the mock prover — real
guest execution, real journal, no TPU needed."""

import pathlib

import pytest

from zktls_tpu.core.legacy import LegacyGuestInput
from zktls_tpu.guest.journal import decode_journal
from zktls_tpu.provers.mock import MockProver
from zktls_tpu.provers.service import ProverService, RemoteGuestProver

FIXTURE = "/root/reference/crates/guest-prover-sp1/testdata/guest_input0.cbor"


@pytest.fixture(scope="module")
def guest_input():
    legacy = LegacyGuestInput.from_cbor(pathlib.Path(FIXTURE).read_bytes())
    return legacy.to_guest_input()


@pytest.fixture(scope="module")
def service():
    svc = ProverService(MockProver(), port=0).start()
    yield svc
    svc.stop()


def test_health(service):
    client = RemoteGuestProver(service.url)
    h = client.health()
    assert h["status"] == "ok"
    assert h["prover"] == "MockProver"


def test_remote_prove_matches_local(service, guest_input):
    client = RemoteGuestProver(service.url)
    journal, proof = client.prove(guest_input)
    local_journal, local_proof = MockProver().prove(guest_input)
    assert journal == local_journal
    assert proof == local_proof == b""
    assert decode_journal(journal)["server_name"] == "httpbin.org"


def test_remote_prove_bad_body(service):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"{service.url}/v1/prove", data=b"not cbor", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_remote_prove_tampered_tape_is_500(service, guest_input):
    import copy

    bad = copy.deepcopy(guest_input)
    stream = bytearray(bad.response.stream)
    stream[-30] ^= 1  # corrupt ciphertext inside the stream tape
    bad.response.stream = bytes(stream)
    client = RemoteGuestProver(bad and service.url)
    with pytest.raises(RuntimeError, match="remote prove failed"):
        client.prove(bad)


def test_cli_network_mode(service, guest_input, tmp_path, capsys):
    from zktls_tpu.cli import main

    req = tmp_path / "req.json"
    req.write_text(guest_input.request.to_json())
    fixture = tmp_path / "session.cbor"
    fixture.write_bytes(guest_input.to_cbor())
    rc = main(["prove", "-i", str(req), "--network",
               "--server", service.url, "--fixture", str(fixture)])
    assert rc == 0
    assert "output: 0x" in capsys.readouterr().out
