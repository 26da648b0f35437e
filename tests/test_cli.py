"""CLI end-to-end tests (mirrors the reference's `zktls prove --mock` demo,
README.md:38-39 / SURVEY.md §4 'mock-prover e2e')."""

import json
import pathlib

import pytest

from zktls_tpu.cli import main
from zktls_tpu.guest.journal import decode_journal

FIXTURE = "/root/reference/crates/guest-prover-sp1/testdata/guest_input0.cbor"
INPUT = "/root/reference/testdata/input.json"


def _legacy_request_json(tmp_path) -> str:
    """The fixture's session predates input.json's request bytes; derive the
    matching request JSON from the fixture itself."""
    from zktls_tpu.core.legacy import LegacyGuestInput

    legacy = LegacyGuestInput.from_cbor(pathlib.Path(FIXTURE).read_bytes())
    req = legacy.to_guest_input().request
    p = tmp_path / "req.json"
    p.write_text(req.to_json())
    return str(p)


def test_prove_mock_fixture(tmp_path, capsys):
    req = _legacy_request_json(tmp_path)
    out_file = tmp_path / "proof.json"
    rc = main(["prove", "-i", req, "-t", "evm", "--mock",
               "--fixture", FIXTURE, "-o", str(out_file)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "output: 0x" in printed and "proof: 0x" in printed
    saved = json.loads(out_file.read_text())
    journal = bytes.fromhex(saved["journal"][2:])
    j = decode_journal(journal)
    assert j["server_name"] == "httpbin.org"
    assert saved["proof"] == "0x"  # mock: empty proof


def test_prove_missing_input_file(capsys):
    rc = main(["prove", "-i", "/nonexistent.json", "--mock"])
    assert rc == 2
    assert "does not exist" in capsys.readouterr().err


def test_prove_rejects_tampered_fixture(tmp_path, capsys):
    req = _legacy_request_json(tmp_path)
    data = bytearray(pathlib.Path(FIXTURE).read_bytes())
    data[-30] ^= 1  # corrupt ciphertext inside the stream tape
    bad = tmp_path / "bad.cbor"
    bad.write_bytes(bytes(data))
    rc = main(["prove", "-i", req, "--mock", "--fixture", str(bad)])
    assert rc == 1
    assert "error" in capsys.readouterr().err.lower()


def test_export_verifier_evm(tmp_path):
    rc = main(["export-verifier", "-t", "evm", "-o", str(tmp_path / "v")])
    assert rc == 0
    sol = (tmp_path / "v" / "ZkTlsVerifier.sol").read_text()
    assert "contract ZkTlsVerifier" in sol
    assert "decodeJournal" in sol


def test_export_verifier_non_evm_chain(tmp_path):
    # non-EVM chains get the verifying key + algorithm spec (the reference
    # CLI stubs all of these, export_verifier.rs:20-27)
    rc = main(["export-verifier", "-t", "ton", "-o", str(tmp_path / "v")])
    assert rc == 0
    assert (tmp_path / "v" / "vk.json").exists()
    assert (tmp_path / "v" / "VERIFIER_SPEC.md").exists()
