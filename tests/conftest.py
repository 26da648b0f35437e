"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(jax.sharding.Mesh over ICI-style axes) is exercised without TPU hardware,
mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.
Set ZKTLS_TEST_TPU=1 to run the suite on real TPU devices instead.

Must set env vars before jax is imported anywhere.
"""

import os

if not os.environ.get("ZKTLS_TEST_TPU"):
    # The ambient environment tunnels a real TPU through the experimental
    # "axon" platform and its sitecustomize *overrides* jax_platforms at
    # interpreter startup, so the env var alone is not enough — update the
    # jax config after import as well.  Tests always run on local CPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")
FIXTURE_CBOR = REFERENCE / "crates/guest-prover-sp1/testdata/guest_input0.cbor"
FIXTURE_REQ = REFERENCE / "testdata/input.json"


@pytest.fixture(scope="session")
def fixture_cbor_bytes() -> bytes:
    return FIXTURE_CBOR.read_bytes()


@pytest.fixture(scope="session")
def fixture_request_json() -> str:
    return FIXTURE_REQ.read_text()
