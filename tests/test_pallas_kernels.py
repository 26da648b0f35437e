"""Pallas TPU kernels vs their XLA counterparts (interpret mode on CPU;
the real Mosaic lowering is exercised by bench.py on hardware)."""

import numpy as np

from zktls_tpu.ops import babybear as bb
from zktls_tpu.ops.field_ref import P
from zktls_tpu.ops.pallas_poseidon2 import BLOCK, permute_batch_pallas
from zktls_tpu.ops.poseidon2 import permute_batch

RNG = np.random.default_rng(21)


def test_pallas_poseidon2_matches_xla():
    for n in (BLOCK, BLOCK + 1, 3 * BLOCK - 7):
        states = RNG.integers(0, P, (n, 16), dtype=np.uint32)
        sm = bb.to_mont(states)
        want = np.asarray(permute_batch(sm))
        got = np.asarray(permute_batch_pallas(sm))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_pallas_poseidon2_idempotent_padding():
    """Padding rows must not contaminate real outputs."""
    states = RNG.integers(0, P, (5, 16), dtype=np.uint32)
    sm = bb.to_mont(states)
    a = np.asarray(permute_batch_pallas(sm))
    # same rows inside a larger batch give identical digests
    big = np.concatenate([states, RNG.integers(0, P, (100, 16),
                                               dtype=np.uint32)])
    b = np.asarray(permute_batch_pallas(bb.to_mont(big)))[:5]
    np.testing.assert_array_equal(a, b)
