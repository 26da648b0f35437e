"""NTT/LDE correctness vs a direct O(n²) evaluation reference."""

import numpy as np

from zktls_tpu.ops import babybear as bb
from zktls_tpu.ops.field_ref import P, two_adic_root
from zktls_tpu.ops.ntt import bitrev_indices, coset_lde, eval_domain, intt, ntt

RNG = np.random.default_rng(7)


def naive_dft(vals: np.ndarray) -> np.ndarray:
    """Direct evaluation: out[i] = sum_j vals[j] * w^(ij)."""
    n = len(vals)
    w = two_adic_root(n.bit_length() - 1)
    out = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        acc = 0
        wi = pow(w, i, P)
        x = 1
        for j in range(n):
            acc = (acc + int(vals[j]) * x) % P
            x = x * wi % P
        out[i] = acc
    return out


def test_bitrev():
    assert list(bitrev_indices(3)) == [0, 4, 2, 6, 1, 5, 3, 7]


def test_ntt_matches_naive():
    for log_n in (1, 2, 4, 6):
        n = 1 << log_n
        vals = RNG.integers(0, P, n, dtype=np.uint32)
        got = np.asarray(bb.from_mont(ntt(bb.to_mont(vals))))
        np.testing.assert_array_equal(got, naive_dft(vals), err_msg=f"n={n}")


def test_ntt_roundtrip_large():
    n = 1 << 12
    vals = RNG.integers(0, P, (n, 8), dtype=np.uint32)
    vm = bb.to_mont(vals)
    back = np.asarray(bb.from_mont(intt(ntt(vm))))
    np.testing.assert_array_equal(back, vals)


def test_ntt_is_linear_in_columns():
    """Batched columns transform independently."""
    n = 1 << 8
    a = RNG.integers(0, P, (n, 3), dtype=np.uint32)
    joint = np.asarray(ntt(bb.to_mont(a)))
    for c in range(3):
        single = np.asarray(ntt(bb.to_mont(a[:, c])))
        np.testing.assert_array_equal(joint[:, c], single)


def test_coset_lde_extends_evaluations():
    """LDE values at coset points must equal direct polynomial evaluation."""
    log_n, log_blowup, shift = 5, 2, 3
    n = 1 << log_n
    vals = RNG.integers(0, P, n, dtype=np.uint32)
    lde = np.asarray(bb.from_mont(coset_lde(bb.to_mont(vals), log_blowup, shift)))
    # recover coefficients by interpolation on H
    coeffs = np.asarray(bb.from_mont(intt(bb.to_mont(vals))))
    domain = eval_domain(log_n + log_blowup, shift)
    for i in list(range(0, n << log_blowup, 7)):
        x = int(domain[i])
        want = 0
        xp = 1
        for c in coeffs:
            want = (want + int(c) * xp) % P
            xp = xp * x % P
        assert lde[i] == want, f"mismatch at {i}"


def test_coset_lde_restricts_to_original_when_shift_in_domain():
    """With shift=1 and blowup b, every 2^b-th LDE point is an original
    evaluation (the sub-sampled domain is H itself)."""
    log_n, log_blowup = 6, 1
    vals = RNG.integers(0, P, (1 << log_n, 4), dtype=np.uint32)
    lde = np.asarray(bb.from_mont(coset_lde(bb.to_mont(vals), log_blowup, 1)))
    np.testing.assert_array_equal(lde[:: 1 << log_blowup], vals)
