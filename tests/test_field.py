"""Field-core property tests: JAX Baby-Bear kernels vs the scalar reference,
plus algebraic sanity of the field parameters (test pyramid level 1)."""

import numpy as np
import pytest

from zktls_tpu.ops import babybear as bb
from zktls_tpu.ops.field_ref import (
    GENERATOR,
    P,
    TWO_ADICITY,
    W_EXT,
    Fp4,
    batch_inverse,
    two_adic_root,
)

RNG = np.random.default_rng(1234)


def rand(n=4096):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


def test_field_parameters():
    assert P == 2**31 - 2**27 + 1
    assert (P - 1) % 2**TWO_ADICITY == 0
    # 31 is a generator: g^((p-1)/q) != 1 for every prime q | p-1
    for q in (2, 3, 5):
        assert (P - 1) % q == 0 or q == 2
        assert pow(GENERATOR, (P - 1) // q, P) != 1
    w = two_adic_root(TWO_ADICITY)
    assert pow(w, 2**TWO_ADICITY, P) == 1
    assert pow(w, 2 ** (TWO_ADICITY - 1), P) == P - 1


def test_ext_field_irreducible():
    """x^4 - W is irreducible over F_p iff gcd(x^(p^k) - x, f) = 1 for
    k = 1, 2 (a quartic with no linear or quadratic factors is irreducible).
    Polynomial arithmetic mod f, coefficients mod p."""

    def polymulmod(a, b):
        prod = [0] * 7
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                prod[i + j] = (prod[i + j] + ai * bj) % P
        for k in range(6, 3, -1):
            prod[k - 4] = (prod[k - 4] + W_EXT * prod[k]) % P
            prod[k] = 0
        return prod[:4]

    def polypow_x(e):
        # x^e mod f
        result = [1, 0, 0, 0]
        base = [0, 1, 0, 0]
        while e:
            if e & 1:
                result = polymulmod(result, base)
            base = polymulmod(base, base)
            e >>= 1
        return result

    for k in (1, 2):
        xp = polypow_x(P**k)
        # x^(p^k) - x must be a unit (nonzero constant => gcd 1) after
        # reduction unless it shares a factor; here it suffices that
        # x^(p^k) != x (mod f) for k=1,2 plus x^(p^4) == x (mod f)
        assert xp != [0, 1, 0, 0], f"f has a degree-{k} factor"
    assert polypow_x(P**4) == [0, 1, 0, 0], "f does not divide x^(p^4)-x"


def test_fp4_arithmetic():
    a = Fp4(1, 2, 3, 4)
    b = Fp4(5, 6, 7, 8)
    assert (a + b) - b == a
    assert a * b == b * a
    assert (a * b) * a.inv() == b * (a * a.inv())
    ainv = a.inv()
    assert a * ainv == Fp4(1)
    # frobenius has order 4 and fixes the base field
    f = a.frobenius().frobenius().frobenius().frobenius()
    assert f == a
    assert Fp4(7).frobenius() == Fp4(7)
    # pow matches repeated mult
    assert a**5 == a * a * a * a * a


def test_batch_inverse():
    vals = [int(x) for x in rand(100) if x != 0]
    invs = batch_inverse(vals)
    for v, iv in zip(vals, invs):
        assert v * iv % P == 1


def test_mont_roundtrip():
    x = rand()
    xm = bb.to_mont(x)
    back = np.asarray(bb.from_mont(xm))
    np.testing.assert_array_equal(back, x)
    # numpy-side conversions agree with device-side
    np.testing.assert_array_equal(bb.np_to_mont(x), np.asarray(xm))
    np.testing.assert_array_equal(bb.np_from_mont(np.asarray(xm)), x)


def test_mul_matches_reference():
    a, b = rand(), rand()
    am, bm = bb.to_mont(a), bb.to_mont(b)
    got = np.asarray(bb.from_mont(bb.mul(am, bm)))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % P).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 16, (1 << 16) - 1,
                     (1 << 31) % P, P // 2], dtype=np.uint32)
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    got = np.asarray(bb.from_mont(bb.mul(bb.to_mont(a), bb.to_mont(b))))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % P).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg():
    a, b = rand(), rand()
    np.testing.assert_array_equal(
        np.asarray(bb.add(a, b)),
        ((a.astype(np.uint64) + b) % P).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.sub(a, b)),
        ((a.astype(np.int64) - b) % P).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.neg(a)), ((-a.astype(np.int64)) % P).astype(np.uint32)
    )


def test_pow_and_inv():
    a = rand(512)
    a[a == 0] = 1
    am = bb.to_mont(a)
    got = np.asarray(bb.from_mont(bb.pow_const(am, 7)))
    want = np.array([pow(int(x), 7, P) for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)
    iv = np.asarray(bb.from_mont(bb.inv(am)))
    assert all(int(x) * int(y) % P == 1 for x, y in zip(a, iv))


def test_sum_dot():
    a, b = rand(1000), rand(1000)
    am, bm = bb.to_mont(a), bb.to_mont(b)
    s = int(np.asarray(bb.sum_mod(a)))
    assert s == int(a.astype(object).sum() % P)
    d = int(np.asarray(bb.from_mont(bb.dot_mod(am, bm))))
    want = int(sum(int(x) * int(y) for x, y in zip(a, b)) % P)
    assert d == want


def test_2d_shapes():
    a = rand(64 * 128).reshape(64, 128)
    b = rand(64 * 128).reshape(64, 128)
    got = np.asarray(bb.from_mont(bb.mul(bb.to_mont(a), bb.to_mont(b))))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % P).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
    col_sum = np.asarray(bb.sum_mod(a, axis=0))
    want_cs = (a.astype(object).sum(axis=0) % P).astype(np.uint32)
    np.testing.assert_array_equal(col_sum, want_cs)
