"""Radix integer + fhEVM tests (evm_functional_tests.cpp analogue):
euint8 arithmetic, comparisons, bitwise, select, casts on the radix-test
paramset."""

import numpy as np
import pytest

from fhe_tpu.tfhe import fhevm, radix
from fhe_tpu.tfhe.fhevm import FheType


@pytest.fixture(scope="module")
def fc():
    return fhevm.FheContext.create("TOY_RADIX", rng=3)


def _vals(x):
    return np.array([int(v) for v in np.asarray(x).reshape(-1)])


def test_encrypt_decrypt_types(fc, rng):
    for t, bits in [(FheType.EUINT8, 8), (FheType.EUINT16, 16)]:
        v = rng.integers(0, 1 << bits, size=3)
        x = fc.encrypt(v, t, rng)
        np.testing.assert_array_equal(_vals(fc.decrypt(x)), v)


def test_trivial_encrypt(fc):
    v = np.array([0, 77, 255])
    x = fc.trivial_encrypt(v, FheType.EUINT8)
    np.testing.assert_array_equal(_vals(fc.decrypt(x)), v)


def test_add_sub(fc, rng):
    a = rng.integers(0, 256, size=4)
    b = rng.integers(0, 256, size=4)
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    s = fc.add(xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(s)), (a + b) % 256)
    d = fc.sub(xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(d)), (a - b) % 256)
    # chained lazy adds exercise the carry budget
    s3 = fc.add(fc.add(s, xa), xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(s3)), (2 * a + 2 * b) % 256)


def test_mul(fc, rng):
    a = rng.integers(0, 256, size=2)
    b = rng.integers(0, 256, size=2)
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    p = fc.mul(xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(p)), (a * b) % 256)


def test_compare(fc, rng):
    a = np.array([5, 200, 77, 77])
    b = np.array([7, 100, 77, 76])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    np.testing.assert_array_equal(fc.decrypt_bool(fc.eq(xa, xb)),
                                  (a == b).astype(int))
    np.testing.assert_array_equal(fc.decrypt_bool(fc.lt(xa, xb)),
                                  (a < b).astype(int))
    np.testing.assert_array_equal(fc.decrypt_bool(fc.ge(xa, xb)),
                                  (a >= b).astype(int))


def test_bitwise(fc, rng):
    a = rng.integers(0, 256, size=3)
    b = rng.integers(0, 256, size=3)
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.and_(xa, xb))), a & b)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.xor(xa, xb))), a ^ b)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.not_(xa))), 255 - a)


def test_select_and_cast(fc, rng):
    a = np.array([10, 20])
    b = np.array([30, 40])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    cond = fc.gt(xa, xb)       # [0, 0]
    out = fc.select(cond, xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(out)), b)
    cond2 = fc.lt(xa, xb)      # [1, 1]
    out2 = fc.select(cond2, xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(out2)), a)
    # casts
    wide = fc.cast(xa, FheType.EUINT16)
    np.testing.assert_array_equal(_vals(fc.decrypt(wide)), a)
    narrow = fc.cast(wide, FheType.EUINT4)
    np.testing.assert_array_equal(_vals(fc.decrypt(narrow)), a % 16)
