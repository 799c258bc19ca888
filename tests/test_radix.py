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


def test_kogge_stone_vs_ripple(fc, rng):
    """Parallel-prefix normalization (euint256.h koggeStoneCarries
    analogue) decrypts identically to the sequential ripple on a
    deep lazy-carry state."""
    a = rng.integers(0, 1 << 16, size=3)
    b = rng.integers(0, 1 << 16, size=3)
    xa = fc.encrypt(a, FheType.EUINT16, rng).value
    xb = fc.encrypt(b, FheType.EUINT16, rng).value
    # three raw limb-wise adds -> limbs up to 4*(m-1)=12 < p=16
    import fhe_tpu.tfhe.lwe as lwe_mod
    ct = lwe_mod.add(lwe_mod.add(xa.ct, xb.ct), lwe_mod.add(xa.ct, xb.ct))
    lazy = radix.RadixInt(ct=ct, rp=xa.rp, max_limb=4 * 3)
    want = (2 * (a + b)) % (1 << 16)
    r1 = radix.propagate_carries_ripple(fc.params, fc.key, lazy)
    r2 = radix.propagate_carries_ks(fc.params, fc.key, lazy)
    got1 = radix.decrypt(fc.params, xa.rp, fc.sk, r1)
    got2 = radix.decrypt(fc.params, xa.rp, fc.sk, r2)
    np.testing.assert_array_equal(np.array([int(v) for v in got1]), want)
    np.testing.assert_array_equal(np.array([int(v) for v in got2]), want)


def test_mul_euint16_wallace(fc, rng):
    """8-limb multiply goes through the carry-save column reduction +
    Kogge-Stone normalize path."""
    a = rng.integers(0, 1 << 16, size=2)
    b = rng.integers(0, 1 << 16, size=2)
    xa = fc.encrypt(a, FheType.EUINT16, rng)
    xb = fc.encrypt(b, FheType.EUINT16, rng)
    p = fc.mul(xa, xb)
    np.testing.assert_array_equal(_vals(fc.decrypt(p)),
                                  (a * b) % (1 << 16))


def test_min_max(fc, rng):
    a = np.array([5, 200])
    b = np.array([7, 100])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    xb = fc.encrypt(b, FheType.EUINT8, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.min(xa, xb))),
                                  np.minimum(a, b))
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.max(xa, xb))),
                                  np.maximum(a, b))


@pytest.mark.slow
def test_shifts_rotations(fc, rng):
    a = np.array([0b10110101, 0b01100011])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    for k in (1, 2, 3):
        np.testing.assert_array_equal(
            _vals(fc.decrypt(fc.shl(xa, k))), (a << k) % 256, err_msg=f"shl{k}")
        np.testing.assert_array_equal(
            _vals(fc.decrypt(fc.shr(xa, k))), a >> k, err_msg=f"shr{k}")
    rotl = lambda v, k: ((v << k) | (v >> (8 - k))) % 256
    rotr = lambda v, k: ((v >> k) | (v << (8 - k))) % 256
    for k in (1, 3):
        np.testing.assert_array_equal(
            _vals(fc.decrypt(fc.rotl(xa, k))), rotl(a, k), err_msg=f"rotl{k}")
        np.testing.assert_array_equal(
            _vals(fc.decrypt(fc.rotr(xa, k))), rotr(a, k), err_msg=f"rotr{k}")


def test_neg_is_zero(fc, rng):
    a = np.array([0, 5])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.neg(xa))),
                                  (-a) % 256)
    np.testing.assert_array_equal(fc.decrypt_bool(fc.is_zero(xa)),
                                  (a == 0).astype(int))
    np.testing.assert_array_equal(fc.decrypt_bool(fc.is_nonzero(xa)),
                                  (a != 0).astype(int))


def test_scalar_ops(fc, rng):
    a = np.array([100, 37])
    xa = fc.encrypt(a, FheType.EUINT8, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.add_scalar(xa, 29))),
                                  (a + 29) % 256)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.sub_scalar(xa, 41))),
                                  (a - 41) % 256)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.mul_scalar(xa, 7))),
                                  (a * 7) % 256)
    np.testing.assert_array_equal(fc.decrypt_bool(fc.lt_scalar(xa, 50)),
                                  (a < 50).astype(int))
    np.testing.assert_array_equal(fc.decrypt_bool(fc.eq_scalar(xa, 37)),
                                  (a == 37).astype(int))
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.and_scalar(xa, 0x5a))),
                                  a & 0x5a)


@pytest.mark.slow
def test_encrypted_shift(fc, rng):
    a = np.array([0b1011, 0b0110])
    k = np.array([1, 2])
    xa = fc.encrypt(a, FheType.EUINT4, rng)
    xk = fc.encrypt(k, FheType.EUINT4, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.shl(xa, xk))),
                                  (a << k) % 16)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.shr(xa, xk))),
                                  a >> k)
    # amount >= width zeroes (EVM semantics)
    xbig = fc.encrypt(np.array([4, 9]), FheType.EUINT4, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.shl(xa, xbig))),
                                  np.zeros(2, dtype=int))


@pytest.mark.slow
def test_public_encrypt(fc, rng):
    fc.public_key_gen(rng)
    a = np.array([123, 45])
    xa = fc.encrypt_public(a, FheType.EUINT8, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(xa)), a)
    s = fc.add(xa, fc.encrypt(np.array([5, 7]), FheType.EUINT8, rng))
    np.testing.assert_array_equal(_vals(fc.decrypt(s)), a + np.array([5, 7]))


def test_bytes_serial_proof(fc, rng):
    x = fc.encrypt_bytes(b"\x01\x02", FheType.EUINT16, rng)
    assert fc.decrypt_bytes(x) == b"\x01\x02"
    blob = fc.serialize_ciphertext(x)
    back = fc.deserialize_ciphertext(blob)
    assert fc.decrypt_bytes(back) == b"\x01\x02"
    assert fc.verify(x)
    proof = fc.get_proof(x)
    assert fc.verify_proof(x, proof)
    assert not fc.verify_proof(back, b"wrong" * 8)
    assert fhevm.fhe_type_bits(FheType.EUINT64) == 64
    assert fhevm.fhe_type_name(FheType.EUINT8) == "euint8"
    assert fhevm.estimate_gas("mul", FheType.EUINT256) > \
        fhevm.estimate_gas("add", FheType.EUINT8)
    assert fhevm.version()


def test_random(fc):
    x = fc.random(FheType.EUINT16, rng=7)
    v = int(fc.decrypt(x).reshape(-1)[0])
    assert 0 <= v < (1 << 16)


@pytest.mark.slow
def test_div_rem(fc, rng):
    a = np.array([13, 10])
    b = np.array([3, 5])
    xa = fc.encrypt(a, FheType.EUINT4, rng)
    xb = fc.encrypt(b, FheType.EUINT4, rng)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.div(xa, xb))), a // b)
    np.testing.assert_array_equal(_vals(fc.decrypt(fc.rem(xa, xb))), a % b)
