"""Functional bootstrap tests (UnitTestFunc.cpp analogue): EvalFunc over
negacyclic/periodic/arbitrary LUTs, EvalFloor, EvalSign, EvalDecomp on TOY.
"""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, lwe, funcboot


@pytest.fixture(scope="module")
def toy():
    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(99)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    return ctx, sk, key


def test_eval_func_identity(toy, rng):
    """f(m) = m (periodic-ish arbitrary LUT) over p = q/(2 beta)."""
    ctx, sk, key = toy
    p = ctx.max_plaintext_space      # TOY: 512/256 = 2
    q = ctx.params.q
    lut = ctx.generate_lut(lambda m, pp: m, p)
    m = np.arange(p)
    ct = ctx.encrypt(sk, m, rng, p=p)
    out = ctx.eval_func(key, ct, lut)
    got = np.asarray(ctx.decrypt(sk, out, p=p))
    np.testing.assert_array_equal(got, m)


def test_eval_func_negacyclic(toy, rng):
    """A LUT with f(x + q/2) = -f(x): single-bootstrap path."""
    ctx, sk, key = toy
    q = ctx.params.q
    x = np.arange(q, dtype=np.uint64)
    lut = np.where(x < q // 2, q // 8, (q - q // 8) % q).astype(np.uint32)
    m = np.array([0, 1])              # phases ~0 and ~q/4 under p=4... use p=4
    ct = ctx.encrypt(sk, np.array([0, 0]), rng, p=4)
    out = funcboot.eval_func(ctx.params, key, ct, lut)
    # phase(ct) ~ 0 (< q/2) -> f = q/8 -> decrypt p=4 after offset: value q/8
    e = np.asarray(lwe.noise(ctx.params, sk, out, np.array([0, 0]), p=8))
    # f output q/8 = encode(1) at p=8
    got = np.asarray(lwe.decrypt(ctx.params, sk, out, p=8))
    np.testing.assert_array_equal(got, np.array([1, 1]))


def test_eval_floor(toy, rng):
    ctx, sk, key = toy
    par = ctx.params
    q = par.q
    big_mod = q * 8                   # large-precision ciphertext modulus
    msgs = np.array([3, 5, 1, 7])
    # encoding step big_mod/p = q so flooring the low log2(q) bits
    # preserves the message exactly
    p_big = 8
    ct = ctx.encrypt(sk, msgs, rng, p=p_big, modulus=big_mod)
    out = funcboot.eval_floor(par, key, ct)
    assert out.modulus == big_mod
    # the floored phase should still decrypt to the same high bits
    got = np.asarray(lwe.decrypt(ctx.params, sk, out, p=p_big))
    np.testing.assert_array_equal(got, msgs)


def test_eval_sign(toy, rng):
    ctx, sk, key = toy
    par = ctx.params
    q = par.q
    big_mod = q * 16
    # messages in the top half -> sign bit 1; bottom half -> 0
    p_big = 8
    msgs = np.array([1, 3, 5, 7])     # encode m*big_mod/8
    ct = ctx.encrypt(sk, msgs, rng, p=p_big, modulus=big_mod)
    out = funcboot.eval_sign(par, key, ct)
    # EvalSign encodes the MSB at {0, q/2}: decrypt with p=2
    # (reference UnitTestFunc decrypts sign outputs at plaintext space 2)
    got = np.asarray(lwe.decrypt(ctx.params, sk, out, p=2))
    want = (msgs >= p_big // 2).astype(int)
    np.testing.assert_array_equal(got, want)


def test_eval_decomp(toy, rng):
    ctx, sk, key = toy
    par = ctx.params
    q = par.q
    big_mod = q * q // (2 * funcboot.BETA)   # two digits worth
    msgs = np.array([5, 2])
    p_big = 8
    ct = ctx.encrypt(sk, msgs, rng, p=p_big, modulus=big_mod)
    digits = funcboot.eval_decomp(par, key, ct)
    assert len(digits) >= 2
    assert digits[0].modulus == q
