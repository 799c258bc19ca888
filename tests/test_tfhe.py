"""TFHE end-to-end tests: LWE primitives, gadget decomposition, and gate
truth tables.

Mirrors the reference's binfhe unittest strategy (UnitTestFHEW.cpp: gate
truth tables across paramsets; UnitTestFHEWDeep: chained gates) on the TOY
paramset for CPU speed, with one STD128 spot check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate, lwe, rgsw, boot, make_params


@pytest.fixture(scope="module")
def toy():
    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(7)
    sk = ctx.key_gen(rng)
    sk_n = lwe.keygen(ctx.params, rng, dim=ctx.params.N)
    key = ctx.bt_key_gen(sk, rng, sk_n=sk_n)
    return ctx, sk, sk_n, key


def test_lwe_roundtrip(toy, rng):
    ctx, sk, _, _ = toy
    m = rng.integers(0, 4, size=32)
    ct = ctx.encrypt(sk, m, rng)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, ct)), m)
    # noise magnitude sane (fresh ct: |e| ~ 3.19)
    e = np.asarray(lwe.noise(ctx.params, sk, ct, m))
    assert np.all(np.abs(e) < 30)


def test_lwe_not(toy, rng):
    ctx, sk, _, _ = toy
    m = np.array([0, 1, 0, 1])
    ct = ctx.encrypt(sk, m, rng, p=4)
    out = np.asarray(ctx.decrypt(sk, ctx.eval_not(ct)))
    np.testing.assert_array_equal(out, 1 - m)


def test_mod_switch(toy, rng):
    ctx, sk, _, _ = toy
    p = ctx.params
    m = rng.integers(0, 4, size=16)
    ct = ctx.encrypt(sk, m, rng, p=4, modulus=p.q_ks)
    ct2 = lwe.mod_switch(ct, p.q)
    assert ct2.modulus == p.q
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, ct2)), m)


def test_key_switch(toy, rng):
    ctx, sk, sk_n, key = toy
    p = ctx.params
    m = rng.integers(0, 4, size=8)
    # encrypt under the ring secret (dim N) at modulus qKS
    ct_n = lwe.encrypt(p, sk_n, m, rng, p=4, modulus=p.q_ks)
    ct = lwe.key_switch(p, key.ksk, ct_n)
    assert ct.n == p.n
    np.testing.assert_array_equal(np.asarray(lwe.decrypt(p, sk, ct)), m)
    # one-hot MXU path must agree exactly when qKS is a power of two
    if p.q_ks & (p.q_ks - 1) == 0:
        ct_oh = lwe.key_switch(p, key.ksk, ct_n, impl="onehot")
        np.testing.assert_array_equal(np.asarray(ct.a), np.asarray(ct_oh.a))
        np.testing.assert_array_equal(np.asarray(ct.b), np.asarray(ct_oh.b))


def test_signed_digit_decompose(rng):
    p = make_params("TOY")
    Q, bg = p.Q, p.base_g
    c = rng.integers(0, Q, size=(3, 2, p.N), dtype=np.uint64).astype(np.uint32)
    digits = np.asarray(rgsw.signed_digit_decompose(p, jnp.asarray(c)))
    assert digits.shape == (3, p.digits_g2, p.N)
    assert digits.min() >= -(bg // 2) and digits.max() < bg // 2
    # reconstruction: sum_t digit_t * Bg^(t+1) = signed(c) - r0 (dropped digit)
    # exactly, because TOY's full digit count covers Q
    signed = c.astype(np.int64)
    signed[signed >= Q // 2] -= Q
    gbits = bg.bit_length() - 1
    r0 = ((signed << (64 - gbits)) >> (64 - gbits))  # balanced low digit
    rest = signed - r0
    for poly in range(2):
        recon = np.zeros((3, p.N), dtype=np.int64)
        for t in range(p.digits_g - 1):
            recon += digits[:, 2 * t + poly, :].astype(np.int64) * bg ** (t + 1)
        # values within the gadget's balanced range reconstruct exactly;
        # edge values near +-Q/2 leave a +-Bg^digitsG residual (the same
        # approximation the reference folds into noise)
        diff = rest[:, poly, :] - recon
        span = bg ** p.digits_g
        assert np.all(diff % span == 0) and np.all(np.abs(diff) <= span)


TRUTH = {
    Gate.AND: lambda a, b: a & b,
    Gate.OR: lambda a, b: a | b,
    Gate.NAND: lambda a, b: 1 - (a & b),
    Gate.NOR: lambda a, b: 1 - (a | b),
    Gate.XOR: lambda a, b: a ^ b,
    Gate.XNOR: lambda a, b: 1 - (a ^ b),
}


def test_gate_truth_tables(toy, rng):
    ctx, sk, _, key = toy
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    for gate, fn in TRUTH.items():
        out = ctx.eval_bin_gate(key, gate, ct1, ct2)
        # gate outputs encode m*q/4 (p=4 convention), like the reference
        got = np.asarray(ctx.decrypt(sk, out, p=4))
        np.testing.assert_array_equal(got, fn(m1, m2), err_msg=str(gate))


def test_gate_extended_output(toy, rng):
    """extended=True returns the dim-N mod-Q ciphertext under sk_n."""
    ctx, sk, sk_n, key = toy
    m1 = np.array([0, 1, 1])
    m2 = np.array([1, 1, 0])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2, extended=True)
    assert out.modulus == ctx.params.Q and out.n == ctx.params.N
    got = np.asarray(lwe.decrypt(ctx.params, sk_n, out, p=4))
    np.testing.assert_array_equal(got, m1 & m2)


def test_multi_input_gates(toy, rng):
    ctx, sk, _, key = toy
    combos = np.array([[0, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
                       [0, 1, 1], [0, 0, 1]])
    m1, m2, m3 = combos.T
    for gate, p, fn in [
        (Gate.AND3, 6, lambda: m1 & m2 & m3),
        (Gate.OR3, 6, lambda: m1 | m2 | m3),
        (Gate.MAJORITY, 4, lambda: (m1 + m2 + m3 >= 2).astype(int)),
    ]:
        cts = [ctx.encrypt(sk, m, rng, p=p) for m in (m1, m2, m3)]
        out = ctx.eval_bin_gate_multi(key, gate, cts)
        got = np.asarray(ctx.decrypt(sk, out, p=p))
        np.testing.assert_array_equal(got, fn(), err_msg=str(gate))


def test_four_input_gates(toy, rng):
    ctx, sk, _, key = toy
    combos = np.array([[0, 0, 0, 0], [1, 1, 1, 1], [1, 0, 1, 1],
                       [0, 1, 0, 0], [1, 1, 0, 1]])
    ms = combos.T
    for gate, fn in [
        (Gate.AND4, lambda: ms[0] & ms[1] & ms[2] & ms[3]),
        (Gate.OR4, lambda: ms[0] | ms[1] | ms[2] | ms[3]),
    ]:
        cts = [ctx.encrypt(sk, m, rng, p=8) for m in ms]
        out = ctx.eval_bin_gate_multi(key, gate, cts)
        got = np.asarray(ctx.decrypt(sk, out, p=8))
        np.testing.assert_array_equal(got, fn(), err_msg=str(gate))


def test_cmux(toy, rng):
    ctx, sk, _, key = toy
    d0 = np.array([0, 1, 0, 1])
    d1 = np.array([1, 0, 0, 1])
    sel = np.array([0, 0, 1, 1])
    ct0 = ctx.encrypt(sk, d0, rng)
    ct1 = ctx.encrypt(sk, d1, rng)
    cts = ctx.encrypt(sk, sel, rng)
    out = ctx.eval_cmux(key, ct0, ct1, cts)
    want = np.where(sel == 1, d1, d0)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)), want)


def test_refresh_bootstrap(toy, rng):
    ctx, sk, _, key = toy
    m = np.array([0, 1, 1, 0])
    ct = ctx.encrypt(sk, m, rng)
    out = ctx.bootstrap(key, ct)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)) % 2, m)
    # refreshed noise should be bounded well below q/8
    e = np.asarray(lwe.noise(ctx.params, sk, out, out_m := np.asarray(
        ctx.decrypt(sk, out))))
    assert np.all(np.abs(e) < ctx.params.q // 8)


def test_gate_chain(toy, rng):
    """Depth-4 chained gates (UnitTestFHEWDeep analogue)."""
    ctx, sk, _, key = toy
    a = np.array([0, 1]); b = np.array([1, 1])
    ct_a = ctx.encrypt(sk, a, rng)
    ct_b = ctx.encrypt(sk, b, rng)
    x = ctx.eval_bin_gate(key, Gate.NAND, ct_a, ct_b)
    want_x = 1 - (a & b)
    for _ in range(3):
        x = ctx.eval_bin_gate(key, Gate.NAND, x, ct_b)
        want_x = 1 - (want_x & b)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, x, p=4)), want_x)


def test_public_key_mode(toy, rng):
    """PKE mode (UnitTestFHEWPKE analogue; lwe-pke.cpp PubKeyGen :74 /
    EncryptN :133): pk encrypt -> decrypt under sk_N, then switch to
    (n, q) and run a gate against an sk-encrypted input."""
    ctx, sk, sk_n, key = toy
    pk = lwe.pub_key_gen(ctx.params, sk_n, rng)
    m = rng.integers(0, 4, size=16)
    ct_big = ctx.encrypt_pk(pk, m, rng)
    assert ct_big.n == ctx.params.N and ct_big.modulus == ctx.params.Q
    got = np.asarray(lwe.decrypt(ctx.params, sk_n, ct_big))
    np.testing.assert_array_equal(got, m)

    # switch to the gate domain and evaluate AND with a secret-key ct
    bits = rng.integers(0, 2, size=16)
    ct_pk = ctx.encrypt_pk(pk, bits, rng, ksk=key.ksk)
    other = rng.integers(0, 2, size=16)
    ct_sk = ctx.encrypt(sk, other, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct_pk, ct_sk)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)),
                                  bits & other)


def test_eval_constant(toy, rng):
    """EvalConstant = NoiselessEmbedding (lwe-pke.cpp:377): trivial
    a=0 ciphertexts decrypt and combine in gates."""
    ctx, sk, _sk_n, key = toy
    const = ctx.eval_constant(np.array([0, 1, 0, 1]))
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, const)),
                                  [0, 1, 0, 1])
    m = np.array([1, 1, 0, 0])
    ct = ctx.encrypt(sk, m, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct, const)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)),
                                  m & np.array([0, 1, 0, 1]))
