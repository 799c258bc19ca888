"""2-limb RNS ring accumulator tests: gate bootstrapping with Q >= 2^31
(the STD192*/STD128Q_3/4 regime; reference runs these on a single 37-50
bit NativeInteger modulus)."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate, rgsw_rns
import jax.numpy as jnp

M1 = np.array([0, 0, 1, 1])
M2 = np.array([0, 1, 0, 1])


def test_garner_decompose_roundtrip(rng):
    """Digit decomposition reconstructs the centered coefficient value."""
    from fhe_tpu.tfhe import params as tp
    p = tp.make_params("TOY_RNS")
    q1, q2 = p.moduli_rns
    Q = q1 * q2
    vals = rng.integers(0, Q, size=64).astype(object)
    c = np.zeros((1, 2, 2, 64), dtype=np.uint32)    # [B, 2poly, L, N=64]
    c[0, 0, 0] = [int(v) % q1 for v in vals]
    c[0, 0, 1] = [int(v) % q2 for v in vals]
    digs = np.asarray(rgsw_rns.signed_digit_decompose_rns(
        p, jnp.asarray(c)))
    # rows r = 2t + poly; poly 0 digits at even rows
    bg = p.base_g
    gb = bg.bit_length() - 1
    recon = np.zeros(64, dtype=object)
    for t in range(1, p.digits_g):
        recon += digs[0, 2 * (t - 1), :].astype(object) * (1 << (gb * t))
    centered = np.array([int(v) - Q if int(v) > Q // 2 else int(v)
                         for v in vals], dtype=object)
    # dropped digit 0: reconstruction matches up to +-Bg/2
    err = np.array([abs(int(a) - int(b)) for a, b in
                    zip(recon, centered)])
    assert err.max() <= bg // 2


@pytest.mark.slow
def test_rns_gates(rng):
    ctx = BinFheContext.generate("TOY_RNS")
    assert ctx.params.Q.bit_length() >= 34
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    ct1 = ctx.encrypt(sk, M1, rng)
    ct2 = ctx.encrypt(sk, M2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  M1 & M2)
    out = ctx.eval_bin_gate(key, Gate.NAND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  1 - (M1 & M2))


def test_std192_params_derive():
    """The big-Q named sets now derive 2-limb rings instead of failing."""
    from fhe_tpu.tfhe import params as tp
    for name in ("STD192", "STD128Q_3", "STD192Q_4"):
        p = tp.make_params(name)
        assert len(p.moduli_rns) == 2
        assert p.Q == p.moduli_rns[0] * p.moduli_rns[1]
        assert p.Q.bit_length() >= 34
