"""AdvancedSHE tests: EvalSum, inner product, linear weighted sum,
polynomial + Chebyshev series, linear transform (base-advancedshe /
ckksrns-advancedshe analogue)."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, advanced

N = 256
SLOTS = N // 2


@pytest.fixture(scope="module")
def setup():
    ctx = ckks.CkksContext.create(N=N, num_levels=6, scale_bits=26, dnum=2)
    rng = np.random.default_rng(23)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    rot_keys = advanced.sum_key_gen(ctx, sk, rng)
    return ctx, sk, pk, evk, rot_keys, rng


def test_eval_sum(setup, rng):
    ctx, sk, pk, _, rot_keys, _ = setup
    z = rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    out = ctx.decrypt(sk, advanced.eval_sum(ctx, ct, SLOTS, rot_keys))
    np.testing.assert_allclose(out.real, np.full(SLOTS, z.sum()), atol=1e-2)


def test_inner_product(setup, rng):
    ctx, sk, pk, evk, rot_keys, _ = setup
    z1 = rng.normal(size=SLOTS) * 0.3
    z2 = rng.normal(size=SLOTS) * 0.3
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    out = ctx.decrypt(sk, advanced.eval_inner_product(
        ctx, ct1, ct2, SLOTS, evk, rot_keys))
    np.testing.assert_allclose(out.real, np.full(SLOTS, z1 @ z2), atol=5e-2)


def test_linear_wsum(setup, rng):
    ctx, sk, pk, _, _, _ = setup
    zs = [rng.normal(size=SLOTS) for _ in range(3)]
    ws = [0.5, -1.25, 2.0]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]
    out = ctx.decrypt(sk, advanced.eval_linear_wsum(ctx, cts, ws))
    want = sum(w * z for w, z in zip(ws, zs))
    np.testing.assert_allclose(out.real, want, atol=1e-2)


def test_eval_poly(setup, rng):
    ctx, sk, pk, evk, _, _ = setup
    z = rng.uniform(-0.8, 0.8, size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    coeffs = [0.25, -1.0, 0.5, 0.125]     # 0.25 - x + 0.5x^2 + 0.125x^3
    out = ctx.decrypt(sk, advanced.eval_poly(ctx, ct, coeffs, evk))
    want = coeffs[0] + coeffs[1] * z + coeffs[2] * z**2 + coeffs[3] * z**3
    np.testing.assert_allclose(out.real, want, atol=2e-2)


def test_chebyshev_series(setup, rng):
    ctx, sk, pk, evk, _, _ = setup
    z = rng.uniform(-0.9, 0.9, size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    # approximate exp(x) on [-1, 1] with a degree-4 Chebyshev series
    deg = 4
    k = np.arange(200)
    nodes = np.cos(np.pi * (k + 0.5) / 200)
    fv = np.exp(nodes)
    coeffs = []
    for j in range(deg + 1):
        c = 2.0 / 200 * np.sum(fv * np.cos(j * np.arccos(nodes)))
        coeffs.append(c)
    coeffs[0] /= 2
    out = ctx.decrypt(sk, advanced.eval_chebyshev_series(
        ctx, ct, coeffs, -1.0, 1.0, evk))
    np.testing.assert_allclose(out.real, np.exp(z), atol=5e-2)


def test_linear_transform(setup, rng):
    ctx, sk, pk, _, rot_keys, _ = setup
    z = rng.normal(size=SLOTS) * 0.5
    M = np.zeros((SLOTS, SLOTS))
    # banded matrix (3 diagonals) to keep the rotation count small
    for d, w in [(0, 1.0), (1, 0.5), (2, -0.25)]:
        for i in range(SLOTS):
            M[i, (i + d) % SLOTS] = w
    ct = ctx.encrypt(pk, z, rng)
    out = ctx.decrypt(sk, advanced.eval_linear_transform(ctx, ct, M,
                                                         rot_keys))
    np.testing.assert_allclose(out.real, M @ z, atol=1e-2)