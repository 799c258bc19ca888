"""DM (AP) and LMKCDEY accumulator gate tests (rgsw-acc-dm.cpp /
rgsw-acc-lmkcdey.cpp analogues; reference truth-table strategy of
UnitTestFHEW.cpp across methods)."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate
from fhe_tpu.tfhe import params as tp

M1 = np.array([0, 0, 1, 1])
M2 = np.array([0, 1, 0, 1])


@pytest.mark.slow
def test_dm_gates(rng):
    ctx = BinFheContext.generate("TOY", method="AP")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    ct1 = ctx.encrypt(sk, M1, rng)
    ct2 = ctx.encrypt(sk, M2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  M1 & M2)
    out = ctx.eval_bin_gate(key, Gate.OR, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  M1 | M2)


@pytest.mark.slow
def test_lmkcdey_gates(rng):
    ctx = BinFheContext.generate("TOY_LMKCDEY", method="LMKCDEY")
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


def test_lmkcdey_requires_q_2n(rng):
    ctx = BinFheContext.generate("TOY", method="LMKCDEY")
    sk = ctx.key_gen(rng)
    with pytest.raises(AssertionError):
        ctx.bt_key_gen(sk, rng)


def test_lmkcdey_scan_bitexact_vs_eager(rng):
    """The jitted op-stream scan (lmk_schedule + blind_rotate_lmkcdey_scan)
    reproduces the host-orchestrated reference-shaped loop BIT-exactly:
    same op order, same leaf arithmetic."""
    from fhe_tpu.tfhe import acc as accmod, params as tp
    import jax.numpy as jnp

    p = tp.make_params("TOY_LMKCDEY")
    ctx = BinFheContext.generate("TOY_LMKCDEY", method="LMKCDEY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    B = 4
    a = rng.integers(0, p.q, size=(B, p.n)).astype(np.uint32)
    acc0 = jnp.asarray(
        rng.integers(0, p.Q, size=(B, 2, p.N)).astype(np.uint32))
    want = accmod.blind_rotate_lmkcdey(p, key.rgsw, key.auto, acc0, a,
                                       "butterfly", None)
    got = accmod.blind_rotate_lmkcdey_scan(p, key.rgsw, key.auto, acc0, a,
                                           "butterfly", None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lmkcdey_gates_jitted_scan(rng):
    """End-to-end LMKCDEY gates through the default (jitted scan) path."""
    ctx = BinFheContext.generate("TOY_LMKCDEY", method="LMKCDEY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    ct1 = ctx.encrypt(sk, M1, rng)
    ct2 = ctx.encrypt(sk, M2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  M1 & M2)


# ---------------------------------------------------------------------------
# method/paramset compatibility (binfhe-constants-impl.cpp:266
# isMethodCompatible) — regression for the silent GINX-on-LMKCDEY-set bug:
# generate('STD128_LMKCDEY') used to default to GINX, whose two-column
# ternary CMUX key treats every |s_i| >= 2 of the set's GAUSSIAN secret
# as zero, producing wrong gates (~50% failure) with no error.
# ---------------------------------------------------------------------------

def test_method_auto_selected_for_lmkcdey_sets():
    ctx = BinFheContext.generate("STD128_LMKCDEY")
    assert ctx.params.method is tp.Method.LMKCDEY
    assert BinFheContext.generate("STD128").params.method is tp.Method.GINX
    # TOY/MEDIUM are any-method in the reference's compat table
    assert BinFheContext.generate(
        "TOY", method="LMKCDEY").params.method is tp.Method.LMKCDEY


def test_method_compat_mismatch_raises():
    with pytest.raises(ValueError, match="incompatible"):
        BinFheContext.generate("STD128_LMKCDEY", method="GINX")
    with pytest.raises(ValueError, match="incompatible"):
        BinFheContext.generate("STD128", method="LMKCDEY")


def test_ginx_bsk_rejects_nonternary_secret(rng):
    from fhe_tpu.tfhe import lwe, rgsw
    import jax.numpy as jnp
    p = tp.make_params("TOY")
    s = np.zeros(p.n, dtype=np.int32)
    s[0] = 2
    sk_bad = lwe.LweSecretKey(s=jnp.asarray(s))
    sk_n = lwe.keygen(p, rng, dim=p.N)
    with pytest.raises(ValueError, match="ternary"):
        rgsw.bsk_gen(p, sk_bad, sk_n, rng)


@pytest.mark.slow
def test_lmkcdey_gaussian_secret_gates(rng):
    """STD128_LMKCDEY (GAUSSIAN key_dist) truth table through the
    auto-selected LMKCDEY path — the exact configuration the GINX
    default silently broke."""
    ctx = BinFheContext.generate("STD128_LMKCDEY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    ct1 = ctx.encrypt(sk, M1, rng)
    ct2 = ctx.encrypt(sk, M2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  M1 & M2)
