"""Batch API tests (binfhe-batch.h analogue): gate/bootstrap/func
batches over an 8-device mesh, flags, async futures, partial-failure
reporting."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate
from fhe_tpu.parallel import batch as pb


@pytest.fixture(scope="module")
def toy():
    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(31)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    return ctx, sk, key, rng


def test_gate_batch_sharded(toy):
    ctx, sk, key, rng = toy
    mesh = pb.make_mesh()
    m1 = rng.integers(0, 2, size=16)
    m2 = rng.integers(0, 2, size=16)
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    out, res = pb.eval_bin_gate_batch(ctx, key, Gate.AND, ct1, ct2,
                                      mesh=mesh)
    assert res.success and res.processed == 16
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  m1 & m2)


def test_bootstrap_batch_async(toy):
    ctx, sk, key, rng = toy
    m = rng.integers(0, 2, size=8)
    ct = ctx.encrypt(sk, m, rng)
    fut, res = pb.bootstrap_batch(ctx, key, ct, flags=pb.BatchFlags.ASYNC)
    assert res.success
    assert isinstance(fut, pb.BatchFuture)
    out = fut.result()
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  m)


def test_no_bootstrap_flag(toy):
    ctx, sk, key, rng = toy
    m = rng.integers(0, 2, size=4)
    ct = ctx.encrypt(sk, m, rng)
    out, res = pb.bootstrap_batch(ctx, key, ct,
                                  flags=pb.BatchFlags.NO_BOOTSTRAP)
    assert res.success and out is ct


def test_failure_reporting(toy):
    ctx, sk, key, rng = toy
    m = rng.integers(0, 2, size=4)
    ct = ctx.encrypt(sk, m, rng)
    bad = ct.__class__(a=ct.a[..., :10], b=ct.b, modulus=ct.modulus,
                       pt_mod=ct.pt_mod)    # wrong dimension
    out, res = pb.eval_bin_gate_batch(ctx, key, Gate.AND, bad, bad)
    assert not res.success and res.failed == 4 and res.error
