"""Cross-device collective tests on the 8-virtual-CPU mesh: the sharded
paths must be BIT-EXACT vs their single-device counterparts (the
reference's GPU-parity method is byte-equality, UnitTestMLX.cpp:40-116;
we hold sharded execution to the same bar)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fhe_tpu.lattice import rns
from fhe_tpu.lattice.rns import RnsPoly, COEFF, EVAL
from fhe_tpu.parallel import collective
from fhe_tpu.pke import ckks, multiparty, params as pkeparams, rlwe

N = 256


def _mesh(n, axis):
    return jax.make_mesh((n,), (axis,), devices=jax.devices()[:n],
                         axis_types=(jax.sharding.AxisType.Auto,))


# ---------------------------------------------------------------------------
# psum_mod
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_dev", [2, 8])
def test_psum_mod_exact(rng, n_dev):
    moduli = (536871001, 268369921, 1032193, 12289)
    q = np.array(moduli, dtype=np.uint64)
    x = (rng.integers(0, 1 << 62, size=(n_dev, len(moduli), 64))
         % q[None, :, None]).astype(np.uint32)
    want = (x.astype(np.uint64).sum(axis=0) % q[:, None]).astype(np.uint32)
    mesh = _mesh(n_dev, "p")

    def body(local):
        return collective.psum_mod(local[0], moduli, "p")

    got = jax.shard_map(body, mesh=mesh, in_specs=P("p"),
                        out_specs=P())(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_psum_mod_pow2(rng):
    q = 2048
    x = rng.integers(0, q, size=(8, 32)).astype(np.uint32)
    want = (x.astype(np.uint64).sum(axis=0) % q).astype(np.uint32)
    mesh = _mesh(8, "p")

    def body(local):
        return collective.psum_mod_pow2(local[0], q, "p")

    got = jax.shard_map(body, mesh=mesh, in_specs=P("p"),
                        out_specs=P())(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)


# ---------------------------------------------------------------------------
# P5: limb-sharded basis switch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("L,n_dev", [(6, 8), (8, 8), (5, 2)])
def test_switch_crt_basis_sharded_bitexact(rng, L, n_dev):
    p = pkeparams.make_ckks_params(N=N, num_levels=max(L, 8),
                                   scale_bits=28, dnum=2)
    from_mods = tuple(p.moduli[:L])
    to_mods = tuple(p.special_mods)
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in from_mods]).astype(np.uint32)
    x = RnsPoly(jnp.asarray(data), from_mods, COEFF)
    want = rns.switch_crt_basis_approx(x, to_mods)
    mesh = _mesh(n_dev, "limb")
    got = collective.switch_crt_basis_approx_sharded(x, to_mods, mesh,
                                                     "limb")
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))


# ---------------------------------------------------------------------------
# digit-sharded HYBRID key switch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("levels,dnum,n_dev", [(8, 8, 8), (8, 4, 4),
                                               (8, 3, 8), (6, 2, 2)])
def test_key_switch_sharded_bitexact(rng, levels, dnum, n_dev):
    p = pkeparams.make_ckks_params(N=N, num_levels=levels - 1,
                                   scale_bits=28, dnum=dnum)
    sk = rlwe.keygen(p, rng)
    s = sk.eval_poly(tuple(p.moduli))
    s2 = rns.mul(s, s)
    evk = rlwe.evk_gen(p, s2, sk, rng)
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in p.moduli]).astype(np.uint32)
    c = RnsPoly(jnp.asarray(data), tuple(p.moduli), EVAL)

    want0, want1 = rlwe.key_switch(p, evk, c)
    mesh = _mesh(n_dev, "digit")
    got0, got1 = collective.key_switch_sharded(p, evk, c, mesh, "digit")
    np.testing.assert_array_equal(np.asarray(got0.data),
                                  np.asarray(want0.data))
    np.testing.assert_array_equal(np.asarray(got1.data),
                                  np.asarray(want1.data))


def test_key_switch_sharded_truncated_basis(rng):
    """Sharded switch on a level-reduced ciphertext basis (fewer digits
    live than at full depth)."""
    p = pkeparams.make_ckks_params(N=N, num_levels=7, scale_bits=28, dnum=4)
    sk = rlwe.keygen(p, rng)
    s = sk.eval_poly(tuple(p.moduli))
    evk = rlwe.evk_gen(p, rns.mul(s, s), sk, rng)
    mods_l = tuple(p.moduli[:5])
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in mods_l]).astype(np.uint32)
    c = RnsPoly(jnp.asarray(data), mods_l, EVAL)
    want0, want1 = rlwe.key_switch(p, evk, c)
    got0, got1 = collective.key_switch_sharded(p, evk, c, _mesh(8, "digit"),
                                               "digit")
    np.testing.assert_array_equal(np.asarray(got0.data),
                                  np.asarray(want0.data))
    np.testing.assert_array_equal(np.asarray(got1.data),
                                  np.asarray(want1.data))


def test_ckks_mult_with_sharded_relin_decrypts(rng):
    """End-to-end: CKKS mult whose relinearization key switch runs
    digit-sharded over the mesh must decrypt to the product."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=4)
    p = ctx.params
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key_gen(sk, rng)
    z1 = rng.normal(size=N // 2) * 0.5
    z2 = rng.normal(size=N // 2) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    # tensor product by hand, then sharded key switch of the c2 component
    d0 = rns.mul(ct1.c0, ct2.c0)
    d1 = rns.add(rns.mul(ct1.c0, ct2.c1), rns.mul(ct1.c1, ct2.c0))
    d2 = rns.mul(ct1.c1, ct2.c1)
    mesh = _mesh(4, "digit")
    k0, k1 = collective.key_switch_sharded(p, rlk, d2, mesh, "digit")
    c0 = rns.add(d0, k0)
    c1 = rns.add(d1, k1)
    prod = ckks.Ciphertext(c0=c0, c1=c1, scale=ct1.scale * ct2.scale)
    got = ctx.decrypt(sk, ctx.rescale(prod))
    np.testing.assert_allclose(got.real, z1 * z2, atol=0.05)


# ---------------------------------------------------------------------------
# P6: party-sharded fusion
# ---------------------------------------------------------------------------

def test_fuse_sharded_bitexact(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1, rng)
    mains = [multiparty.decrypt_main(ctx.params, sk, ct.c1, rng)
             for sk in sks[1:]]
    shares = [lead] + mains
    want = multiparty.fuse(shares)
    stacked = jnp.stack([s.share.data for s in shares])
    got = collective.fuse_sharded(stacked, tuple(ct.c0.moduli),
                                  _mesh(5, "party"), "party")
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
    # and it still decrypts
    big = rns.to_bigint(got)
    Q = 1
    for q in ct.moduli:
        Q *= q
    val = ckks.decode(ckks._center(big, Q), N, ct.scale)
    np.testing.assert_allclose(val.real, z, atol=0.6)


def test_threshold_combine_sharded(rng):
    q = 2048
    partials = rng.integers(0, q, size=(5, 16)).astype(np.uint32)
    want = (partials.astype(np.uint64).sum(axis=0) % q).astype(np.uint32)
    got = collective.threshold_combine_sharded(
        jnp.asarray(partials), q, _mesh(5, "party"), "party")
    np.testing.assert_array_equal(np.asarray(got), want)
