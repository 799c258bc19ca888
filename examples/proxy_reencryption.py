"""Proxy re-encryption (reference: pre-buffer.cpp, pre-hra-secure.cpp,
UnitTestMultihopPRE): Alice's ciphertext becomes Bob's without
decryption, chained A->B->C multi-hop, with HRA rerandomization when the
target public key is supplied."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import bgv, ckks, pre

rng = np.random.default_rng(11)

# -- BGV single hop with HRA-secure rerandomization --
ctx = bgv.BgvContext.create(N=256, num_levels=2, plain_mod=65537,
                            mod_bits=28, dnum=2)
sk_a, pk_a = ctx.keygen(rng)
sk_b, pk_b = ctx.keygen(rng)
rk_ab = pre.re_key_gen(ctx.params, sk_a, sk_b, rng)
m = rng.integers(0, 65537, size=256)
ct = ctx.encrypt(pk_a, m, rng)
c0, c1 = pre.re_encrypt(ctx.params, rk_ab, ct.c0, ct.c1, rng, pk_b)
got = np.asarray(ctx.decrypt(sk_b, bgv.Ciphertext(c0, c1)))
assert np.array_equal(got, m % 65537)
print("BGV PRE (HRA rerandomized): Bob decrypts Alice's data: OK")

# -- CKKS 2-hop chain A -> B -> C --
cctx = ckks.CkksContext.create(N=256, num_levels=3, scale_bits=26, dnum=2)
keys = [cctx.keygen(rng) for _ in range(3)]
rk1 = pre.re_key_gen(cctx.params, keys[0][0], keys[1][0], rng)
rk2 = pre.re_key_gen(cctx.params, keys[1][0], keys[2][0], rng)
z = rng.normal(size=128)
ct = cctx.encrypt(keys[0][1], z, rng)
c0, c1 = pre.re_encrypt(cctx.params, rk1, ct.c0, ct.c1)
c0, c1 = pre.re_encrypt(cctx.params, rk2, c0, c1)
got = cctx.decrypt(keys[2][0], ckks.Ciphertext(c0, c1, ct.scale))
err = np.abs(got.real - z).max()
print(f"CKKS 2-hop PRE max error {err:.2e}")
assert err < 2e-2
print("proxy re-encryption: OK")
