"""2-party interactive CKKS bootstrapping (reference:
interactive-bootstrapping.cpp): refresh an exhausted joint ciphertext
without the sine machinery."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import ckks, multiparty

ctx = ckks.CkksContext.create(N=256, num_levels=6, scale_bits=26, dnum=2)
rng = np.random.default_rng(6)
sks, pk = multiparty.multiparty_keygen(ctx.params, 2, rng)
z = rng.normal(size=128) * 0.5
ct = ctx.encrypt(pk, z, rng)

low = multiparty.int_boot_adjust_scale(ctx, ct)
print("compressed to", len(low.moduli), "limb(s)")
a = multiparty.int_mp_boot_random_gen(ctx.params, rng)
shares = [multiparty.int_mp_boot_decrypt(ctx.params, s, low, a, rng)
          for s in sks]
fresh = multiparty.int_mp_boot_encrypt(
    ctx.params, low, multiparty.int_mp_boot_add(shares), a)
print("refreshed to", len(fresh.moduli), "limbs")
assert len(fresh.moduli) == len(ctx.params.moduli)
print("interactive bootstrapping: OK")
