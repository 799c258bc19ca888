"""CKKS approximate arithmetic (reference: simple-real-numbers.cpp):
encrypt vectors, add/multiply/rotate, decrypt."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import ckks

ctx = ckks.CkksContext.create(N=256, num_levels=4, scale_bits=28, dnum=2)
rng = np.random.default_rng(2)
sk, pk = ctx.keygen(rng)
evk = ctx.relin_key_gen(sk, rng)
rot_keys = ctx.rotation_key_gen(sk, [1], rng)

x = rng.normal(size=128) * 0.5
y = rng.normal(size=128) * 0.5
cx, cy = ctx.encrypt(pk, x, rng), ctx.encrypt(pk, y, rng)

s = ctx.decrypt(sk, ctx.add(cx, cy)).real
p = ctx.decrypt(sk, ctx.rescale(ctx.mul(cx, cy, evk))).real
r = ctx.decrypt(sk, ctx.rotate(cx, 1, rot_keys)).real
print("add err  ", np.abs(s - (x + y)).max())
print("mul err  ", np.abs(p - x * y).max())
print("rot err  ", np.abs(r - np.roll(x, -1)).max())
assert np.abs(s - (x + y)).max() < 1e-3
assert np.abs(p - x * y).max() < 1e-3
print("ckks basics: OK")
