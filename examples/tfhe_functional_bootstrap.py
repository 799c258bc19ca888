"""TFHE functional bootstrapping family (reference:
src/binfhe/examples/eval-function.cpp, eval-flooring.cpp, eval-sign.cpp,
eval-decomp.cpp): arbitrary-LUT EvalFunc, large-precision EvalFloor,
EvalSign over an extended modulus, and EvalDecomp digit extraction."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.tfhe import BinFheContext, funcboot

ctx = BinFheContext.generate("TOY")
rng = np.random.default_rng(4)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)
par = ctx.params

# -- EvalFunc: f(m) = m^2 mod p over the context's LUT plaintext space --
p = max(ctx.max_plaintext_space, 4)
lut = ctx.generate_lut(lambda m, pp: (m * m) % pp, p)
m = np.arange(p)
out = ctx.eval_func(key, ctx.encrypt(sk, m, rng, p=p), lut)
got = np.asarray(ctx.decrypt(sk, out, p=p))
print(f"EvalFunc m^2 mod {p}: {got.tolist()}")
assert np.array_equal(got, (m * m) % p)

# -- EvalFloor: drop the low bits of a large-precision ciphertext --
big_mod = par.q * 8
msgs = np.array([3, 5, 1, 7])
ct = ctx.encrypt(sk, msgs, rng, p=8, modulus=big_mod)
fl = funcboot.eval_floor(par, key, ct)
got = np.asarray(ctx.decrypt(sk, fl, p=8))
print(f"EvalFloor: {got.tolist()} expected {msgs.tolist()}")
assert np.array_equal(got, msgs)

# -- EvalSign: MSB of a value under an extended modulus --
vals = np.array([1, 3, 5, 7])        # top half of p=8 -> sign 1
ct = ctx.encrypt(sk, vals, rng, p=8, modulus=big_mod)
sg = funcboot.eval_sign(par, key, ct)
got = np.asarray(ctx.decrypt(sk, sg, p=2))
want = (vals >= 4).astype(int)
print(f"EvalSign: {got.tolist()} expected {want.tolist()}")
assert np.array_equal(got, want)

# -- EvalDecomp: digit decomposition of a large message --
ct = ctx.encrypt(sk, np.array([5, 6]), rng, p=8, modulus=big_mod)
digits = funcboot.eval_decomp(par, key, ct)
print(f"EvalDecomp produced {len(digits)} digit ciphertexts")
assert len(digits) >= 1
print("functional bootstrap family: OK")
