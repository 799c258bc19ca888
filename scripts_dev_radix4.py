import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
import numpy as np
from fhe_tpu.tfhe import BinFheContext, lwe, radix, shortint, funcboot, boot
from fhe_tpu.tfhe.lwe import _dot_mod, _sk_mod
ctx = BinFheContext.generate('TOY_RADIX')
params = ctx.params
rng = np.random.default_rng(5)
sk = ctx.key_gen(rng)
sk_n = lwe.keygen(params, rng, dim=params.N)
key = ctx.bt_key_gen(sk, rng, sk_n=sk_n)
sp = radix.EUINT8.limb
q, p, Q = params.q, sp.p, params.Q
v = np.arange(16)
ct = shortint.encrypt(params, sp, sk, v, rng)
# identity LUT via ONE bootstrap_func call with a negacyclic-extended table
tab = funcboot.generate_lut(lambda x, pp: x, p, q)
ct1 = funcboot.add_const(ct, funcboot.BETA)
ext = None
# replicate bootstrap_func but stop at the extended ct (mod Q, under sk_n)
impl, plan, mxu = boot.resolve_ntt(params, None)
a = ct1.a.reshape(-1, params.n); b = ct1.b.reshape(-1)
factor = (2*params.N)//q
j = jnp.arange(q>>1, dtype=jnp.uint32)[None,:]
from fhe_tpu.math.modmath import sub_mod
bj = sub_mod(b[:,None], j, q)
fv = jnp.take(jnp.asarray(tab.astype(np.uint32)), bj.astype(jnp.int32), axis=0)
vals = jnp.uint32(Q//q)*fv
tv = jnp.zeros(b.shape+(params.N,), dtype=jnp.uint32).at[:, ::factor].set(vals)
acc = boot.bootstrap_core(params, key.bsk, tv, a, None, a_modulus=q, plan=plan, mxu=mxu)
ext = boot.extract_lwe(params, acc, jnp.asarray(np.uint32(0)), None, plan, mxu)
# phase under ring key mod Q
phQ = np.asarray(jnp.mod(ext.b - _dot_mod(ext.a, _sk_mod(sk_n, Q), Q), Q)).astype(np.int64)
want = ((v.astype(np.int64)*(q//p) + funcboot.BETA) % q)  # identity table: value scaled Q/q
wantQ = (tab[want].astype(np.int64)*(Q//q))
errQ = (phQ - wantQ + Q//2) % Q - Q//2
print('blind-rotate noise mod Q (in q-units, /16384):', (errQ/(Q//q)).round(2).tolist(), flush=True)
# then keyswitch chain
ms = lwe.mod_switch(ext, params.q_ks)
ks = lwe.key_switch(params, key.ksk, ms)
out = lwe.mod_switch(ks, q)
ph = np.asarray(jnp.mod(out.b - _dot_mod(out.a, _sk_mod(sk, q), q), q)).astype(np.int64)
err = (ph - tab[want].astype(np.int64) + q//2) % q - q//2
print('after ks chain, err (q units):', err.tolist(), flush=True)
