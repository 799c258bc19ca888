import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, schemeswitch as ss
from fhe_tpu.pke.ckks import Ciphertext
from fhe_tpu.pke.bootstrap import bsgs_linear_transform
from fhe_tpu.lattice import rns
from fhe_tpu.tfhe import BinFheContext
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=11, scale_bits=26, dnum=2)
rng = np.random.default_rng(22)
sk, pk = ctx.keygen(rng)
evk = ctx.relin_key_gen(sk, rng)
tctx = BinFheContext.generate('TOY')
tsk = tctx.key_gen(rng)
k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
m = rng.integers(0, 2, size=32)
cts = tctx.encrypt(tsk, m, rng)
q = cts.modulus
B = 32
a = np.asarray(cts.a, dtype=np.float64).reshape(B, -1)
b = np.asarray(cts.b, dtype=np.float64).reshape(B)
n_f = a.shape[1]
M = np.zeros((SLOTS, SLOTS)); M[:B, :n_f] = a / q
d_enc = ctx.decrypt(sk, k2.enc_sk).real
s_true = np.asarray(tsk.s, dtype=np.float64)
print('enc_sk err:', np.abs(d_enc[:n_f] - s_true).max())
As = bsgs_linear_transform(ctx, k2.enc_sk, M, k2.rot_keys, k2.bsgs_g)
dAs = ctx.decrypt(sk, As).real
want_As = (M @ np.concatenate([s_true, np.zeros(SLOTS-n_f)]))
print('As err:', np.abs(dAs - want_As).max(), 'As scale %.5g L%d' % (As.scale, len(As.moduli)))
bz = np.zeros(SLOTS); bz[:B] = b / q
phase = ctx.add_plain(Ciphertext(rns.neg(As.c0), rns.neg(As.c1), As.scale), bz)
dp = ctx.decrypt(sk, phase).real
want_p = bz - want_As
print('phase err:', np.abs(dp - want_p).max())
print('phase values sample:', np.round(dp[:8], 4), 'm:', m[:8])
