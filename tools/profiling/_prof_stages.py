"""Per-stage timing of the STD128 blind-rotate step on the TPU.

Each stage is repeated R times inside ONE jitted lax.scan (with a cheap
shape-restoring feedback so XLA cannot dead-code it) -- amortizes host
dispatch, which otherwise dominates (~36 ms/call on a contended host vs
~3 ms of device work)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fhe_tpu.tfhe import params as tp, boot, rgsw
from fhe_tpu.math import ntt as nttmod
from fhe_tpu.math.modmath import U32, add_mod, u32

B = 2048
R = 30
params = tp.make_params("STD128")
N, Q, n = params.N, params.Q, params.n
impl, plan, mxu = boot.resolve_ntt(params, None)
dG2 = 2 * (params.digits_g - 1)
print("impl:", impl, "N:", N, "n:", n, "Q:", Q, "dG2:", dG2, "B:", B)

rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, Q, size=(B, 2, N)).astype(np.uint32))
digits0 = jnp.asarray(rng.integers(-params.base_g // 2, params.base_g // 2,
                                   size=(B, dG2, N)).astype(np.int32))
d_eval0 = jnp.asarray(rng.integers(0, Q, size=(B, dG2, N)).astype(np.uint32))
bsk_i = jnp.asarray(rng.integers(0, Q, size=(2, dG2, 2, N)).astype(np.uint32))
idx0 = jnp.asarray(rng.integers(0, 2 * N, size=B).astype(np.uint32))
mono0 = jnp.asarray(rng.integers(0, Q, size=(B, N)).astype(np.uint32))


def timeit_scan(name, body, init):
    f = jax.jit(lambda c: lax.scan(lambda c, _: (body(c), None), c,
                                   None, length=R)[0])
    out = f(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:28s} {dt:8.3f} ms  (x{n} = {dt*n/1e3:7.2f} s/scan)")


timeit_scan("ntt_inverse [B,2,N]",
            lambda c: nttmod.ntt_inverse(plan, c, impl, mxu), acc)

timeit_scan("ntt_forward [B,2,N]",
            lambda c: nttmod.ntt_forward(plan, c, impl, mxu), acc)

timeit_scan("digit_decompose",
            lambda c: (rgsw.signed_digit_decompose(params, c)[:, :2, :]
                       % jnp.int32(Q)).astype(U32), acc)

timeit_scan("ntt_signed_digits",
            lambda d: ((rgsw.ntt_signed_digits(plan, d, impl, mxu)
                        & jnp.uint32(511)).astype(jnp.int32)
                       - jnp.int32(256)), digits0)

timeit_scan("external_product (x1 key)",
            lambda d: jnp.concatenate(
                [rgsw.external_product(plan, d, bsk_i[0])] * (dG2 // 2),
                axis=1), d_eval0)

timeit_scan("monomial_pair",
            lambda i: boot.monomial_pair_eval(params, i)[0][:, 0]
            & jnp.uint32(2 * N - 1), idx0)

timeit_scan("pointwise_mont [B,2,N]",
            lambda c: nttmod.pointwise_mont(plan, c, mono0[:, None, :]), acc)

timeit_scan("add_mod [B,2,N]", lambda c: add_mod(c, acc, Q), acc)


def whole(st):
    a, i = st
    c = nttmod.ntt_inverse(plan, a, impl, mxu)
    digits = rgsw.signed_digit_decompose(params, c)
    d_eval = rgsw.ntt_signed_digits(plan, digits, impl, mxu)
    ep_pos = rgsw.external_product(plan, d_eval, bsk_i[0])
    ep_neg = rgsw.external_product(plan, d_eval, bsk_i[1])
    mp, mn = boot.monomial_pair_eval(params, i)
    upd = add_mod(nttmod.pointwise_mont(plan, ep_pos, mp[:, None, :]),
                  nttmod.pointwise_mont(plan, ep_neg, mn[:, None, :]), Q)
    return (add_mod(a, upd, Q), i)


timeit_scan("WHOLE STEP", whole, (acc, idx0))
