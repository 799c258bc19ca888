"""Pallas TPU kernel: fused negacyclic NTT/INTT butterfly pipeline.

The role of the reference GPU backend's fused threadgroup NTT
(/root/reference/src/core/include/math/hal/mlx/metal_dispatch_optimized.h
ntt_forward_fused/ntt_inverse_fused :190-335 -- load once, run all log N
stages with barriers in shared memory, fused N^-1 scale), re-architected
for the TPU memory hierarchy:

* one `pallas_call` keeps a [tile, N] batch block resident in VMEM for
  all log2(N) stages -- zero HBM round-trips between stages (the XLA
  butterfly path materializes inter-stage tensors);
* butterflies are expressed as two lane-rolls + masked selects per stage
  (never reshapes or gathers, which fight the 8x128 tiling): the pair
  partner of lane i at distance t is roll(x, +-t), and per-position
  Shoup twiddles are host-precomputed [logN, N] tables;
* the final bit-reversal permutation stays an XLA gather outside the
  kernel (cheap, fuses with neighbors); the N^-1 scale of the inverse is
  fused into the kernel.

Correctness anchor: bit-exact against math.ntt.forward_butterfly /
inverse_butterfly (tests run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import U32, u32, add_mod, sub_mod, shoup_mul, shoup_precompute
from . import ntt as nttmod


@functools.lru_cache(maxsize=None)
def _stage_tables(N: int, q: int) -> tuple[np.ndarray, ...]:
    """Per-stage per-position twiddle tables [logN, N] (plain + Shoup):
    forward stage s uses w[m + i//(2t)] with m=2^s, t=N>>(s+1);
    inverse stage s uses w_inv[h + i//(2t)] with h=N>>(s+1), t=2^s."""
    plan = nttmod.make_plan(N, q)
    logN = plan.logN
    fwd_w = np.asarray(plan.fwd_w)
    inv_w = np.asarray(plan.inv_w)
    i = np.arange(N)
    f_tw = np.zeros((logN, N), dtype=np.uint32)
    g_tw = np.zeros((logN, N), dtype=np.uint32)
    for s in range(logN):
        m, t = 1 << s, N >> (s + 1)
        f_tw[s] = fwd_w[m + i // (2 * t)]
        h, ti = N >> (s + 1), 1 << s
        g_tw[s] = inv_w[h + i // (2 * ti)]
    mk = lambda w: np.array([[shoup_precompute(int(x), q) for x in row]
                             for row in w], dtype=np.uint32)
    return f_tw, mk(f_tw), g_tw, mk(g_tw)


def _roll(x, shift, N):
    return pltpu.roll(x, shift % N, axis=1)


def _fwd_kernel(x_ref, tw_ref, tws_ref, out_ref, *, N, logN, q):
    x = x_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 1)
    for s in range(logN):
        t = N >> (s + 1)
        lo = ((pos // u32(t)) & u32(1)) == 0
        partner = jnp.where(lo, _roll(x, -t, N), _roll(x, t, N))
        tw = tw_ref[s, :][None, :]
        tws = tws_ref[s, :][None, :]
        v = jnp.where(lo, partner, x)
        wv = shoup_mul(v, tw, tws, q)
        x = jnp.where(lo, add_mod(x, wv, q), sub_mod(partner, wv, q))
    out_ref[:] = x


def _inv_kernel(x_ref, tw_ref, tws_ref, ninv_ref, out_ref, *, N, logN, q):
    x = x_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 1)
    for s in range(logN):
        t = 1 << s
        lo = ((pos // u32(t)) & u32(1)) == 0
        partner = jnp.where(lo, _roll(x, -t, N), _roll(x, t, N))
        tw = tw_ref[s, :][None, :]
        tws = tws_ref[s, :][None, :]
        x = jnp.where(lo, add_mod(x, partner, q),
                      shoup_mul(sub_mod(partner, x, q), tw, tws, q))
    ninv = ninv_ref[0, 0]
    ninv_s = ninv_ref[0, 1]
    out_ref[:] = shoup_mul(x, ninv, ninv_s, q)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _call(kernel, plan, x2d, extra, tile):
    N, q = plan.N, plan.q
    B = x2d.shape[0]
    Bp = -(-B // tile) * tile
    if Bp != B:
        x2d = jnp.pad(x2d, ((0, Bp - B), (0, 0)))
    grid = (Bp // tile,)
    in_specs = [pl.BlockSpec((tile, N), lambda i: (i, 0),
                             memory_space=pltpu.ANY
                             if _interpret() else pltpu.VMEM)]
    for arr in extra:
        in_specs.append(pl.BlockSpec(
            arr.shape, (lambda i, nd=arr.ndim: (0,) * nd),
            memory_space=pltpu.ANY if _interpret() else pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, N), lambda i: (i, 0),
                               memory_space=pltpu.ANY
                               if _interpret() else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.uint32),
        interpret=_interpret(),
    )(x2d, *extra)
    return out[:B]


def forward_pallas(plan: nttmod.NttPlan, x: jax.Array,
                   tile: int = 64, out_br: bool = False) -> jax.Array:
    """[..., N] uint32 COEFFICIENT -> EVALUATION.

    out_br=True returns the kernel's native bit-reversed order (skips the
    final permutation; the fused blind-rotate keeps everything BR)."""
    N, q = plan.N, plan.q
    f_tw, f_tws, _, _ = _stage_tables(N, q)
    host_plan = nttmod.make_plan(N, q)     # concrete tables even under jit
    lead = x.shape[:-1]
    x2 = x.reshape(-1, N)
    tile = min(tile, -(-x2.shape[0] // 8) * 8)   # multiple of 8 sublanes
    out = _call(functools.partial(_fwd_kernel, N=N, logN=plan.logN, q=q),
                plan, x2, (jnp.asarray(f_tw), jnp.asarray(f_tws)), tile)
    if not out_br:
        out = jnp.take(out, jnp.asarray(np.asarray(host_plan.br)),
                       axis=-1)            # bit-reversed -> natural
    return out.reshape(*lead, N)


def inverse_pallas(plan: nttmod.NttPlan, x: jax.Array,
                   tile: int = 64, in_br: bool = False) -> jax.Array:
    """[..., N] uint32 EVALUATION -> COEFFICIENT (natural order).

    in_br=True: input already in bit-reversed evaluation order."""
    N, q = plan.N, plan.q
    _, _, g_tw, g_tws = _stage_tables(N, q)
    lead = x.shape[:-1]
    host_plan = nttmod.make_plan(N, q)     # concrete tables even under jit
    x2 = x.reshape(-1, N)
    if not in_br:
        x2 = jnp.take(x2, jnp.asarray(np.asarray(host_plan.br)),
                      axis=-1)             # natural -> BR
    tile = min(tile, -(-x2.shape[0] // 8) * 8)   # multiple of 8 sublanes
    ninv = jnp.asarray(
        np.array([[np.asarray(host_plan.ninv), np.asarray(host_plan.ninv_s)]],
                 dtype=np.uint32))
    out = _call(functools.partial(_inv_kernel, N=N, logN=plan.logN, q=q),
                plan, x2, (jnp.asarray(g_tw), jnp.asarray(g_tws), ninv),
                tile)
    return out.reshape(*lead, N)
