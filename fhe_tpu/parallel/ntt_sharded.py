"""Coefficient-axis (ring-dimension) sharded NTT over a device mesh.

SURVEY P7: the reference has no analogue (single-process OpenMP); its
four-step NTT (/root/reference/src/core/include/math/hal/mlx/
ntt_fourstep.h:1-14) decomposes one length-N transform into row DFTs ->
twiddle -> transpose -> column DFTs for GPU layouts.  Here the SAME
decomposition becomes the cross-chip sharding scheme: with N = n1*n2 the
[n1, n2] matrix view is sharded on n1 (one block of rows per device),
the row DFTs and twiddles are device-local MXU matmuls, and the single
transpose in the middle is ONE `jax.lax.all_to_all` over the mesh axis
-- the textbook distributed-FFT exchange, riding ICI.

Layouts (device count D along mesh axis `axis`):
  COEF-sharded  x[b, i1_local, i2]   i = i1 + n1*i2, i1 sharded
  EVAL-sharded  X[b, k2_local, k1]   k = k1*n2 + k2, k2 sharded

A negacyclic product never needs the natural order in between:
forward (COEF->EVAL), pointwise Montgomery mult in the EVAL-sharded
layout, inverse (EVAL->COEF) -- coefficients only cross chips in the
two all_to_alls.  Bit-exact vs math.ntt_fourstep (same tables, same
Montgomery arithmetic; tested on the 8-device CPU mesh).

Only pays off for rings too large for one chip's VMEM/HBM working set
(N >= 2^16) or when the rest of the pipeline is already
coefficient-sharded; batch/limb sharding remain the first choice
(SURVEY section 5 long-context note)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..math import ntt_fourstep as fs
from ..math.modmath import mont_mul, u32


@functools.lru_cache(maxsize=None)
def _tables_2d(N: int, q: int):
    """Four-step tables with the flat twist/untwist re-laid out to the
    [n1, n2] matrix view so they shard along n1 with the data."""
    t = fs.make_fourstep(N, q)
    n1, n2 = t["n1"], t["n2"]
    with jax.ensure_compile_time_eval():
        # flat index i = i1 + n1*i2  ->  [i1, i2]
        twist2 = jnp.asarray(np.asarray(t["twist_f"]).reshape(n2, n1).T)
        untwist2 = jnp.asarray(np.asarray(t["untwist"]).reshape(n2, n1).T)
    return dict(t, twist2=twist2, untwist2=untwist2)


def shard_coef(x: jax.Array, mesh: Mesh, axis: str = "c") -> jax.Array:
    """[..., N] natural COEFFICIENT order -> COEF-sharded [..., n1, n2]."""
    N = x.shape[-1]
    n1, n2 = fs._split(N)
    y = x.reshape(*x.shape[:-1], n2, n1)
    y = jnp.swapaxes(y, -1, -2)                       # [..., n1, n2]
    spec = P(*([None] * (y.ndim - 2)), axis, None)
    return jax.device_put(y, NamedSharding(mesh, spec))


def unshard_coef(y: jax.Array) -> jax.Array:
    """COEF-sharded [..., n1, n2] -> natural [..., N] (host gather)."""
    z = jnp.swapaxes(y, -1, -2)                       # [..., n2, n1]
    return z.reshape(*z.shape[:-2], z.shape[-2] * z.shape[-1])


def unshard_eval(Y: jax.Array) -> jax.Array:
    """EVAL-sharded [..., n2, n1] -> natural EVAL order [..., N]."""
    z = jnp.swapaxes(Y, -1, -2)                       # [..., n1, n2]
    return z.reshape(*z.shape[:-2], z.shape[-2] * z.shape[-1])


def _local_fwd(plan, t, xloc, tw_loc, twd_loc):
    """Device-local forward half-steps around the all_to_all.

    xloc [B, n1/D, n2]: twist, DFT over i2, twiddle."""
    y = mont_mul(xloc, tw_loc[None], plan.q, u32(plan.qinv_neg))
    Z = fs._mm(plan, y, t["W2f"], t["n2"])
    return mont_mul(Z, twd_loc[None], plan.q, u32(plan.qinv_neg))


def forward_sharded(N: int, q: int, mesh: Mesh, axis: str = "c"):
    """Build the jittable COEF-sharded -> EVAL-sharded transform.

    Returns fn(x_sharded [B, n1, n2]) -> [B, n2, n1] EVAL-sharded."""
    t = _tables_2d(N, q)
    plan = t["plan"]
    n1, n2 = t["n1"], t["n2"]
    D = mesh.shape[axis]
    assert n1 % D == 0 and n2 % D == 0, (n1, n2, D)

    def body(xloc, tw_loc, twd_loc):
        Z = _local_fwd(plan, t, xloc, tw_loc, twd_loc)   # [B, n1/D, n2]
        # distributed transpose: split k2 across devices, gather i1
        Zt = jax.lax.all_to_all(Z, axis, split_axis=2, concat_axis=1,
                                tiled=True)              # [B, n1, n2/D]
        Zt = jnp.swapaxes(Zt, 1, 2)                      # [B, n2/D, n1]
        return fs._mm(plan, Zt, t["W1f"], n1)            # DFT over i1

    sh = lambda *spec: P(*spec)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh(None, axis, None), sh(axis, None), sh(axis, None)),
        out_specs=sh(None, axis, None),
    )), (t["twist2"], t["tw_f"])


def inverse_sharded(N: int, q: int, mesh: Mesh, axis: str = "c"):
    """EVAL-sharded [B, n2, n1] -> COEF-sharded [B, n1, n2]."""
    t = _tables_2d(N, q)
    plan = t["plan"]
    n1, n2 = t["n1"], t["n2"]
    D = mesh.shape[axis]
    assert n1 % D == 0 and n2 % D == 0

    def body(Xloc, twi_loc, untw_loc):
        # Xloc [B, n2/D, n1]: undo DFT over i1, transpose back, undo rest
        Zt = fs._mm(plan, Xloc, t["W1i"], n1)            # [B, n2/D, n1]
        Zt = jnp.swapaxes(Zt, 1, 2)                      # [B, n1, n2/D]
        Z = jax.lax.all_to_all(Zt, axis, split_axis=1, concat_axis=2,
                               tiled=True)               # [B, n1/D, n2]
        Z = mont_mul(Z, twi_loc[None], plan.q, u32(plan.qinv_neg))
        Y = fs._mm(plan, Z, t["W2i"], n2)
        return mont_mul(Y, untw_loc[None], plan.q, u32(plan.qinv_neg))

    sh = lambda *spec: P(*spec)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh(None, axis, None), sh(axis, None), sh(axis, None)),
        out_specs=sh(None, axis, None),
    )), (t["tw_i"], t["untwist2"])


def negacyclic_mul_sharded(N: int, q: int, mesh: Mesh, axis: str = "c"):
    """Whole sharded negacyclic product a*b mod (X^N+1, q): two sharded
    forwards, an EVAL-sharded pointwise Montgomery mult (needs one extra
    *R^2 to stay in plain form), one sharded inverse.  One compiled fn."""
    t = _tables_2d(N, q)
    plan = t["plan"]
    n1, n2 = t["n1"], t["n2"]
    with jax.ensure_compile_time_eval():
        r2 = jnp.asarray((1 << 64) % q, dtype=jnp.uint32)

    def body(a, b, tw_loc, twd_loc, twi_loc, untw_loc):
        A = _fwd_local_chain(plan, t, a, tw_loc, twd_loc, axis)
        B = _fwd_local_chain(plan, t, b, tw_loc, twd_loc, axis)
        # plain*plain via Montgomery: (aR^-1 b) * R^2 * R^-1 = ab
        AB = mont_mul(A, B, plan.q, u32(plan.qinv_neg))
        AB = mont_mul(AB, r2, plan.q, u32(plan.qinv_neg))
        Zt = fs._mm(plan, AB, t["W1i"], n1)
        Zt = jnp.swapaxes(Zt, 1, 2)
        Z = jax.lax.all_to_all(Zt, axis, split_axis=1, concat_axis=2,
                               tiled=True)
        Z = mont_mul(Z, twi_loc[None], plan.q, u32(plan.qinv_neg))
        Y = fs._mm(plan, Z, t["W2i"], n2)
        return mont_mul(Y, untw_loc[None], plan.q, u32(plan.qinv_neg))

    sh = lambda *spec: P(*spec)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh(None, axis, None), sh(None, axis, None),
                  sh(axis, None), sh(axis, None),
                  sh(axis, None), sh(axis, None)),
        out_specs=sh(None, axis, None),
    ))
    tabs = (t["twist2"], t["tw_f"], t["tw_i"], t["untwist2"])
    return fn, tabs


def _fwd_local_chain(plan, t, xloc, tw_loc, twd_loc, axis):
    Z = _local_fwd(plan, t, xloc, tw_loc, twd_loc)
    Zt = jax.lax.all_to_all(Z, axis, split_axis=2, concat_axis=1,
                            tiled=True)
    Zt = jnp.swapaxes(Zt, 1, 2)
    return fs._mm(plan, Zt, t["W1f"], t["n1"])
