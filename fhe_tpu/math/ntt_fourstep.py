"""Four-step NTT: large-N negacyclic transforms as MXU matmul pairs.

Reference semantics: /root/reference/src/core/include/math/hal/mlx/
ntt_fourstep.h:1-14 (N = n1*n2 decomposition: row DFTs -> twiddle scale
-> transpose -> column DFTs, built for GPU throughput layouts), here
mapped onto the TPU MXU: both DFT factors are dense [n_i, n_i] matrices
in the int8 digit-plane encoding of math.ntt, so one large-N transform
becomes two batched int8 matmuls + one pointwise Montgomery twiddle --
O(N * (n1 + n2)) multiplies with perfect 128x128 systolic tiling, where
the dense single-matrix path would need an infeasible [dN, dN] operand
(1 GB at N = 8192).

Negacyclic reduction: X[k] = sum_i x_i psi^{i(2k+1)} = DFT_N(x .* psi^i)
with omega = psi^2, so a pre/post twist turns the cyclic four-step into
the negacyclic transform with natural-order output (bit-exact vs
forward_butterfly)."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .modmath import mont_mul, u32
from . import ntt as nttmod


@functools.lru_cache(maxsize=None)
def _split(N: int) -> tuple[int, int]:
    n1 = 1 << ((N.bit_length() - 1) // 2)
    return n1, N // n1


@functools.lru_cache(maxsize=None)
def make_fourstep(N: int, q: int):
    """Tables for the (N, q) four-step plan: int8 digit matrices for the
    two DFT factors, Montgomery twist/twiddle tables."""
    with jax.ensure_compile_time_eval():
        return _make_fourstep(N, q)


def _make_fourstep(N: int, q: int):
    plan = nttmod.make_plan(N, q)
    n1, n2 = _split(N)
    psi = plan.psi
    omega = pow(psi, 2, q)
    d = plan.d_full

    def pow_table(base: int, length: int) -> np.ndarray:
        out = np.zeros(length, dtype=np.uint64)
        acc = 1
        for i in range(length):
            out[i] = acc
            acc = acc * base % q
        return out

    def dft_mat(root: int, n: int, inverse: bool) -> np.ndarray:
        r = pow(root, -1, q) if inverse else root
        pows = pow_table(r, n)
        ij = np.outer(np.arange(n), np.arange(n)) % n
        return pows[ij]

    def digits(M: np.ndarray) -> jnp.ndarray:
        in_w = [1 << (7 * u) for u in range(d)]
        return jnp.asarray(nttmod._build_digit_matrix(M, q, d, d, in_w))

    mont = lambda x: jnp.asarray(((x.astype(np.object_) << 32) %
                                  q).astype(np.uint64).astype(np.uint32))

    # forward tables
    W2f = digits(dft_mat(pow(omega, n1, q), n2, False))   # [dn2, dn2]
    W1f = digits(dft_mat(pow(omega, n2, q), n1, False))   # [dn1, dn1]
    # T[i1, k2] = omega^(i1*k2), i1 < n1, k2 < n2
    i1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    om_pows = pow_table(omega, N)
    tw_f = mont(om_pows[(i1 * k2) % N])
    twist_f = mont(pow_table(psi, N))                     # psi^i
    # inverse tables
    W2i = digits(dft_mat(pow(omega, n1, q), n2, True))
    W1i = digits(dft_mat(pow(omega, n2, q), n1, True))
    om_inv = pow(omega, -1, q)
    omi_pows = pow_table(om_inv, N)
    tw_i = mont(omi_pows[(i1 * k2) % N])
    psi_inv = pow(psi, -1, q)
    ninv = pow(N, -1, q)
    untwist = mont((pow_table(psi_inv, N) * ninv) % q)    # psi^-i / N
    return dict(n1=n1, n2=n2, W1f=W1f, W2f=W2f, W1i=W1i, W2i=W2i,
                tw_f=tw_f, tw_i=tw_i, twist_f=twist_f, untwist=untwist,
                plan=plan)


def _mm(plan, x: jnp.ndarray, Wd: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., n] uint32 @ digit-matrix [dn, dn] -> [..., n] uint32 mod q."""
    lead = x.shape[:-1]
    planes = nttmod._decompose_u32_planes(x.reshape(-1, n), plan.d_full)
    return nttmod._matmul_recombine(
        _SubPlan(plan, n), planes, Wd).reshape(*lead, n)


class _SubPlan:
    """Adapter: reuse _matmul_recombine with a different row length."""

    def __init__(self, plan, n):
        self.q = plan.q
        self.N = n
        self.d_out = plan.d_out
        self.d_full = plan.d_full
        self.comb_w = plan.comb_w
        self.comb_ws = plan.comb_ws


def _pointwise_mont(plan, x, table_mont):
    return mont_mul(x, table_mont, plan.q, u32(plan.qinv_neg))


def forward_fourstep(plan: nttmod.NttPlan, x: jax.Array) -> jax.Array:
    """[..., N] uint32 COEFFICIENT -> EVALUATION (natural order)."""
    N, q = plan.N, plan.q
    t = make_fourstep(N, q)
    n1, n2 = t["n1"], t["n2"]
    lead = x.shape[:-1]
    y = _pointwise_mont(plan, x.reshape(-1, N), t["twist_f"])  # x * psi^i
    B = y.shape[0]
    # y[i] with i = i1 + n1*i2: natural reshape [n2, n1] then transpose
    Y = y.reshape(B, n2, n1).transpose(0, 2, 1)                # [B, n1, n2]
    Z = _mm(plan, Y, t["W2f"], n2)                             # DFT over i2
    Z = _pointwise_mont(plan, Z, t["tw_f"][None])              # * omega^(i1 k2)
    # out[k1, k2] = sum_i1 Z[i1, k2] * W1[i1, k1]
    Zt = Z.transpose(0, 2, 1)                                  # [B, n2, n1]
    O = _mm(plan, Zt, t["W1f"], n1)                            # [B, n2, n1]
    out = O.transpose(0, 2, 1).reshape(B, N)                   # [k1, k2] -> k
    return out.reshape(*lead, N)


def inverse_fourstep(plan: nttmod.NttPlan, x: jax.Array) -> jax.Array:
    """[..., N] uint32 EVALUATION (natural order) -> COEFFICIENT."""
    N, q = plan.N, plan.q
    t = make_fourstep(N, q)
    n1, n2 = t["n1"], t["n2"]
    lead = x.shape[:-1]
    X = x.reshape(-1, N)
    B = X.shape[0]
    # invert the forward chain: out[k1,k2] -> Zt -> Z -> Y -> y
    O = X.reshape(B, n1, n2).transpose(0, 2, 1)                # [B, n2, n1]
    Zt = _mm(plan, O, t["W1i"], n1)
    Z = Zt.transpose(0, 2, 1)                                  # [B, n1, n2]
    Z = _pointwise_mont(plan, Z, t["tw_i"][None])
    Y = _mm(plan, Z, t["W2i"], n2)                             # [B, n1, n2]
    y = Y.transpose(0, 2, 1).reshape(B, N)                     # i = i1+n1*i2
    out = _pointwise_mont(plan, y, t["untwist"])
    return out.reshape(*lead, N)
