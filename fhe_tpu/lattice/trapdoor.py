"""RLWE trapdoor generation and Gaussian preimage sampling (GPV/MP12).

Reference semantics: /root/reference/src/core/include/lattice/trapdoor.h
(RLWETrapdoorPair :59, RLWETrapdoorUtility::TrapdoorGen :90, GaussSamp
:109-148) and lib/lattice/trapdoor-{poly,dcrtpoly}.cpp + dgsampling.

Construction (Micciancio-Peikert):
  A = [1, a, g_1 - (a*r_1 + e_1), ..., g_k - (a*r_k + e_k)],  g_i = b^i
with ternary/Gaussian trapdoor polys (r_i, e_i).  GaussSamp returns x
with <A, x> = u:
  x = p + [e.z, r.z, z],   z a G-lattice preimage of v = u - <A, p>.

This round implements exact correctness (<A, x> = u always) with
spherical perturbation and deterministic balanced-digit G-sampling; the
reference's covariance-corrected perturbation (dgsampling ZSampleSigma2x2
over Field2n) is the planned upgrade for tight statistical closeness."""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math import samplers


@dataclasses.dataclass
class TrapdoorParams:
    N: int
    q: int
    base: int = 2
    sigma: float = 3.19

    @property
    def k(self) -> int:
        return int(math.ceil(math.log(self.q, self.base)))


@dataclasses.dataclass
class RlweTrapdoorPair:
    """trapdoor.h:59 RLWETrapdoorPair: the secret (R, E) polys [k, N]."""
    r: np.ndarray
    e: np.ndarray


@dataclasses.dataclass
class TrapdoorOutput:
    a_row: np.ndarray         # public row A: [k+2, N] coefficients mod q
    pair: RlweTrapdoorPair
    params: TrapdoorParams


def _ring_mul(params: TrapdoorParams, a: np.ndarray, b: np.ndarray
              ) -> np.ndarray:
    plan = nttmod.make_plan(params.N, params.q)
    prod = nttmod.negacyclic_mul(
        plan, jnp.asarray(np.atleast_2d(a % params.q).astype(np.uint32)),
        jnp.asarray(np.atleast_2d(b % params.q).astype(np.uint32)),
        impl="butterfly")
    return np.asarray(prod).astype(np.int64).reshape(a.shape)


def trapdoor_gen(params: TrapdoorParams, rng: np.random.Generator
                 ) -> TrapdoorOutput:
    """TrapdoorGen (trapdoor.h:90): A = [1, a, g - (a*r + e)]."""
    N, q, k = params.N, params.q, params.k
    a = samplers.discrete_uniform(rng, q, N)
    r = samplers.discrete_gaussian_rounded(rng, params.sigma, (k, N))
    e = samplers.discrete_gaussian_rounded(rng, params.sigma, (k, N))
    rows = [np.zeros(N, dtype=np.int64), a.copy()]
    rows[0][0] = 1                      # the constant poly 1
    for i in range(k):
        ar = _ring_mul(params, a, r[i])
        gi = np.zeros(N, dtype=np.int64)
        gi[0] = pow(params.base, i, q)
        rows.append((gi - ar - e[i]) % q)
    return TrapdoorOutput(a_row=np.stack(rows) % q,
                          pair=RlweTrapdoorPair(r=r, e=e), params=params)


def _g_preimage(params: TrapdoorParams, v: np.ndarray) -> np.ndarray:
    """Balanced base-b digits z [k, N] with sum_i b^i z_i = v (mod q):
    exact because |v| < q <= b^k (the deterministic G-lattice preimage)."""
    q, b, k = params.q, params.base, params.k
    vv = np.asarray(v % q, dtype=np.int64)
    # centered representative for smaller digits
    vv = np.where(vv > q // 2, vv - q, vv)
    sign = np.sign(vv)
    mag = np.abs(vv)
    digits = np.zeros((k, len(vv)), dtype=np.int64)
    for i in range(k):
        digits[i] = mag % b
        mag = mag // b
    # signed digits of the centered representative: |digit| < b and
    # sum_i b^i digits_i = v exactly as integers (|v| <= q/2 < b^k)
    return digits * sign


def gauss_samp(td: TrapdoorOutput, u: np.ndarray,
               rng: np.random.Generator, sigma_p: float | None = None
               ) -> np.ndarray:
    """GaussSamp (trapdoor.h:109): x [k+2, N] with <A, x> = u mod q."""
    params = td.params
    N, q, k = params.N, params.q, params.k
    sigma_p = sigma_p or (params.sigma * (params.base + 1))
    p = samplers.discrete_gaussian_rounded(rng, sigma_p, (k + 2, N))
    ap = np.zeros(N, dtype=np.int64)
    for i in range(k + 2):
        ap = (ap + _ring_mul(params, td.a_row[i], p[i])) % q
    v = (np.asarray(u, dtype=np.int64) - ap) % q
    z = _g_preimage(params, v)
    ez = np.zeros(N, dtype=np.int64)
    rz = np.zeros(N, dtype=np.int64)
    for i in range(k):
        ez = (ez + _ring_mul(params, td.pair.e[i], z[i] % q)) % q
        rz = (rz + _ring_mul(params, td.pair.r[i], z[i] % q)) % q
    x = p.copy() % q
    x[0] = (x[0] + ez) % q
    x[1] = (x[1] + rz) % q
    for i in range(k):
        x[2 + i] = (x[2 + i] + z[i]) % q
    return x


def verify_preimage(td: TrapdoorOutput, x: np.ndarray, u: np.ndarray
                    ) -> bool:
    """Check <A, x> = u mod q."""
    params = td.params
    acc = np.zeros(params.N, dtype=np.int64)
    for i in range(x.shape[0]):
        acc = (acc + _ring_mul(params, td.a_row[i], x[i])) % params.q
    return bool(np.array_equal(acc % params.q,
                               np.asarray(u, dtype=np.int64) % params.q))
