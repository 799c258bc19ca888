"""RLWE trapdoor generation and Gaussian preimage sampling (GPV/MP12).

Reference semantics: /root/reference/src/core/include/lattice/trapdoor.h
(RLWETrapdoorPair :59, RLWETrapdoorUtility::TrapdoorGen :90, GaussSamp
:109-148) and lib/lattice/trapdoor-{poly,dcrtpoly}.cpp + dgsampling.

Construction (Micciancio-Peikert):
  A = [1, a, g_1 - (a*r_1 + e_1), ..., g_k - (a*r_k + e_k)],  g_i = b^i
with ternary/Gaussian trapdoor polys (r_i, e_i).  GaussSamp returns x
with <A, x> = u:
  x = p + [e.z, r.z, z],   z a G-lattice preimage of v = u - <A, p>.

Two samplers are provided:

* gauss_samp -- exact correctness (<A, x> = u always) with spherical
  perturbation and deterministic balanced-digit G-sampling (fast path).
* gauss_samp_corrected -- the full MP12 statistical pipeline mirroring
  the reference's dgsampling (ZSampleSigma2x2 / SamplePz over Field2n):
  (a) RANDOMIZED G-lattice sampling: Klein/GPV nearest-plane over the
      gadget kernel basis S_q of Lambda^perp(g^t) (Genise-Micciancio
      arbitrary-modulus basis: b on the diagonal, -1 subdiagonal, last
      column the base-b digits of q), so z is a discrete Gaussian over
      the preimage coset rather than a fixed point;
  (b) COVARIANCE-CORRECTED perturbation: p = A*z2 + w with
      A = -(alpha^2/v^2)[E;R], z2 ~ D_{v}, and w sampled per embedding
      frequency from the 2x2 Hermitian Cholesky factor of
      Sigma_w = s^2 I - alpha^2 (1 + alpha^2/v^2) M(omega),
      M(omega) = [e^;r^][e^* r^*]  (v^2 = s^2 - alpha^2), then
      randomized-rounded (Peikert 2010 convolution) -- the TPU-friendly
      FFT-diagonal equivalent of the reference's recursive Field2n
      Schur-complement sampler.  Cov(x) ~ s^2 I independent of (R, E)."""

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


# ---------------------------------------------------------------------------
# full MP12 statistical pipeline (reference dgsampling equivalents)
# ---------------------------------------------------------------------------

def _gadget_kernel_basis(params: TrapdoorParams) -> np.ndarray:
    """S_q basis of Lambda^perp(g^t) mod q for arbitrary modulus
    (Genise-Micciancio; reference dgsampling): columns are k kernel
    vectors of z -> sum_i b^i z_i mod q."""
    q, b, k = params.q, params.base, params.k
    S = np.zeros((k, k), dtype=np.float64)
    for j in range(k - 1):
        S[j, j] = b
        S[j + 1, j] = -1.0
    digs = []
    qq = q
    for _ in range(k):
        digs.append(qq % b)
        qq //= b
    S[:, k - 1] = digs
    return S


def _klein_sample(S: np.ndarray, center: np.ndarray, sigma: float,
                  rng: np.random.Generator) -> np.ndarray:
    """Klein/GPV randomized nearest-plane over basis S (columns),
    vectorized over the trailing axis of `center` [k, N]: returns integer
    combinations c [k, N] with S @ c ~ D_{L(S), sigma, center}."""
    k = S.shape[0]
    Q, R = np.linalg.qr(S)                    # S = Q R, R upper triangular
    t = Q.T @ center                          # [k, N]
    c = np.zeros_like(center)
    for i in range(k - 1, -1, -1):
        ci = (t[i] - R[i, i + 1:] @ c[i + 1:]) / R[i, i]
        si = sigma / abs(R[i, i])
        c[i] = np.rint(ci + rng.normal(0.0, si, size=ci.shape))
    return c


def _g_preimage_sampled(params: TrapdoorParams, v: np.ndarray,
                        alpha: float, rng: np.random.Generator
                        ) -> np.ndarray:
    """Randomized G-lattice preimage: deterministic digits plus a
    discrete-Gaussian kernel vector (SampleG semantics)."""
    z0 = _g_preimage(params, v).astype(np.float64)   # [k, N]
    S = _gadget_kernel_basis(params)
    c = _klein_sample(S, -z0, alpha, rng)            # L(S) point near -z0
    return (z0 + S @ c).astype(np.int64)


def _embed(x: np.ndarray) -> np.ndarray:
    """Negacyclic (2N-th root) embedding of real coefficient rows."""
    N = x.shape[-1]
    tw = np.exp(1j * np.pi * np.arange(N) / N)
    return np.fft.fft(x * tw, axis=-1)


def _unembed(X: np.ndarray) -> np.ndarray:
    N = X.shape[-1]
    tw = np.exp(-1j * np.pi * np.arange(N) / N)
    return np.real(np.fft.ifft(X, axis=-1) * tw)


def gauss_samp_corrected(td: TrapdoorOutput, u: np.ndarray,
                         rng: np.random.Generator,
                         s: float | None = None,
                         alpha: float | None = None,
                         round_r: float = 3.0) -> np.ndarray:
    """GaussSamp with the full MP12 covariance correction (reference
    trapdoor-dcrtpoly.cpp GaussSamp + dgsampling SamplePz): the output
    preimage distribution is ~ spherical D_{Z, s} regardless of the
    trapdoor (R, E), because the perturbation covariance cancels the
    alpha^2 T T^t contribution of the G-sample."""
    params = td.params
    N, q, k = params.N, params.q, params.k
    b = params.base
    alpha = alpha or (params.sigma * (b + 1))      # G-sample width
    # s must dominate alpha * s1(T); ternary-Gaussian T has s1 ~
    # sigma*(sqrt(2N)+sqrt(kN)) -- use the reference's C*sigma bound
    s = s or (alpha * params.sigma * 1.2 *
              (math.sqrt(2 * N) + math.sqrt(k * N) + 4.7))
    v2 = s * s - alpha * alpha
    assert v2 > 0, "s must exceed alpha"

    # ---- perturbation p = (p01 [2,N], p2 [k,N])
    p2 = np.rint(rng.normal(0.0, math.sqrt(v2), size=(k, N)))
    # mean part A*z2 = -(alpha^2/v2) [E; R] p2   (ring products over R)
    re = np.stack([td.pair.e, td.pair.r])          # [2, k, N] (float ok)
    scale = -(alpha * alpha) / v2
    Ez = _embed(re.astype(np.float64))             # [2, k, N] complex
    P2 = _embed(p2)                                # [k, N]
    mean01 = scale * np.einsum("tkn,kn->tn", Ez, P2)
    # covariance part: per-frequency 2x2 Hermitian Cholesky
    beta = alpha * alpha * (1.0 + alpha * alpha / v2)
    Eh = np.einsum("kn->n", Ez[0] * np.conj(Ez[0])).real
    Rh = np.einsum("kn->n", Ez[1] * np.conj(Ez[1])).real
    C = np.einsum("kn,kn->n", Ez[0], np.conj(Ez[1]))
    # Per-frequency target Cov = N*(s^2 I - beta*M(w)); the N rides on
    # the FFT of the unit normals below (Var(FFT(g)_w) = N), so the
    # Cholesky factors the N-free part.
    s2 = s * s
    a11 = np.maximum(s2 - beta * Eh, 1e-9)
    a12 = -beta * C
    a22 = np.maximum(s2 - beta * Rh, 1e-9)
    l11 = np.sqrt(a11)
    l21 = np.conj(a12) / l11
    l22 = np.sqrt(np.maximum(a22 - (l21 * np.conj(l21)).real, 1e-9))
    # complex standard normals with Hermitian symmetry = FFT of real iid
    g = rng.normal(size=(2, N))
    G = _embed(g)                                  # unit-var real -> freq
    w1 = l11 * G[0] / math.sqrt(N)
    w2 = l21 * G[0] / math.sqrt(N) + l22 * G[1] / math.sqrt(N)
    p01 = _unembed(np.stack([mean01[0] + w1, mean01[1] + w2]))
    p01 = np.rint(p01 + rng.normal(0.0, round_r, size=(2, N)))
    p = np.vstack([p01, p2]).astype(np.int64)

    # ---- syndrome + randomized G-sample
    ap = np.zeros(N, dtype=np.int64)
    for i in range(k + 2):
        ap = (ap + _ring_mul(params, td.a_row[i] % q, p[i] % q)) % q
    v = (np.asarray(u, dtype=np.int64) - ap) % q
    z = _g_preimage_sampled(params, v, alpha, rng)

    # ---- assemble x = p + [e.z, r.z, z]
    ez = np.zeros(N, dtype=np.int64)
    rz = np.zeros(N, dtype=np.int64)
    for i in range(k):
        ez = (ez + _ring_mul(params, td.pair.e[i] % q, z[i] % q)) % q
        rz = (rz + _ring_mul(params, td.pair.r[i] % q, z[i] % q)) % q
    x = p % q
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
