"""Bluestein DFT + arbitrary-cyclotomic transform over Z_q.

Reference semantics: /root/reference/src/core/include/math/hal/intnat/
transformnat-impl.h -- BluesteinFFTNat (:861-1039: chirp multiply, padded
linear convolution on an auxiliary power-of-2 NTT, unchirp) and
ChineseRemainderTransformArbNat (:1031-1150+: evaluate at the phi(m)
primitive m-th roots, inverse = full inverse DFT with zeros at
non-primitive spots followed by reduction mod the cyclotomic polynomial
Phi_m; the reference precomputes a Newton-iteration InversePolyMod for
Barrett-style poly division :1117-1150).

TPU redesign: the reference runs the auxiliary convolution over ONE big
scalar modulus (log2(nttDim) + 2*msb(q) bits).  TPUs have no big-int
units, so the padded linear convolution runs EXACTLY over a CRT stack of
three 31-bit NTT-friendly primes on the existing power-of-2 pipeline
(math/ntt.py negacyclic kernels -- zero-padding keeps every product
degree below the transform length, so the negacyclic wrap never fires),
with a host Garner recombination.  The mod-Phi_m reduction is a host
schoolbook division (parity path, not a hot loop; every scheme in the
library uses power-of-2 rings).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np
import jax.numpy as jnp

from . import ntt as nttmod
from . import primes as primesmod


# ---------------------------------------------------------------------------
# cyclotomic polynomials (exact integer coefficients)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def cyclotomic_poly(m: int) -> tuple[int, ...]:
    """Coefficients of Phi_m(X), constant term first (exact ints)."""
    if m == 1:
        return (-1, 1)
    # X^m - 1 = prod_{d | m} Phi_d  =>  Phi_m = (X^m - 1) / prod_{d<m} Phi_d
    num = [0] * (m + 1)
    num[0] = -1
    num[m] = 1
    for d in range(1, m):
        if m % d == 0:
            den = cyclotomic_poly(d)
            num = _polydiv_exact(num, den)
    return tuple(num)


def _polydiv_exact(num: list[int], den: tuple[int, ...]) -> list[int]:
    """Exact division of integer polynomials (den monic up to +-1)."""
    num = list(num)
    dn = len(den) - 1
    lead = den[-1]
    out = [0] * (len(num) - dn)
    for i in range(len(num) - 1, dn - 1, -1):
        c = num[i] // lead
        out[i - dn] = c
        if c:
            for j, dj in enumerate(den):
                num[i - dn + j] -= c * dj
    assert all(v == 0 for v in num), "non-exact cyclotomic division"
    return out


def totient_indices(m: int) -> np.ndarray:
    """Ascending j in [1, m) with gcd(j, m) = 1."""
    return np.array([j for j in range(1, m) if math.gcd(j, m) == 1],
                    dtype=np.int64)


# ---------------------------------------------------------------------------
# exact linear convolution via a 3-prime CRT stack on the pow2 pipeline
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _aux_primes(two_L: int) -> tuple[int, ...]:
    return tuple(primesmod.generate_ntt_primes(31, two_L, 3))


def _exact_linconv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact integer linear convolution of nonneg int arrays (entries
    < 2^32), via negacyclic pow2 NTTs mod three 31-bit primes + Garner.
    Returns dtype=object (exact)."""
    L = 1 << (len(a) + len(b) - 2).bit_length()
    ps = _aux_primes(2 * L)
    residues = []
    for p in ps:
        plan = nttmod.make_plan(L, p)
        aa = np.zeros(L, dtype=np.uint32)
        bb = np.zeros(L, dtype=np.uint32)
        aa[:len(a)] = (a % p).astype(np.uint32)
        bb[:len(b)] = (b % p).astype(np.uint32)
        c = nttmod.negacyclic_mul(plan, jnp.asarray(aa), jnp.asarray(bb))
        residues.append(np.asarray(c).astype(np.int64))
    # Garner mixed-radix reconstruction (host, exact)
    p0, p1, p2 = ps
    r0, r1, r2 = residues
    inv01 = pow(p0, -1, p1)
    inv012 = pow(p0 * p1, -1, p2)
    t1 = (r1 - r0) % p1 * inv01 % p1
    x01 = r0.astype(object) + t1.astype(object) * p0
    t2 = (r2 - (x01 % p2).astype(np.int64)) % p2 * inv012 % p2
    x = x01 + t2.astype(object) * (p0 * p1)
    return x[:len(a) + len(b) - 1]


# ---------------------------------------------------------------------------
# Bluestein DFT mod q (any length m)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BluesteinPlan:
    m: int
    q: int
    psi: int                  # primitive 2m-th root mod q
    chirp: np.ndarray         # psi^{k^2 mod 2m}          [m]
    chirp_inv: np.ndarray     # psi^{-k^2 mod 2m}         [m]
    vker: np.ndarray          # chirp_inv[|t|], t=-(m-1)..(m-1)  [2m-1]
    vker_f: np.ndarray        # chirp[|t|]                       [2m-1]
    m_inv: int


@functools.lru_cache(maxsize=None)
def bluestein_plan(m: int, q: int) -> BluesteinPlan:
    if (q - 1) % (2 * m):
        raise ValueError(f"q={q} has no primitive 2m-th root (m={m})")
    psi = primesmod.root_of_unity(2 * m, q)
    k = np.arange(m, dtype=np.int64)
    e = (k * k) % (2 * m)
    chirp = np.array([pow(psi, int(t), q) for t in e], dtype=object)
    psi_inv = pow(psi, -1, q)
    chirp_inv = np.array([pow(psi_inv, int(t), q) for t in e], dtype=object)
    t = np.abs(np.arange(-(m - 1), m))
    return BluesteinPlan(m, q, psi, chirp, chirp_inv,
                         chirp_inv[t], chirp[t], pow(m, -1, q))


def bluestein_dft(x: np.ndarray, m: int, q: int,
                  inverse: bool = False) -> np.ndarray:
    """X_j = sum_k x_k w^{jk} mod q with w = psi^2 (order m); inverse
    evaluates at w^{-1} and scales by m^{-1}.  x: int array length m."""
    pl = bluestein_plan(m, q)
    x = np.asarray(x, dtype=object) % q
    if not inverse:
        u = (x * pl.chirp) % q
        w = _exact_linconv(u, pl.vker)
        out = (w[m - 1:2 * m - 1] % q) * pl.chirp % q
    else:
        u = (x * pl.chirp_inv) % q
        w = _exact_linconv(u, pl.vker_f)
        out = (w[m - 1:2 * m - 1] % q) * pl.chirp_inv % q
        out = out * pl.m_inv % q
    return out.astype(np.int64)


# ---------------------------------------------------------------------------
# arbitrary-cyclotomic ring transform (Z_q[X] / Phi_m(X))
# ---------------------------------------------------------------------------

def forward_arb(poly, m: int, q: int) -> np.ndarray:
    """Evaluate poly (len <= m, coefficients mod q) at the phi(m)
    primitive m-th roots w^j (gcd(j, m) = 1, ascending j) --
    ChineseRemainderTransformArbNat::ForwardTransform semantics."""
    x = np.zeros(m, dtype=np.int64)
    p = np.asarray(poly, dtype=np.int64) % q
    x[:len(p)] = p
    return bluestein_dft(x, m, q)[totient_indices(m)]


def inverse_arb(vals, m: int, q: int) -> np.ndarray:
    """Interpolate phi(m) primitive-root evaluations back to the unique
    representative of degree < phi(m) mod (Phi_m, q).  The full inverse
    DFT with zeros at non-primitive spots yields a degree-<m polynomial
    with the right primitive-root values; reducing mod Phi_m (which only
    constrains primitive-root behaviour) gives the interpolant."""
    idx = totient_indices(m)
    spec = np.zeros(m, dtype=np.int64)
    spec[idx] = np.asarray(vals, dtype=np.int64) % q
    r = bluestein_dft(spec, m, q, inverse=True)
    return _poly_mod_cyclo(r, m, q)


def _poly_mod_cyclo(r: np.ndarray, m: int, q: int) -> np.ndarray:
    phi = cyclotomic_poly(m)
    n = len(phi) - 1                       # = totient(m)
    c = [int(v) % q for v in r]
    for i in range(len(c) - 1, n - 1, -1):
        t = c[i]
        if t:
            for j in range(n + 1):
                c[i - n + j] = (c[i - n + j] - t * phi[j]) % q
    return np.array(c[:n], dtype=np.int64)


def multiply_arb(a, b, m: int, q: int) -> np.ndarray:
    """a * b mod (Phi_m(X), q) via pointwise multiplication in the
    primitive-root CRT basis."""
    fa = forward_arb(a, m, q).astype(object)
    fb = forward_arb(b, m, q).astype(object)
    return inverse_arb((fa * fb) % q, m, q)
