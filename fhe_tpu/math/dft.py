"""Discrete Fourier transform over complex doubles.

Reference semantics: /root/reference/src/core/include/math/dftransform.h:53
(DiscreteFourierTransform) and lib/math/dftransform.cpp -- the complex
FFT backing CKKS encode/decode and Field2n arithmetic.  Table-cached
forward/inverse plus the "special" negacyclic embedding transforms
(odd-index evaluation points for Z[X]/(X^N+1))."""

from __future__ import annotations

import functools

import numpy as np


def forward_transform(x: np.ndarray) -> np.ndarray:
    """Plain DFT (dftransform.h ForwardTransform)."""
    return np.fft.fft(np.asarray(x, dtype=np.complex128))


def inverse_transform(x: np.ndarray) -> np.ndarray:
    return np.fft.ifft(np.asarray(x, dtype=np.complex128))


@functools.lru_cache(maxsize=None)
def _special_tables(N: int):
    """Roots for the negacyclic embedding: zeta^(2k+1), zeta = e^(i*pi/N)."""
    k = np.arange(N)
    return np.exp(1j * np.pi * k / N)


def forward_special(coeffs: np.ndarray) -> np.ndarray:
    """Evaluate a real-coefficient poly at the odd 2N-th roots of unity
    (ForwardTransformSpecial): out[j] = sum_k c_k zeta^{k(2j+1)}.

    Via one length-N FFT after the zeta^k pre-twist (the e^{+2pi i jk/N}
    kernel is N * ifft)."""
    c = np.asarray(coeffs, dtype=np.complex128)
    N = c.shape[-1]
    return N * np.fft.ifft(c * _special_tables(N))


def inverse_special(vals: np.ndarray) -> np.ndarray:
    """Inverse of forward_special (InverseTransformSpecial)."""
    v = np.asarray(vals, dtype=np.complex128)
    N = v.shape[-1]
    return np.fft.fft(v) / N / _special_tables(N)
