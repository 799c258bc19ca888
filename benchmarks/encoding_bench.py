"""CKKS canonical-embedding (special FFT) encode/decode benchmarks.

Mirrors /root/reference/benchmark/src/fft-ckks-encoding.cpp:67-125:
FFTSpecial / FFTSpecialInv at ring dims 4096, 16384, 65536.  Like the
reference's, this transform runs on the host (encode/decode are
client-side, once per ciphertext lifetime); the numbers are wall time.
"""

from __future__ import annotations

import numpy as np

from .core import Suite, rng as mkrng


def run() -> Suite:
    from fhe_tpu.pke import ckks

    s = Suite("encoding")
    r = mkrng(11)
    for N in (4096, 16384, 65536):
        z = r.normal(size=N // 2) + 1j * r.normal(size=N // 2)
        scale = 2.0 ** 40
        s.wall(f"FFTSpecial_RingDim{N}",
               lambda: ckks.encode(z, N, scale), iters=5,
               note="host canonical embedding")
        m = ckks.encode(z, N, scale)
        s.wall(f"FFTSpecialInv_RingDim{N}",
               lambda: ckks.decode(m, N, scale), iters=5,
               note="host canonical embedding")
    return s
