"""Serialization benchmarks.

Mirrors /root/reference/benchmark/src/serialize-ckks.cpp:122 (CKKS
ciphertext serialize, binary + JSON archives) over our cereal-analogue
container (fhe_tpu/utils/serial.py), plus deserialize and a
reference-wire-format LWE write (utils/serial_ref.py).
"""

from __future__ import annotations

import numpy as np

from .core import Suite, rng as mkrng


def run() -> Suite:
    from fhe_tpu.pke import ckks
    from fhe_tpu.utils import serial

    s = Suite("serialize")
    r = mkrng(13)
    N = 1 << 13
    ctx = ckks.CkksContext.create(N=N, num_levels=5, scale_bits=26, dnum=2)
    sk, pk = ctx.keygen(r)
    ct = ctx.encrypt(pk, r.normal(size=N // 2), r)

    blob = {}

    def ser(mode):
        blob[mode] = serial.dumps(ct, mode=mode)
        return True

    for mode in ("binary", "json"):
        s.wall(f"CKKS_serialize/{mode}_n{N}", lambda: ser(mode), iters=3)
        size = len(blob[mode])
        s.wall(f"CKKS_deserialize/{mode}_n{N}",
               lambda: serial.loads(blob[mode], mode=mode) is not None,
               iters=3, bytes=size)

    s.wall("CKKS_serialize/secret_key",
           lambda: len(serial.dumps(sk, mode="binary")) > 0, iters=3)
    return s
