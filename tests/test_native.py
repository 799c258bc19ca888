"""Native CRT codec tests: exact agreement with Python big-int paths."""

import numpy as np
import pytest

from fhe_tpu import native
from fhe_tpu.math import primes

N = 64
MODS = tuple(primes.generate_ntt_primes(28, 2 * N, 4))


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _bigints(rng):
    Q = 1
    for q in MODS:
        Q *= q
    vals = [int(v) % Q for v in
            rng.integers(0, 1 << 63, size=N, dtype=np.uint64)]
    vals = [(v * v) % Q for v in vals]
    res = np.stack([np.array([v % q for v in vals], dtype=np.uint32)
                    for q in MODS])
    return vals, res, Q


def test_center_mod(lib, rng):
    vals, res, Q = _bigints(rng)
    t = 65537
    got = native.crt_center_mod(res, MODS, t)
    want = [((v - Q) % t if v > Q // 2 else v % t) for v in vals]
    np.testing.assert_array_equal(got, want)


def test_center_double(lib, rng):
    vals, res, Q = _bigints(rng)
    got = native.crt_center_double(res, MODS)
    want = np.array([float(v - Q) if v > Q // 2 else float(v)
                     for v in vals])
    np.testing.assert_allclose(got, want, rtol=1e-15)


def test_scale_round_mod(lib, rng):
    vals, res, Q = _bigints(rng)
    t = 65537
    got = native.crt_scale_round_mod(res, MODS, t)
    want = [((2 * t * v + Q) // (2 * Q)) % t for v in vals]
    np.testing.assert_array_equal(got, want)
