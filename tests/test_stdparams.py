"""HE-standard lattice security tables (stdlatticeparms.cpp:120-263)."""

import pytest

from fhe_tpu.lattice import stdparams
from fhe_tpu.pke import params as pkeparams


def test_table_values_match_reference():
    assert stdparams.max_log_q(8192, "128_classic", "ternary") == 218
    assert stdparams.max_log_q(32768, "256_quantum", "ternary") == 443
    assert stdparams.max_log_q(4096, "192_classic", "uniform") == 77
    assert stdparams.max_log_q(131072, "128_quantum", "error") == 3351
    assert stdparams.max_log_q(512, "128_classic", "ternary") == 0


def test_min_ring_dim():
    assert stdparams.min_ring_dim(100, "128_classic", "ternary") == 4096
    assert stdparams.min_ring_dim(219, "128_classic", "ternary") == 16384
    with pytest.raises(ValueError):
        stdparams.min_ring_dim(10_000, "256_classic", "ternary")


def test_validate_pass_and_fail():
    # 8192 ternary 128-classic allows 218 bits; a 4-level 28-bit chain +
    # P fits easily
    pkeparams.make_ckks_params(N=1 << 13, num_levels=4, scale_bits=28,
                               security="128_classic")
    # the same chain on N=1024 (27-bit cap) must be rejected
    with pytest.raises(ValueError):
        pkeparams.make_ckks_params(N=1 << 10, num_levels=4, scale_bits=28,
                                   security="128_classic")
    # not_set skips validation
    pkeparams.make_ckks_params(N=1 << 10, num_levels=4, scale_bits=28)


def test_validate_bgv_bfv():
    pkeparams.make_bgv_params(N=1 << 13, num_levels=3, mod_bits=28,
                              security="128_classic")
    with pytest.raises(ValueError):
        pkeparams.make_bfv_params(N=1 << 11, num_limbs=4, mod_bits=28,
                                  security="128_classic")
