"""Cross-implementation known-answer tests against the REFERENCE build.

Vectors in tests/vectors/ were dumped by tools/ref_kat_dump.cpp from the
reference compiled CPU-only on this machine (CMake Release, MATHBACKEND=4
-- the configuration of /root/reference/BENCHMARKS.md).  These tests
evidence the BASELINE "bit-exact parity vs the reference CPU build" claim:

* negacyclic polynomial products match BIT-EXACTLY (root-convention-free);
* the forward NTT computes the exact same evaluation sets as the
  reference transform (transformnat-impl.h:302), related by the derivable
  root/ordering relabeling;
* LWE ciphertexts encrypted by the reference decrypt correctly here (and
  the reference's own bootstrapped gate outputs do too);
* the TPU blind-rotation pipeline runs with the REFERENCE's bootstrap key
  imported in COEFFICIENT format and produces correct gates.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from fhe_tpu.math import ntt as nttmod
from fhe_tpu.tfhe import boot, lwe, rgsw
from fhe_tpu.tfhe.params import Gate, make_params

VEC = os.path.join(os.path.dirname(__file__), "vectors")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(VEC, "manifest.json")),
    reason="reference vectors not generated (tools/ref_kat_dump.cpp)")


def _manifest():
    with open(os.path.join(VEC, "manifest.json")) as f:
        return json.load(f)


def _load(name):
    return np.load(os.path.join(VEC, name))


NTT_TAGS = ["n1024_q27", "n2048_q27", "n4096_q28"]


@pytest.mark.parametrize("tag", NTT_TAGS)
def test_negacyclic_product_bit_exact(tag):
    """a*b mod (X^N+1, q) must equal the reference's NativePoly product
    exactly -- this is independent of either side's root-of-unity or
    output-ordering conventions."""
    m = _manifest()[f"ntt_{tag}"]
    N, q = m["N"], m["q"]
    a = _load(f"ntt_{tag}_in.npy")
    b = _load(f"ntt_{tag}_in2.npy")
    want = _load(f"ntt_{tag}_prod.npy")
    plan = nttmod.make_plan(N, q)
    got = np.asarray(nttmod.negacyclic_mul(plan, jnp.asarray(a),
                                           jnp.asarray(b)))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("tag", NTT_TAGS)
def test_forward_ntt_same_evaluation_set(tag):
    """The reference's ForwardTransformToBitReverse output is exactly our
    natural-order forward NTT under the relabeling derived from the two
    root conventions: psi_ref = psi_ours^t and their slot j holds the
    evaluation at psi_ref^(2*bitrev(j)+1)."""
    m = _manifest()[f"ntt_{tag}"]
    N, q, psi_ref = m["N"], m["q"], m["psi"]
    a = _load(f"ntt_{tag}_in.npy")
    want = _load(f"ntt_{tag}_fwd.npy")
    plan = nttmod.make_plan(N, q)
    ours = np.asarray(nttmod.ntt_forward(plan, jnp.asarray(a), "butterfly"))

    # discrete log: psi_ref = psi_ours^t (both primitive 2N-th roots)
    t = None
    acc = 1
    for e in range(2 * N):
        if acc == psi_ref:
            t = e
            break
        acc = acc * plan.psi % q
    assert t is not None and t % 2 == 1, "psi_ref not an odd power"

    br = nttmod.bit_reverse_perm(N)
    # their index j <- evaluation at psi_ref^(2*br(j)+1)
    #               = psi_ours^(t*(2*br(j)+1)) = our index k(j)
    e = (t * (2 * br.astype(np.int64) + 1)) % (2 * N)
    assert np.all(e % 2 == 1)
    k = ((e - 1) // 2).astype(np.int64)
    assert np.array_equal(want, ours[:, k])


def _sk_from_ref(vals, mod):
    """Reference NativeVector secret ({0, 1, mod-1}) -> signed LweSecretKey."""
    v = vals.astype(np.int64)
    s = np.where(v > mod // 2, v - mod, v)
    return lwe.LweSecretKey(s=jnp.asarray(s.astype(np.int32)))


def test_lwe_decrypt_interop():
    """Ciphertexts encrypted by the reference decrypt with our LWE
    decrypt (lwe-pke.cpp:182 round semantics)."""
    m = _manifest()["tfhe"]
    params = make_params(m["paramset"])
    assert (params.n, params.N, params.q, params.Q) == \
        (m["n"], m["N"], m["q"], m["Q"])
    # the reference stores the LWE secret mod qKS (binfhecontext.cpp
    # KeyGen -> LWEscheme->KeyGen(n, qKS)); ternary values are
    # {0, 1, qKS-1}
    sk = _sk_from_ref(_load("tfhe_sk.npy"), m["qKS"])
    a = _load("tfhe_cts_a.npy")
    b = _load("tfhe_cts_b.npy")
    msg = _load("tfhe_cts_m.npy")
    ct = lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                           modulus=m["q"], pt_mod=4)
    got = np.asarray(lwe.decrypt(params, sk, ct, p=4))
    assert np.array_equal(got, msg)


def test_reference_gate_outputs_decrypt_interop():
    """The reference's own bootstrapped gate outputs (AND/OR/XOR/NAND on
    inputs (0,1)) decrypt correctly with our decrypt."""
    m = _manifest()["tfhe"]
    params = make_params(m["paramset"])
    # the reference stores the LWE secret mod qKS (binfhecontext.cpp
    # KeyGen -> LWEscheme->KeyGen(n, qKS)); ternary values are
    # {0, 1, qKS-1}
    sk = _sk_from_ref(_load("tfhe_sk.npy"), m["qKS"])
    a = _load("tfhe_gateout_a.npy")
    b = _load("tfhe_gateout_b.npy")
    want = _load("tfhe_gateout_m.npy")
    ct = lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                           modulus=m["q"], pt_mod=4)
    got = np.asarray(lwe.decrypt(params, sk, ct, p=4))
    assert np.array_equal(got, want)
    assert np.array_equal(want, [0, 1, 1, 1])    # AND OR XOR NAND on (0,1)


def _import_reference_bsk(params, bsk_coef):
    """Reference BSK [n, 2, dG2, 2, N] in COEFFICIENT format -> our
    BootstrapKey bsk tensor (EVALUATION, Montgomery), exactly as
    rgsw.bsk_gen lays it out.  NTT conventions drop out because the
    import re-transforms with OUR plan."""
    plan = nttmod.make_plan(params.N, params.Q)
    ev = nttmod.ntt_forward(plan, jnp.asarray(bsk_coef.astype(np.uint32))
                            .reshape(-1, params.N))
    ev = ev.reshape(bsk_coef.shape)
    return nttmod.to_mont(plan, ev)


def test_gate_with_reference_bootstrap_key():
    """Full cross-implementation bootstrap: OUR blind rotation + extract +
    key switch, driven by the REFERENCE's bootstrap key (and a switching
    key we generate for the reference's own (sk, skN) pair), on
    REFERENCE-encrypted inputs, decrypted with the reference's secret."""
    m = _manifest()["tfhe"]
    params = make_params(m["paramset"])
    assert params.digits_g == m["digitsG"] and params.base_g == m["baseG"]
    # the reference stores the LWE secret mod qKS (binfhecontext.cpp
    # KeyGen -> LWEscheme->KeyGen(n, qKS)); ternary values are
    # {0, 1, qKS-1}
    sk = _sk_from_ref(_load("tfhe_sk.npy"), m["qKS"])
    sk_n = _sk_from_ref(_load("tfhe_skN.npy"), m["Q"])

    bsk = _import_reference_bsk(params, _load("tfhe_bsk_coef.npy"))
    rng = np.random.default_rng(7)
    ksk = lwe.key_switch_gen(params, sk, sk_n, rng)
    key = rgsw.BootstrapKey(bsk=bsk, ksk=ksk,
                            bsk_shoup=rgsw.shoup_dual(bsk, params.Q))

    a = _load("tfhe_cts_a.npy")
    b = _load("tfhe_cts_b.npy")
    PER = a.shape[0] // 2

    def ct_of(rows):
        return lwe.LweCiphertext(a=jnp.asarray(a[rows]),
                                 b=jnp.asarray(b[rows]),
                                 modulus=m["q"], pt_mod=4)

    # batch the four input combinations using distinct encryption replicas
    bits1 = np.array([0, 0, 1, 1])
    bits2 = np.array([0, 1, 0, 1])
    rows1 = bits1 * PER + np.array([0, 1, 2, 3])
    rows2 = bits2 * PER + np.array([1, 2, 3, 0])
    ct1, ct2 = ct_of(rows1), ct_of(rows2)

    truth = {Gate.AND: bits1 & bits2, Gate.OR: bits1 | bits2,
             Gate.XOR: bits1 ^ bits2, Gate.NAND: 1 - (bits1 & bits2)}
    for gate, want in truth.items():
        out = boot.eval_bin_gate(params, key, gate, ct1, ct2)
        got = np.asarray(lwe.decrypt(params, sk, out, p=4)) % 2
        assert np.array_equal(got, want), (gate, got, want)
