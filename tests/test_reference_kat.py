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


# ---------------------------------------------------------------------------
# PKE KATs (tools/ref_pke_kat_dump.cpp): the reference's CKKS/BFV/BGV
# ciphertexts decrypted through OUR math stack
# ---------------------------------------------------------------------------

_PKE_MANIFEST = os.path.join(VEC, "manifest_pke.json")

pke_mark = pytest.mark.skipif(
    not os.path.exists(_PKE_MANIFEST),
    reason="PKE reference vectors not generated (tools/ref_pke_kat_dump.cpp)")


def _pke_manifest():
    with open(_PKE_MANIFEST) as f:
        return json.load(f)


def _negacyclic_exact(a, b, q: int) -> np.ndarray:
    """Exact negacyclic product mod q for word-size values up to ~2^52:
    split both operands into 26-bit halves and run four exact linear
    convolutions on OUR 31-bit-prime NTT CRT stack
    (math/ntt_arb._exact_linconv), recombining in exact integers.  The
    KAT therefore exercises the framework's own NTT on every limb."""
    from fhe_tpu.math import ntt_arb
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    S = 1 << 26
    a0, a1 = (a % S).astype(np.uint64), (a // S).astype(np.uint64)
    b0, b1 = (b % S).astype(np.uint64), (b // S).astype(np.uint64)
    c00 = ntt_arb._exact_linconv(a0, b0)
    c01 = ntt_arb._exact_linconv(a0, b1)
    c10 = ntt_arb._exact_linconv(a1, b0)
    c11 = ntt_arb._exact_linconv(a1, b1)
    full = c00 + (c01 + c10) * S + c11 * (S * S)          # object ints
    N = len(a)
    red = np.zeros(N, dtype=object)
    red[: min(N, len(full))] += full[:N]
    red[: len(full) - N] -= full[N:]
    return np.array([int(v) % q for v in red], dtype=object)


def _phase_limbs(c0, c1, sk, mods) -> list[np.ndarray]:
    """phase_l = c0_l + c1_l * s_l mod q_l per RNS limb (the reference's
    DecryptCore sum over ct[i] * s^i, rns-pke.cpp semantics)."""
    out = []
    for l, q in enumerate(mods):
        prod = _negacyclic_exact(c1[l], sk[l], int(q))
        out.append((prod + c0[l].astype(object)) % int(q))
    return out


def _crt_compose(limbs, mods) -> tuple[list, int]:
    """Garner reconstruction of the big-int coefficients mod prod(mods)."""
    Q = 1
    for q in mods:
        Q *= int(q)
    N = len(limbs[0])
    out = [0] * N
    for i in range(N):
        x, m = 0, 1
        for l, q in enumerate(mods):
            q = int(q)
            t = (int(limbs[l][i]) - x) % q * pow(m % q, -1, q) % q
            x += t * m
            m *= q
        out[i] = x
    return out, Q


@pke_mark
class TestPkeKat:
    def test_ckks_fresh_decrypt(self):
        """A CKKS ciphertext encrypted by the reference decrypts+decodes
        with our stack (NTT limb products + CRT + canonical embedding)."""
        from fhe_tpu.pke import ckks as ckksmod
        m = _pke_manifest()["ckks"]
        mods = _load("ckks_moduli.npy")
        sk = _load("ckks_sk.npy")
        c0 = _load("ckks_ct_c0.npy")
        c1 = _load("ckks_ct_c1.npy")
        vals = np.load(os.path.join(VEC, "ckks_values.npy"))
        L = c0.shape[0]
        limbs = _phase_limbs(c0, c1, sk, mods[:L])
        coefs, Q = _crt_compose(limbs, mods[:L])
        centered = np.array([float(x - Q) if x > Q // 2 else float(x)
                             for x in coefs])
        got = ckksmod.decode(centered, m["N"], 2.0 ** m["scale_bits"])
        err = np.abs(got[: m["slots"]].real - vals).max()
        assert err < 1e-5, err

    def test_ckks_evalmult_rescale_decrypt(self):
        """The reference's EvalMult+Rescale output decodes to values^2
        under the exact derived scale (scale^2 / dropped modulus)."""
        from fhe_tpu.pke import ckks as ckksmod
        m = _pke_manifest()["ckks"]
        mods = _load("ckks_moduli.npy")
        sk = _load("ckks_sk.npy")
        c0 = _load("ckks_ct2_c0.npy")
        c1 = _load("ckks_ct2_c1.npy")
        vals = np.load(os.path.join(VEC, "ckks_values.npy"))
        L = c0.shape[0]
        limbs = _phase_limbs(c0, c1, sk, mods[:L])
        coefs, Q = _crt_compose(limbs, mods[:L])
        centered = np.array([float(x - Q) if x > Q // 2 else float(x)
                             for x in coefs])
        scale2 = (2.0 ** m["scale_bits"]) ** 2 / float(int(mods[L]))
        got = ckksmod.decode(centered, m["N"], scale2)
        err = np.abs(got[: m["slots"]].real - vals * vals).max()
        assert err < 1e-4, err

    def test_bfv_exact_decrypt(self):
        """BFV coef-packed: exact integer decrypt of the reference's
        ciphertext reproduces the message verbatim (HPS rounding)."""
        m = _pke_manifest()["bfv"]
        mods = _load("bfv_moduli.npy")
        sk = _load("bfv_sk.npy")
        c0 = _load("bfv_ct_c0.npy")
        c1 = _load("bfv_ct_c1.npy")
        msg = _load("bfv_msg.npy")
        L = c0.shape[0]
        t = m["t"]
        limbs = _phase_limbs(c0, c1, sk, mods[:L])
        coefs, Q = _crt_compose(limbs, mods[:L])
        got = np.array([((x * t + Q // 2) // Q) % t for x in coefs],
                       dtype=np.uint64)
        np.testing.assert_array_equal(got, msg)

    def test_bgv_exact_decrypt(self):
        """BGV coef-packed: phase mod t after centering equals the
        message exactly."""
        m = _pke_manifest()["bgv"]
        mods = _load("bgv_moduli.npy")
        sk = _load("bgv_sk.npy")
        c0 = _load("bgv_ct_c0.npy")
        c1 = _load("bgv_ct_c1.npy")
        msg = _load("bgv_msg.npy")
        L = c0.shape[0]
        t = m["t"]
        limbs = _phase_limbs(c0, c1, sk, mods[:L])
        coefs, Q = _crt_compose(limbs, mods[:L])
        got = np.array([((x - Q) % t if x > Q // 2 else x % t)
                        for x in coefs], dtype=np.uint64)
        np.testing.assert_array_equal(got, msg)


# ---------------------------------------------------------------------------
# serialization interop: the reference's cereal archives parse directly
# ---------------------------------------------------------------------------

@pke_mark
class TestSerialInterop:
    def _sk(self):
        v = _load("serial_lwe_sk.npy").astype(np.int64)
        s = np.where(v > 1, -1, v)       # ternary {0, 1, qKS-1}
        return lwe.LweSecretKey(s=jnp.asarray(s.astype(np.int32)))

    def test_binary_archive_decrypts(self):
        from fhe_tpu.utils import serial_ref
        params = make_params("TOY")
        sk = self._sk()
        for bit in (0, 1):
            ct = serial_ref.load_lwe_binary(
                os.path.join(VEC, f"serial_lwe_ct{bit}.bin"))
            assert ct.modulus == _pke_manifest()["serial_lwe"]["q"]
            got = int(np.asarray(lwe.decrypt(params, sk, ct, p=4)))
            assert got == bit

    def test_json_archive_matches_binary(self):
        from fhe_tpu.utils import serial_ref
        for bit in (0, 1):
            cb = serial_ref.load_lwe_binary(
                os.path.join(VEC, f"serial_lwe_ct{bit}.bin"))
            cj = serial_ref.load_lwe_json(
                os.path.join(VEC, f"serial_lwe_ct{bit}.json"))
            np.testing.assert_array_equal(np.asarray(cb.a), np.asarray(cj.a))
            assert int(cb.b) == int(cj.b) and cb.modulus == cj.modulus

    def test_binary_roundtrip_byte_identical(self, tmp_path):
        """Our writer regenerates the reference's archive byte-for-byte."""
        from fhe_tpu.utils import serial_ref
        src = os.path.join(VEC, "serial_lwe_ct1.bin")
        ct = serial_ref.load_lwe_binary(src)
        out = tmp_path / "roundtrip.bin"
        serial_ref.dump_lwe_binary(ct, str(out))
        assert out.read_bytes() == open(src, "rb").read()
