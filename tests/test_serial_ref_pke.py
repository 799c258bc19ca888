"""PKE cereal-archive interop: reference-produced SERBINARY/SERJSON
archives of CKKS objects (context, keys, ciphertexts) parse into our
representation, decrypt through OUR math stack, and re-serialize
BYTE-IDENTICALLY.

Vectors produced by tools/ref_pke_ser_dump.cpp from a reference build
(CMake Release, MATHBACKEND=4, cereal from its install tree):
N=512, depth-2 FIXEDMANUAL CKKS, 50/40/40-bit chain."""

import json
import os

import numpy as np
import pytest

from fhe_tpu.utils import serial_ref_pke as sp

VEC = os.path.join(os.path.dirname(__file__), "vectors")
NEED = ["pke_cc.bin", "pke_sk.bin", "pke_pk.bin", "pke_ct.bin",
        "pke_ct2.bin", "pke_ct.json", "pke_ser_values.npy",
        "manifest_pke_ser.json"]
pke_ser_mark = pytest.mark.skipif(
    not all(os.path.exists(os.path.join(VEC, f)) for f in NEED),
    reason="PKE cereal vectors not generated")


def _p(name):
    return os.path.join(VEC, name)


ALL = [("context", "pke_cc.bin"), ("private_key", "pke_sk.bin"),
       ("public_key", "pke_pk.bin"), ("ciphertext", "pke_ct.bin"),
       ("ciphertext", "pke_ct2.bin")]


@pke_ser_mark
@pytest.mark.parametrize("kind,name", ALL, ids=[n for _, n in ALL])
def test_binary_roundtrip_byte_identical(kind, name):
    tree = sp.load_binary(_p(name), kind)
    blob = sp.dump_binary(tree, kind)
    with open(_p(name), "rb") as f:
        assert blob == f.read()


@pke_ser_mark
def test_context_fields_match_manifest():
    tree = sp.load_binary(_p("pke_cc.bin"), "context")
    info = sp.context_summary(tree)
    man = json.load(open(_p("manifest_pke_ser.json")))
    assert info["ring_dim"] == man["ring_dim"]
    assert len(info["moduli"]) == man["depth"] + 1
    assert all(int(q).bit_length() in (40, 41, 50, 51)
               for q in info["moduli"])


@pke_ser_mark
def test_json_binary_agree():
    """The JSON archive's value tree matches the binary parse."""
    tree = sp.load_binary(_p("pke_ct.bin"), "ciphertext")
    doc = json.load(open(_p("pke_ct.json")))
    jct = doc["value0"]["ptr_wrapper"]["data"]
    assert jct["sl"] == tree["data"]["sl"]
    assert jct["s"] == tree["data"]["s"]
    jvals = np.asarray(jct["v"][0]["v"][0]["v"]["ptr_wrapper"]["data"]["v"],
                       dtype=np.uint64)
    bvals = tree["data"]["v"][0]["v"][0]["v"]["v"]
    np.testing.assert_array_equal(jvals, bvals)


# ---------------------------------------------------------------------------
# decrypt through OUR stack: the archives hold EVALUATION-format towers
# in the reference's bit-reversed NTT layout (transformnat-impl.h:302
# ForwardTransformToBitReverse: eval[i] = a(psi^(2*br(i)+1))); the phase
# c0 + c1*s is pointwise there, and we invert THEIR transform from first
# principles (exact integer inverse DFT over each 40/50-bit limb) before
# Garner CRT composition and our canonical-embedding decode.
# ---------------------------------------------------------------------------

def _bit_rev(n):
    logn = n.bit_length() - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = 0
        x = i
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


def _inverse_ref_ntt(ev, q: int, psi: int) -> np.ndarray:
    """coeff_j = N^-1 sum_i ev[i] * psi^{-(2*br(i)+1) j} mod q (exact)."""
    N = len(ev)
    br = _bit_rev(N)
    psi_inv = pow(psi, -1, q)
    # exponent table psi^{-e} for e in [0, 2N)
    pows = [1] * (2 * N)
    for e in range(1, 2 * N):
        pows[e] = pows[e - 1] * psi_inv % q
    ninv = pow(N, -1, q)
    out = np.zeros(N, dtype=object)
    e_i = [(2 * int(br[i]) + 1) % (2 * N) for i in range(N)]
    for j in range(N):
        acc = 0
        for i in range(N):
            acc += int(ev[i]) * pows[(e_i[i] * j) % (2 * N)]
        out[j] = acc % q * ninv % q
    return out


def _decrypt_archive(ct_tree, sk_tree):
    """phase -> their-iNTT -> Garner CRT -> centered big-int coeffs."""
    table = sp.build_ptr_table(ct_tree)
    els = ct_tree["data"]["v"]
    c0, mods, fmt0 = sp.dcrt_to_arrays(els[0])
    c1, _, _ = sp.dcrt_to_arrays(els[1])
    s, smods, _ = sp.dcrt_to_arrays(sk_tree["data"]["s"])
    assert fmt0 == "EVAL"
    L = len(mods)
    assert smods[:L] == mods
    towers = sp.deref(els[0]["p"], table)["towers"]
    roots = tuple(int(sp.deref(t, table)["base"]["ru"]) for t in towers)
    coeff_limbs = []
    for l, q in enumerate(mods):
        q = int(q)
        ph = (c0[l].astype(object) + c1[l].astype(object)
              * s[l].astype(object)) % q
        coeff_limbs.append(_inverse_ref_ntt(ph, q, int(roots[l])))
    # Garner
    Q = 1
    for q in mods:
        Q *= int(q)
    N = len(coeff_limbs[0])
    coefs = []
    for i in range(N):
        x, m = 0, 1
        for l, q in enumerate(mods):
            q = int(q)
            t = (int(coeff_limbs[l][i]) - x) % q * pow(m % q, -1, q) % q
            x += t * m
            m *= q
        coefs.append(x - Q if x > Q // 2 else x)
    return np.array([float(v) for v in coefs]), Q


@pke_ser_mark
def test_reference_archive_decrypts_through_our_stack():
    """A ciphertext serialized by the reference's cereal stack decrypts
    and decodes with OUR arithmetic end-to-end."""
    from fhe_tpu.pke import ckks as ckksmod

    man = json.load(open(_p("manifest_pke_ser.json")))
    ct = sp.load_binary(_p("pke_ct.bin"), "ciphertext")
    sk = sp.load_binary(_p("pke_sk.bin"), "private_key")
    vals = np.load(_p("pke_ser_values.npy"))
    coefs, _ = _decrypt_archive(ct, sk)
    got = ckksmod.decode(coefs, man["ring_dim"], man["scale"])
    err = np.abs(got[: man["slots"]].real - vals).max()
    assert err < 1e-4, err


@pke_ser_mark
def test_reference_archive_ct2_decrypts_squared():
    """The EvalMult+Rescale archive decodes to values^2 via our stack."""
    from fhe_tpu.pke import ckks as ckksmod

    man = json.load(open(_p("manifest_pke_ser.json")))
    ct = sp.load_binary(_p("pke_ct2.bin"), "ciphertext")
    sk = sp.load_binary(_p("pke_sk.bin"), "private_key")
    vals = np.load(_p("pke_ser_values.npy"))
    coefs, _ = _decrypt_archive(ct, sk)
    got = ckksmod.decode(coefs, man["ring_dim"], man["scale2"])
    err = np.abs(got[: man["slots"]].real - vals * vals).max()
    assert err < 1e-3, err
