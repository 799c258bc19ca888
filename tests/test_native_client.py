"""Native client library tests: BLAKE2b vectors (RFC 7693), CSPRNG
determinism, and cross-language LWE interop (C encrypt <-> Python
decrypt and the reverse; C-encrypted bits run through a real
bootstrapped gate on the engine)."""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.native import client
from fhe_tpu.tfhe import BinFheContext, Gate, lwe

pytestmark = pytest.mark.skipif(client.get_lib() is None,
                                reason="native toolchain unavailable")


def test_blake2b_rfc_vectors():
    # RFC 7693 appendix A: blake2b-512("abc")
    want = hashlib.blake2b(b"abc", digest_size=64).hexdigest()
    assert client.blake2b(b"abc", 64).hex() == want
    want32 = hashlib.blake2b(b"", digest_size=32).hexdigest()
    assert client.blake2b(b"", 32).hex() == want32
    long = bytes(range(256)) * 3
    want_l = hashlib.blake2b(long, digest_size=64).hexdigest()
    assert client.blake2b(long, 64).hex() == want_l


def test_prng_deterministic_and_uniform():
    seed = bytes(range(32))
    a = client.prng_uniform(seed, 0, 1 << 30, 4096)
    b = client.prng_uniform(seed, 0, 1 << 30, 4096)
    np.testing.assert_array_equal(a, b)
    c = client.prng_uniform(seed, 1, 1 << 30, 4096)
    assert not np.array_equal(a, c)            # stream separation
    assert a.max() < (1 << 30)
    assert abs(a.mean() / (1 << 29) - 1.0) < 0.05

    g = client.prng_gaussian(seed, 0, 3.19, 8192)
    assert abs(g.std() - 3.19) < 0.2
    assert abs(g.mean()) < 0.2


def test_c_encrypt_python_decrypt(rng):
    ctx = BinFheContext.generate("TOY")
    q, n, p = ctx.params.q, ctx.params.n, 4
    seed = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    sk_np = client.lwe_keygen(seed, n)
    m = rng.integers(0, p, size=32).astype(np.int32)
    a, b = client.lwe_encrypt(sk_np, q, p, m, seed)
    sk = lwe.LweSecretKey(s=jnp.asarray(sk_np))
    ct = lwe.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                           modulus=q, pt_mod=p)
    got = np.asarray(lwe.decrypt(ctx.params, sk, ct, p))
    np.testing.assert_array_equal(got, m)


def test_python_encrypt_c_decrypt(rng):
    ctx = BinFheContext.generate("TOY")
    q, p = ctx.params.q, 4
    sk = ctx.key_gen(rng)
    m = rng.integers(0, p, size=32)
    ct = ctx.encrypt(sk, m, rng, p=p)
    got = client.lwe_decrypt(np.asarray(sk.s), q, p,
                             np.asarray(ct.a), np.asarray(ct.b))
    np.testing.assert_array_equal(got, m)


@pytest.mark.slow
def test_c_client_to_tpu_gate(rng):
    """Full client-server story: native client encrypts, the engine
    evaluates a bootstrapped gate, the native client decrypts."""
    ctx = BinFheContext.generate("TOY")
    q, n = ctx.params.q, ctx.params.n
    seed = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    sk_np = client.lwe_keygen(seed, n)
    sk = lwe.LweSecretKey(s=jnp.asarray(sk_np))
    key = ctx.bt_key_gen(sk, rng)
    m1 = np.array([0, 0, 1, 1], dtype=np.int32)
    m2 = np.array([0, 1, 0, 1], dtype=np.int32)
    a1, b1 = client.lwe_encrypt(sk_np, q, 4, m1, seed + b"")
    a2, b2 = client.lwe_encrypt(sk_np, q, 4, m2, bytes(32))
    ct1 = lwe.LweCiphertext(a=jnp.asarray(a1), b=jnp.asarray(b1),
                            modulus=q, pt_mod=4)
    ct2 = lwe.LweCiphertext(a=jnp.asarray(a2), b=jnp.asarray(b2),
                            modulus=q, pt_mod=4)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    got = client.lwe_decrypt(sk_np, q, 4, np.asarray(out.a),
                             np.asarray(out.b))
    np.testing.assert_array_equal(got, m1 & m2)
