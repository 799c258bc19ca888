"""Packed ciphertext/key wire formats (backend/packed.h analogue)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.tfhe import packed, params as tparams, lwe, context


@pytest.fixture(scope="module")
def stack():
    p = tparams.make_params("TOY")
    rng = np.random.default_rng(7)
    ctx = context.BinFheContext(params=p)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    return p, ctx, sk, key, rng


class TestPackedLwe:
    def test_single_roundtrip(self, stack):
        p, ctx, sk, _key, rng = stack
        ct = ctx.encrypt(sk, 1, rng)
        blob = packed.pack_lwe(ct)
        back = packed.unpack_lwe(blob)
        np.testing.assert_array_equal(np.asarray(back.a), np.asarray(ct.a))
        assert int(back.b) == int(ct.b)
        assert back.modulus == ct.modulus and back.pt_mod == ct.pt_mod
        assert ctx.decrypt(sk, back) == 1

    def test_batch_sequential_and_interleaved(self, stack):
        p, ctx, sk, _key, rng = stack
        bits = [0, 1, 1, 0, 1]
        cts = [ctx.encrypt(sk, b, rng) for b in bits]
        batch = lwe.LweCiphertext(
            a=jnp.stack([c.a for c in cts]),
            b=jnp.stack([c.b for c in cts]),
            modulus=cts[0].modulus, pt_mod=cts[0].pt_mod)
        for flags in (packed.LWE_PACK_DEFAULT, packed.LWE_PACK_INTERLEAVED):
            blob = packed.pack_lwe_batch(batch, flags)
            back = packed.unpack_lwe_batch(blob)
            np.testing.assert_array_equal(np.asarray(back.a),
                                          np.asarray(batch.a))
            np.testing.assert_array_equal(np.asarray(back.b),
                                          np.asarray(batch.b))
            got = [ctx.decrypt(sk, lwe.LweCiphertext(
                a=back.a[i], b=back.b[i], modulus=back.modulus,
                pt_mod=back.pt_mod)) for i in range(len(bits))]
            assert got == bits

    def test_header_validation(self, stack):
        p, ctx, sk, _key, rng = stack
        blob = bytearray(packed.pack_lwe(ctx.encrypt(sk, 0, rng)))
        bad = bytearray(blob); bad[0] ^= 0xFF
        with pytest.raises(ValueError, match="magic"):
            packed.unpack_lwe(bytes(bad))
        with pytest.raises(ValueError, match="type"):
            packed.unpack_lwe_batch(bytes(blob))
        with pytest.raises(ValueError, match="size"):
            packed.unpack_lwe(bytes(blob[:-4]))


class TestPackedKeys:
    def test_switching_key_roundtrip(self, stack):
        p, _ctx, _sk, key, _rng = stack
        blob = packed.pack_switching_key(key.ksk, p.q_ks)
        back, q_ks = packed.unpack_switching_key(blob)
        assert q_ks == p.q_ks
        np.testing.assert_array_equal(np.asarray(back.a), np.asarray(key.ksk.a))
        np.testing.assert_array_equal(np.asarray(back.b), np.asarray(key.ksk.b))

    def test_bsk_roundtrip_and_gate(self, stack):
        """Unpacked bootstrap key evaluates a correct AND gate."""
        p, ctx, sk, key, rng = stack
        blob = packed.pack_bsk(p, key)
        back = packed.unpack_bsk(p, blob)
        np.testing.assert_array_equal(np.asarray(back.bsk),
                                      np.asarray(key.bsk))
        np.testing.assert_array_equal(np.asarray(back.bsk_shoup),
                                      np.asarray(key.bsk_shoup))
        for a in (0, 1):
            for b in (0, 1):
                ca, cb = ctx.encrypt(sk, a, rng), ctx.encrypt(sk, b, rng)
                out = ctx.eval_bin_gate(back, "AND", ca, cb)
                assert ctx.decrypt(sk, out) == (a & b)

    def test_bsk_param_mismatch(self, stack):
        p, _ctx, _sk, key, _rng = stack
        blob = packed.pack_bsk(p, key)
        other = tparams.make_params("MEDIUM")
        with pytest.raises(ValueError, match="match params"):
            packed.unpack_bsk(other, blob)
