"""Python-side implementation behind the native full C API (capi.cpp).

The reference's C API (src/c_api/c_api.cpp:73-366) wraps BinFHEContext
in-process: context/keys/gates/mux/bootstrap/marshal with opaque handles
and integer error codes.  Here the TPU compute path lives in Python/JAX,
so the native library embeds CPython and delegates every call to this
module, which keeps integer-handle registries (the C side only ever sees
int64 ids).  All functions return plain ints/bytes/lists so the C shim
needs no numpy C API.

Error contract: exceptions never cross the C boundary -- the C side maps
a Python exception to LUX_FHE_ERR_* after clearing it.
"""

from __future__ import annotations

import threading

import numpy as np

_lock = threading.Lock()
_next_id = 1
_contexts: dict[int, object] = {}
_secret_keys: dict[int, tuple] = {}     # (sk, sk_n)
_public_keys: dict[int, object] = {}
_boot_keys: dict[int, object] = {}
_ciphertexts: dict[int, object] = {}

VERSION = "1.4.2"   # mirrors the reference c_api.cpp version string


def _new_id() -> int:
    global _next_id
    with _lock:
        i = _next_id
        _next_id += 1
        return i


def version() -> str:
    return VERSION


def has_tpu() -> int:
    """lux_fhe_has_gpu analogue: 1 iff a TPU backend is live."""
    import jax
    try:
        return int(jax.default_backend() == "tpu")
    except Exception:
        return 0


def context_new(param_set: str, method: str = "GINX") -> int:
    from ..tfhe.context import BinFheContext
    ctx = BinFheContext.generate(param_set, method)
    i = _new_id()
    _contexts[i] = ctx
    return i


def context_free(h: int) -> None:
    _contexts.pop(h, None)


def context_n(h: int) -> int:
    return int(_contexts[h].params.n)


def context_ring_dim(h: int) -> int:
    return int(_contexts[h].params.N)


def context_modulus(h: int) -> int:
    return int(_contexts[h].params.q)


def keygen_secret(h: int, seed: int) -> int:
    ctx = _contexts[h]
    rng = np.random.default_rng(seed if seed else None)
    sk = ctx.key_gen(rng)
    sk_n = ctx.key_gen_n(rng)
    i = _new_id()
    _secret_keys[i] = (sk, sk_n, rng)
    return i


def keygen_bootstrap(h: int, sk_h: int) -> int:
    ctx = _contexts[h]
    sk, sk_n, rng = _secret_keys[sk_h]
    key = ctx.bt_key_gen(sk, rng, sk_n=sk_n)
    i = _new_id()
    _boot_keys[i] = key
    return i


def keygen_public(h: int, sk_h: int) -> int:
    from ..tfhe import lwe
    ctx = _contexts[h]
    sk, sk_n, rng = _secret_keys[sk_h]
    pk = lwe.pub_key_gen(ctx.params, sk_n, rng)
    i = _new_id()
    _public_keys[i] = pk
    return i


def key_free(h: int) -> None:
    _secret_keys.pop(h, None)
    _public_keys.pop(h, None)
    _boot_keys.pop(h, None)


def encrypt(h: int, sk_h: int, bit: int) -> int:
    ctx = _contexts[h]
    sk, _sk_n, rng = _secret_keys[sk_h]
    ct = ctx.encrypt(sk, np.array([bit & 1]), rng)
    i = _new_id()
    _ciphertexts[i] = ct
    return i


def encrypt_pk(h: int, pk_h: int, sk_h: int, bit: int) -> int:
    from ..tfhe import lwe
    ctx = _contexts[h]
    pk = _public_keys[pk_h]
    _sk, _sk_n, rng = _secret_keys[sk_h]
    ct = lwe.encrypt_pk(ctx.params, pk, np.array([bit & 1]), rng)
    i = _new_id()
    _ciphertexts[i] = ct
    return i


def decrypt(h: int, sk_h: int, ct_h: int) -> int:
    ctx = _contexts[h]
    sk, sk_n, _rng = _secret_keys[sk_h]
    ct = _ciphertexts[ct_h]
    key = sk if ct.a.shape[-1] == ctx.params.n else sk_n
    return int(np.asarray(ctx.decrypt(key, ct)).reshape(-1)[0])


def ciphertext_free(h: int) -> None:
    _ciphertexts.pop(h, None)


def ciphertext_clone(h: int) -> int:
    i = _new_id()
    _ciphertexts[i] = _ciphertexts[h]    # cts are immutable pytrees
    return i


def eval_gate(h: int, bk_h: int, gate: str, a_h: int, b_h: int) -> int:
    from ..tfhe.params import Gate
    ctx = _contexts[h]
    key = _boot_keys[bk_h]
    out = ctx.eval_bin_gate(key, Gate[gate.upper()],
                            _ciphertexts[a_h], _ciphertexts[b_h])
    i = _new_id()
    _ciphertexts[i] = out
    return i


def eval_not(h: int, ct_h: int) -> int:
    ctx = _contexts[h]
    out = ctx.eval_not(_ciphertexts[ct_h])
    i = _new_id()
    _ciphertexts[i] = out
    return i


def eval_mux(h: int, bk_h: int, sel_h: int, a_h: int, b_h: int) -> int:
    """CMUX(sel, a, b) = sel ? a : b (c_api.cpp:246-258)."""
    ctx = _contexts[h]
    key = _boot_keys[bk_h]
    out = ctx.eval_cmux(key, _ciphertexts[b_h], _ciphertexts[a_h],
                        _ciphertexts[sel_h])
    i = _new_id()
    _ciphertexts[i] = out
    return i


def bootstrap(h: int, bk_h: int, ct_h: int) -> int:
    ctx = _contexts[h]
    out = ctx.bootstrap(_boot_keys[bk_h], _ciphertexts[ct_h])
    i = _new_id()
    _ciphertexts[i] = out
    return i


def ciphertext_marshal(ct_h: int) -> bytes:
    from ..utils import serial
    return serial.dumps(_ciphertexts[ct_h], mode="binary")


def ciphertext_unmarshal(data: bytes) -> int:
    from ..utils import serial
    ct = serial.loads(bytes(data), mode="binary")
    i = _new_id()
    _ciphertexts[i] = ct
    return i


def secretkey_marshal(sk_h: int) -> bytes:
    from ..utils import serial
    sk, sk_n, _rng = _secret_keys[sk_h]
    return serial.dumps([sk, sk_n], mode="binary")


def secretkey_unmarshal(data: bytes) -> int:
    from ..utils import serial
    sk, sk_n = serial.loads(bytes(data), mode="binary")
    i = _new_id()
    _secret_keys[i] = (sk, sk_n, np.random.default_rng())
    return i
