"""Packed ciphertext/key wire formats (contiguous, header-tagged).

Reference semantics: /root/reference/src/binfhe/include/backend/packed.h
(PackedHeader magic "LUXF" + PackedType, PackedLWE/PackedLWEBatch with a
sequential-or-interleaved flag, PackedBootstrappingKey with layout flags,
PackedSwitchingKey; pack/unpack function family).  Same 32-byte header
discipline and type/flag vocabulary here, with the payload laid out for
the TPU runtime instead of Metal buffers:

  * word size is uint32 (our RNS limbs are 32-bit; the reference packs
    64-bit NativeIntegers),
  * the batch INTERLEAVED layout is coefficient-major [n+1, B] -- the
    transpose-free layout for feeding a lane-vectorized kernel,
  * the bootstrap key packs the EVALUATION-format Montgomery tensor
    exactly as the blind-rotate kernel consumes it (KEY_LAYOUT_NTT |
    KEY_LAYOUT_MONT), so unpack -> device_put is zero-relayout: the
    "bulk DMA transfer" goal of the reference format, with HBM as the
    target instead of a Metal heap.

Unpacking is zero-copy on the host (np.frombuffer views) until
device_put."""

from __future__ import annotations

import dataclasses
import struct

import numpy as np
import jax.numpy as jnp

from .params import TfheParams
from . import lwe as lwemod
from . import rgsw as rgswmod

PACKED_MAGIC = 0x4C555846  # "LUXF"
PACKED_VERSION = 1

# PackedType (packed.h:33-41)
LWE_CIPHERTEXT = 1
LWE_BATCH = 2
RLWE_CIPHERTEXT = 3
RGSW_CIPHERTEXT = 4
BOOTSTRAPPING_KEY = 5
SWITCHING_KEY = 6
PARAMETERS = 7

# LWEPackFlags (packed.h:60-64)
LWE_PACK_DEFAULT = 0
LWE_PACK_INTERLEAVED = 1 << 0

# KeyLayoutFlags (packed.h:183-188) + TPU-native extension
KEY_LAYOUT_STANDARD = 0
KEY_LAYOUT_NTT = 1 << 1
KEY_LAYOUT_MONT = 1 << 4     # Montgomery residue form (TPU extension)

_HDR = struct.Struct("<IHHQQII")   # magic, ver, type, total, count, flags, rsvd
assert _HDR.size == 32


def _header(ptype: int, total: int, count: int, flags: int = 0) -> bytes:
    return _HDR.pack(PACKED_MAGIC, PACKED_VERSION, ptype, total, count,
                     flags, 0)


def _parse_header(data: bytes, want_type: int):
    if len(data) < _HDR.size:
        raise ValueError("packed blob shorter than header")
    magic, ver, ptype, total, count, flags, _ = _HDR.unpack_from(data, 0)
    if magic != PACKED_MAGIC:
        raise ValueError(f"bad magic {magic:#x}")
    if ver != PACKED_VERSION:
        raise ValueError(f"unsupported packed version {ver}")
    if ptype != want_type:
        raise ValueError(f"packed type {ptype}, want {want_type}")
    if total != len(data):
        raise ValueError(f"size mismatch: header {total}, blob {len(data)}")
    return count, flags


def _u32s(*arrays: np.ndarray) -> bytes:
    return b"".join(np.ascontiguousarray(a, dtype=np.uint32).tobytes()
                    for a in arrays)


def _view_u32(data: bytes, off: int, shape) -> np.ndarray:
    n = int(np.prod(shape))
    return np.frombuffer(data, dtype=np.uint32, count=n,
                         offset=off).reshape(shape)


# ---------------------------------------------------------------------------
# LWE ciphertexts
# ---------------------------------------------------------------------------

_LWE_PARAMS = struct.Struct("<IIQQII")  # n, log_q, q, count, stride, pt_mod


def pack_lwe(ct: lwemod.LweCiphertext) -> bytes:
    """Single LWE ciphertext -> packed bytes (PackedLWE layout)."""
    a = np.asarray(ct.a)
    b = np.asarray(ct.b)
    if a.ndim != 1:
        raise ValueError("pack_lwe packs a single ciphertext; "
                         "use pack_lwe_batch")
    n = a.shape[0]
    params = _LWE_PARAMS.pack(n, int(ct.modulus).bit_length(),
                              ct.modulus, 1, 0, ct.pt_mod)
    payload = params + _u32s(a, np.asarray([b]))
    total = _HDR.size + len(payload)
    return _header(LWE_CIPHERTEXT, total, 1) + payload


def unpack_lwe(data: bytes) -> lwemod.LweCiphertext:
    _parse_header(data, LWE_CIPHERTEXT)
    n, _logq, q, _cnt, _stride, pt_mod = _LWE_PARAMS.unpack_from(
        data, _HDR.size)
    off = _HDR.size + _LWE_PARAMS.size
    a = _view_u32(data, off, (n,))
    b = _view_u32(data, off + 4 * n, (1,))[0]
    return lwemod.LweCiphertext(a=jnp.asarray(a), b=jnp.asarray(b),
                                modulus=int(q), pt_mod=int(pt_mod))


def pack_lwe_batch(ct: lwemod.LweCiphertext,
                   flags: int = LWE_PACK_DEFAULT) -> bytes:
    """Batched LWE ciphertext [B] -> packed bytes (PackedLWEBatch).

    SEQUENTIAL: B rows of [a_0..a_{n-1}, b] (ciphertext-major).
    INTERLEAVED: [n+1, B] coefficient-major -- each coefficient position
    contiguous across the batch (packed.h:88-90 'good for SIMD')."""
    a = np.asarray(ct.a)
    b = np.asarray(ct.b)
    if a.ndim != 2:
        raise ValueError("pack_lwe_batch needs a [B, n] batch")
    B, n = a.shape
    rows = np.concatenate([a, b[:, None]], axis=1)          # [B, n+1]
    if flags & LWE_PACK_INTERLEAVED:
        body = _u32s(rows.T)
        stride = 4 * B
    else:
        body = _u32s(rows)
        stride = 4 * (n + 1)
    params = _LWE_PARAMS.pack(n, int(ct.modulus).bit_length(),
                              ct.modulus, B, stride, ct.pt_mod)
    payload = params + body
    return _header(LWE_BATCH, _HDR.size + len(payload), B, flags) + payload


def unpack_lwe_batch(data: bytes) -> lwemod.LweCiphertext:
    count, flags = _parse_header(data, LWE_BATCH)
    n, _logq, q, cnt, _stride, pt_mod = _LWE_PARAMS.unpack_from(
        data, _HDR.size)
    if cnt != count:
        raise ValueError("count mismatch between header and params")
    off = _HDR.size + _LWE_PARAMS.size
    if flags & LWE_PACK_INTERLEAVED:
        rows = _view_u32(data, off, (n + 1, count)).T
    else:
        rows = _view_u32(data, off, (count, n + 1))
    return lwemod.LweCiphertext(a=jnp.asarray(rows[:, :n]),
                                b=jnp.asarray(rows[:, n]),
                                modulus=int(q), pt_mod=int(pt_mod))


# ---------------------------------------------------------------------------
# Switching key
# ---------------------------------------------------------------------------

_KSK_PARAMS = struct.Struct("<IIIIQQQ")  # in_n, out_n, dc, Bks, qks, a_sz, b_sz


def pack_switching_key(ksk: lwemod.LweSwitchingKey, q_ks: int) -> bytes:
    a = np.asarray(ksk.a)   # [N, dc, Bks, n]
    b = np.asarray(ksk.b)   # [N, dc, Bks]
    N, dc, Bks, n = a.shape
    params = _KSK_PARAMS.pack(N, n, dc, Bks, q_ks, a.size, b.size)
    payload = params + _u32s(a, b)
    return _header(SWITCHING_KEY, _HDR.size + len(payload), N) + payload


def unpack_switching_key(data: bytes) -> tuple[lwemod.LweSwitchingKey, int]:
    _parse_header(data, SWITCHING_KEY)
    N, n, dc, Bks, q_ks, a_sz, b_sz = _KSK_PARAMS.unpack_from(data, _HDR.size)
    off = _HDR.size + _KSK_PARAMS.size
    a = _view_u32(data, off, (N, dc, Bks, n))
    b = _view_u32(data, off + 4 * a_sz, (N, dc, Bks))
    return (lwemod.LweSwitchingKey(a=jnp.asarray(a), b=jnp.asarray(b)),
            int(q_ks))


# ---------------------------------------------------------------------------
# Bootstrapping key
# ---------------------------------------------------------------------------

_BSK_PARAMS = struct.Struct("<IIIIIIQQI4x")
# lwe_n, lwe_log_q, rlwe_N, num_limbs, dG2, base_log, Q, ksk_size, layout


def pack_bsk(params: TfheParams, key: rgswmod.BootstrapKey) -> bytes:
    """Bootstrap key -> packed bytes, in the exact tensor layout the
    blind-rotate kernel consumes ([n, 2, dG2, 2, N] EVAL/Montgomery --
    KEY_LAYOUT_NTT | KEY_LAYOUT_MONT; the Shoup dual is regenerable so it
    is not packed)."""
    bsk = np.asarray(key.bsk)
    ksk_blob = pack_switching_key(key.ksk, params.q_ks)
    layout = KEY_LAYOUT_NTT | KEY_LAYOUT_MONT
    head = _BSK_PARAMS.pack(params.n, int(params.q).bit_length(), params.N,
                            1, params.digits_g2,
                            int(params.base_g).bit_length() - 1, params.Q,
                            len(ksk_blob), layout)
    payload = head + _u32s(bsk) + ksk_blob
    return _header(BOOTSTRAPPING_KEY, _HDR.size + len(payload),
                   params.n, layout) + payload


def unpack_bsk(params: TfheParams, data: bytes,
               with_shoup: bool = True) -> rgswmod.BootstrapKey:
    _parse_header(data, BOOTSTRAPPING_KEY)
    (n, _logq, N, _limbs, dg2, _blog, Q, ksk_size,
     layout) = _BSK_PARAMS.unpack_from(data, _HDR.size)
    if (n, N, dg2, Q) != (params.n, params.N, params.digits_g2, params.Q):
        raise ValueError("packed bootstrap key does not match params")
    if not (layout & KEY_LAYOUT_NTT) or not (layout & KEY_LAYOUT_MONT):
        raise ValueError("unsupported bootstrap key layout")
    off = _HDR.size + _BSK_PARAMS.size
    shape = (n, 2, dg2, 2, N)
    bsk_np = _view_u32(data, off, shape)
    ksk, _q_ks = unpack_switching_key(data[off + 4 * bsk_np.size:])
    bsk = jnp.asarray(bsk_np)
    shoup = rgswmod.shoup_dual(bsk, params.Q) if with_shoup else None
    return rgswmod.BootstrapKey(bsk=bsk, ksk=ksk, bsk_shoup=shoup)
