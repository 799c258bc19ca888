"""fhEVM: EVM-compatible encrypted integer types and operations.

Reference semantics: /root/reference/src/binfhe/include/fhevm/fhevm.h
(FheType euint4..euint256/eaddress/ebool :35-49; arithmetic, comparison,
bitwise, select, cast, trivial-encrypt op surface :3-13) built on RadixInt
+ ShortIntLUTs (lib/fhevm/fhevm.cpp:60-150).

The context wraps a BinFHE context at a q=4096 gate modulus (plaintext
space 16 = 2-bit message x 2-bit carry limbs); every op delegates to the
batched radix engine.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from .context import BinFheContext
from . import lwe, radix, rgsw
from .radix import RadixParams


class FheType(enum.Enum):
    EBOOL = "ebool"
    EUINT4 = "euint4"
    EUINT8 = "euint8"
    EUINT16 = "euint16"
    EUINT32 = "euint32"
    EUINT64 = "euint64"
    EUINT128 = "euint128"
    EUINT256 = "euint256"
    EADDRESS = "eaddress"


TYPE_PARAMS: dict[FheType, RadixParams] = {
    FheType.EBOOL: radix.EBOOL,
    FheType.EUINT4: radix.EUINT4,
    FheType.EUINT8: radix.EUINT8,
    FheType.EUINT16: radix.EUINT16,
    FheType.EUINT32: radix.EUINT32,
    FheType.EUINT64: radix.EUINT64,
    FheType.EUINT128: radix.EUINT128,
    FheType.EUINT256: radix.EUINT256,
    FheType.EADDRESS: radix.EADDRESS,
}


@dataclasses.dataclass
class EncryptedInt:
    """A typed handle over a RadixInt (fhevm.h's euintN)."""
    value: radix.RadixInt
    fhe_type: FheType


@dataclasses.dataclass
class FheContext:
    """fhevm.cpp FheContext: BinFHE context + bootstrap key, fixed to the
    radix-friendly parameter profile."""
    ctx: BinFheContext
    key: rgsw.BootstrapKey | None = None
    sk: lwe.LweSecretKey | None = None

    @classmethod
    def create(cls, param_set: str = "TOY_RADIX",
               rng: np.random.Generator | int = 0) -> "FheContext":
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        ctx = BinFheContext.generate(param_set)
        sk = ctx.key_gen(rng)
        key = ctx.bt_key_gen(sk, rng)
        return cls(ctx=ctx, key=key, sk=sk)

    @property
    def params(self):
        return self.ctx.params

    # -- encryption ----------------------------------------------------------
    def encrypt(self, values, fhe_type: FheType,
                rng: np.random.Generator | int = 0) -> EncryptedInt:
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        rp = TYPE_PARAMS[fhe_type]
        return EncryptedInt(radix.encrypt(self.params, rp, self.sk, values,
                                          rng), fhe_type)

    def trivial_encrypt(self, values, fhe_type: FheType) -> EncryptedInt:
        rp = TYPE_PARAMS[fhe_type]
        return EncryptedInt(radix.trivial_encrypt(self.params, rp, values),
                            fhe_type)

    def decrypt(self, x: EncryptedInt):
        return radix.decrypt(self.params, x.value.rp, self.sk, x.value)

    # -- arithmetic ----------------------------------------------------------
    def add(self, a: EncryptedInt, b: EncryptedInt) -> EncryptedInt:
        return EncryptedInt(radix.add(self.params, self.key, a.value,
                                      b.value), a.fhe_type)

    def sub(self, a: EncryptedInt, b: EncryptedInt) -> EncryptedInt:
        return EncryptedInt(radix.sub(self.params, self.key, a.value,
                                      b.value), a.fhe_type)

    def mul(self, a: EncryptedInt, b: EncryptedInt) -> EncryptedInt:
        return EncryptedInt(radix.mul(self.params, self.key, a.value,
                                      b.value), a.fhe_type)

    # -- comparison (returns ebool LWE bit) -----------------------------------
    def _cmp(self, op, a, b) -> lwe.LweCiphertext:
        return radix.compare(self.params, self.key, op, a.value, b.value)

    def eq(self, a, b): return self._cmp("eq", a, b)
    def ne(self, a, b): return self._cmp("ne", a, b)
    def lt(self, a, b): return self._cmp("lt", a, b)
    def le(self, a, b): return self._cmp("le", a, b)
    def gt(self, a, b): return self._cmp("gt", a, b)
    def ge(self, a, b): return self._cmp("ge", a, b)

    def decrypt_bool(self, bit: lwe.LweCiphertext) -> np.ndarray:
        p = TYPE_PARAMS[FheType.EBOOL].limb.p
        return np.asarray(lwe.decrypt(self.params, self.sk, bit, p=p)) & 1

    # -- bitwise --------------------------------------------------------------
    def and_(self, a, b):
        return EncryptedInt(radix.bitwise(self.params, self.key, "and",
                                          a.value, b.value), a.fhe_type)

    def or_(self, a, b):
        return EncryptedInt(radix.bitwise(self.params, self.key, "or",
                                          a.value, b.value), a.fhe_type)

    def xor(self, a, b):
        return EncryptedInt(radix.bitwise(self.params, self.key, "xor",
                                          a.value, b.value), a.fhe_type)

    def not_(self, a):
        return EncryptedInt(radix.bit_not(self.params, self.key, a.value),
                            a.fhe_type)

    # -- control --------------------------------------------------------------
    def select(self, cond: lwe.LweCiphertext, a: EncryptedInt,
               b: EncryptedInt) -> EncryptedInt:
        return EncryptedInt(radix.select(self.params, self.key, cond,
                                         a.value, b.value), a.fhe_type)

    def cast(self, a: EncryptedInt, to: FheType) -> EncryptedInt:
        return EncryptedInt(radix.cast(self.params, a.value,
                                       TYPE_PARAMS[to]), to)
