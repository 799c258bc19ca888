"""Serialization roundtrip (reference: boolean-serial-binary.cpp /
pre-buffer.cpp): keys and ciphertexts through binary + JSON archives."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.tfhe import BinFheContext, Gate
from fhe_tpu.utils import serial

ctx = BinFheContext.generate("TOY")
rng = np.random.default_rng(4)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)
ct = ctx.encrypt(sk, np.array([1, 0]), rng)

blob = serial.dumps(ct)                       # binary container
ct2 = serial.loads(blob)
jblob = serial.dumps(sk, mode="json")         # JSON archive
sk2 = serial.loads(jblob, mode="json")
out = ctx.eval_bin_gate(key, Gate.OR, ct2, ct2)
got = np.asarray(ctx.decrypt(sk2, out, p=4))
print(f"binary ct {len(blob)}B, json sk {len(jblob)}B, OR -> {got.tolist()}")
assert got.tolist() == [1, 0]
print("serialization roundtrip: OK")
