"""Bootstrapped boolean gates (reference: src/binfhe/examples/boolean.cpp):
encrypt bits, evaluate AND/OR/XOR/NAND with gate bootstrapping, decrypt."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.tfhe import BinFheContext, Gate

ctx = BinFheContext.generate("TOY")          # STD128 for production
rng = np.random.default_rng(1)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)

m1 = np.array([0, 0, 1, 1])
m2 = np.array([0, 1, 0, 1])
ct1, ct2 = ctx.encrypt(sk, m1, rng), ctx.encrypt(sk, m2, rng)

for gate, ref in [(Gate.AND, m1 & m2), (Gate.OR, m1 | m2),
                  (Gate.XOR, m1 ^ m2), (Gate.NAND, 1 - (m1 & m2))]:
    out = ctx.eval_bin_gate(key, gate, ct1, ct2)
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    print(f"{gate.name:5s} {got.tolist()}  expected {ref.tolist()}")
    assert np.array_equal(got, ref)
print("boolean gates: OK")
