"""Gate truth tables across blind-rotation methods (reference:
boolean-truth-tables.cpp, boolean-ap.cpp, boolean-lmkcdey.cpp,
boolean-multi-input.cpp): every 2-input gate over all 4 input pairs for
GINX/AP/LMKCDEY, plus multi-input AND3/OR3/MAJORITY and CMUX."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.tfhe import BinFheContext, Gate

TRUTH = {
    Gate.AND: lambda a, b: a & b, Gate.OR: lambda a, b: a | b,
    Gate.NAND: lambda a, b: 1 - (a & b), Gate.NOR: lambda a, b: 1 - (a | b),
    Gate.XOR: lambda a, b: a ^ b, Gate.XNOR: lambda a, b: 1 - (a ^ b),
}

m1 = np.array([0, 0, 1, 1])
m2 = np.array([0, 1, 0, 1])

for method in ("GINX", "AP", "LMKCDEY"):
    # LMKCDEY's round-to-odd automorphism exponents need q == 2N
    # (binfhe-constants-impl.cpp pairs the _LMKCDEY sets accordingly)
    pset = "TOY_LMKCDEY" if method == "LMKCDEY" else "TOY"
    ctx = BinFheContext.generate(pset, method=method)
    rng = np.random.default_rng(7)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    ct1, ct2 = ctx.encrypt(sk, m1, rng), ctx.encrypt(sk, m2, rng)
    for gate, f in TRUTH.items():
        got = np.asarray(ctx.decrypt(sk, ctx.eval_bin_gate(key, gate,
                                                           ct1, ct2), p=4))
        assert np.array_equal(got, f(m1, m2)), (method, gate)
    # NOT is bootstrap-free
    got = np.asarray(ctx.decrypt(sk, ctx.eval_not(ct1), p=4))
    assert np.array_equal(got, 1 - m1)
    print(f"{method:8s} all 2-input truth tables + NOT: OK")

# multi-input gates + CMUX (the reference's _3/_4 paramset workflow;
# the 3-input encoding needs plaintext space p=6, majority p=4)
ctx = BinFheContext.generate("TOY", method="GINX")
rng = np.random.default_rng(9)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)
bits = [np.array([0, 1, 1, 1]), np.array([0, 1, 0, 1]),
        np.array([0, 1, 1, 0])]
for gate, p, want in [
    (Gate.AND3, 6, bits[0] & bits[1] & bits[2]),
    (Gate.OR3, 6, bits[0] | bits[1] | bits[2]),
    (Gate.MAJORITY, 4, (bits[0] + bits[1] + bits[2] >= 2).astype(int)),
]:
    cts = [ctx.encrypt(sk, b, rng, p=p) for b in bits]
    got = np.asarray(ctx.decrypt(sk, ctx.eval_bin_gate_multi(key, gate, cts),
                                 p=p))
    assert np.array_equal(got, want), gate
    print(f"{gate.name:9s} {got.tolist()}  expected {want.tolist()}")
cts = [ctx.encrypt(sk, b, rng) for b in bits]

sel = ctx.encrypt(sk, np.array([0, 1, 0, 1]), rng)
mux = ctx.eval_cmux(key, cts[0], cts[1], sel)
want = np.where(np.array([0, 1, 0, 1]) == 1, bits[1], bits[0])
assert np.array_equal(np.asarray(ctx.decrypt(sk, mux, p=4)), want)
print("CMUX: OK")
