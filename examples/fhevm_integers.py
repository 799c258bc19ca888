"""fhEVM encrypted integers (reference: fhevm.h + evm_functional_tests):
euint8 arithmetic, comparison, select."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.tfhe import fhevm

fc = fhevm.FheContext.create("TOY_RADIX", rng=7)
a = fc.encrypt(np.array([37, 200]), fhevm.FheType.EUINT8, rng=1)
b = fc.encrypt(np.array([85, 99]), fhevm.FheType.EUINT8, rng=2)
print("a+b =", fc.decrypt(fc.add(a, b)), "(expect [122 43])")
print("a*b =", fc.decrypt(fc.mul(a, b)), "(expect [81 84])")   # mod 256
lt = fc.lt(a, b)
print("a<b =", fc.decrypt_bool(lt).tolist(), "(expect [1, 0])")
sel = fc.select(lt, a, b)
print("min =", fc.decrypt(sel), "(expect [37 99])")
print("fhevm integers: OK")
