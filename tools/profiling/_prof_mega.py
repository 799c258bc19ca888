"""Stage ablation of the mega2 blind-rotate kernel on the real TPU.

Each FHE_MEGA_ABLATE variant recompiles the kernel with one stage
replaced by a cheap stand-in; the full-vs-ablated delta attributes the
step cost.  Random key material (timing only)."""
import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from fhe_tpu.tfhe import params as tp, boot_mxu
from fhe_tpu.math import ntt_lane as nl

B = int(os.environ.get("PROF_B", "2048"))
params = tp.make_params("STD128")
N, Q, n = params.N, params.Q, params.n
dg2 = params.digits_g2
rng = np.random.default_rng(0)

bsk = jnp.asarray(rng.integers(0, Q, size=(n, 2, dg2, 2, N)).astype(np.uint32))
bsk_s = jnp.asarray((np.asarray(bsk).astype(np.uint64) << 32) // Q
                    ).astype(jnp.uint32)
acc = jnp.asarray(rng.integers(0, Q, size=(B, 2, N)).astype(np.uint32))
a = jnp.asarray(rng.integers(0, params.q, size=(B, n)).astype(np.uint32))

variant = sys.argv[1] if len(sys.argv) > 1 else ""
os.environ["FHE_MEGA_ABLATE"] = variant

fn = jax.jit(lambda b, bs, ac, aa: boot_mxu.blind_rotate_mega2(
    params, b, bs, ac, aa))
out = fn(bsk, bsk_s, acc, a)
jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(bsk, bsk_s, acc, a)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"ABLATE={variant or 'none':12s} {best*1e3:9.2f} ms/batch "
      f"({B/best:8.1f} gates/s)", flush=True)
