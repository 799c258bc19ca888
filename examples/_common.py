"""Shared example bootstrap: put the repo root on sys.path and pick a
backend.  Examples default to the CPU backend with a virtual 8-device
mesh -- the PKE walkthroughs are eager op-by-op drivers, and routing
every tiny op through a remote TPU compile is pathologically slow.  Set
FHE_EXAMPLES_TPU=1 to keep the ambient TPU (worthwhile for the batched
TFHE examples)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

if not (os.environ.get("FHE_EXAMPLES_TPU") == "1"
        and jax.default_backend() == "tpu"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")
