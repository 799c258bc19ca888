"""Shared example bootstrap: put the repo root on sys.path and force
the CPU backend with a virtual 8-device mesh unless a TPU is present
(examples run anywhere)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

if jax.default_backend() not in ("tpu",):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")
