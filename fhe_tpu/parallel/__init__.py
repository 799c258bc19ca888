"""Device-mesh parallelism (no reference counterpart; SURVEY SS2.7)."""

from . import batch

__all__ = ["batch"]
