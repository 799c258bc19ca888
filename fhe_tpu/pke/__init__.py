"""PKE layer: CKKS/BGV/BFV RNS schemes (reference: src/pke)."""

from . import params, rlwe, ckks

__all__ = ["params", "rlwe", "ckks"]
