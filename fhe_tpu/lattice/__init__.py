"""Lattice layer: RNS/DCRT ring elements (reference: src/core/lattice)."""

from . import rns

__all__ = ["rns"]
