"""TFHE/FHEW layer: LWE, RGSW, gate bootstrapping (reference: src/binfhe)."""

from .params import TfheParams, Method, Gate, KeyDist, make_params, PARAM_SETS
from .context import BinFheContext
from . import lwe, rgsw, boot, acc, threshold, transcript, zkp

__all__ = ["TfheParams", "Method", "Gate", "KeyDist", "make_params",
           "PARAM_SETS", "BinFheContext", "lwe", "rgsw", "boot", "acc",
           "threshold", "transcript", "zkp"]
