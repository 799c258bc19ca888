"""PKE layer: CKKS/BGV/BFV RNS schemes, bootstrapping, scheme switching
(reference: src/pke)."""

from . import params, rlwe, ckks

__all__ = ["params", "rlwe", "ckks", "bgv", "bfv", "advanced",
           "bootstrap", "schemeswitch", "multiparty", "pre"]


def __getattr__(name):
    # lazy submodule access (bootstrap/schemeswitch pull in tfhe)
    if name in __all__:
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
