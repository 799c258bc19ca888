"""Serialization: deterministic binary + JSON container for every key and
ciphertext type.

The TPU-native replacement for the reference's cereal layer
(/root/reference/src/core/include/utils/serial.h:69-71 -- JSON and
portable-binary archives; per-object -ser.h shims like
binfhecontext-ser.h).  Design: every registered dataclass pytree
serializes to a flat dict {path: numpy array} plus a JSON-able static
spec; the container format is a single .npz-style zip (numpy save) or
pure-JSON (base64 arrays) for interop/debugging, with a format version
and type tag for forward compatibility.
"""

from __future__ import annotations

import base64
import dataclasses
import enum
import io
import json
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 1

_REGISTRY: dict[str, type] = {}


def register(cls):
    """Register a dataclass pytree for serialization (type tag = qualname)."""
    _REGISTRY[f"{cls.__module__}.{cls.__qualname__}"] = cls
    return cls


def _type_tag(obj) -> str:
    cls = type(obj)
    return f"{cls.__module__}.{cls.__qualname__}"


def _flatten(obj, path: str, arrays: dict, spec: dict):
    if obj is None:
        spec[path] = {"kind": "none"}
    elif isinstance(obj, (jax.Array, np.ndarray)):
        arrays[path] = np.asarray(jax.device_get(obj))
        spec[path] = {"kind": "array"}
    elif isinstance(obj, (int, float, str, bool)):
        spec[path] = {"kind": "scalar", "value": obj}
    elif isinstance(obj, bytes):
        spec[path] = {"kind": "bytes"}
        arrays[path] = np.frombuffer(obj, dtype=np.uint8)
    elif isinstance(obj, enum.Enum):
        spec[path] = {"kind": "enum", "type": _type_tag(obj),
                      "name": obj.name}
    elif isinstance(obj, tuple):
        spec[path] = {"kind": "tuple", "items": len(obj)}
        for i, v in enumerate(obj):
            _flatten(v, f"{path}.{i}", arrays, spec)
    elif isinstance(obj, list):
        spec[path] = {"kind": "list", "items": len(obj)}
        for i, v in enumerate(obj):
            _flatten(v, f"{path}.{i}", arrays, spec)
    elif isinstance(obj, dict):
        keys = sorted(obj.keys(), key=str)
        spec[path] = {"kind": "dict", "keys": [repr(k) for k in keys]}
        for i, k in enumerate(keys):
            _flatten(obj[k], f"{path}.{i}", arrays, spec)
    elif dataclasses.is_dataclass(obj):
        tag = _type_tag(obj)
        if tag not in _REGISTRY:
            _REGISTRY[tag] = type(obj)
        fields = [f.name for f in dataclasses.fields(obj)]
        spec[path] = {"kind": "object", "type": tag, "fields": fields}
        for f in fields:
            _flatten(getattr(obj, f), f"{path}.{f}", arrays, spec)
    else:
        raise TypeError(f"cannot serialize {type(obj)} at {path}")


def _unflatten(path: str, arrays: dict, spec: dict):
    ent = spec[path]
    kind = ent["kind"]
    if kind == "none":
        return None
    if kind == "array":
        return jnp.asarray(arrays[path])
    if kind == "scalar":
        return ent["value"]
    if kind == "bytes":
        return arrays[path].tobytes()
    if kind == "enum":
        cls = _REGISTRY.get(ent["type"]) or _import_type(ent["type"])
        return cls[ent["name"]]
    if kind == "tuple":
        return tuple(_unflatten(f"{path}.{i}", arrays, spec)
                     for i in range(ent["items"]))
    if kind == "list":
        return [_unflatten(f"{path}.{i}", arrays, spec)
                for i in range(ent["items"])]
    if kind == "dict":
        out = {}
        for i, kr in enumerate(ent["keys"]):
            out[eval(kr)] = _unflatten(f"{path}.{i}", arrays, spec)  # noqa: S307 -- keys are repr of int/str we wrote
        return out
    if kind == "object":
        cls = _REGISTRY.get(ent["type"])
        if cls is None:
            cls = _import_type(ent["type"])
        kwargs = {f: _unflatten(f"{path}.{f}", arrays, spec)
                  for f in ent["fields"]}
        return cls(**kwargs)
    raise ValueError(f"bad spec kind {kind}")


def _import_type(tag: str):
    mod, _, name = tag.rpartition(".")
    import importlib
    m = importlib.import_module(mod)
    obj = m
    for part in name.split("."):
        obj = getattr(obj, part)
    _REGISTRY[tag] = obj
    return obj


def dumps(obj, mode: str = "binary") -> bytes:
    """Serialize to bytes. mode='binary' (npz container, compact) or
    'json' (text archive with base64 arrays, interop/debug)."""
    arrays: dict[str, np.ndarray] = {}
    spec: dict[str, Any] = {}
    _flatten(obj, "r", arrays, spec)
    header = {"version": FORMAT_VERSION, "spec": spec}
    if mode == "json":
        payload = {k: {"dtype": str(v.dtype), "shape": list(v.shape),
                       "data": base64.b64encode(v.tobytes()).decode()}
                   for k, v in arrays.items()}
        return json.dumps({"header": header, "arrays": payload}).encode()
    buf = io.BytesIO()
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(buf, **arrays)
    return buf.getvalue()


def loads(data: bytes, mode: str = "binary"):
    if mode == "json":
        doc = json.loads(data.decode())
        header = doc["header"]
        arrays = {k: np.frombuffer(
            base64.b64decode(v["data"]),
            dtype=np.dtype(v["dtype"])).reshape(v["shape"])
            for k, v in doc["arrays"].items()}
    else:
        with np.load(io.BytesIO(data)) as z:
            arrays = {k: z[k] for k in z.files}
        header = json.loads(bytes(arrays.pop("__header__")).decode())
    if header["version"] > FORMAT_VERSION:
        raise ValueError(f"format version {header['version']} too new")
    return _unflatten("r", arrays, header["spec"])


def save(obj, path: str, mode: str = "binary"):
    with open(path, "wb") as f:
        f.write(dumps(obj, mode))


def load(path: str, mode: str = "binary"):
    with open(path, "rb") as f:
        return loads(f.read(), mode)
