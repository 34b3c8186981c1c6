"""Array metadata: dict-like KV store persisted in the manifest.

Reference: ``tiledb/metadata.py:19-263`` — values may be int, float, str,
bytes, homogeneous lists/tuples, or numpy arrays (flattened).  We encode
each value with a type tag so JSON round-trips restore the exact Python
type, including numpy arrays (flattened, like the reference).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from . import manifest as mf


def _pack(value: Any) -> dict:
    if isinstance(value, (bool, np.bool_)):
        return {"t": "int", "v": int(value)}
    if isinstance(value, (int, np.integer)):
        return {"t": "int", "v": int(value)}
    if isinstance(value, (float, np.floating)):
        return {"t": "float", "v": float(value)}
    if isinstance(value, str):
        return {"t": "str", "v": value}
    if isinstance(value, bytes):
        return {"t": "bytes", "v": value.decode("latin-1")}
    if isinstance(value, np.ndarray):
        if value.ndim != 1:
            value = value.reshape(-1)  # flattened, like the reference
        k = value.dtype.kind
        if k in "Mm":
            # JSON-safe tick counts; the dtype string restores the unit
            # (.item() would yield datetime objects json.dump rejects)
            return {"t": "ndarray", "dtype": str(value.dtype),
                    "v": [int(x) for x in value.view("int64")]}
        if k == "S":
            return {"t": "ndarray", "dtype": str(value.dtype),
                    "v": [x.decode("latin-1") for x in value]}
        if k == "U":
            return {"t": "ndarray", "dtype": str(value.dtype),
                    "v": [str(x) for x in value]}
        if k not in "biuf":
            raise TypeError(
                f"unsupported metadata array dtype {value.dtype}")
        return {"t": "ndarray", "dtype": str(value.dtype),
                "v": [v.item() for v in value]}
    if isinstance(value, (list, tuple)):
        if len(value) == 0:
            return {"t": "list", "et": "int", "v": [],
                    "tuple": isinstance(value, tuple)}
        et = type(value[0])
        if not all(isinstance(v, et) for v in value):
            raise TypeError("metadata lists must be homogeneous (reference rule)")
        if issubclass(et, (bool, np.bool_, int, np.integer)):
            return {"t": "list", "et": "int", "v": [int(v) for v in value],
                    "tuple": isinstance(value, tuple)}
        if issubclass(et, (float, np.floating)):
            return {"t": "list", "et": "float", "v": [float(v) for v in value],
                    "tuple": isinstance(value, tuple)}
        if issubclass(et, str):
            return {"t": "list", "et": "str", "v": list(value),
                    "tuple": isinstance(value, tuple)}
        raise TypeError(f"unsupported metadata list element type {et}")
    raise TypeError(f"unsupported metadata value type {type(value)}")


def _unpack(d: dict) -> Any:
    t = d["t"]
    if t == "int":
        return d["v"]
    if t == "float":
        return d["v"]
    if t == "str":
        return d["v"]
    if t == "bytes":
        return d["v"].encode("latin-1")
    if t == "ndarray":
        dt = np.dtype(d["dtype"])
        if dt.kind in "Mm":
            return np.array(d["v"], dtype="int64").view(dt)
        if dt.kind == "S":
            return np.array([s.encode("latin-1") for s in d["v"]],
                            dtype=dt)
        return np.array(d["v"], dtype=dt)
    if t == "list":
        v = list(d["v"])
        return tuple(v) if d.get("tuple") else v
    raise TypeError(f"bad metadata tag {t}")


class Metadata:
    """``A.meta`` — reads hit the cached manifest; each write commits a new
    manifest version (same durability model as the reference's ``__meta``
    fragment files)."""

    def __init__(self, uri: str):
        self.uri = uri
        self._cache: tuple | None = None  # (version, metadata dict)

    def _read(self) -> dict:
        # parse the manifest once per VERSION, not once per read — the
        # manifest holds every fragment record, so a per-key get() loop
        # was O(manifest size) per call.  latest_version is a cheap
        # stat-probe; any external commit bumps it and invalidates.
        v = mf.latest_version(self.uri)
        if self._cache is not None and self._cache[0] == v:
            return self._cache[1]
        meta = mf.read_manifest(self.uri, v).metadata
        self._cache = (v, meta)
        return meta

    def __getitem__(self, key: str) -> Any:
        meta = self._read()
        if key not in meta:
            raise KeyError(key)
        return _unpack(meta[key])

    def get(self, key: str, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key: str, value: Any) -> None:
        if not isinstance(key, str):
            raise TypeError("metadata keys must be str")
        packed = _pack(value)
        mf.commit(self.uri, lambda m: m.metadata.__setitem__(key, packed))

    def __delitem__(self, key: str) -> None:
        def _del(m):
            if key not in m.metadata:
                raise KeyError(key)
            del m.metadata[key]

        mf.commit(self.uri, _del)

    def __contains__(self, key: str) -> bool:
        return key in self._read()

    def __len__(self) -> int:
        return len(self._read())

    def keys(self):
        return list(self._read().keys())

    def values(self):
        return [_unpack(v) for v in self._read().values()]

    def items(self):
        return [(k, _unpack(v)) for k, v in self._read().items()]

    def setdefault(self, key: str, default=None):
        """dict.setdefault semantics — check-and-set in ONE manifest
        commit (a read-then-write pair lets two concurrent setdefaults
        both observe 'missing' and the later clobber the earlier)."""
        packed = _pack(default)
        out: dict = {}

        def _mut(m):
            out.clear()  # commit retries re-run the closure
            if key in m.metadata:
                out["existing"] = m.metadata[key]
            else:
                m.metadata[key] = packed

        mf.commit(self.uri, _mut)
        return _unpack(out["existing"]) if "existing" in out else default

    def pop(self, key: str, *default):
        """dict.pop semantics — remove-and-return in ONE commit."""
        out: dict = {}

        def _mut(m):
            out.clear()
            if key in m.metadata:
                out["v"] = m.metadata.pop(key)

        mf.commit(self.uri, _mut)
        if "v" in out:
            return _unpack(out["v"])
        if default:
            return default[0]
        raise KeyError(key)

    def popitem(self):
        """dict.popitem semantics — pick-and-remove in ONE commit."""
        out: dict = {}

        def _mut(m):
            out.clear()
            if m.metadata:
                k = next(reversed(m.metadata))
                out["kv"] = (k, m.metadata.pop(k))

        mf.commit(self.uri, _mut)
        if "kv" not in out:
            raise KeyError("metadata is empty")
        k, v = out["kv"]
        return (k, _unpack(v))

    def clear(self) -> None:
        """Remove every key in ONE commit (reference MutableMapping
        surface)."""
        mf.commit(self.uri, lambda m: m.metadata.clear())

    def dump(self) -> None:
        """Print all metadata (reference ``metadata.py:260-263``)."""
        for k, v in self.items():
            print(f"### {k} ###\n{v!r}")

    def consolidate(self, config=None, ctx=None) -> None:
        """Consolidate metadata (reference ``metadata.py:225-235``).
        Metadata lives IN the manifest here — one committed document,
        never fragmented — so there is nothing to fold; a no-op kept
        for drop-in compatibility."""
        self._read()  # validates the array still exists

    def update(self, other=(), /, **kwargs) -> None:
        """Set several keys in ONE manifest commit — per-key
        ``__setitem__`` commits multiply version churn and let a crash
        tear related keys apart (e.g. the filestore's size/mime
        pair)."""
        items = dict(other, **kwargs)
        for k in items:
            if not isinstance(k, str):
                raise TypeError("metadata keys must be str")
        packed = {k: _pack(v) for k, v in items.items()}
        if packed:
            mf.commit(self.uri, lambda m: m.metadata.update(packed))

    def __iter__(self):
        return iter(self.keys())
