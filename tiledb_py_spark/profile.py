"""Named configuration profiles (reference ``tiledb/profile.py:1-117``).

A profile is a named bag of config parameters persisted under a profile
directory (default ``~/.tiledb``), loadable by name — the reference uses
it for saved connection/config presets.  Spark rebuild: one JSON file per
profile dir at ``<dir>/profiles.json`` holding ``{name: {param: value}}``;
``Config``/``Ctx`` consumers can merge a loaded profile's params.
"""

from __future__ import annotations

import json
import os
from typing import Optional


class TileDBError(Exception):
    pass


_DEFAULT_NAME = "default"


def _profiles_file(dir: Optional[str]) -> str:
    base = dir or os.path.join(os.path.expanduser("~"), ".tiledb")
    return os.path.join(base, "profiles.json")


def _read_all(dir: Optional[str]) -> dict:
    f = _profiles_file(dir)
    if not os.path.isfile(f):
        return {}
    with open(f) as fh:
        return json.load(fh)


def _write_all(dir: Optional[str], data: dict) -> None:
    f = _profiles_file(dir)
    os.makedirs(os.path.dirname(f), exist_ok=True)
    tmp = f + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    os.replace(tmp, f)


class Profile:
    """Named parameter set with save/load/remove lifecycle
    (reference ``Profile``: ``__setitem__``/``__getitem__``/``get``/
    ``save``/``load``/``remove``)."""

    def __init__(self, name: Optional[str] = None, dir: Optional[str] = None):
        self._name = name or _DEFAULT_NAME
        self._dir = dir
        self._params: dict[str, str] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def dir(self) -> Optional[str]:
        return self._dir

    def __setitem__(self, param: str, value: str) -> None:
        self._params[str(param)] = str(value)

    def __getitem__(self, param: str) -> str:
        return self.get(param, raise_keyerror=True)

    def get(self, param: str, raise_keyerror: bool = True) -> Optional[str]:
        val = self._params.get(param)
        if val is None and raise_keyerror:
            raise KeyError(param)
        return val

    def items(self):
        return self._params.items()

    def __repr__(self) -> str:
        body = json.dumps(self._params, indent=1, sort_keys=True)
        return f"Profile(name={self._name!r}, dir={self._dir!r}, params={body})"

    def save(self, overwrite: bool = False) -> None:
        data = _read_all(self._dir)
        if self._name in data and not overwrite:
            raise TileDBError(
                f"profile {self._name!r} already exists (pass overwrite=True)")
        data[self._name] = dict(self._params)
        _write_all(self._dir, data)

    @classmethod
    def load(cls, name: Optional[str] = None, dir: Optional[str] = None) -> "Profile":
        name = name or _DEFAULT_NAME
        data = _read_all(dir)
        if name not in data:
            raise TileDBError(f"no profile {name!r}")
        p = cls(name, dir)
        p._params = dict(data[name])
        return p

    @classmethod
    def remove(cls, name: Optional[str] = None, dir: Optional[str] = None) -> None:
        name = name or _DEFAULT_NAME
        data = _read_all(dir)
        if name not in data:
            raise TileDBError(f"no profile {name!r}")
        del data[name]
        _write_all(dir, data)
