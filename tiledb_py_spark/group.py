"""Groups: hierarchical containers of arrays/groups + metadata.

Reference: ``/root/reference/tiledb/group.py:11-354`` — create/open,
add/remove members (with optional relative paths + names), member
iteration, group metadata.  Spark mapping per SURVEY.md §1.4: a directory
with a JSON member registry (catalog-namespace analog).
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
from dataclasses import dataclass
from typing import Any, Optional

from .metadata import _pack, _unpack

GROUP_FILE = "__group.json"
META_DIR = "__group_meta"


@dataclass
class Member:
    uri: str
    type: str  # "array" | "group"
    name: Optional[str] = None
    relative: bool = False


class GroupMetadata:
    """Group metadata over a delta LOG (reference group meta fragments):
    each write appends a small delta file under ``__group_meta/``; reads
    fold base + deltas in commit order; ``Group.consolidate_metadata``
    merges the log into the base document and ``vacuum_metadata`` removes
    the folded delta files (reference ``group.py:321-352``)."""

    def __init__(self, group: "Group"):
        self._group = group

    def _meta(self) -> dict:
        return self._group._meta_view()

    def __setitem__(self, key: str, value: Any):
        self._group._append_meta_delta({key: _pack(value)})

    def __getitem__(self, key: str) -> Any:
        return _unpack(self._meta()[key])

    def __delitem__(self, key: str):
        if key not in self._meta():
            raise KeyError(key)
        self._group._append_meta_delta({key: None})  # None = tombstone

    def __contains__(self, key: str) -> bool:
        return key in self._meta()

    def __len__(self) -> int:
        return len(self._meta())

    def keys(self):
        return list(self._meta().keys())

    def items(self):
        return [(k, _unpack(v)) for k, v in self._meta().items()]


class Group:
    """Open group handle (``tiledb.Group(uri, mode)``)."""

    def __init__(self, uri: str, mode: str = "r"):
        from .manifest import require_local_uri

        self.uri = uri
        self.mode = mode
        self._path = os.path.join(require_local_uri(uri), GROUP_FILE)
        if not os.path.isfile(self._path):
            raise FileNotFoundError(f"no group at {uri}")
        with open(self._path) as f:
            self._state = json.load(f)

    @staticmethod
    def create(uri: str) -> None:
        from .manifest import require_local_uri

        uri = require_local_uri(uri)
        os.makedirs(uri, exist_ok=True)
        path = os.path.join(uri, GROUP_FILE)
        if os.path.exists(path):
            raise FileExistsError(f"group already exists at {uri}")
        with open(path, "w") as f:
            json.dump({"members": [], "metadata": {}}, f)

    def _mutate(self, fn) -> None:
        if self.mode != "w":
            raise PermissionError("group not opened in write mode")
        # apply to a FRESH read of the group file, not this handle's
        # cached state — writing the cached snapshot would silently
        # revert every change made through another handle since open
        # (worst case: reverting consolidate_metadata's folded base,
        # whose delta files vacuum_metadata then deletes — permanent
        # metadata loss)
        with open(self._path) as f:
            state = json.load(f)
        fn(state)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._path)
        self._state = state

    # -- members -------------------------------------------------------------
    def _resolve(self, uri: str, relative: bool) -> str:
        return os.path.join(self.uri, uri) if relative else uri

    def add(self, uri: str, name: Optional[str] = None, relative: bool = False) -> None:
        from .highlevel import object_type

        ot = object_type(self._resolve(uri, relative))
        if ot is None:
            raise ValueError(f"no tiledb object at {uri}")
        self._mutate(lambda s: s["members"].append(
            {"uri": uri, "type": ot, "name": name, "relative": relative}))

    def remove(self, member: str) -> None:
        def _rm(s):
            before = len(s["members"])
            s["members"] = [m for m in s["members"]
                            if m["uri"] != member and m.get("name") != member]
            if len(s["members"]) == before:
                raise KeyError(member)

        self._mutate(_rm)

    def __len__(self) -> int:
        return len(self._state["members"])

    def __getitem__(self, key) -> Member:
        members = self._state["members"]
        if isinstance(key, int):
            m = members[key]
        else:
            matches = [m for m in members if m.get("name") == key]
            if not matches:
                raise KeyError(key)
            m = matches[0]
        return Member(uri=self._resolve(m["uri"], m.get("relative", False)),
                      type=m["type"], name=m.get("name"),
                      relative=m.get("relative", False))

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def __contains__(self, name: str) -> bool:
        return any(m.get("name") == name for m in self._state["members"])

    @property
    def meta(self) -> GroupMetadata:
        return GroupMetadata(self)

    # -- metadata log --------------------------------------------------------
    def _meta_dir(self) -> str:
        return os.path.join(self.uri, META_DIR)

    def _meta_deltas(self) -> list:
        d = self._meta_dir()
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d)
                      if n.startswith("meta_") and n.endswith(".json"))

    def _meta_view(self) -> dict:
        """Base metadata + delta log folded in commit order."""
        out = dict(self._state["metadata"])
        for name in self._meta_deltas():
            with open(os.path.join(self._meta_dir(), name)) as f:
                for k, v in json.load(f).items():
                    if v is None:
                        out.pop(k, None)
                    else:
                        out[k] = v
        return out

    #: process-wide monotonic sequence: same-millisecond deltas must still
    #: replay in write order (filenames sort by (ts, seq); the uuid only
    #: disambiguates across processes)
    _meta_seq = itertools.count()

    def _append_meta_delta(self, delta: dict) -> None:
        if self.mode != "w":
            raise PermissionError("group not opened in write mode")
        import time
        import uuid

        d = self._meta_dir()
        os.makedirs(d, exist_ok=True)
        name = (f"meta_{int(time.time() * 1000):013d}_"
                f"{next(self._meta_seq):06d}_{uuid.uuid4().hex[:8]}.json")
        tmp = os.path.join(d, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(delta, f)
        os.replace(tmp, os.path.join(d, name))

    @staticmethod
    def consolidate_metadata(uri: str, config=None, ctx=None) -> int:
        """Fold the metadata delta log into the base group document
        (reference ``Group.consolidate_metadata``, ``group.py:321-338``).
        The folded delta files stay on disk until ``vacuum_metadata``.
        Returns the number of deltas folded."""
        g = Group(uri, "w")
        deltas = g._meta_deltas()
        if not deltas:
            return 0
        folded = g._meta_view()
        g._mutate(lambda s: s.__setitem__("metadata", folded))
        marker = os.path.join(g._meta_dir(), ".consolidated.json")
        with open(marker, "w") as f:
            json.dump(deltas, f)
        return len(deltas)

    @staticmethod
    def vacuum_metadata(uri: str, config=None, ctx=None) -> int:
        """Remove delta files folded by a prior ``consolidate_metadata``
        (reference ``Group.vacuum_metadata``, ``group.py:340-352``)."""
        g = Group(uri, "w")
        marker = os.path.join(g._meta_dir(), ".consolidated.json")
        if not os.path.isfile(marker):
            return 0
        with open(marker) as f:
            folded = json.load(f)
        removed = 0
        for name in folded:
            p = os.path.join(g._meta_dir(), name)
            if os.path.isfile(p):
                os.remove(p)
                removed += 1
        os.remove(marker)
        return removed

    def is_relative(self, name: str) -> bool:
        """Whether the named member was added with ``relative=True``
        (reference ``group.py:299-306``)."""
        for m in self._state["members"]:
            if m.get("name") == name or m["uri"] == name:
                return bool(m.get("relative", False))
        raise KeyError(name)

    def open(self, mode: str = "r") -> None:
        """(Re)open this handle in ``mode`` (reference
        ``group.py:117-125``)."""
        if mode not in ("r", "w", "m", "d"):
            raise ValueError(f"invalid mode {mode}")
        with open(self._path) as f:
            self._state = json.load(f)
        self.mode = mode
        self._closed = False

    def set_config(self, cfg) -> None:
        """Attach a Config (reference ``group.py:308-318``; declarative
        here — the manifest layer has no per-group config knobs)."""
        if self.isopen:
            raise ValueError(
                "set_config can only be used on closed groups; call "
                "close() first")
        self._config = cfg

    @property
    def isopen(self) -> bool:
        return not getattr(self, "_closed", False)

    def close(self):
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @staticmethod
    def delete(uri: str, recursive: bool = False) -> None:
        if recursive:
            shutil.rmtree(uri)
        else:
            os.remove(os.path.join(uri, GROUP_FILE))
            # the metadata delta log belongs to the deleted group — a
            # group re-created at this URI would otherwise resurrect
            # the old metadata (and a stale .consolidated.json marker
            # could later vacuum the wrong files)
            shutil.rmtree(os.path.join(uri, META_DIR),
                          ignore_errors=True)
