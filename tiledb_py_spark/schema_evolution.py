"""Schema evolution: add/drop attributes and enumerations after creation.

Reference: ``/root/reference/tiledb/schema_evolution.py:9-75`` —
``add_attribute``, ``drop_attribute``, ``add_enumeration``,
``drop_enumeration``, ``extend_enumeration``, ``expand_current_domain``.

Spark rebuild: evolution = a new manifest version with a bumped
``schema_version``.  Old fragments lack the new column; reading them with
the evolved explicit schema yields nulls, which the scan coalesces to the
attr's fill value for non-nullable attrs — the reference's
"added attribute reads as fill" semantics.
"""

from __future__ import annotations

from typing import Any, Optional

from . import manifest as mf
from .schema import Attr, Enumeration


def _any_fragment_stores(uri: str, m: "mf.Manifest", name: str) -> bool:
    """Does any live fragment's parquet store a column called ``name``?

    Upgrade guard for manifests whose drop history predates the
    ``dropped_attrs`` record: adding an attr whose name matches a
    column still stored by old fragments must record an ``attr_since``
    mask, or reads would surface (or crash on) the dropped
    predecessor's bytes.  One footer read per fragment (files within a
    fragment share a schema), threaded, early-exit on first hit —
    evolve is a rare driver-side admin op, so the cost is acceptable
    and correctness-critical."""
    import glob
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    first_files = []
    for f in m.fragments:  # ALL records: superseded ones remain
        # readable via time travel and need the same mask
        fdir = mf.fragment_path(uri, f)
        got = sorted(glob.glob(os.path.join(fdir, "**", "*.parquet"),
                               recursive=True))
        if got:
            first_files.append(got[0])
    if not first_files:
        return False

    def _has(p):
        try:
            return name in pq.ParquetFile(p).schema_arrow.names
        except Exception:
            return False

    with ThreadPoolExecutor(max_workers=min(16, len(first_files))) as ex:
        for hit in ex.map(_has, first_files):
            if hit:
                return True
    return False


class ArraySchemaEvolution:
    def __init__(self, uri_or_ctx: Optional[Any] = None):
        # accepts a ctx-like arg for signature parity; state is per-array
        # attr add/drop ops in CALL order (the reference applies ops as
        # called, so drop('w') then add Attr('w', ...) in ONE evolution
        # is legal and creates a new attr under the reused name)
        self._attr_ops: list[tuple] = []
        self._enum_adds: list[Enumeration] = []
        self._enum_drops: list[str] = []
        self._enum_extends: dict[str, list] = {}
        self._domain_expands: dict[str, tuple] = {}
        self._cd_expand = None  # Optional[CurrentDomain]
        self._timestamp: Optional[int] = None

    def timestamp(self, ts: int) -> None:
        """UNSUPPORTED (loud refusal, the ``key=`` posture): the
        reference stamps an evolution at ``ts`` so older timestamped
        opens see the pre-evolution schema.  This engine resolves the
        schema from the LATEST manifest for every open (fragments carry
        ``schema_version`` for fill semantics, but schema visibility is
        not time-indexed), so a requested timestamp would be silently
        ignored — evolution visibility would differ from the reference
        with no error.  Refuse rather than mislead."""
        raise NotImplementedError(
            "ArraySchemaEvolution.timestamp() is not supported: schema "
            "visibility is not time-indexed in this engine (opens always "
            "use the latest schema; fragment-level fill semantics are "
            "preserved via schema_version). Evolve without a timestamp, "
            "or snapshot the array first (create_array_from_fragments).")

    def add_attribute(self, attr: Attr) -> None:
        self._attr_ops.append(("add", attr))

    def drop_attribute(self, name: str) -> None:
        self._attr_ops.append(("drop", name))

    def add_enumeration(self, enum: Enumeration) -> None:
        self._enum_adds.append(enum)

    def drop_enumeration(self, name: str) -> None:
        self._enum_drops.append(name)

    def extend_enumeration(self, enum: Enumeration) -> None:
        """Replace an existing enumeration with a superset (reference allows
        appending values so existing codes stay valid)."""
        self._enum_extends[enum.name] = list(enum.values)

    def expand_current_domain(self, new_domains) -> None:
        """Expand the current domain.  Accepts a ``CurrentDomain`` (reference
        ``schema_evolution.py:57-62``) or a {dim_name: (lo, hi)} dict
        (legacy convenience expanding the dim domains); shrinking is
        rejected at evolve time."""
        from .current_domain import CurrentDomain

        if isinstance(new_domains, CurrentDomain):
            self._cd_expand = new_domains
        else:
            self._domain_expands = dict(new_domains)

    def array_evolve(self, uri: str) -> None:
        def _apply(m: mf.Manifest):
            schema = m.schema
            for e in self._enum_adds:
                if e.name in schema.enums:
                    raise ValueError(f"enumeration {e.name!r} already exists")
                schema.enums[e.name] = e
            for name, values in self._enum_extends.items():
                old = schema.enums[name]
                if values[: len(old.values)] != old.values:
                    raise ValueError("extend_enumeration must preserve existing values as a prefix")
                schema.enums[name] = Enumeration(name, old.ordered, values)
            dropped_names = {n for op, n in self._attr_ops if op == "drop"}
            for name in self._enum_drops:
                # reference check against the POST-drop attr list: the
                # reference applies ops in call order, so dropping an
                # attr and its enumeration in ONE evolution is legal —
                # a fixed enum-drops-first order must not reject it
                if any(a.enum_label == name for a in schema.attrs_list
                       if a.name not in dropped_names):
                    raise ValueError(f"enumeration {name!r} still referenced")
                del schema.enums[name]
            new_version = m.schema_version + 1
            for op, arg in self._attr_ops:
                if op == "drop":
                    if not schema.has_attr(arg):
                        raise KeyError(arg)
                    schema.attrs_list = [a for a in schema.attrs_list
                                         if a.name != arg]
                    m.dropped_attrs[arg] = new_version
                    m.attr_since.pop(arg, None)
                    continue
                a = arg
                if schema.has_attr(a.name) or schema.has_dim(a.name):
                    raise ValueError(f"column {a.name!r} already exists")
                schema.attrs_list.append(a)
                if a.name in m.dropped_attrs:
                    # name reuse: this is a NEW attr — fragments older
                    # than this version must read its FILL value, never
                    # the dropped predecessor's stored bytes (manifest
                    # attr_since / Manifest.masked_attrs)
                    m.attr_since[a.name] = new_version
                    del m.dropped_attrs[a.name]
                elif m.schema_version > 0 and _any_fragment_stores(
                        uri, m, a.name):
                    # UNRECORDED history: the array evolved before drop
                    # records existed (pre-r14 manifests) yet some live
                    # fragment stores a same-named column — that column
                    # is a dropped predecessor's data.  Record the mask
                    # here or those fragments would resurface/crash it.
                    m.attr_since[a.name] = new_version
            for name, (lo, hi) in self._domain_expands.items():
                d = schema.domain.dim(name)
                old_lo, old_hi = d.domain
                if old_lo is not None and (lo > old_lo or hi < old_hi):
                    raise ValueError(
                        f"current domain of {name!r} can only expand "
                        f"({(old_lo, old_hi)} -> {(lo, hi)})")
                d.domain = (lo, hi)
            if self._cd_expand is not None:
                new_box = self._cd_expand.box(schema.domain)
                old_box = schema.current_domain_box()
                for name, (lo, hi) in new_box.items():
                    if name in old_box:
                        olo, ohi = old_box[name]
                        if lo > olo or hi < ohi:
                            raise ValueError(
                                f"current domain of {name!r} can only expand "
                                f"({(olo, ohi)} -> {(lo, hi)})")
                schema.set_current_domain(self._cd_expand)
            m.schema_version += 1

        mf.commit(uri, _apply)
