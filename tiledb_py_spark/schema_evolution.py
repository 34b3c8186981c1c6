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


class ArraySchemaEvolution:
    def __init__(self, uri_or_ctx: Optional[Any] = None):
        # accepts a ctx-like arg for signature parity; state is per-array
        self._adds: list[Attr] = []
        self._drops: list[str] = []
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
        self._adds.append(attr)

    def drop_attribute(self, name: str) -> None:
        self._drops.append(name)

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
            for name in self._enum_drops:
                # reference check against the POST-drop attr list: the
                # reference applies ops in call order, so dropping an
                # attr and its enumeration in ONE evolution is legal —
                # a fixed enum-drops-first order must not reject it
                if any(a.enum_label == name for a in schema.attrs_list
                       if a.name not in self._drops):
                    raise ValueError(f"enumeration {name!r} still referenced")
                del schema.enums[name]
            new_version = m.schema_version + 1
            for a in self._adds:
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
            for name in self._drops:
                if not schema.has_attr(name):
                    raise KeyError(name)
                schema.attrs_list = [a for a in schema.attrs_list if a.name != name]
                m.dropped_attrs[name] = new_version
                m.attr_since.pop(name, None)
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
