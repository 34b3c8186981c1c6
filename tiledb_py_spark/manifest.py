"""Versioned JSON manifest: the array's source of truth.

Replaces the reference's on-disk array directory layout (``__schema``,
``__fragments``, ``__meta`` — managed by libtiledb) with:

    <uri>/
      __manifest/manifest_v{N:012d}.json     # full snapshot per version
      __fragments/<fragment_name>/*.parquet  # immutable fragment data

A manifest version is a *snapshot* (schema + fragment list + metadata), so
opening an array = read one JSON file; commit = write v{N+1} via atomic
rename.  This mirrors how modern table formats (Delta/Iceberg) commit and
is the scale story: a 1000-executor read needs only the single manifest
fetch on the driver, then fragment/row-group pruning before ``spark.read``.

Fragment records carry what the reference exposes via ``FragmentInfo``
(``/root/reference/tiledb/fragment.py:24-34``): timestamp range, cell
count, per-dim nonempty domain (MBR) — which powers time-travel opens
(``array.py:321-339``) and spatial fragment pruning before any Spark job
is launched.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
import urllib.parse
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from .schema import ArraySchema

MANIFEST_DIR = "__manifest"
FRAGMENT_DIR = "__fragments"


def now_ms() -> int:
    return int(time.time() * 1000)


@dataclass
class FragmentRecord:
    """One immutable write (reference fragment ``__ts1_ts2_uuid_ver``)."""

    name: str
    timestamp_range: tuple[int, int]  # [ts_start, ts_end] ms
    cell_num: int
    # per-dim {dim_name: [min, max]} over written cells (MBR) — JSON-safe values
    nonempty_domain: dict[str, list]
    kind: str = "write"  # "write" | "delete"
    # for kind="delete": the QueryCondition expression to anti-apply
    delete_condition: Optional[str] = None
    schema_version: int = 0
    # set by consolidate(): the consolidated fragment that folded this one
    # in.  Superseded fragments are excluded from any read where their
    # superseder is visible, but still serve timestamped opens that predate
    # the consolidation; vacuum() drops them (reference keeps consolidated
    # fragments readable until vacuum).
    superseded_by: Optional[str] = None

    @property
    def path(self) -> str:
        return self.name

    def to_json(self):
        return {
            "name": self.name,
            "timestamp_range": list(self.timestamp_range),
            "cell_num": self.cell_num,
            "nonempty_domain": self.nonempty_domain,
            "kind": self.kind,
            "delete_condition": self.delete_condition,
            "schema_version": self.schema_version,
            "superseded_by": self.superseded_by,
        }

    @classmethod
    def from_json(cls, d):
        return cls(
            name=d["name"],
            timestamp_range=tuple(d["timestamp_range"]),
            cell_num=d["cell_num"],
            nonempty_domain=d.get("nonempty_domain", {}),
            kind=d.get("kind", "write"),
            delete_condition=d.get("delete_condition"),
            schema_version=d.get("schema_version", 0),
            superseded_by=d.get("superseded_by"),
        )


def new_fragment_name(ts: int, tag: str = "") -> str:
    """``tag`` (e.g. ``"sb7_"``) embeds an idempotency marker — the
    streaming sinks use it to detect an already-committed micro-batch
    replayed after a crash."""
    return f"frag_{ts}_{ts}_{tag}{uuid.uuid4().hex[:12]}"


# __frag_ts encoding: (timestamp_ms << SEQ_BITS) | within-ms sequence.
# 20 bits = up to 1,048,576 fragments per millisecond slot in one scan;
# ts_ms ~ 1.8e12 shifted left 20 stays under 2^63.  The old ts*10000+i
# encoding overflowed its slot at >10000 fragments, corrupting
# last-write-wins order and the delete cutoff.
FRAG_SEQ_BITS = 20


def frag_order_key(ts_ms: int, seq: int) -> int:
    """Total order over fragments in one scan: commit ms, then sequence."""
    if seq >= (1 << FRAG_SEQ_BITS):
        raise ValueError(
            f"more than {1 << FRAG_SEQ_BITS} fragments in one scan; "
            "consolidate before reading")
    return (ts_ms << FRAG_SEQ_BITS) | seq


def delete_cutoff(ts_ms: int) -> int:
    """Writes with commit ms <= the delete's ms count as pre-delete
    (TileDB deletes apply to cells with timestamp <= the delete's)."""
    return (ts_ms + 1) << FRAG_SEQ_BITS


@dataclass
class Manifest:
    """Snapshot of an array at one version."""

    schema: ArraySchema
    version: int = 0
    fragments: list[FragmentRecord] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)  # array KV metadata
    pandas_meta: dict[str, Any] = field(default_factory=dict)  # __pandas_* analogs
    schema_version: int = 0
    created_ms: int = 0
    # Attribute IDENTITY across drop/re-add (schema evolution): an attr
    # added under a name a PREVIOUS evolution dropped is a NEW attr —
    # fragments older than the re-add must read its fill value, never
    # the dropped predecessor's bytes (which may not even share a type:
    # reading them under the new declared schema crashes Spark's parquet
    # reader, and arrow-casting them silently fabricates values).
    # dropped_attrs: name -> schema_version at which it was dropped;
    # attr_since: name -> schema_version at which it was RE-added.
    dropped_attrs: dict[str, int] = field(default_factory=dict)
    attr_since: dict[str, int] = field(default_factory=dict)

    def masked_attrs(self, frag_schema_version: int) -> tuple:
        """Attr names a fragment at ``frag_schema_version`` must NOT
        read from its files (same-named column belongs to a dropped
        predecessor attr — see ``attr_since``)."""
        if not self.attr_since:
            return ()
        return tuple(n for n, v in self.attr_since.items()
                     if frag_schema_version < v)

    def to_json(self):
        out = {
            "format_version": 1,
            "version": self.version,
            "schema_version": self.schema_version,
            "created_ms": self.created_ms,
            "schema": self.schema.to_json(),
            "fragments": [f.to_json() for f in self.fragments],
            "metadata": self.metadata,
            "pandas_meta": self.pandas_meta,
        }
        # written only when set: pre-r14 manifests stay byte-identical
        if self.dropped_attrs:
            out["dropped_attrs"] = self.dropped_attrs
        if self.attr_since:
            out["attr_since"] = self.attr_since
        return out

    @classmethod
    def from_json(cls, d):
        return cls(
            schema=ArraySchema.from_json(d["schema"]),
            version=d["version"],
            fragments=[FragmentRecord.from_json(f) for f in d["fragments"]],
            metadata=d.get("metadata", {}),
            pandas_meta=d.get("pandas_meta", {}),
            schema_version=d.get("schema_version", 0),
            created_ms=d.get("created_ms", 0),
            dropped_attrs=d.get("dropped_attrs", {}),
            attr_since=d.get("attr_since", {}),
        )

    # -- fragment pruning ----------------------------------------------------
    def _window(self, timestamp: Optional[Any]) -> list[FragmentRecord]:
        if timestamp is None:
            return list(self.fragments)
        if isinstance(timestamp, tuple):
            lo, hi = timestamp
            lo = 0 if lo is None else lo
            hi = 2**62 if hi is None else hi
        else:
            lo, hi = 0, timestamp
        return [f for f in self.fragments
                if lo <= f.timestamp_range[0] and f.timestamp_range[1] <= hi]

    def live_fragments(self, timestamp: Optional[Any] = None) -> list[FragmentRecord]:
        """Fragments visible at ``timestamp`` (None = all; int = end ts;
        (start, end) = range), mirroring timestamp-range open semantics
        (reference ``array.py:321-339``, ``highlevel.py:13-34``).

        A superseded fragment is visible only when its consolidation
        product is NOT in the window — so a timestamped open that predates
        the consolidation reconstructs the pre-consolidation view, while
        any window containing the product reads the product instead."""
        win = self._window(timestamp)
        names = {f.name for f in win if f.kind == "write"}
        return [f for f in win
                if f.kind == "write" and f.superseded_by not in names]

    def delete_fragments_visible(self, timestamp: Optional[Any] = None) -> list[FragmentRecord]:
        """Delete fragments to anti-apply: a delete superseded by a visible
        consolidation product is already materialized in the product."""
        win = self._window(timestamp)
        write_names = {f.name for f in win if f.kind == "write"}
        return [f for f in win
                if f.kind == "delete" and f.superseded_by not in write_names]

    def nonempty_domain(self, timestamp=None) -> Optional[tuple]:
        """Union of fragment MBRs per dim — answers ``Array.nonempty_domain``
        (reference ``array.py:687-727``) from the manifest alone, no scan."""
        frs = self.live_fragments(timestamp)
        if not frs:
            return None
        out = []
        for d in self.schema.domain:
            los, his = [], []
            for f in frs:
                mbr = f.nonempty_domain.get(d.name)
                if mbr is not None:
                    los.append(mbr[0])
                    his.append(mbr[1])
            out.append((min(los), max(his)) if los else (None, None))
        return tuple(out)


# -- storage ----------------------------------------------------------------

def require_local_uri(uri: str) -> str:
    """Normalize an array URI to a local path, refusing remote schemes.

    The manifest/fragment commit layer is POSIX-only today (os.link /
    O_CREAT|O_EXCL version claims, os.makedirs, shutil.move).  The
    reference opens arrays natively at ``s3://`` URIs
    (``/root/reference/tiledb/ctx.py:149-156``, the ``vfs.s3.*`` config
    family); until the commit layer is object-store-routed, a remote URI
    must be refused LOUDLY — ``os.makedirs("s3://bucket/arr")`` would
    otherwise succeed by creating a local ``./s3:/bucket/arr`` directory
    and the corpus would silently land on the driver's disk.
    """
    s = str(uri)
    # Anything without a scheme prefix is a plain local path.  The
    # scheme grammar is RFC 3986's (letter, then letters/digits/+-.)
    # and we require it to be followed by ':' — so absolute paths,
    # ./relative paths, and paths whose colon appears after a '/'
    # never match.  Matching on the PREFIX (not just '://') also
    # catches the single-slash/no-slash typo forms a naive
    # os.path.join produces from an s3 URI ('s3:/bucket/x',
    # 's3:bucket/x'), which previously passed through as local
    # relative paths — the same silent-misplacement class.  The scheme
    # must be >= 2 chars: a single letter before ':' is a Windows drive
    # path (C:\data\arr), not a URI — every real storage scheme (s3,
    # gs, az, hdfs, http, file, mem) has at least two.
    m = re.match(r"[A-Za-z][A-Za-z0-9+.\-]+:", s)
    if m is None:
        return s
    scheme = s[:m.end() - 1]
    from .functions.query_condition import TileDBError

    if scheme.lower() == "file":
        parts = urllib.parse.urlsplit(s)
        # RFC 8089: an empty or 'localhost' authority means THIS host;
        # any other authority names a remote host — stripping the
        # prefix blindly (the pre-r14 behavior) turned
        # 'file://somehost/share/arr' into the RELATIVE local path
        # 'somehost/share/arr' and created a ./somehost/... tree.
        if parts.netloc and parts.netloc.lower() != "localhost":
            raise TileDBError(
                f"file URI {s!r} names a non-local authority "
                f"{parts.netloc!r}; only file:// with an empty or "
                "'localhost' authority maps to this machine's "
                "filesystem. Mount the remote share and use a local "
                "path.")
        if not parts.path.startswith("/"):
            raise TileDBError(
                f"malformed file URI {s!r}: the path part must be "
                "absolute (file:///p or file://localhost/p).")
        # '#' and '?' are legal in POSIX filenames but urlsplit parses
        # them as fragment/query delimiters — silently returning the
        # truncated parts.path would retarget the array to a DIFFERENT
        # path (the misplacement class this guard exists to kill).
        # Percent-escapes are likewise passed through UNDECODED by this
        # layer, so refuse both and name the unambiguous spelling.
        if parts.query or parts.fragment or "%" in parts.path:
            raise TileDBError(
                f"file URI {s!r} contains '?', '#', or a percent-"
                "escape; this layer does not URI-decode paths, so the "
                "target would be ambiguous. Pass the plain local path "
                "instead (no file:// prefix) — '?', '#', and '%' are "
                "fine in plain paths.")
        return parts.path
    raise TileDBError(
        f"remote array URIs are not supported yet: {s!r} "
        f"(scheme {scheme!r}). The array commit layer is local-"
        "filesystem only; writing this URI with os paths would "
        "silently misplace the array into the local working "
        "directory. Use a local path (or file://), or mount the "
        "object store (s3fs/gcsfuse/NFS) and point at the mount. "
        "For a LOCAL relative path that happens to contain ':' "
        "before its first '/', prefix it with './'. "
        "VFS file operations on remote URIs remain available via "
        "tiledb_py_spark.VFS (fsspec-routed).")


def manifest_dir(uri: str) -> str:
    return os.path.join(require_local_uri(uri), MANIFEST_DIR)


def fragments_dir(uri: str) -> str:
    return os.path.join(require_local_uri(uri), FRAGMENT_DIR)


def fragment_path(uri: str, frag: FragmentRecord | str) -> str:
    name = frag if isinstance(frag, str) else frag.name
    return os.path.join(fragments_dir(uri), name)


def _manifest_file(uri: str, version: int) -> str:
    return os.path.join(manifest_dir(uri), f"manifest_v{version:012d}.json")


def array_exists(uri: str) -> bool:
    d = manifest_dir(uri)
    return os.path.isdir(d) and any(n.startswith("manifest_v") for n in os.listdir(d))


# last seen version per manifest dir: turns latest_version from an
# O(#versions) listdir per call (quadratic across a metadata write
# loop — measured 5-9ms/op at 10k versions) into an O(newer-versions)
# exists-probe.  Correct across processes: versions are monotone, so
# probing FORWARD from any previously seen version finds every newer
# commit; if the cached version's file vanished (external vacuum), we
# fall back to the full scan.
_LATEST_SEEN: dict = {}


def _scan_latest(d: str, uri: str) -> int:
    versions = [int(n[len("manifest_v"):-len(".json")])
                for n in os.listdir(d)
                if n.startswith("manifest_v") and n.endswith(".json")]
    if not versions:
        raise FileNotFoundError(f"no manifest found at {uri}")
    return max(versions)


def latest_version(uri: str) -> int:
    d = manifest_dir(uri)
    v = _LATEST_SEEN.get(d)
    if v is None or not os.path.exists(_manifest_file(uri, v)):
        v = _scan_latest(d, uri)
    while os.path.exists(_manifest_file(uri, v + 1)):
        v += 1
    _LATEST_SEEN[d] = v
    return v


def read_manifest(uri: str, version: Optional[int] = None) -> Manifest:
    if version is None:
        version = latest_version(uri)
    with open(_manifest_file(uri, version)) as f:
        m = Manifest.from_json(json.load(f))
    # tag the schema with the schema_version it was READ at: fragment
    # writers stamp records with the version of the schema they
    # validated/laid out against (plan time), NOT the version current
    # at commit time — an evolution landing between a writer's plan and
    # its commit must not mark the fragment post-evolution, or the
    # evolved-fill guard and drop/re-add masking would treat its
    # old-layout files as already conforming (nulls instead of fills;
    # a dropped predecessor column unmasked).  Instance attr only —
    # never serialized.
    m.schema._read_version = m.schema_version
    return m


def write_manifest(uri: str, m: Manifest) -> None:
    """Atomic write of one version file: write temp, then CLAIM the
    version with ``os.link`` — which fails with FileExistsError if the
    target exists, atomically.  A pre-check + rename would race: two
    writers committing the same version could both pass the check and
    the second rename would silently clobber the first commit (a lost
    fragment record = orphaned data)."""
    d = manifest_dir(uri)
    os.makedirs(d, exist_ok=True)
    target = _manifest_file(uri, m.version)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(m.to_json(), f)
        try:
            os.link(tmp, target)  # atomic claim
        except FileExistsError:
            raise FileExistsError(
                f"manifest version {m.version} already committed at {uri}")
        except OSError:
            # filesystems without hardlink support (some NFS mounts,
            # FUSE/object-store mounts, FAT) raise EPERM/ENOTSUP here —
            # fall back to the equally-atomic O_CREAT|O_EXCL claim and
            # write the payload into the claimed fd.  (On these
            # backends a racing reader can observe a partially-written
            # file; the hardlink path never exposes that window.)
            try:
                cfd = os.open(target,
                              os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise FileExistsError(
                    f"manifest version {m.version} already committed"
                    f" at {uri}")
            with os.fdopen(cfd, "w") as cf:
                json.dump(m.to_json(), cf)
        _LATEST_SEEN[d] = max(_LATEST_SEEN.get(d, 0), m.version)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def commit(uri: str, mutate) -> Manifest:
    """Read latest manifest, apply ``mutate(manifest) -> None``, write as the
    next version.  Retries up to 16× on version collision — each retry
    re-reads the winner's manifest and replays ``mutate`` on top, so
    concurrent committers serialize instead of clobbering."""
    for _ in range(16):
        m = read_manifest(uri)
        mutate(m)
        m.version += 1
        try:
            write_manifest(uri, m)
            return m
        except FileExistsError:
            continue
    raise RuntimeError(f"manifest commit contention at {uri}")


def all_fragment_names(uri: str) -> set:
    """Union of fragment names across EVERY manifest version — the
    "ever committed" set.  vacuum() uses it to distinguish a
    consolidated-away / dropped fragment directory (removable) from an
    in-flight concurrent writer's staged directory (untouchable: its
    parquet exists before its manifest record).  O(#versions) JSON
    reads — a maintenance-path cost, never on the query path."""
    d = manifest_dir(uri)
    names: set = set()
    for n in os.listdir(d):
        if not (n.startswith("manifest_v") and n.endswith(".json")):
            continue
        try:
            with open(os.path.join(d, n)) as f:
                names.update(fr["name"] for fr in json.load(f)["fragments"])
        except (OSError, ValueError, KeyError):
            continue   # torn/partial version file: contribute nothing
    return names


def create_array(uri: str, schema: ArraySchema) -> Manifest:
    """Create an empty array (reference ``Array.create``,
    ``array.py:388-432``)."""
    if array_exists(uri):
        raise FileExistsError(f"array already exists at {uri}")
    os.makedirs(fragments_dir(uri), exist_ok=True)
    m = Manifest(schema=schema, version=0, created_ms=now_ms())
    write_manifest(uri, m)
    return m


def delete_array(uri: str) -> None:
    """Remove the array (reference ``Array.delete_array``,
    ``array.py:661-685``)."""
    import shutil

    if not array_exists(uri):
        raise FileNotFoundError(f"no array at {uri}")
    shutil.rmtree(uri)


# -- shared sidecar-payload persistence --------------------------------------
# The ANN indexes and trained classifiers all persist the same way: into
# an array's manifest metadata when the uri is an engine array (one
# manifest version, same durability as A.meta), else as an atomically-
# replaced JSON file.  One implementation, four callers — a contract fix
# (fsync, object-store-safe replace, ...) lands once.

def save_payload(uri: str, key: str, payload: str,
                 file_suffix: str = ".tmp") -> None:
    if array_exists(uri):
        from .metadata import Metadata

        Metadata(uri)[key] = payload
    else:
        d = os.path.dirname(os.path.abspath(uri)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=file_suffix)
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, uri)


def load_payload(uri: str, key: str, kind: str = "payload") -> str:
    if array_exists(uri):
        from .metadata import Metadata

        payload = Metadata(uri).get(key)
        if payload is None:
            raise KeyError(f"no {kind} {key!r} stored at {uri}")
        return payload
    with open(uri) as f:
        return f.read()
