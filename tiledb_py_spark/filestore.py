"""Filestore: file blobs stored inside an array.

Reference: ``/root/reference/tiledb/filestore.py:9-151`` (write/read/
copy_from/copy_to/__len__) and ``ArraySchema.from_file``
(``array_schema.py:145-150``).

Storage shape mirrors the reference's filestore array: a sparse array with
one int64 ``position`` dimension (byte offset of each chunk) and a binary
``contents`` attribute, chunked so huge files parallelize across Spark
tasks; file-level metadata (size, mime) lives in the array's KV metadata.
"""

from __future__ import annotations

import mimetypes
import os
from typing import ByteString, Optional

import numpy as np
import pandas as pd

from . import manifest as mf
from .metadata import Metadata
from .schema import ArraySchema, Attr, Dim, Domain
from .sources.fragment_writer import write_fragment_pandas

CHUNK = 4 * 1024 * 1024  # 4 MiB chunks, small enough for parquet pages

_SIZE_KEY = "__filestore_size"
_MIME_KEY = "__filestore_mime"
_NAME_KEY = "__filestore_original_name"


def filestore_schema() -> ArraySchema:
    """The filestore array schema (reference ``ArraySchema.from_file``)."""
    dom = Domain(Dim(name="position", domain=(0, 2**62), tile=CHUNK,
                     dtype=np.int64))
    return ArraySchema(domain=dom,
                       attrs=[Attr(name="contents", dtype=np.bytes_)],
                       sparse=True)


def schema_from_file(file_uri: Optional[str] = None) -> ArraySchema:
    return filestore_schema()


class Filestore:
    """File blob stored in an array (reference ``filestore.py:9-151``)."""

    def __init__(self, uri: str, ctx=None) -> None:
        self._uri = uri
        if not mf.array_exists(uri):
            from .array import Array

            Array.create(uri, filestore_schema())

    def write(self, buffer: ByteString, mime_type: str = "AUTODETECT") -> None:
        try:
            buffer = memoryview(buffer)
        except TypeError:
            raise TypeError("buffer must support the buffer protocol")
        if not isinstance(mime_type, str):
            raise TypeError(f"expected str mime_type, got {type(mime_type)}")
        # chunk the memoryview directly — bytes(buffer) up front would
        # hold the original, a full copy, AND the chunk list at once
        # (~3x peak memory on GiB-scale files)
        n = len(buffer)
        positions = list(range(0, max(n, 1), CHUNK))
        chunks = [bytes(buffer[p:p + CHUNK]) for p in positions]
        pdf = pd.DataFrame({"position": np.array(positions, dtype="int64"),
                            "contents": chunks})
        schema = mf.read_manifest(self._uri).schema
        write_fragment_pandas(self._uri, schema, pdf)
        # one commit for the metadata pair: a crash between per-key
        # commits would leave __len__ reporting the OLD size against
        # the NEW chunk contents (torn read)
        Metadata(self._uri).update({
            _SIZE_KEY: n,
            _MIME_KEY: ("application/octet-stream"
                        if mime_type == "AUTODETECT" else mime_type)})

    def read(self, offset: int = 0, size: int = -1) -> bytes:
        if not isinstance(offset, int):
            raise TypeError(f"expected int offset, got {type(offset)}")
        if not isinstance(size, int):
            raise TypeError(f"expected int size, got {type(size)}")
        if offset < 0:
            # floor division would make lo_chunk negative and silently
            # return bytes from the wrong position
            raise ValueError(f"offset must be >= 0, got {offset}")
        if size < -1:
            raise ValueError(f"size must be >= 0 (or -1 for all), got {size}")
        total = len(self)
        if size == -1:
            size = total
        size = min(size, total - offset)
        if size <= 0:
            return b""
        # prune to the chunks overlapping [offset, offset+size)
        lo_chunk = (offset // CHUNK) * CHUNK
        hi_chunk = ((offset + size - 1) // CHUNK) * CHUNK
        from .highlevel import open as _open

        A = _open(self._uri)
        res = A.multi_index[lo_chunk:hi_chunk]
        order = np.argsort(res["position"])
        data = b"".join(bytes(res["contents"][i]) for i in order)
        start = offset - lo_chunk
        return data[start:start + size]

    @staticmethod
    def copy_from(filestore_array_uri: str, file_uri: str,
                  mime_type: str = "AUTODETECT", ctx=None) -> None:
        for v, n in ((filestore_array_uri, "filestore_array_uri"),
                     (file_uri, "file_uri"), (mime_type, "mime_type")):
            if not isinstance(v, str):
                raise TypeError(f"expected str {n}, got {type(v)}")
        fs = Filestore(filestore_array_uri)
        with open(file_uri, "rb") as f:
            data = f.read()
        if mime_type == "AUTODETECT":
            mime_type = mimetypes.guess_type(file_uri)[0] or "application/octet-stream"
        fs.write(data, mime_type=mime_type)
        Metadata(filestore_array_uri)[_NAME_KEY] = os.path.basename(file_uri)

    @staticmethod
    def copy_to(filestore_array_uri: str, file_uri: str, ctx=None) -> None:
        for v, n in ((filestore_array_uri, "filestore_array_uri"),
                     (file_uri, "file_uri")):
            if not isinstance(v, str):
                raise TypeError(f"expected str {n}, got {type(v)}")
        fs = Filestore(filestore_array_uri)
        with open(file_uri, "wb") as f:
            f.write(fs.read())

    def __len__(self) -> int:
        return int(Metadata(self._uri).get(_SIZE_KEY, 0))

    @property
    def mime_type(self) -> str:
        return Metadata(self._uri).get(_MIME_KEY, "application/octet-stream")
