"""Context & Config: global configuration surface.

Reference: ``/root/reference/tiledb/ctx.py:16-611`` — ``Config`` (dict of
string keys like ``sm.tile_cache_size``), ``Ctx``, ``default_ctx``, and
``scope_ctx`` (context-manager override).

Spark rebuild: config keys live in one dict; keys under ``spark.`` are
forwarded to the SparkSession conf when a context is activated, so the
reference-shaped API can tune the actual engine (e.g.
``Config({"spark.sql.shuffle.partitions": "64"})``).  Reference ``sm.*`` /
``vfs.*`` keys are accepted and retained (inert — libtiledb's internals
don't exist here) so existing user code runs unchanged.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Iterator, Optional


class Config:
    """String-keyed config dict (reference ``ctx.py:16-316``)."""

    def __init__(self, params: Optional[dict] = None, path: Optional[str] = None):
        self._d: dict[str, str] = {}
        if path:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line and not line.startswith("#") and "=" in line:
                        k, v = line.split("=", 1)
                        self._d[k.strip()] = v.strip()
        for k, v in (params or {}).items():
            self._d[str(k)] = str(v)

    def __getitem__(self, key: str) -> str:
        return self._d[key]

    def get(self, key: str, default=None):
        return self._d.get(key, default)

    def __setitem__(self, key: str, value) -> None:
        self._d[str(key)] = str(value)

    def __delitem__(self, key: str) -> None:
        del self._d[key]

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def dict(self, prefix: str = "") -> dict:
        return {k: v for k, v in self._d.items() if k.startswith(prefix)}

    def update(self, other) -> None:
        for k, v in dict(other).items():
            self[k] = v

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for k, v in sorted(self._d.items()):
                f.write(f"{k}={v}\n")

    def values(self, prefix: str = ""):
        """Iterator over config values, optionally prefix-filtered
        (reference ``ctx.py:234-242``)."""
        return iter([v for k, v in self._d.items() if k.startswith(prefix)])

    def clear(self) -> None:
        """Unset every parameter (reference ``ctx.py:254-257``)."""
        self._d.clear()

    def from_file(self, path: str) -> None:
        """Merge parameters from a config file into this instance
        (reference ``ctx.py:283``)."""
        self.update(Config(path=path).dict())

    @staticmethod
    def load(uri: str) -> "Config":
        """Config loaded from a local file (reference
        ``ctx.py:62-73``)."""
        if not isinstance(uri, str):
            raise TypeError("uri must be a string")
        return Config(path=uri)

    def __repr__(self):
        return f"Config({self._d!r})"


class Ctx:
    """Engine context holding a Config (reference ``ctx.py:371-450``)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config if isinstance(config, Config) else Config(config)

    def apply_to_session(self, spark) -> None:
        """Forward spark.* keys onto the live session conf."""
        for k, v in self.config.items():
            if k.startswith("spark."):
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass  # static conf; takes effect on next session

    def set_tag(self, key: str, value: str) -> None:
        """Set a (string, string) tag on the context (reference
        ``ctx.py:420-422``; diagnostic metadata only here)."""
        if not hasattr(self, "_tags"):
            self._tags: dict[str, str] = {}
        self._tags[str(key)] = str(value)

    def get_stats(self, print_out: bool = True, json: bool = False):
        """Engine-wide stats (reference ``ctx.py:435-453``)."""
        from .stats import stats_dump

        return stats_dump(print_out=print_out, json_output=json)

    def data_protocol(self, uri: str):
        """UNSUPPORTED: the reference's data protocol probe applies to
        ``tiledb://`` cloud URIs (reference ``ctx.py:455-463``); cloud
        URIs are refused by this engine's local-only commit layer (see
        ``manifest.require_local_uri``)."""
        raise NotImplementedError(
            "data_protocol() probes tiledb:// cloud URIs, which this "
            "engine does not support (remote array URIs are refused "
            "loudly; see manifest.require_local_uri)")


_local = threading.local()


def default_ctx(config: Optional[Any] = None) -> Ctx:
    """Return (and lazily install) the thread-local default context.

    Parity note (reference ``ctx.py:585-591``): the reference accepts
    only Config/dict/None and raises ValueError otherwise — including
    for a Ctx, which it cannot adopt because its thread-local slot holds
    an immutable native handle.  This implementation INTENTIONALLY
    extends the accepted types with ``Ctx`` (adopted as-is), matching
    :func:`scope_ctx`'s signature so the two context entry points take
    the same inputs; everything else still raises ValueError, because
    silently returning an empty config would drop the caller's settings.
    """
    ctx = getattr(_local, "ctx", None)
    if ctx is None or config is not None:
        if isinstance(config, Ctx):
            ctx = config           # adopt the caller's context as-is
        elif isinstance(config, (Config, dict, type(None))):
            ctx = Ctx(config)
        else:
            raise ValueError(
                "default_ctx takes a Config, dict, Ctx, or None; got "
                f"{type(config).__name__}")
        _local.ctx = ctx
    return ctx


@contextlib.contextmanager
def scope_ctx(ctx_or_config: Optional[Any] = None) -> Iterator[Ctx]:
    """Temporarily override the default context (reference ``scope_ctx``)."""
    prev = getattr(_local, "ctx", None)
    ctx = ctx_or_config if isinstance(ctx_or_config, Ctx) else Ctx(
        ctx_or_config if isinstance(ctx_or_config, (Config, dict)) else None)
    _local.ctx = ctx
    try:
        yield ctx
    finally:
        _local.ctx = prev
