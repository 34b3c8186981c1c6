"""Execution statistics: ``stats_enable/disable/reset/dump``.

Reference: ``tiledb.stats_*`` (``/root/reference/tiledb/__init__.py``
exports; C++ counters in libtiledb).  The Spark rebuild counts engine-side
events — queries planned, fragments scanned vs pruned, rows/bytes
materialized, wall time per phase — from the Python query layer.  Executor
internals (shuffle bytes, scan time) remain visible through Spark's own
instrumentation (``df.queryExecution``/UI); these counters cover the parts
the engine adds on top.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Optional

_enabled = False
_counters: dict = defaultdict(float)


def stats_enable() -> None:
    global _enabled
    _enabled = True


def stats_disable() -> None:
    global _enabled
    _enabled = False


def stats_reset() -> None:
    _counters.clear()


def stats_enabled() -> bool:
    return _enabled


def record(name: str, value: float = 1.0) -> None:
    if _enabled:
        _counters[name] += value


@contextmanager
def timed(name: str):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _counters[f"{name}.seconds"] += time.perf_counter() - t0
        _counters[f"{name}.count"] += 1


def stats_dump(version: bool = True, print_out: bool = True,
               include_python: bool = True, json: bool = False,
               verbose: bool = True,
               json_output: bool = False) -> Optional[str]:
    """Formatted counter dump (reference ``stats.py:28-38`` signature;
    ``json_output`` is this engine's pre-r14 alias for ``json``)."""
    import json as _json  # the reference-parity `json` param shadows it

    json_output = json_output or json
    del include_python, verbose  # one counter family here; always shown
    data = dict(sorted(_counters.items()))
    if json_output:
        out = _json.dumps(data, indent=2)
    else:
        lines = ["TileDB-on-Spark statistics:"]
        if version:
            import pyspark

            lines.append(f"  pyspark.version: {pyspark.__version__}")
        for k, v in data.items():
            lines.append(f"  {k}: {v:g}")
        out = "\n".join(lines)
    if print_out:
        print(out)
        return None
    return out
