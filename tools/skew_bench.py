"""Adversarial skew-stress runner (VERDICT r7 item 2).

Every prior scale artifact (BENCH_sf1/sf10) uses benign seed-42
distributions; real crawl data is Zipfian.  This tool runs the heaviest
operator families on a ``gen_sf.py --skew`` directory (hot entity with
~20% of events, ~5M*sf-token document, one n-gram on ~30% of postings,
an LSH bucket past its cap) AND on the matching uniform directory, then
reports per-family:

  * ``uniform_s`` / ``skew_s`` wall seconds and their ratio,
  * ``straggler`` — max/median task runtime over the skew run's
    completed stages (from the Spark UI REST API), the single-task-skew
    signal wall-clock alone can hide on a 32-core box.

Usage:
    python tools/skew_bench.py [family ...]        # default: the 10
                                                   # heaviest families
    SPARK_GRAFT_SKEW_DIR=...  SPARK_GRAFT_UNIFORM_DIR=... override dirs.

Prints ONE JSON line; commit it as BENCH_skew.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = [
    "sessionize", "ewma", "funnel", "minhash_dedup", "line_dedup",
    "repeated_ngrams", "contamination", "interval_join",
    "incremental_neardup", "pack_materialize",
]


def _mk_spark(cpus: str):
    # scale_bench session but with the UI ON: the REST API is the only
    # public per-task-runtime surface (no Python SparkListener bridge)
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("skew_bench")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.default.parallelism", cpus)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.python.filterPushdown.enabled", "true")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.sql.autoBroadcastJoinThreshold",
                    str(64 * 1024 * 1024))
            .getOrCreate())


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=10) as r:
        return json.loads(r.read())


def _max_stage_id(spark) -> int:
    try:
        stages = _api(spark, "/stages?status=complete")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def _straggler(spark, after_stage: int):
    """Max over post-watermark completed stages of (max task runtime /
    median task runtime); returns (ratio, stage_id, max_ms, med_ms) for
    the worst stage with >= 4 tasks (tiny stages are all noise)."""
    worst = (1.0, None, 0.0, 0.0)
    try:
        stages = _api(spark, "/stages?status=complete")
    except Exception:
        return worst
    for s in stages:
        if s["stageId"] <= after_stage or s.get("numCompleteTasks", 0) < 4:
            continue
        try:
            q = _api(spark, f"/stages/{s['stageId']}/"
                            f"{s['attemptId']}/taskSummary"
                            "?quantiles=0.5,1.0")
            med, mx = q["executorRunTime"]
        except Exception:
            continue
        if med > 50 and mx / med > worst[0]:  # ignore sub-50ms medians
            worst = (round(mx / med, 1), s["stageId"], mx, med)
    return worst


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--same-jvm"]
    same_jvm = "--same-jvm" in sys.argv[1:]
    names = argv or FAMILIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    skew_dir = os.environ.get("SPARK_GRAFT_SKEW_DIR",
                              "/root/repo/.bench_data/sf1skew")
    uni_dir = os.environ.get("SPARK_GRAFT_UNIFORM_DIR",
                             "/root/repo/.bench_data/sf1")
    load_start = round(os.getloadavg()[0], 2)

    if len(names) > 1 and not same_jvm:
        # fresh process per family (the scale_bench r8 contract): the
        # retired batched mode inflated LATE families 2-4x — the r10
        # batched sweep recorded pack_materialize (last of 10) at 45s
        # uniform vs 11.3s in its own JVM, with a phantom straggler
        # from accumulated GC/codegen state.  --same-jvm restores the
        # batched mode for quick triage.
        import subprocess

        fams = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, env=os.environ)
            line = (r.stdout.strip().splitlines() or [""])[-1]
            try:
                fams.update(json.loads(line)["families"])
            except Exception:
                fams[name] = None
                print(f"  {name}: FAILED\n{r.stderr[-2000:]}",
                      file=sys.stderr)
            else:
                f = fams[name]
                print(f"  {name}: uniform {f['uniform_s']}s skew "
                      f"{f['skew_s']}s (x{f['skew_over_uniform']}, "
                      f"straggler {f.get('straggler_task_ratio')})",
                      file=sys.stderr)
        print(json.dumps({
            "metric": "skew_bench", "unit": "sec", "families": fams,
            "skew_dir": skew_dir, "uniform_dir": uni_dir,
            "mode": "fresh-process",
            "load_1m_start": load_start,
            "load_1m_end": round(os.getloadavg()[0], 2)}))
        return 0

    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from scale_bench import RUNNERS, _docs  # noqa: E402

    # warmup both dirs: parquet footers + python workers + codegen
    for d in (uni_dir, skew_dir):
        from pyspark.sql import functions as F

        _docs(spark, d).select(F.xxhash64("text")).write.format("noop") \
            .mode("overwrite").save()

    out = {}
    for name in names:
        fam = {}
        for label, d in (("uniform", uni_dir), ("skew", skew_dir)):
            wm = _max_stage_id(spark)
            t0 = time.perf_counter()
            df = RUNNERS[name](spark, d)
            df.write.format("noop").mode("overwrite").save()
            fam[f"{label}_s"] = round(time.perf_counter() - t0, 3)
            if label == "skew":
                ratio, sid, mx, med = _straggler(spark, wm)
                fam["straggler_task_ratio"] = ratio
                fam["straggler_stage"] = sid
                fam["straggler_max_ms"] = mx
                fam["straggler_med_ms"] = med
        fam["skew_over_uniform"] = round(
            fam["skew_s"] / max(fam["uniform_s"], 1e-9), 2)
        out[name] = fam
        print(f"  {name}: uniform {fam['uniform_s']}s skew {fam['skew_s']}s "
              f"(x{fam['skew_over_uniform']}, straggler "
              f"{fam.get('straggler_task_ratio')})", file=sys.stderr)

    print(json.dumps({
        "metric": "skew_bench", "unit": "sec", "families": out,
        "skew_dir": skew_dir, "uniform_dir": uni_dir,
        "load_1m_start": load_start,
        "load_1m_end": round(os.getloadavg()[0], 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
