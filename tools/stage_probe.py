"""Per-stage timing probe for one or more bench queries (guide §7.1).

Usage: python tools/stage_probe.py <query> [query ...] [--sf sf_dir]

Runs each query once (after the standard warmup + prime) with the Spark
UI enabled, then prints every stage of the timed run from the UI REST
API: duration, task count, shuffle read/write bytes, and the stage name
(which names the operator via the job description / call site). This is
the local-mode stand-in for "open the Stages tab" — it answers where a
tiny-input query's wall time actually goes (stage waves, Python passes,
exchanges) before any optimization is attempted.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _bench_only

    from youtube_analytics_lakehouse_databricks_spark.queries import registry
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="stage_probe", extra_conf={"spark.ui.enabled": "true"})
    reg = {**registry(), **_bench_only()}
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.loads(r.read())

    for name in names:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        try:
            _run(reg[name].builder(spark, "/root/testdata/sf0.001"))
        except Exception as e:
            print(f"{name}: warmup failed: {e}")
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"prime {name}")
        try:
            _run(reg[name].builder(spark, sf_dir))
        except Exception as e:
            print(f"{name}: prime failed: {e}")
            continue
        # bench.py's GC hygiene: without it, accumulated shuffle block
        # files from prior queries skew later ones 2-4x
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.catalog.clearCache()
        before = {s["stageId"] for s in _stages()}
        spark.sparkContext.setJobDescription(f"timed {name}")
        t0 = time.time()
        _run(reg[name].builder(spark, sf_dir))
        wall = time.time() - t0
        rows = []
        for s in _stages():
            if s["stageId"] in before or s["status"] not in ("COMPLETE", "FAILED"):
                continue
            t_sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            dur = 0.0
            if t_sub and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(s["completionTime"], fmt)
                    - datetime.strptime(t_sub, fmt)
                ).total_seconds()
            rows.append(
                (
                    dur,
                    s["stageId"],
                    s["numCompleteTasks"],
                    s.get("executorRunTime", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s["name"].split("\n")[0][:90],
                )
            )
        rows.sort(key=lambda r: -r[0])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(rows)} stages ===")
        total = sum(r[0] for r in rows)
        print(f"  sum of stage walls: {total:.3f}s (gaps/driver = {wall - total:.3f}s)")
        for dur, sid, ntask, run_ms, sr, sw, nm in rows:
            print(
                f"  {dur:6.3f}s stage {sid:>4} tasks={ntask:<3} exec={run_ms/1000:7.2f}s "
                f"sRead={sr >> 10:>7}K sWrite={sw >> 10:>7}K  {nm}"
            )


if __name__ == "__main__":
    main()
