"""Isolate-time one or more bench queries with the noop sink (guide §1.4).

Usage: python tools/time_query.py <query> [query ...] [--sf sf_dir] [--runs N]

Methodology matches bench.py: sf0.001 warmup, a priming run at the target
sf, then N timed runs; reports each run and the min. JVM GC + cache clear
between runs, jobs labelled for the UI.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _bench_only

    from youtube_analytics_lakehouse_databricks_spark.queries import registry
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark(app_name="time_query")
    reg = {**registry(), **_bench_only()}

    def _run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

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
        secs = []
        for r in range(runs):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"timed {name} #{r}")
            t0 = time.time()
            _run(reg[name].builder(spark, sf_dir))
            secs.append(time.time() - t0)
        print(f"{name}: min={min(secs):.3f}  runs={[round(s, 3) for s in secs]}")


if __name__ == "__main__":
    main()
