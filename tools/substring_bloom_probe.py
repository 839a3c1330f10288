"""Measure the substring_dedup bloom-filter claim (r9 VERDICT #3 / r10 #4).

COVERAGE.md's 10x->100x row diagnosed a broadcast->shuffle regime boundary
in the loser-probe join (winners outgrow autoBroadcastJoinThreshold, the
probe pays a second window-keys exchange) and CLAIMED runtime bloom-filter
injection as the 100 TB mitigation. This tool turns the claim into a
measurement: it runs the operator at the scaling corpus in three
configurations —

  baseline   session defaults (bloom enabled, but its 10 GB
             application-side scan threshold targets real cluster scale,
             so at the local 100x corpus it is NOT expected to fire);
  forced     thresholds overridden so the planner injects the filter at
             THIS corpus size (applicationSideScanSizeThreshold=1b,
             creationSideThreshold raised past the winners aggregate's
             unknown-stats size estimate) — a scale model of the regime
             the defaults target;
  disabled   spark.sql.optimizer.runtime.bloomFilter.enabled=false;

forcing the shuffle-join regime in all three (autoBroadcastJoinThreshold
=-1, the 100 TB winners regime), recording per-run shuffle-write bytes +
executor CPU + wall via the scaling harness's StageMeter, and asserting
whether the executed plan actually contains the BloomFilter nodes — the
claim is only honest if `forced` shows the node AND a shuffle-byte cut.

Usage: python tools/substring_bloom_probe.py [--mult 100] [--pairs 3]
Prints one JSON object; paste the numbers into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_curve import OUT_ROOT, StageMeter, generate  # noqa: E402

from youtube_analytics_lakehouse_databricks_spark.operators import dedup as dedup_ops  # noqa: E402
from youtube_analytics_lakehouse_databricks_spark.queries import read_fanned  # noqa: E402

MODES = {
    "baseline": {},
    "forced": {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        # the winners side is an aggregate with unknown column stats, so
        # its size ESTIMATE is far above its real bytes — lift the
        # creation-side cap so the estimate qualifies
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "8000000000000b",
    },
    "disabled": {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"},
}


def build(spark, d):
    return dedup_ops.substring_dedup(
        read_fanned(spark, d, "documents", by="doc_id"), "doc_id", "text",
        min_tokens=20,
    )


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    mult, pairs = 100, 3
    for i, a in enumerate(sys.argv):
        if a == "--mult" and i + 1 < len(sys.argv):
            mult = int(sys.argv[i + 1])
        if a == "--pairs" and i + 1 < len(sys.argv):
            pairs = int(sys.argv[i + 1])
    d = f"{OUT_ROOT}/x{mult}"
    if not os.path.exists(f"{d}/documents.parquet"):
        print(f"generating {mult}x corpus ...", file=sys.stderr)
        generate(mult, d, hot=(mult >= 10))

    spark = get_spark(app_name="substring_bloom_probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "1000000",
        # pin the 100 TB join regime in EVERY mode: winners never
        # broadcast, so the bloom filter's target exchange exists
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    })
    # warmup (JIT/codegen/footers) on the probe corpus, noop sink
    build(spark, d).write.format("noop").mode("overwrite").save()

    meter = StageMeter(spark)
    out: dict[str, dict] = {}
    for _ in range(pairs):
        for mode, confs in MODES.items():
            originals = {k: spark.conf.get(k) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                df = build(spark, d)
                meter.delta()  # reset
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                shuffle, cpu = meter.delta()
                plan = df._jdf.queryExecution().executedPlan().toString()
                has_bloom = "bloom" in plan.lower()
            finally:
                for k, v in originals.items():
                    spark.conf.set(k, v)
            rec = out.setdefault(
                mode, {"wall_s": [], "shuffle_mb": [], "cpu_s": [], "bloom_in_plan": has_bloom}
            )
            rec["wall_s"].append(round(wall, 2))
            rec["shuffle_mb"].append(round(shuffle / 1e6, 2))
            rec["cpu_s"].append(round(cpu / 1e9, 2))
            rec["bloom_in_plan"] = has_bloom

    for rec in out.values():
        rec["wall_min_s"] = min(rec["wall_s"])
        rec["shuffle_min_mb"] = min(rec["shuffle_mb"])
        rec["cpu_min_s"] = min(rec["cpu_s"])
    print(json.dumps({"mult": mult, "modes": out}, indent=2))


if __name__ == "__main__":
    main()
