"""Plan-quality audit: dump formatted plans for headline queries and grep
for the properties that matter at scale — parquet filter pushdown
(PushedFilters), column pruning (ReadSchema width), whole-stage codegen
spans, and broadcast joins on small sides.

Usage: python tools/explain_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "q1_pricing_summary",
    "latest_events_dedup",
    "orders_enriched",
    "daily_orders_with_top_customer",
    "lsh_candidate_pairs",
    "semantic_dedup_embeddings",
    "scd2_user_event_type",
    "event_sessionization",
    "paragraph_dedup_documents",
    "substring_dedup_documents",
    "curate_audit",
]


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.queries import registry
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or AUDIT
    spark = get_spark(app_name="explain")
    reg = registry()
    for name in names:
        df = reg[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        # AQE finalizes codegen stages only at execution: run the query,
        # then count distinct *(N) codegen-stage markers in the executed
        # plan (pre-execution explain always reports 0 under AQE).
        # Drain toLocalIterator instead of collect(): it executes this
        # exact plan instance but holds at most one partition on the
        # driver, so wide results can't OOM a diagnostic that only needs
        # the plan (count()/noop-write would execute a different
        # QueryExecution and leave this one un-finalized).
        for _ in df.toLocalIterator():
            pass
        executed = df._jdf.queryExecution().executedPlan().toString()
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", executed)))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_exch = len(re.findall(r"Exchange", plan))
        print(f"== {name}")
        for p in pushed:
            print(f"   pushed: [{p[:120]}]")
        for rs in read_schemas:
            print(f"   read:   {len(rs.split(','))} cols: {rs[:110]}")
        print(f"   codegen spans={n_codegen} broadcast_joins={n_bhj} sortmerge_joins={n_smj} exchanges={n_exch}")
        if os.environ.get("FULL"):
            print(plan)


if __name__ == "__main__":
    main()
