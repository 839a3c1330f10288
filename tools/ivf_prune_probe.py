"""Measured evidence for the persisted-IVF serving claim: a small query
batch READS only its probed cells.

tests/test_ivf_index.py plan-asserts the `cell IN (...)` PartitionFilters;
this probe measures the actual INPUT BYTES (Spark UI REST, the StageMeter
pattern) of a pruned 4-query search vs a full corpus scan of the same
index, at two corpus scales. The expected ratio tracks
|probed cells| / n_cells (up to per-file overhead: parquet footers and
row-group alignment make tiny files read slightly more than their share).

Also measures the SAME pruned search over the IVFPQ index (m=8 residual
codes instead of float vectors): the compound claim — pruning bounds the
scanned FRACTION, compression bounds the scanned BYTES PER ROW — shows
up as ivfpq_read_fraction < read_fraction, widening with corpus scale as
payload outgrows per-file framing (the layout-level ratio is measured at
0.074x at 8k x 64-d in tests/test_ivfpq.py).

And the TWO-STAGE refined search (r13): ivfpq_search_refined reads the
COMPRESSED probed cells (shortlist pass) AND the FLAT probed cells
(exact re-rank) — its docstring states the byte accounting honestly; the
refined_read_fraction row MEASURES it (expected ~= read_fraction +
ivfpq_read_fraction, i.e. more bytes than either single-stage search;
what refine buys is exact reported cosines with the re-rank compute
bounded by queries x refine). The refined queries enter as a driver-
local relation so the measurement is exactly the two index scans.

Usage: python tools/ivf_prune_probe.py [--mults 1,10] [--markdown]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_curve import OUT_ROOT, generate  # noqa: E402

N_CELLS = 32
N_PROBE = 2
N_QUERIES = 4


class InputMeter:
    """Input-byte deltas from the Spark UI REST API between checkpoints."""

    def __init__(self, spark):
        self.app = spark.sparkContext.applicationId
        self.port = spark.sparkContext.getConf().get("spark.ui.port", "4040")
        self._bus = spark.sparkContext._jsc.sc().listenerBus()
        self.last = self._total()

    def _total(self) -> int:
        self._bus.waitUntilEmpty()
        url = (
            f"http://localhost:{self.port}/api/v1/applications/"
            f"{self.app}/stages?status=complete"
        )
        stages = json.load(urllib.request.urlopen(url))
        return sum(s.get("inputBytes", 0) for s in stages)

    def delta(self) -> int:
        cur = self._total()
        d = cur - self.last
        self.last = cur
        return d


def run_scale(spark, mult: int, d: str) -> dict:
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        build_ivf_index,
        build_ivfpq_index,
        ivf_search,
        ivfpq_search,
        ivfpq_search_refined,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    idx = f"/tmp/sparkgraft_ivf_probe/x{mult}"
    # meta is the builders' LAST write: its _SUCCESS marks the whole
    # index committed — a crash mid-priming leaves centroids (the FIRST
    # artifact) behind, which a bare isdir check would silently reuse
    if not os.path.exists(f"{idx}/meta/_SUCCESS"):
        build_ivf_index(emb, "vec_id", "embedding", idx, n_cells=N_CELLS)
    pq_idx = f"/tmp/sparkgraft_ivfpq_probe/x{mult}"
    if not os.path.exists(f"{pq_idx}/meta/_SUCCESS"):
        build_ivfpq_index(emb, "vec_id", "embedding", pq_idx, n_cells=N_CELLS)
    queries = emb.filter(f"vec_id < {N_QUERIES}")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # the query-side collect (and its embeddings scan) happens at CALL
    # time, driver-side — reset the meter after it so the measurement is
    # exactly the search job's corpus read
    out = ivf_search(
        spark, idx, queries, "vec_id", "embedding", n_probe=N_PROBE, k=5
    )
    out_pq = ivfpq_search(
        spark, pq_idx, queries, "vec_id", "embedding", n_probe=N_PROBE, k=5
    )
    meter = InputMeter(spark)
    noop(out)
    pruned = meter.delta()
    noop(out_pq)
    pruned_pq = meter.delta()
    # refined: the shortlist job runs at CALL time (internal collect), so
    # the meter must cover the call AND the re-rank noop; a driver-local
    # query relation keeps the embeddings scan out of the measurement
    local_q = spark.createDataFrame(queries.collect(), queries.schema)
    meter.delta()
    out_ref = ivfpq_search_refined(
        spark, pq_idx, idx, local_q, "vec_id", "embedding",
        n_probe=N_PROBE, refine=50, k=5,
        validate=False,  # footer walks are driver-side pyarrow, not input bytes
    )
    noop(out_ref)
    refined = meter.delta()
    noop(spark.read.parquet(f"{idx}/corpus"))
    full = meter.delta()
    return {
        "corpus_vectors": emb.count(),
        "n_cells": N_CELLS,
        "n_queries": N_QUERIES,
        "n_probe": N_PROBE,
        "pruned_search_input_mb": round(pruned / 1e6, 3),
        "pruned_ivfpq_search_input_mb": round(pruned_pq / 1e6, 3),
        "refined_search_input_mb": round(refined / 1e6, 3),
        "full_scan_input_mb": round(full / 1e6, 3),
        "read_fraction": round(pruned / full, 4) if full else None,
        "ivfpq_read_fraction": round(pruned_pq / full, 4) if full else None,
        "refined_read_fraction": round(refined / full, 4) if full else None,
        "probe_budget_fraction": round(min(N_QUERIES * N_PROBE, N_CELLS) / N_CELLS, 4),
    }


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    mults = (1, 10)
    for i, arg in enumerate(sys.argv):
        if arg == "--mults" and i + 1 < len(sys.argv):
            mults = tuple(int(m) for m in sys.argv[i + 1].split(","))
    dirs = {}
    for mult in mults:
        d = f"{OUT_ROOT}/x{mult}"
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"generating {mult}x corpus ...", file=sys.stderr)
            generate(mult, d, hot=(mult >= 10))
        dirs[mult] = d
    spark = get_spark(
        app_name="ivf_prune_probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "1000000"},
    )
    warm = min(dirs)
    run_scale(spark, warm, dirs[warm])  # warmup: not recorded
    results = {m: run_scale(spark, m, d) for m, d in dirs.items()}
    print(json.dumps(results, indent=2))
    if "--markdown" in sys.argv:
        ms = sorted(results)
        print()
        print(
            "| corpus | pruned search MB | full scan MB | read fraction "
            "| ivfpq fraction | refined fraction | probe budget |"
        )
        print("|---|---|---|---|---|---|---|")
        for m in ms:
            r = results[m]
            print(
                f"| {m}x ({r['corpus_vectors']} vecs) | {r['pruned_search_input_mb']} "
                f"| {r['full_scan_input_mb']} | {r['read_fraction']} "
                f"| {r['ivfpq_read_fraction']} | {r['refined_read_fraction']} "
                f"| {r['probe_budget_fraction']} |"
            )


if __name__ == "__main__":
    main()
