"""Fold-COST scaling probe for compact_ivf_index (r16; r15 VERDICT #6).

The compaction's BENEFIT is measured (r14: a 60-append corpus scanned
4.5x slower until folded); this probe measures its COST curve so the
maintenance scheduling advice ("fold after N appends") is data-backed:

- 1x vs 10x corpus at the SAME append count — is the fold's cost bound
  by DATA size (it re-reads and rewrites every over-budget cell's
  rows)?
- 30 vs 60 appends of the SAME total appended rows at 1x — does
  fragmentation itself (file count) move the fold's cost, or only the
  scan tax it removes?

Each scenario: build a fresh index (n_cells=32, d=32), run the appends,
then time ONE compact_ivf_index with wall seconds, executor CPU
seconds, and shuffle-write bytes (Spark UI REST API — the
tools/scaling_curve.py StageMeter), plus corpus file counts before and
after. Prints one JSON document; --markdown adds a COVERAGE.md-ready
table.

Usage: python tools/fold_cost_probe.py [--markdown]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = "/tmp/sparkgraft_fold_probe"
D = 32
N_CELLS = 32
BASE_BUILD = 5_000
BASE_APPEND_TOTAL = 3_000


def _vec_df(spark, n: int, start: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, D))
    return spark.createDataFrame(
        [(start + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def _count_files(root: str) -> int:
    total = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        total += sum(1 for f in filenames if f.endswith(".parquet"))
    return total


def scenario(spark, meter, name: str, mult: int, n_appends: int) -> dict:
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
    )

    path = f"{OUT_ROOT}/{name}"
    shutil.rmtree(path, ignore_errors=True)
    build_ivf_index(
        _vec_df(spark, BASE_BUILD * mult, 0, 7),
        "vec_id", "embedding", path, n_cells=N_CELLS, kmeans_iters=2,
    )
    per_append = (BASE_APPEND_TOTAL * mult) // n_appends
    for a in range(n_appends):
        append_ivf_index(
            _vec_df(spark, per_append, 1_000_000 + a * per_append, 100 + a),
            "vec_id", "embedding", path,
        )
    files_before = _count_files(f"{path}/corpus")
    meter.delta()  # reset the shuffle/cpu checkpoint
    t0 = time.time()
    folded = compact_ivf_index(spark, path)
    wall = time.time() - t0
    shuffle_b, cpu_ns = meter.delta()
    return {
        "scenario": name,
        "corpus_rows": BASE_BUILD * mult + per_append * n_appends,
        "n_appends": n_appends,
        "files_before": files_before,
        "files_after": _count_files(f"{path}/corpus"),
        "cells_folded": folded,
        "wall_sec": round(wall, 2),
        "cpu_sec": round(cpu_ns / 1e9, 2),
        "shuffle_write_mb": round(shuffle_b / 1e6, 2),
    }


def main() -> None:
    from tools.scaling_curve import StageMeter
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    spark = get_spark(
        app_name="fold_cost_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "1000000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = StageMeter(spark)
    # warmup: one tiny build+append+fold so JIT/codegen isn't billed to
    # the first measured scenario
    scenario(spark, meter, "warmup", 1, 4)
    results = [
        scenario(spark, meter, "x1_30appends", 1, 30),
        scenario(spark, meter, "x10_30appends", 10, 30),
        scenario(spark, meter, "x1_60appends", 1, 60),
    ]
    print(json.dumps(results, indent=2))
    if "--markdown" in sys.argv:
        print()
        hdr = [
            "scenario", "corpus rows", "appends", "files before→after",
            "fold wall s", "fold cpu s", "shuffle MB",
        ]
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in results:
            print(
                f"| {r['scenario']} | {r['corpus_rows']} | {r['n_appends']} "
                f"| {r['files_before']}→{r['files_after']} | {r['wall_sec']} "
                f"| {r['cpu_sec']} | {r['shuffle_write_mb']} |"
            )


if __name__ == "__main__":
    main()
