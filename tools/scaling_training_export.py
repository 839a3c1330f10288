"""Composed prepare_training_data scaling: the full assembly, 1x vs 10x.

Every component of the export pipeline has its own measured scaling row
(COVERAGE.md) — but composition is where regressions hide (the round-5
uncut-lineage blowup lived BETWEEN stages, not in any one of them). This
harness measures the COMPOSED `prepare_training_data` — paragraph-dedup
clean -> curate() -> leakage-safe split -> mixture_sample -> epoch
shuffle_shards -> in-partition pack_sequences -> partitioned parquet
write, audit alongside — end to end:

- ``export`` row: wall + shuffle bytes for a full epochs=1 run
  (paragraph_dedup=True, substring_dedup=True W=20 since r9, domain
  mixing alpha=0.5, val split 10%, capacity-2048 packing, 8 shards);
- ``marginal epoch`` row: (epochs=3 run - epochs=1 run) / 2 — the
  incremental cost of one additional epoch tree. The design claim is
  that curation+mixing run ONCE (lineage-cut) and each extra epoch pays
  exactly its own permutation exchange + pack + write, i.e. the
  marginal shuffle should track the shuffle_shards row (~2 MB at 1x /
  ~18 MB at 10x), NOT the full chain's.

Gates per scale: every epoch tree holds the same doc multiset (rows per
epoch == rows of the epochs=1 run), stats['rows_per_epoch'] agrees, and
no sequence straddles a shard.

Reuses the deterministic scaling_curve corpora (1x = 5k docs, 10x =
50k docs incl. the hot boilerplate key).

Usage: python tools/scaling_training_export.py [--markdown] [--mults 1,10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_curve import OUT_ROOT, StageMeter, generate  # noqa: E402

EXPORT_ROOT = "/tmp/sparkgraft_training_export"


def _run_export(spark, corpus_dir: str, out: str, epochs: int) -> dict:
    from youtube_analytics_lakehouse_databricks_spark.operators.training_export import (
        prepare_training_data,
    )
    from youtube_analytics_lakehouse_databricks_spark.queries import read_fanned

    docs = read_fanned(spark, corpus_dir, "documents", by="doc_id").select(
        "doc_id", "text", "source"
    )
    shutil.rmtree(out, ignore_errors=True)
    meter = StageMeter(spark)
    spark.catalog.clearCache()
    meter.delta()
    t0 = time.time()
    stats = prepare_training_data(
        docs,
        "doc_id",
        "text",
        out,
        n_shards=8,
        seed=7,
        epochs=epochs,
        paragraph_dedup=True,
        # r9: the composed row now carries the strongest dedup mode too
        # (ExactSubstr at W=20 — the driver-corpus window width)
        substring_dedup=True,
        substring_min_tokens=20,
        domain_col="source",
        alpha=0.5,
        capacity=2048,
        val_frac=0.1,
    )
    wall = time.time() - t0
    shuffle_mb = meter.delta()[0] / 1e6
    return {"wall_sec": round(wall, 2), "shuffle_mb": round(shuffle_mb, 2), **stats}


def run_scale(spark, mult: int, corpus_dir: str) -> dict:
    out: dict = {}
    e1 = _run_export(spark, corpus_dir, f"{EXPORT_ROOT}/x{mult}_e1", epochs=1)
    e3 = _run_export(spark, corpus_dir, f"{EXPORT_ROOT}/x{mult}_e3", epochs=3)
    out["input_docs"] = e1["input_docs"]
    out["export_sec"] = e1["wall_sec"]
    out["export_shuffle_mb"] = e1["shuffle_mb"]
    out["exported_rows"] = e1["exported_rows"]
    out["mean_seq_fill"] = e1["mean_seq_fill"]
    out["marginal_epoch_sec"] = round((e3["wall_sec"] - e1["wall_sec"]) / 2, 2)
    out["marginal_epoch_shuffle_mb"] = round(
        (e3["shuffle_mb"] - e1["shuffle_mb"]) / 2, 2
    )
    # gates: every epoch tree carries the identical doc multiset
    ok = e3["rows_per_epoch"] == e1["exported_rows"]
    ok = ok and e3["exported_rows"] == 3 * e3["rows_per_epoch"]
    written = spark.read.parquet(f"{EXPORT_ROOT}/x{mult}_e3")
    per_epoch = {
        r["epoch"]: r["n"]
        for r in written.groupBy("epoch").count().withColumnRenamed("count", "n").collect()
    }
    ok = ok and set(per_epoch) == {0, 1, 2} and len(set(per_epoch.values())) == 1
    # no sequence straddles two shards within an epoch: each (epoch,
    # seq_id) maps to exactly one shard
    seqs = written.select("epoch", "shard", "seq_id").distinct().count()
    uniq = written.select("epoch", "seq_id").distinct().count()
    out["epochs_consistent"] = bool(ok and seqs == uniq)
    return out


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    mults = (1, 10)
    for i, arg in enumerate(sys.argv):
        if arg == "--mults" and i + 1 < len(sys.argv):
            mults = tuple(int(m) for m in sys.argv[i + 1].split(","))
    dirs = {}
    for mult in mults:
        d = f"{OUT_ROOT}/x{mult}"
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"generating {mult}x corpus ...", file=sys.stderr)
            generate(mult, d, hot=(mult >= 10))
        dirs[mult] = d

    spark = get_spark(
        app_name="scaling_training_export", extra_conf={
            "spark.ui.enabled": "true",
            # StageMeter reads cumulative stage totals from the UI REST
            # API; the default retainedStages=1000 EVICTS early stages
            # mid-run on a full-table measurement (17 stages x 3 pairs x
            # 2 scales), making later deltas under-read or go NEGATIVE
            "spark.ui.retainedStages": "1000000",
        }
    )
    warm = min(dirs)
    run_scale(spark, warm, dirs[warm])  # warmup: JIT/codegen, not recorded
    results = {m: run_scale(spark, m, d) for m, d in dirs.items()}
    print(json.dumps(results, indent=2))
    if "--markdown" in sys.argv:
        ms = sorted(results)
        print()
        hdr = ["path"]
        for m in ms:
            hdr += [f"{m}x wall s", f"{m}x shuffle MB"]
        hdr += ["epochs consistent"]
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for key, label in (
            ("export", "prepare_training_data (full assembly, epochs=1)"),
            ("marginal_epoch", "marginal extra epoch ((epochs=3 − epochs=1) / 2)"),
        ):
            row = [label]
            for m in ms:
                row += [
                    str(results[m][f"{key}_sec"]),
                    str(results[m][f"{key}_shuffle_mb"]),
                ]
            row.append(str(all(results[m]["epochs_consistent"] for m in ms)))
            print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
