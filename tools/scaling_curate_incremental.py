"""Incremental-vs-full curation scaling: fixed batch, growing corpus.

Backs the append-mode claim (VERDICT r5 #3) with a measurement: the cost
of curating a NEW batch into an already-curated corpus should be driven
by the batch, not the corpus — while full re-curation grows linearly
with the corpus.

Setup per scale (reuses the deterministic scaling_curve corpora: 1x =
5k docs, 10x = 50k docs incl. the hot boilerplate key):

- the corpus is curated once and its CurationState persisted to parquet
  (untimed bootstrap — the state a production pipeline already has);
- a FIXED 500-doc batch (60% fresh text, 20% exact copies of corpus
  docs, 20% near-dup variants of corpus docs) appends via
  ``curate_incremental`` against the RELOADED state (timed);
- the same union runs through full ``curate`` (timed);
- the two audit frames are compared row-for-row (the correctness gate —
  strict equality expected here: the generator cannot cross the
  hot-bucket cap, so the documented monotone divergence never fires).

Usage: python tools/scaling_curate_incremental.py [--markdown]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_curve import OUT_ROOT, StageMeter, generate  # noqa: E402

BATCH_DOCS = 500
STATE_ROOT = "/tmp/sparkgraft_curate_state"


def make_batch(spark, corpus_dir: str, semantic: bool = False):
    """Deterministic 500-doc batch with ids above the corpus frontier.
    ``semantic=True`` reads the embedded corpus and attaches embeddings:
    fresh docs get fresh random vectors; text copies/variants get their
    source doc's vector perturbed by 0.002 — cross-batch SEMANTIC dups
    the append must fold against the stored cluster index."""
    import numpy as np
    import pyarrow.parquet as pq

    src = "documents_embedded" if semantic else "documents"
    cols = ["doc_id", "text"] + (["embedding"] if semantic else [])
    tbl = pq.read_table(f"{corpus_dir}/{src}.parquet", columns=cols)
    texts = tbl["text"].to_pylist()
    embs = tbl["embedding"].to_pylist() if semantic else None
    max_id = max(tbl["doc_id"].to_pylist())
    rng = np.random.default_rng(1234)
    words = [f"tok{i:04d}" for i in range(5000)]

    def vec_of(j=None):
        if j is None:
            v = rng.normal(0, 1, size=len(embs[0]))
        else:
            v = np.asarray(embs[j], dtype=np.float64)
            v = v + 0.002 * rng.standard_normal(len(v))
        return [float(x) for x in v / np.linalg.norm(v)]

    rows = []
    for i in range(BATCH_DOCS):
        doc_id = max_id + 1 + i
        kind = i % 5
        if kind < 3:  # fresh text
            n = int(np.clip(rng.normal(45, 15), 10, 100))
            t = " ".join(words[j] for j in rng.integers(0, 5000, n))
            rows.append((doc_id, t) if not semantic else (doc_id, t, vec_of()))
        elif kind == 3:  # exact copy of a corpus doc
            j = int(rng.integers(0, len(texts)))
            rows.append(
                (doc_id, texts[j]) if not semantic else (doc_id, texts[j], vec_of(j))
            )
        else:  # near-dup variant of a corpus doc (2 words swapped)
            j = int(rng.integers(0, len(texts)))
            toks = texts[j].split(" ")
            for w in rng.choice(len(toks), size=min(2, len(toks)), replace=False):
                toks[w] = words[int(rng.integers(0, 5000))]
            t = " ".join(toks)
            rows.append((doc_id, t) if not semantic else (doc_id, t, vec_of(j)))
    schema = "doc_id long, text string" + (
        ", embedding array<float>" if semantic else ""
    )
    return spark.createDataFrame(rows, schema)


def run_scale(spark, mult: int, corpus_dir: str, semantic: bool = False) -> dict:
    from pyspark.sql import functions as F

    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
    from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
        CurationState,
        curate_incremental,
    )
    from youtube_analytics_lakehouse_databricks_spark.queries import read_fanned

    if semantic:
        # same embedded input both paths, explicit shared quantizer
        # (caller-owned contract); built on demand outside timing
        from tools.scaling_curve import ensure_embedded

        from youtube_analytics_lakehouse_databricks_spark.operators.similarity import (
            train_semantic_centroids,
        )

        ensure_embedded(spark, corpus_dir)
        corpus = read_fanned(spark, corpus_dir, "documents_embedded", by="doc_id")
        sem = dict(
            semantic_vec_col="embedding",
            semantic_threshold=0.95,
            semantic_centroids=train_semantic_centroids(
                corpus, "doc_id", "embedding", n_cells=32
            ),
        )
    else:
        corpus = read_fanned(spark, corpus_dir, "documents", by="doc_id").select(
            "doc_id", "text"
        )
        sem = {}
    batch = make_batch(spark, corpus_dir, semantic=semantic)
    state_dir = f"{STATE_ROOT}/x{mult}" + ("_sem" if semantic else "")
    shutil.rmtree(state_dir, ignore_errors=True)

    # bootstrap (untimed): the state a production pipeline already holds
    _, st = curate_incremental(corpus, "doc_id", "text", **sem)
    st.save(state_dir)

    meter = StageMeter(spark)
    out: dict = {"corpus_docs": corpus.count(), "batch_docs": BATCH_DOCS}

    spark.catalog.clearCache()
    meter.delta()
    t0 = time.time()
    st2 = CurationState.load(spark, state_dir)
    inc_audit, _ = curate_incremental(batch, "doc_id", "text", state=st2, **sem)
    out["inc_rows"] = inc_audit.count()
    out["incremental_sec"] = round(time.time() - t0, 2)
    out["incremental_shuffle_mb"] = round(meter.delta()[0] / 1e6, 2)

    spark.catalog.clearCache()
    meter.delta()
    t0 = time.time()
    full_audit = curate(corpus.unionByName(batch), "doc_id", "text", **sem)
    out["full_rows"] = full_audit.count()
    out["full_recurate_sec"] = round(time.time() - t0, 2)
    out["full_recurate_shuffle_mb"] = round(meter.delta()[0] / 1e6, 2)

    # correctness gate: row-for-row equality of the two audit frames
    cols = sorted(inc_audit.columns)

    def audit_hash(df):
        h = df.select(
            F.sha2(
                F.concat_ws(
                    "\x1f",
                    *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols],
                ),
                256,
            ).alias("h")
        )
        return h.agg(
            F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    hi, hf = audit_hash(inc_audit), audit_hash(full_audit)
    out["audits_equal"] = (hi["s"] == hf["s"]) and (hi["n"] == hf["n"])
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
        app_name="scaling_curate_incremental", extra_conf={
            "spark.ui.enabled": "true",
            # StageMeter reads cumulative stage totals from the UI REST
            # API; the default retainedStages=1000 EVICTS early stages
            # mid-run on a full-table measurement (17 stages x 3 pairs x
            # 2 scales), making later deltas under-read or go NEGATIVE
            "spark.ui.retainedStages": "1000000",
        }
    )
    semantic = "--semantic" in sys.argv
    warm = min(dirs)
    run_scale(spark, warm, dirs[warm], semantic)  # warmup: not recorded
    results = {m: run_scale(spark, m, d, semantic) for m, d in dirs.items()}
    print(json.dumps(results, indent=2))
    if "--markdown" in sys.argv:
        ms = sorted(results)
        print()
        hdr = ["path"]
        for m in ms:
            hdr += [f"{m}x wall s", f"{m}x shuffle MB"]
        hdr += ["audits equal"]
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for key, label in (
            ("incremental", "curate_incremental (500-doc batch vs stored state)"),
            ("full_recurate", "full curate (corpus + batch)"),
        ):
            row = [label]
            for m in ms:
                row += [str(results[m][f"{key}_sec"]), str(results[m][f"{key}_shuffle_mb"])]
            row.append(str(all(results[m]["audits_equal"] for m in ms)))
            print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
