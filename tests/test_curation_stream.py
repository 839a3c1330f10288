"""Streaming curation: file stream -> foreachBatch incremental curate.

The gate: after draining N landing files (N micro-batches), the
latest-wins view of the append-only audit log equals ``curate()`` run
once over every doc ever streamed — including a retroactive fold where
a later batch's doc bridges two earlier keepers.
"""

from __future__ import annotations

import json
import os
import time

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.streaming.curation_stream import (
    curated_ingest_stream,
    current_audit,
)

from tests.test_curation_incremental import A_TXT, B_TXT, C_TXT, OTHER, PARAMS


def _write_landing(path: str, name: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}", "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _drain(spark, landing, dirs, **params):
    q = curated_ingest_stream(
        spark,
        landing,
        state_dir=dirs["state"],
        audit_dir=dirs["audit"],
        checkpoint_dir=dirs["ckpt"],
        available_now=True,
        **params,
    )
    q.awaitTermination(120)
    time.sleep(0.2)


def test_streamed_curation_equals_batch_curate(spark, tmp_path):
    landing = str(tmp_path / "landing")
    dirs = {
        "state": str(tmp_path / "state"),
        "audit": str(tmp_path / "audit"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    b1 = [(1, A_TXT), (2, OTHER), (3, B_TXT), (4, "tiny doc")]
    b2 = [(11, OTHER), (12, "a fresh unique doc about gardening with tomatoes "
                            "herbs and patient watering schedules")]
    b3 = [(21, C_TXT)]  # bridges keepers 1 and 3 -> retro fold of 3

    # three drains, one landing file each: three separate micro-batches
    all_rows: list[tuple[int, str]] = []
    for i, rows in enumerate((b1, b2, b3)):
        _write_landing(landing, f"batch{i}.json", rows)
        _drain(spark, landing, dirs, **PARAMS)
        all_rows += rows

    got = sorted(map(tuple, current_audit(spark, dirs["audit"]).collect()))
    full = sorted(
        map(
            tuple,
            curate(
                spark.createDataFrame(all_rows, "doc_id long, text string"),
                "doc_id",
                "text",
                **PARAMS,
            ).collect(),
        )
    )
    assert got == full

    # the log is history, not just state: doc 3 shows BOTH decisions —
    # kept when it arrived, retro-folded when the bridge doc landed
    log = spark.read.parquet(dirs["audit"]).filter("doc_id = 3").collect()
    verdicts = {r["batch_id"]: (r["keep"], r["drop_reason"]) for r in log}
    assert len(verdicts) == 2
    assert (True, None) in verdicts.values()
    assert (False, "near_duplicate") in verdicts.values()


def test_streamed_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch id (what Structured Streaming does after an
    unacknowledged crash) must not duplicate audit rows."""
    from youtube_analytics_lakehouse_databricks_spark.streaming.curation_stream import (
        ingest_curated_batch,
    )

    dirs = {"state": str(tmp_path / "state"), "audit": str(tmp_path / "audit")}
    b1 = spark.createDataFrame([(1, A_TXT), (2, OTHER)], "doc_id long, text string")
    ingest_curated_batch(
        b1, 0, "doc_id", "text", state_dir=dirs["state"], audit_dir=dirs["audit"], **PARAMS
    )
    before = sorted(map(tuple, spark.read.parquet(dirs["audit"]).collect()))
    # replay the same batch id with the same docs
    ingest_curated_batch(
        b1, 0, "doc_id", "text", state_dir=dirs["state"], audit_dir=dirs["audit"], **PARAMS
    )
    after = sorted(map(tuple, spark.read.parquet(dirs["audit"]).collect()))
    assert after == before


def test_crash_replay_touches_only_its_own_partition(spark, tmp_path):
    """The crash window the replay protocol exists for: batch K's audit
    partition was written but the state save never committed. The
    replayed batch must overwrite ONLY its own batch_id=K/ partition —
    every other batch's files stay byte-identical (the log is
    partitioned by batch_id; no read-filter-rewrite of history)."""
    import glob
    import shutil

    from youtube_analytics_lakehouse_databricks_spark.streaming.curation_stream import (
        ingest_curated_batch,
    )

    state, audit = str(tmp_path / "state"), str(tmp_path / "audit")
    b0 = spark.createDataFrame([(1, A_TXT), (2, OTHER)], "doc_id long, text string")
    b1 = spark.createDataFrame([(11, B_TXT), (12, C_TXT)], "doc_id long, text string")
    kw = dict(state_dir=state, audit_dir=audit, **PARAMS)

    ingest_curated_batch(b0, 0, "doc_id", "text", **kw)
    shutil.copytree(state, str(tmp_path / "state_after_b0"))
    ingest_curated_batch(b1, 1, "doc_id", "text", **kw)
    want = sorted(map(tuple, spark.read.parquet(audit).collect()))

    def snapshot(part):
        return {
            os.path.basename(f): open(f, "rb").read()
            for f in glob.glob(f"{audit}/batch_id={part}/*.parquet")
        }

    b0_files = snapshot(0)
    assert b0_files and snapshot(1)  # the log really is batch-partitioned

    # crash: state save never committed -> roll state back, audit stays
    shutil.rmtree(state)
    shutil.copytree(str(tmp_path / "state_after_b0"), state)
    ingest_curated_batch(b1, 1, "doc_id", "text", **kw)  # the replay

    assert sorted(map(tuple, spark.read.parquet(audit).collect())) == want
    # batch 0's partition was never rewritten: same files, same bytes
    assert snapshot(0) == b0_files


def test_streamed_semantic_gate_equals_batch_curate(spark, tmp_path):
    """r10: the semantic gate threads through the stream — the embedding
    column rides the JSON source schema and each micro-batch, verdicts
    against the frozen bootstrap quantizer match curate() over the union,
    including a cross-batch semantic fold."""
    from tests.test_curation_semantic import CENTROIDS, _dup_of, _emb, _text

    landing = str(tmp_path / "landing")
    dirs = {
        "state": str(tmp_path / "state"),
        "audit": str(tmp_path / "audit"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    e1 = _emb(0, 100)
    b1 = [(1, _text(1), e1), (2, _text(2), _emb(1, 201)), (3, _text(3), _emb(2, 302))]
    b2 = [(11, _text(11), _dup_of(e1, 111)), (12, _text(12), _emb(3, 312))]

    os.makedirs(landing, exist_ok=True)
    sem = dict(
        semantic_vec_col="emb",
        semantic_threshold=0.97,
        semantic_centroids=CENTROIDS,
    )
    all_rows = []
    for i, rows in enumerate((b1, b2)):
        with open(f"{landing}/batch{i}.json", "w") as f:
            for doc_id, text, emb in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "emb": emb}) + "\n")
        all_rows += rows
        _drain(spark, landing, dirs, **sem)

    got = sorted(map(tuple, current_audit(spark, dirs["audit"]).collect()))
    full = curate(
        spark.createDataFrame(all_rows, "doc_id long, text string, emb array<float>"),
        "doc_id",
        "text",
        **sem,
    )
    assert got == sorted(map(tuple, full.collect()))
    by_id = {t[0]: t for t in got}
    assert by_id[11][1:4] == (False, "semantic_duplicate", 1)


def test_streamed_semantic_decontam_gate(spark, tmp_path):
    """r11: the semantic DECONTAMINATION tier threads through the stream
    in decontam-only mode — the embedding rides the JSON source schema
    via semantic_decontam_vec_col (SemDeDup off), a cross-batch eval
    paraphrase drops as semantic_contaminated, and the audit columns
    land in the latest-wins log."""
    from tests.test_curation_semantic import _dup_of, _emb, _text

    landing = str(tmp_path / "landing")
    dirs = {
        "state": str(tmp_path / "state"),
        "audit": str(tmp_path / "audit"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    ev_vec = _emb(3, 900, noise=0.0)  # direction 3: nobody else near it
    ev = spark.createDataFrame([(900, ev_vec)], "doc_id long, emb array<float>")
    b1 = [(1, _text(1), _emb(0, 101)), (2, _text(2), _emb(1, 102))]
    b2 = [(11, _text(11), _emb(2, 103)), (12, _text(12), _dup_of(ev_vec, 5))]

    os.makedirs(landing, exist_ok=True)
    params = dict(semantic_eval_df=ev, semantic_decontam_vec_col="emb")
    all_rows = []
    for i, rows in enumerate((b1, b2)):
        with open(f"{landing}/batch{i}.json", "w") as f:
            for doc_id, text, emb in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "emb": emb}) + "\n")
        all_rows += rows
        _drain(spark, landing, dirs, **params)

    got = sorted(map(tuple, current_audit(spark, dirs["audit"]).collect()))
    full = curate(
        spark.createDataFrame(all_rows, "doc_id long, text string, emb array<float>"),
        "doc_id",
        "text",
        **params,
    )
    assert got == sorted(map(tuple, full.collect()))
    by_id = {t[0]: t for t in got}
    assert by_id[12][1:3] == (False, "semantic_contaminated")
    assert by_id[12][10] >= 0.9 and by_id[12][11] == 900  # audit columns
    assert by_id[1][1] is True and by_id[1][10] is not None  # review tier


def test_compact_audit_log_value_stable(spark, tmp_path):
    """Folding old audit partitions into one latest-verdict partition
    leaves current_audit() value-identical (incl. the retro-folded
    verdicts that live ONLY in later partitions), shrinks the log to
    one row per doc among the folded batches, and never touches the
    live partitions — subsequent ingest keeps working against the
    untouched state."""
    import glob

    from youtube_analytics_lakehouse_databricks_spark.streaming.curation_stream import (
        compact_audit_log,
    )

    landing = str(tmp_path / "landing")
    dirs = {
        "state": str(tmp_path / "state"),
        "audit": str(tmp_path / "audit"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    batches = [
        [(1, A_TXT), (2, OTHER), (3, B_TXT), (4, "tiny doc")],
        [(11, OTHER), (12, "a fresh unique doc about gardening with "
                           "tomatoes herbs and patient watering schedules")],
        [(21, C_TXT)],  # bridges keepers 1 and 3 -> retro fold of 3
        [(31, "another entirely fresh doc on mountain weather patterns "
              "and seasonal snowpack measurement methodology details")],
    ]
    for i, rows in enumerate(batches):
        _write_landing(landing, f"batch{i}.json", rows)
        _drain(spark, landing, dirs, **PARAMS)

    def snapshot():
        return sorted(map(tuple, current_audit(spark, dirs["audit"]).collect()))

    before = snapshot()
    part_dirs = lambda: sorted(  # noqa: E731
        os.path.basename(p) for p in glob.glob(f"{dirs['audit']}/batch_id=*")
    )
    assert len(part_dirs()) == 4

    # fold-vs-fold lock: concurrent folds share the fixed _compact_tmp
    # dir — a held lock refuses (named) before anything is staged
    import os as _os

    import pytest as _pytest

    with open(f"{dirs['audit']}/.compact_lock", "w") as f:
        f.write("compact_audit_log")
    with _pytest.raises(ValueError, match="another fold holds the lock"):
        compact_audit_log(spark, dirs["audit"], keep_latest=1)
    _os.remove(f"{dirs['audit']}/.compact_lock")

    # fold batches 0..2 (keep_latest=1 keeps only the frontier live)
    assert compact_audit_log(spark, dirs["audit"], keep_latest=1) == 3
    assert part_dirs() == ["batch_id=2", "batch_id=3"]
    assert snapshot() == before
    # the consolidated partition holds ONE row per doc seen in 0..2
    folded = spark.read.parquet(f"{dirs['audit']}/batch_id=2")
    assert folded.count() == folded.select("doc_id").distinct().count()
    # nothing left to fold at this horizon
    assert compact_audit_log(spark, dirs["audit"], keep_latest=1) == 0
    # and the finished folds released the lock
    assert not _os.path.exists(f"{dirs['audit']}/.compact_lock")

    # ingest continues against the untouched state after compaction
    _write_landing(landing, "batch4.json", [(41, A_TXT)])  # exact dup of 1
    _drain(spark, landing, dirs, **PARAMS)
    after = {r["doc_id"]: r for r in current_audit(spark, dirs["audit"]).collect()}
    assert after[41]["keep"] is False and after[41]["duplicate_of"] == 1
    assert after[1]["keep"] is True
