"""JSONL corpus source (sources/corpus.py): audit-not-drop parsing."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.sources.corpus import (
    read_jsonl_corpus,
    write_jsonl_corpus,
)


def _write_fixture(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "a perfectly good document"}),
        json.dumps({"doc_id": 2, "text": "another fine document"}),
        '{"doc_id": 3, "text": "truncated li',  # malformed JSON
        json.dumps({"text": "no id at all"}),  # missing id
        json.dumps({"doc_id": 4, "text": None}),  # null text is VALID
        "not json at all",
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_separates_docs_and_audit(spark, tmp_path):
    path = _write_fixture(tmp_path)
    docs, audit = read_jsonl_corpus(spark, path)
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == {
        1: "a perfectly good document",
        2: "another fine document",
        4: None,
    }
    assert docs.columns == ["doc_id", "text"]
    reasons = sorted(r["reason"] for r in audit.collect())
    assert reasons == ["malformed_json", "malformed_json", "missing_id"]
    # every rejected line keeps its payload for debugging
    raws = [r["raw"] for r in audit.collect()]
    assert any("truncated li" in r for r in raws)
    assert any("not json at all" in r for r in raws)
    assert any("no id at all" in r for r in raws)


def test_total_coverage_no_silent_loss(spark, tmp_path):
    path = _write_fixture(tmp_path)
    docs, audit = read_jsonl_corpus(spark, path)
    n_lines = sum(1 for line in open(path) if line.strip())
    assert docs.count() + audit.count() == n_lines


def test_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    out = str(tmp_path / "out")
    write_jsonl_corpus(df, out)
    docs, audit = read_jsonl_corpus(spark, out)
    assert audit.count() == 0
    assert {(r["doc_id"], r["text"]) for r in docs.collect()} == {
        (i, f"text {i}") for i in range(50)
    }


def test_feeds_curation(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate

    path = _write_fixture(tmp_path)
    docs, _ = read_jsonl_corpus(spark, path)
    audit = curate(docs.fillna({"text": ""}), "doc_id", "text")
    assert audit.count() == 3  # every parsed doc gets a verdict
