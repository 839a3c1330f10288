"""Registry-wide contract guard: every query entry must construct a
DataFrame and every oracle must be valid DuckDB SQL. Catches decorator
mis-binding, schema typos, and oracle syntax drift in seconds, without
running the full value-compare gate."""

from __future__ import annotations

import duckdb

from youtube_analytics_lakehouse_databricks_spark.queries import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# Iterative builders run Spark jobs at build time by design (driver-side
# convergence loops); they are exercised by their own oracle rows instead.
ITERATIVE = {
    "dedup_keepers",
    "curate_audit",
    "ngram_lm_scores",
    "classifier_training_scores",
    "embedding_pca_project",  # train_pca collects moments at build time
    "embedding_pq_adc",  # train_pq samples + pq_topk collects queries at build time
}


def test_every_builder_constructs_and_every_oracle_parses(spark):
    reg = registry()
    # The driver's CORRECTNESS gate checks at most 50 queries per round;
    # every registered query must get a driver row, so the registry must
    # never outgrow that budget (consolidate overlapping queries instead).
    assert 45 <= len(reg) <= 50, len(reg)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, q in reg.items():
        if name not in ITERATIVE:
            df = q.builder(spark, SF_DIR)
            assert df is not None and df.schema.fields, name
        if q.oracle is not None:
            con.sql("EXPLAIN " + q.oracle)  # raises on any syntax/binding error
