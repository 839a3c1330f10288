

class TestHashedEmbedding:
    def _df(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox leaps over the lazy dog"),  # near-dup of 1
            (3, "completely unrelated text about spark catalyst optimizer"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (5, ""),
            (6, "   "),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_geometry_tracks_lexical_similarity(self, spark):
        """Exact dups embed identically; a one-token edit stays close;
        unrelated text lands far — the JL property the model-free bridge
        rests on. Deterministic across runs and partitionings."""
        import numpy as np

        from youtube_analytics_lakehouse_databricks_spark.operators.text import hashed_embedding

        df = self._df(spark)
        out = {
            r["doc_id"]: r["embedding"]
            for r in hashed_embedding(df, "doc_id", "text", dim=64).collect()
        }
        v = {k: np.asarray(e, dtype=np.float64) for k, e in out.items() if e is not None}
        assert out[5] is None and out[6] is None  # zero-token docs: NULL
        assert np.allclose(v[1], v[4])  # exact dup: identical embedding
        near = float(v[1] @ v[2])
        far = float(v[1] @ v[3])
        assert near > 0.8, near
        assert far < 0.5, far
        assert abs(float(v[1] @ v[1]) - 1.0) < 1e-6  # unit norm

        again = {
            r["doc_id"]: r["embedding"]
            for r in hashed_embedding(
                df.repartition(7), "doc_id", "text", dim=64
            ).collect()
        }
        for k in v:
            assert np.allclose(v[k], np.asarray(again[k], dtype=np.float64))

    def test_all_cancelling_doc_embeds_null_not_zero_vector(self, spark):
        """A doc whose per-dimension signed sums ALL cancel has zero
        norm — it must surface as NULL like the zero-token channel, not
        as a zero vector faking similarity 0 to everything. sha256('a')
        opens with nibble 0xc (1100) and sha256('b') with 0x3 (0011):
        complementary, so the two-token doc cancels every dim at dim=4."""
        from youtube_analytics_lakehouse_databricks_spark.operators.text import hashed_embedding

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a a b")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["embedding"]
            for r in hashed_embedding(df, "doc_id", "text", dim=4).collect()
        }
        assert out[1] is None  # exact cancellation -> NULL
        assert out[2] is not None  # odd token counts can't cancel

    def test_plan_is_jvm_only_shuffle_free_and_dim_guarded(self, spark):
        """r13: the operator is a pure per-row projection — no Python
        in the plan AND no Exchange at all (no explode/groupBy/join),
        so the bridge costs zero shuffle at any corpus size."""
        import io
        from contextlib import redirect_stdout

        import pytest as pt

        from youtube_analytics_lakehouse_databricks_spark.operators.text import hashed_embedding

        df = self._df(spark)
        out = hashed_embedding(df, "doc_id", "text", dim=16)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan, plan
        with pt.raises(ValueError, match="dim=300 must be in"):
            hashed_embedding(df, "doc_id", "text", dim=300)

    def test_composes_with_semantic_dedup(self, spark):
        """The bridge's purpose: a TEXT-ONLY corpus with planted
        paraphrase-level near-dups runs semantic_dedup over its hashed
        embeddings — each planted pair folds to one keeper, distinct
        docs survive."""
        from youtube_analytics_lakehouse_databricks_spark.operators.similarity import semantic_dedup
        from youtube_analytics_lakehouse_databricks_spark.operators.text import hashed_embedding

        base = [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten eleven",
            "spark shuffles hash partitions across executors during wide stages",
        ]
        rows = []
        for i, t in enumerate(base):
            rows.append((2 * i, t))
            toks = t.split()
            toks[3] = toks[3] + "x"  # one-token edit = near-dup
            rows.append((2 * i + 1, " ".join(toks)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        emb = hashed_embedding(df, "doc_id", "text", dim=64)
        out = semantic_dedup(
            emb.filter("embedding IS NOT NULL"), "doc_id", "embedding",
            threshold=0.8, n_cells=2, keeper="min_id",
        )
        res = {r["doc_id"]: r for r in out.collect()}
        for i in range(len(base)):
            a, b = res[2 * i], res[2 * i + 1]
            assert a["keep"] and not b["keep"], (i, a, b)
            assert b["duplicate_of"] == 2 * i


def test_hashed_embedding_semantic_dedup_composed_mirror(spark):
    """The full text -> vector -> dedup chain under ONE cross-engine
    mirror (r13 VERDICT stretch): hashed_embedding at dim=8 feeds
    semantic_dedup with the registered oracle parameters, and DuckDB
    rebuilds BOTH stages — sha256-nibble signs -> ±1 sums -> float32
    normalize (bit-identical to Spark's array<float>), then the
    unmodified SemDeDup oracle SQL over that view. Keeper sets, duplicate
    pointers, clusters, and 1e-6-rounded centroid sims must agree row
    for row, and the fixture plants real duplicates so keep=False rows
    exist (non-vacuous)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from youtube_analytics_lakehouse_databricks_spark.operators.similarity import semantic_dedup
    from youtube_analytics_lakehouse_databricks_spark.operators.text import hashed_embedding
    from youtube_analytics_lakehouse_databricks_spark.queries.vectorops import (
        SEMDEDUP_CAP,
        SEMDEDUP_ITERS,
        SEMDEDUP_N_CELLS,
        SEMDEDUP_THRESHOLD,
        _semdedup_oracle_sql,
    )

    base = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine they always say",
        "to be or not to be that is the question",
        "all that glitters is not gold in the end",
        "pack my box with five dozen liquor jugs",
    ]
    rows = []
    for i in range(40):
        t = base[i % 5]
        if i >= 20:  # lexical near-variant of its base
            t = f"{t} extra token {i % 3}"
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    DIM = 8
    emb = hashed_embedding(docs, "doc_id", "text", dim=DIM).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    got = {
        r["vec_id"]: (
            r["cluster"], r["centroid_sim"], r["keep"], r["duplicate_of"],
            r["semdedup_audit_incomplete"],
        )
        for r in semantic_dedup(
            emb, "vec_id", "embedding",
            threshold=SEMDEDUP_THRESHOLD, n_cells=SEMDEDUP_N_CELLS,
            kmeans_iters=SEMDEDUP_ITERS, max_cluster_size=SEMDEDUP_CAP,
        ).collect()
    }
    assert len(got) == 40
    assert sum(1 for v in got.values() if not v[2]) >= 5  # real drops

    # DuckDB mirror: rebuild the hashed embedding (UNrounded float32 —
    # bit-identical to Spark's array<float>) as a view named
    # `embeddings`, then run the registered SemDeDup oracle verbatim
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    nibs = ", ".join(
        f"strpos('0123456789abcdef', substr(sha256(token), {i + 1}, 1)) - 1 AS nb{i}"
        for i in range((DIM + 3) // 4)
    )
    sums = ", ".join(
        f"SUM(2 * ((nb{b // 4} // {2 ** (3 - b % 4)}) % 2) - 1) AS d{b}"
        for b in range(DIM)
    )
    sq = " + ".join(f"d{b} * d{b}" for b in range(DIM))
    vec = ", ".join(f"CAST(d{b} / nrm AS REAL)" for b in range(DIM))
    con.execute(f"""
        CREATE VIEW embeddings AS
        WITH htok AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
          FROM documents
        ),
        hnib AS (SELECT doc_id, {nibs} FROM htok),
        hsum AS (SELECT doc_id, {sums} FROM hnib GROUP BY doc_id)
        SELECT doc_id AS vec_id, [{vec}] AS embedding
        FROM (SELECT *, sqrt(CAST({sq} AS DOUBLE)) AS nrm FROM hsum)
        WHERE nrm <> 0
    """)
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(_semdedup_oracle_sql()).fetchall()
    }
    assert got == want


def test_passthrough_collision_raises_named(spark):
    """A passthrough column that collides with the projection's own
    columns fails loudly AT THE CALL, naming passthrough — not as an
    ambiguous-reference error at action time three operators later."""
    import pytest

    from youtube_analytics_lakehouse_databricks_spark.operators.text import (
        hashed_embedding,
        quality_scores,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="passthrough"):
        quality_scores(df, "doc_id", "text", passthrough=("text",))
    with pytest.raises(ValueError, match="passthrough"):
        quality_scores(df, "doc_id", "text", passthrough=("n_tokens",))
    with pytest.raises(ValueError, match="passthrough"):
        hashed_embedding(df, "doc_id", "text", passthrough=("embedding",))
    # text_col is deliberately allowed on hashed_embedding (the fused
    # doc_quality_scores composition)
    assert hashed_embedding(
        df, "doc_id", "text", dim=4, passthrough=("text",)
    ).columns == ["doc_id", "text", "embedding"]
