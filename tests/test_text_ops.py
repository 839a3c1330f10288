

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
