"""IVF ANN quality: top-1 recall vs brute force on the clustered
embeddings table (labels mark ground-truth clusters)."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.operators.similarity import cosine_topk, ivf_topk
from youtube_analytics_lakehouse_databricks_spark.queries import read

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_top1_recall(spark):
    """Full probe == brute force exactly; partial probe trades recall for
    a fraction of the work (these embeddings are near-random in 64-d, so
    partial-probe recall is bounded by the probe fraction — ANN physics)."""
    emb = read(spark, SF_DIR, "embeddings")
    brute = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(emb, "vec_id", "embedding", k=1).collect()
    }

    def recall(n_cells, n_probe):
        ivf = {
            r["query_id"]: r["neighbor_id"]
            for r in ivf_topk(emb, "vec_id", "embedding", n_cells=n_cells, n_probe=n_probe, k=1).collect()
        }
        assert set(ivf) == set(brute)  # every query answered
        return sum(1 for q in brute if ivf[q] == brute[q]) / len(brute)

    assert recall(8, 8) == 1.0  # probing every cell == exact search
    partial = recall(8, 3)
    assert partial >= 0.55, f"top-1 recall {partial:.2f} probing 3/8 cells"


def test_registered_ivf_query_self_validates(spark):
    """The registered embedding_ivf_ann query emits in_exact_topk and
    recall_at_k; check them against an independently computed exact top-k."""
    from youtube_analytics_lakehouse_databricks_spark.queries import registry

    emb = read(spark, SF_DIR, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    rows = registry()["embedding_ivf_ann"].builder(spark, SF_DIR).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["in_exact_topk"] == ((r["query_id"], r["neighbor_id"]) in exact)
        by_q.setdefault(r["query_id"], []).append(r)
    # denominator is the EXACT top-k size per query (recall), not however
    # many rows IVF retrieved (which would be precision)
    exact_n: dict = {}
    for q, _n in exact:
        exact_n[q] = exact_n.get(q, 0) + 1
    for q, rs in by_q.items():
        want = round(sum(1 for r in rs if r["in_exact_topk"]) / exact_n[q], 3)
        assert all(abs(r["recall_at_k"] - want) < 1e-9 for r in rs)
    # with 2/16 cells probed on near-random 64-d vectors recall is modest
    # but must be far above chance; the exact-probe case is covered above
    mean_recall = sum(rs[0]["recall_at_k"] for rs in by_q.values()) / len(by_q)
    assert mean_recall >= 0.2, mean_recall


def test_ivf_rank_contract(spark):
    emb = read(spark, SF_DIR, "embeddings")
    rows = ivf_topk(emb, "vec_id", "embedding", n_cells=8, n_probe=2, k=3).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        ranks = [r["rank"] for r in rs]
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)
