"""Semantic dedup (operators/similarity.py::semantic_dedup — SemDeDup,
Abbas et al. 2023).

Correctness pinned against an independent pure-numpy implementation of
the same rule (identical deterministic k-means quantizer, per-cluster
pairwise cosine at 1e-6 rounding, union-find duplicate groups, keep the
lowest-centroid-similarity member) on a seeded corpus with planted
duplicate groups; plus the oversized-cluster audit guard, partition
invariance, and a no-cartesian plan check.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.similarity import semantic_dedup

DIM = 24
N_CELLS = 4


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    # 4 well-separated direction groups; within two of them, plant
    # near-identical duplicate sets (cosine ~ 0.999)
    dirs = rng.standard_normal((4, DIM))
    rows = []
    vid = 0
    for g in range(4):
        for j in range(12):
            v = dirs[g] + 0.15 * rng.standard_normal(DIM)
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
            vid += 1
    # duplicate groups: 3 copies of row 0's vector, 2 copies of row 20's
    for src, n_copies in ((0, 3), (20, 2)):
        base = np.asarray(rows[src][1], dtype=np.float64)
        for _ in range(n_copies):
            v = base + 0.004 * rng.standard_normal(DIM)
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
            vid += 1
    return rows


def reference_semdedup(rows, threshold=0.97, n_cells=N_CELLS, iters=3, sample=2048):
    ids = np.array([i for i, _ in rows], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # same quantizer: lowest-id sample, init = first n_cells rows
    order = np.argsort(ids)
    smat = mat[order][:sample]
    cents = smat[: min(n_cells, len(smat))].copy()
    for _ in range(iters):
        assign = np.argmax(smat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = smat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                if np.linalg.norm(m) > 0:
                    cents[c] = m / np.linalg.norm(m)
    sims = mat @ cents.T
    cell = np.argmax(sims, axis=1)
    csim = np.round(sims[np.arange(len(ids)), cell], 6)
    out = {}
    for c in np.unique(cell):
        mem = np.where(cell == c)[0]
        mem = mem[np.argsort(ids[mem])]
        cos = np.round(mat[mem] @ mat[mem].T, 6)
        parent = list(range(len(mem)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in range(len(mem)):
            for b in range(a + 1, len(mem)):
                if cos[a, b] >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = {}
        for i in range(len(mem)):
            roots.setdefault(find(i), []).append(i)
        for group in roots.values():
            keeper = min(group, key=lambda i: (csim[mem[i]], ids[mem[i]]))
            for i in group:
                gid = int(ids[mem[i]])
                if i == keeper:
                    out[gid] = (int(c), True, None)
                else:
                    out[gid] = (int(c), False, int(ids[mem[keeper]]))
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r["vec_id"]: (r["cluster"], r["keep"], r["duplicate_of"])
        for r in semantic_dedup(df, "vec_id", "embedding", **kw).collect()
    }


def test_matches_reference_and_dedups_planted_groups(spark, corpus):
    got = _run(spark, corpus, threshold=0.97, n_cells=N_CELLS)
    want = reference_semdedup(corpus, threshold=0.97)
    assert got == want
    # the planted groups each collapsed to one keeper
    dropped = [i for i, (_, keep, _) in got.items() if not keep]
    assert len(dropped) >= 3  # 3+2 copies minus 2 keepers at minimum
    for i in dropped:
        keeper = got[i][2]
        assert got[keeper][1] is True  # pointers end at a kept member
        assert got[keeper][0] == got[i][0]  # same cluster


def test_partition_invariance(spark, corpus):
    a = _run(spark, corpus, threshold=0.97)
    df = spark.createDataFrame(
        corpus, "vec_id long, embedding array<float>"
    ).repartition(13)
    b = {
        r["vec_id"]: (r["cluster"], r["keep"], r["duplicate_of"])
        for r in semantic_dedup(df, "vec_id", "embedding", threshold=0.97).collect()
    }
    assert a == b


def test_oversized_cluster_kept_and_flagged(spark, corpus):
    got = {
        r["vec_id"]: (r["keep"], r["semdedup_audit_incomplete"])
        for r in semantic_dedup(
            spark.createDataFrame(corpus, "vec_id long, embedding array<float>"),
            "vec_id",
            "embedding",
            threshold=0.97,
            n_cells=N_CELLS,
            max_cluster_size=3,  # every one of the 4 clusters exceeds it
        ).collect()
    }
    assert all(keep and flagged for keep, flagged in got.values())


def test_threshold_validation_and_plan(spark, corpus):
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        semantic_dedup(df, "vec_id", "embedding", threshold=0.0)
    plan = (
        semantic_dedup(df, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
