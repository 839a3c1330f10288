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

from youtube_analytics_lakehouse_databricks_spark.operators.similarity import (
    auto_n_cells,
    semantic_dedup,
    semantic_dedup_refine,
)

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


def test_auto_n_cells_tracks_corpus(spark, corpus):
    # the derivation: expected cluster = cap/2, floored for small corpora
    assert auto_n_cells(0, 100) == 16
    assert auto_n_cells(1000, 100) == 20
    assert auto_n_cells(10_000, 100) == 200  # 10x corpus -> 10x cells
    assert auto_n_cells(10_000_000, 8192) == 2442
    # e2e: n_cells=None derives from the row count — a corpus 10x the cap
    # fans out over proportionally more clusters without the caller
    # passing anything, and (expected size = cap/2) none trips the flag
    got = semantic_dedup(
        spark.createDataFrame(corpus, "vec_id long, embedding array<float>"),
        "vec_id",
        "embedding",
        threshold=0.97,
        max_cluster_size=5,  # 53 rows = ~10.6x the cap -> 22 cells
    ).collect()
    n_clusters = len({r["cluster"] for r in got})
    assert n_clusters > N_CELLS  # more cells than the small-corpus run
    flagged = [r for r in got if r["semdedup_audit_incomplete"]]
    sizes: dict[int, int] = {}
    for r in got:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    # flag fires iff a cluster actually exceeded the cap (self-consistent)
    assert {r["cluster"] for r in flagged} == {c for c, n in sizes.items() if n > 5}


def test_min_id_keeper(spark, corpus):
    got = _run(spark, corpus, threshold=0.97, n_cells=N_CELLS, keeper="min_id")
    want = reference_semdedup(corpus, threshold=0.97)
    # same groups as the diversity run, but the keeper is the min id:
    # every dropped doc points at the smallest id of its group
    groups: dict[int, set[int]] = {}
    for vid, (_, keep, dup) in want.items():
        root = vid if keep else dup
        groups.setdefault(root, set()).add(vid)
    for members in groups.values():
        if len(members) == 1:
            continue
        k = min(members)
        for m in members:
            if m == k:
                assert got[m][1] is True and got[m][2] is None
            else:
                assert got[m][1] is False and got[m][2] == k
    with pytest.raises(ValueError):
        _run(spark, corpus, keeper="median")


def test_refine_resolves_flagged_clusters(spark, corpus):
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    # cap 13 flags exactly 2 of the 4 direction clusters (sizes 15 and 14
    # — the two holding the planted copies); the other 2 (size 12) pass
    first = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.97, n_cells=N_CELLS,
        max_cluster_size=13,
    )
    rows1 = {r["vec_id"]: r for r in first.collect()}
    flagged1 = {i for i, r in rows1.items() if r["semdedup_audit_incomplete"]}
    assert 0 < len(flagged1) < len(rows1)  # both branches exercised
    # cell_scale=1 on this 29-row flagged population: the floor (16 cells)
    # already splits both over-cap clusters under the cap while keeping
    # each planted copy co-clustered with its source
    refined = semantic_dedup_refine(
        df, first, "vec_id", "embedding", threshold=0.97, cell_scale=1,
        max_cluster_size=13,
    ).collect()
    assert len(refined) == len(rows1)
    by_id = {r["vec_id"]: r for r in refined}
    # unflagged first-pass rows pass through byte-identical
    for i, r in rows1.items():
        if i not in flagged1:
            assert tuple(by_id[i]) == tuple(r)
    # the second pass actually compared: all 5 planted copies fold
    dropped = [r for r in refined if not r["keep"] and r["vec_id"] in flagged1]
    assert len(dropped) >= 5
    for r in dropped:
        keeper = by_id[r["duplicate_of"]]
        assert keeper["keep"] and keeper["cluster"] == r["cluster"]
        # second-pass cluster ids sit past the first pass's range
        assert r["cluster"] >= N_CELLS
    # flags resolved (no second-pass cluster over the cap here)
    assert not any(r["semdedup_audit_incomplete"] for r in refined)
    # no flagged rows left -> refine is a passthrough
    refined_df = semantic_dedup_refine(
        df, first, "vec_id", "embedding", threshold=0.97, cell_scale=1,
        max_cluster_size=13,
    )
    assert semantic_dedup_refine(
        df, refined_df, "vec_id", "embedding", threshold=0.97,
        max_cluster_size=13,  # must match (r11 metadata-stamp guard)
    ) is refined_df


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
