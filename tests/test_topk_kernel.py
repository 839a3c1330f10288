"""The vectorized top-k kernel must reproduce the per-row lexsort loop
it replaced, element for element, across edge shapes: ties on score
(id-asc break), self-pairs present/absent, rows with fewer than k
candidates, k larger than the corpus, and empty inputs."""

from __future__ import annotations

import numpy as np

from youtube_analytics_lakehouse_databricks_spark.operators._topk import topk_pairs


def _loop_reference(q_ids, c_ids, score, k, exclude_self=True):
    out_q, out_n, out_s = [], [], []
    for i in range(len(q_ids)):
        mask = c_ids != q_ids[i] if exclude_self else np.ones(len(c_ids), bool)
        cand_ids, cand_s = c_ids[mask], score[i][mask]
        order = np.lexsort((cand_ids, -cand_s))[: min(k, len(cand_ids))]
        out_q.extend([q_ids[i]] * len(order))
        out_n.extend(cand_ids[order])
        out_s.extend(cand_s[order])
    return (
        np.array(out_q, dtype=np.int64),
        np.array(out_n, dtype=np.int64),
        np.array(out_s, dtype=np.float64),
    )


def _assert_same(got, want):
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_matches_loop_on_random_matrices():
    rng = np.random.default_rng(7)
    for nq, nc, k in [(1, 1, 5), (3, 7, 2), (17, 33, 5), (5, 4, 10), (8, 8, 1)]:
        q_ids = np.arange(nq, dtype=np.int64) * 3
        c_ids = np.arange(nc, dtype=np.int64) * 3  # overlaps q_ids -> self pairs
        score = np.round(rng.uniform(-1, 1, size=(nq, nc)), 6)
        for excl in (True, False):
            _assert_same(
                topk_pairs(q_ids, c_ids, score, k, exclude_self=excl),
                _loop_reference(q_ids, c_ids, score, k, exclude_self=excl),
            )


def test_score_ties_break_to_lowest_id():
    q_ids = np.array([100], dtype=np.int64)
    c_ids = np.array([9, 3, 7, 5], dtype=np.int64)
    score = np.array([[0.5, 0.5, 0.9, 0.5]])
    out_q, out_n, out_s = topk_pairs(q_ids, c_ids, score, 3)
    np.testing.assert_array_equal(out_n, [7, 3, 5])
    np.testing.assert_array_equal(out_s, [0.9, 0.5, 0.5])
    np.testing.assert_array_equal(out_q, [100, 100, 100])


def test_self_exclusion_and_short_rows():
    # one candidate which IS the query: excluded -> empty row
    out_q, out_n, _ = topk_pairs(
        np.array([5]), np.array([5]), np.array([[1.0]]), 3
    )
    assert len(out_q) == 0 and len(out_n) == 0
    # self among others: never emitted even at rank 1
    out_q, out_n, _ = topk_pairs(
        np.array([5]), np.array([5, 6]), np.array([[1.0, 0.2]]), 3
    )
    np.testing.assert_array_equal(out_n, [6])


def test_empty_inputs():
    for nq, nc in [(0, 4), (4, 0), (0, 0)]:
        out = topk_pairs(
            np.arange(nq), np.arange(nc), np.zeros((nq, nc)), 5
        )
        assert all(len(o) == 0 for o in out)
