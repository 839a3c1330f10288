"""Vectorized exact top-k selection shared by the similarity / ANN / PQ
Arrow kernels.

Every kernel used to finish with the same per-query Python loop: mask
the self-pair, `np.lexsort` the row, slice k. At corpus scale the loop
body is tiny numpy calls, so the Python iteration overhead dominated the
batch (measured: the loop was ~40% of embedding_topk_cosine's Arrow
stage at sf0.1). `topk_pairs` computes the identical result with one
vectorized lexsort over the whole score matrix — no Python per-row work.
"""

from __future__ import annotations

import numpy as np


def topk_pairs(q_ids, c_ids, score, k: int, exclude_self: bool = True):
    """Exact top-k per row of a dense (nq, nc) score matrix, ordered
    (score desc, candidate id asc) — the same output multiset, in the
    same per-query rank order, as the per-row
    ``np.lexsort((cand_ids, -cand_score))[:k]`` loop it replaces.

    Self-pairs (``c_ids == q_ids[row]``) are excluded when
    ``exclude_self``; a row with fewer than k (non-self) candidates
    emits all of them. Scores must be finite (cosines/ADC cosines are);
    -inf is reserved as the internal self-exclusion sentinel.

    Returns ``(out_q, out_n, out_s)`` flat arrays, query-major in rank
    order.
    """
    q_ids = np.asarray(q_ids, dtype=np.int64)
    c_ids = np.asarray(c_ids, dtype=np.int64)
    score = np.asarray(score, dtype=np.float64)
    nq, nc = score.shape
    if nq == 0 or nc == 0 or k <= 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.float64),
        )
    s = score
    if exclude_self:
        self_mask = c_ids[None, :] == q_ids[:, None]
        if self_mask.any():
            # ids are unique within a corpus tile/cell, so at most one
            # self per row: k+1 sort columns always cover the top-k
            s = np.where(self_mask, -np.inf, score)
    width = min(nc, k + 1 if exclude_self else k)
    order = np.lexsort((np.broadcast_to(c_ids, s.shape), -s), axis=-1)[:, :width]
    sel_s = np.take_along_axis(s, order, axis=1)
    sel_n = c_ids[order]
    valid = np.isfinite(sel_s)  # -inf == the excluded self sentinel
    keep = valid & (np.cumsum(valid, axis=1) <= k)
    out_q = np.broadcast_to(q_ids[:, None], keep.shape)[keep]
    return out_q, sel_n[keep], sel_s[keep]
