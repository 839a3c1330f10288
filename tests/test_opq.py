"""Optimized product quantization (operators/opq.py): rotation +
eigenvalue allocation + PQ.

Contracts: the rotation is orthonormal so inner products and norms —
the quantities ADC approximates — are exactly preserved; the allocation
balances per-subspace eigenvalue products and is deterministic; OPQ
beats raw PQ at the same code budget on anisotropic data (measured,
margin-asserted); training is deterministic + partition-invariant;
save/load round-trips; guards are loud.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.opq import (
    OPQModel,
    allocate_eigen_dims,
    opq_encode,
    opq_topk,
    train_opq,
)
from youtube_analytics_lakehouse_databricks_spark.operators.pq import pq_encode, pq_topk, train_pq
from youtube_analytics_lakehouse_databricks_spark.operators.similarity import cosine_topk

N, D = 400, 16


def _planted(n=N, d=D, seed=13):
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.standard_normal((d, d)))
    scales = np.array([8.0, 5.0, 3.0, 2.0] + [0.4] * (d - 4))
    return r.standard_normal((n, d)) @ (q * scales).T


def _df(spark, X, start=0):
    return spark.createDataFrame(
        [(start + i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def fitted(spark):
    df = _df(spark, _planted())
    model = train_opq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    return df, model


def test_rotation_is_orthonormal_and_preserves_geometry(fitted):
    """The whole design rests on this: R has orthonormal rows, so
    <Ra, Rb> = <a, b> and ||Rx|| = ||x|| — the ADC scan over rotated
    codes approximates the ORIGINAL cosine, not a distorted one."""
    _df_, model = fitted
    R = np.asarray(model.rotation)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-9)
    r = np.random.default_rng(7)
    a, b = r.standard_normal(D), r.standard_normal(D)
    assert abs(float((R @ a) @ (R @ b)) - float(a @ b)) < 1e-9
    assert abs(np.linalg.norm(R @ a) - np.linalg.norm(a)) < 1e-9


def test_allocation_balances_eigenvalue_products():
    """Ge et al. §4.2: descending walk, each eigenvalue lands in the
    open bucket with the smallest log-product — bucket products end
    within a factor of the largest single eigenvalue of each other,
    versus contiguous slicing whose first bucket hoards the spectrum."""
    ev = np.array([64.0, 25.0, 9.0, 4.0, 0.16, 0.16, 0.16, 0.16])
    perm = allocate_eigen_dims(ev, 4)
    assert sorted(perm) == list(range(8))
    buckets = [perm[i * 2 : (i + 1) * 2] for i in range(4)]
    prods = sorted(float(np.prod(ev[b])) for b in buckets)
    contiguous = sorted(
        float(np.prod(ev[i * 2 : (i + 1) * 2])) for i in range(4)
    )
    # balanced spread is orders of magnitude tighter than contiguous
    assert prods[-1] / prods[0] < 0.01 * (contiguous[-1] / contiguous[0])
    # deterministic
    assert perm == allocate_eigen_dims(ev, 4)
    with pytest.raises(ValueError, match="not divisible"):
        allocate_eigen_dims(ev, 3)


def test_opq_beats_raw_pq_at_same_budget(spark, fitted):
    """The reason the operator exists, measured not asserted: on the
    planted anisotropic corpus at m=4/64 codes, OPQ's recall@10 vs exact
    cosine is ~0.70 where raw PQ reads ~0.53 (the allocation matters
    most when few subspaces must share mixed-direction variance); the
    assertion keeps a wide margin."""
    df, model = fitted
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, "vec_id", "embedding", k=10).collect()
    }

    def recall(hits):
        got = {(r["query_id"], r["neighbor_id"]) for r in hits.collect()}
        return len(got & exact) / len(exact)

    opq_r = recall(
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            df, "vec_id", "embedding", model, k=10, exclude_self=True,
        )
    )
    raw = train_pq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    pq_r = recall(
        pq_topk(
            pq_encode(df, "vec_id", "embedding", raw),
            df, "vec_id", "embedding", raw, k=10, exclude_self=True,
        )
    )
    print(f"recall@10: opq {opq_r:.3f} vs pq {pq_r:.3f}")
    assert opq_r >= pq_r + 0.08, (opq_r, pq_r)


def test_training_is_deterministic_and_partition_invariant(spark, fitted):
    """Same input, same partitioning -> bit-identical model (no RNG
    anywhere). Repartitioned input -> equal to float-summation
    tolerance: the PCA moments merge per-partition partials, so the
    covariance — and everything downstream — can differ in the last
    ulps (the test_pca stance; the codebook sample itself is
    id-ordered, hence exactly partition-invariant)."""
    df, model = fitted
    same = train_opq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    assert np.array_equal(np.asarray(model.rotation), np.asarray(same.rotation))
    assert np.array_equal(
        np.asarray(model.pq.codebooks), np.asarray(same.pq.codebooks)
    )
    again = train_opq(
        df.repartition(13), "vec_id", "embedding", m=4, n_codes=64, iters=5
    )
    assert np.allclose(
        np.asarray(model.rotation), np.asarray(again.rotation), atol=1e-8
    )
    assert np.allclose(
        np.asarray(model.pq.codebooks), np.asarray(again.pq.codebooks), atol=1e-6
    )


def test_save_load_roundtrip(spark, fitted, tmp_path):
    df, model = fitted
    path = str(tmp_path / "opq")
    model.save(spark, path)
    loaded = OPQModel.load(path)
    assert np.array_equal(np.asarray(model.rotation), np.asarray(loaded.rotation))
    assert np.array_equal(
        np.asarray(model.pq.codebooks), np.asarray(loaded.pq.codebooks)
    )
    a = sorted(map(tuple, opq_encode(df, "vec_id", "embedding", model).collect()))
    b = sorted(map(tuple, opq_encode(df, "vec_id", "embedding", loaded).collect()))
    assert a == b


def test_guards(spark, fitted):
    df, model = fitted
    strdf = df.selectExpr("CAST(vec_id AS STRING) AS vec_id", "embedding")
    with pytest.raises(ValueError, match="integral id"):
        train_opq(strdf, "vec_id", "embedding", m=4)
    with pytest.raises(ValueError, match="not divisible by m=7"):
        train_opq(df, "vec_id", "embedding", m=7)
    with pytest.raises(Exception, match="ragged"):
        ragged = spark.createDataFrame(
            [(1, [1.0] * D), (2, [1.0, 2.0])], "vec_id long, embedding array<float>"
        ).coalesce(1)
        opq_encode(ragged, "vec_id", "embedding", model).collect()
    wrongd = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match=f"{D}-dim"):
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            wrongd, "vec_id", "embedding", model,
        )
    with pytest.raises(ValueError, match="empty query"):
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            df.filter("vec_id < 0"), "vec_id", "embedding", model,
        )


def test_composes_with_ivfpq(spark, fitted, tmp_path):
    """The rotation helps the COMPRESSED index too: residual codebooks
    adapt locally per cell, but they still slice the original axes —
    rotating first aligns the slices with the variance structure
    (measured 0.747 vs 0.705 recall@10 at m=4/64 codes on the planted
    corpus). Deliberately composed as a pure upstream column rewrite
    (the PCA stance): the caller rotates the corpus before
    build_ivfpq_index and rotates query batches the same way — rotation
    preserves cosine, so the exact top-k, the cell assignment geometry,
    and every downstream grading are unchanged."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        build_ivfpq_index,
        ivfpq_search,
    )

    df, model = fitted
    R = np.asarray(model.rotation)
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in df.orderBy("vec_id").collect()]
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, "vec_id", "embedding", k=10).collect()
    }

    def recall(d, path):
        build_ivfpq_index(d, "vec_id", "embedding", path,
                          n_cells=8, kmeans_iters=3, m=4, n_codes=64, pq_iters=5)
        hits = ivfpq_search(spark, path, d, "vec_id", "embedding",
                            n_probe=2, k=10, exclude_self=True)
        got = {(r["query_id"], r["neighbor_id"]) for r in hits.collect()}
        return len(got & exact) / len(exact)

    plain = recall(df, str(tmp_path / "plain"))
    rotated = recall(_df(spark, X @ R.T), str(tmp_path / "rot"))
    print(f"ivfpq recall@10: plain {plain:.3f} rotated {rotated:.3f}")
    assert rotated >= plain + 0.02, (plain, rotated)


# --- cross-engine mirror (r13) ----------------------------------------------
#
# The OPQ pipeline joins the hash-match regime the way IVFPQ did in
# test_ivfpq.py: by COMPOSING the already-oracled recurrences. The
# rotation is the registered PCA oracle's power-deflation unroll
# (vectorops._pca_component_ctes — same init, iteration count, sign
# rule, Rayleigh eigenvalue, deflation), run to FULL RANK; the
# eigenvalue-product allocation is re-derived in the test from the
# DuckDB eigenvalues (ten lines of greedy, reimplemented — not the
# operator's code); the rotated Lloyd rounds and the ADC scan mirror
# the registered PQ oracle (distinct-subvector init in sample order,
# expanded-form L2, lowest-code ties, subspace-ordered accumulation,
# float32 stored norms, 1e-6 rounding). One step has no SQL unroll:
# train_opq's Householder-QR polish — the Spark side therefore runs
# orthonormalize=False on a spectrum of well-separated DISTINCT
# eigenvalues (where the polish is a numerical no-op by design and the
# power basis is the rotation), and the polish itself stays pinned by
# test_rotation_is_orthonormal_and_preserves_geometry on the default
# path.

MIR_D, MIR_M, MIR_CODES, MIR_PQ_ITERS, MIR_K, MIR_N = 8, 2, 4, 2, 3, 96


def _mir_planted():
    r = np.random.default_rng(47)
    q, _ = np.linalg.qr(r.standard_normal((MIR_D, MIR_D)))
    scales = np.array([8.0, 6.5, 5.0, 4.0, 3.2, 2.6, 2.1, 1.7])
    return r.standard_normal((MIR_N, MIR_D)) @ (q * scales).T


def _alloc_from_eigs(ev, m):
    """allocate_eigen_dims re-derived (Ge et al. §4.2 greedy) — kept
    independent of the operator's implementation on purpose."""
    import math

    d, cap = len(ev), len(ev) // m
    order = sorted(range(d), key=lambda i: -ev[i])  # stable: ties keep index
    buckets, logs = [[] for _ in range(m)], [0.0] * m
    for idx in order:
        best = min(
            (b for b in range(m) if len(buckets[b]) < cap),
            key=lambda b: (logs[b], b),
        )
        buckets[best].append(idx)
        logs[best] += math.log(max(ev[idx], 1e-30))
    return [i for b in buckets for i in b]


def _mir_rotation_sql() -> str:
    """Stage 1: the registered PCA oracle's covariance + power-deflation
    CTEs run to full rank; emits every component coordinate (tag=0) and
    every Rayleigh eigenvalue (tag=1)."""
    from youtube_analytics_lakehouse_databricks_spark.queries.vectorops import _pca_component_ctes

    comps = ",".join(_pca_component_ctes(c) for c in range(1, MIR_D + 1))
    comp_union = "\n      UNION ALL ".join(
        f"SELECT {c} AS kc, i, v FROM vc{c}" for c in range(1, MIR_D + 1)
    )
    eig_union = "\n      UNION ALL ".join(
        f"SELECT {c} AS kc, 0 AS i, l AS v FROM lam{c}" for c in range(1, MIR_D + 1)
    )
    return f"""
    WITH x AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    nr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
    mu AS MATERIALIZED (
      SELECT i, SUM(val) / (SELECT n FROM nr) AS m FROM x GROUP BY i
    ),
    a0 AS MATERIALIZED (
      SELECT xi.i AS r, xj.i AS q,
             (SUM(xi.val * xj.val) - (SELECT n FROM nr) * mi.m * mj.m)
               / (SELECT n FROM nr) AS a
      FROM x xi JOIN x xj USING (vec_id)
      JOIN mu mi ON mi.i = xi.i JOIN mu mj ON mj.i = xj.i
      GROUP BY xi.i, xj.i, mi.m, mj.m
    ),{comps}
    SELECT 0 AS tag, kc, i, v FROM ({comp_union})
    UNION ALL
    SELECT 1 AS tag, kc, i, v FROM ({eig_union})
    """


def _mir_search_sql(rotation) -> str:
    """Stage 2: rotate (float64 for Lloyd TRAINING, float32-cast for
    ENCODING and the query side — opq_encode/opq_topk's exact regimes),
    per-subspace Lloyd rounds, encode, full ADC scan with float32
    stored norms and subspace-ordered accumulation, exclude_self."""
    from youtube_analytics_lakehouse_databricks_spark.queries.vectorops import _DOT_D_DD, _NORM_DD

    d_sub = MIR_D // MIR_M
    sp_values = ", ".join(f"({s})" for s in range(MIR_M))
    rot_vals = ", ".join(
        "(%d, [%s])" % (j, ", ".join(repr(float(w)) for w in row))
        for j, row in enumerate(rotation)
    )

    def sl(v):
        return f"{v}[s.s * {d_sub} + 1 : s.s * {d_sub} + {d_sub}]"

    def pq_round(kk: int) -> str:
        d2 = (
            f"{_DOT_D_DD.format(a='s.sv', b='s.sv')} - 2 * "
            f"{_DOT_D_DD.format(a='s.sv', b='c.v')} + "
            f"{_DOT_D_DD.format(a='c.v', b='c.v')}"
        )
        return f"""
        pa{kk} AS (
          SELECT rnk, sp, sv, code, row_number() OVER (
            PARTITION BY sp, rnk ORDER BY d2 ASC, code ASC) AS rn
          FROM (SELECT s.rnk, s.sp, s.sv, c.code, {d2} AS d2
                FROM rsub s JOIN pc{kk - 1} c ON c.sp = s.sp)
        ),
        pm{kk} AS (
          SELECT sp, code, i, avg(sv[i]) AS mv
          FROM (SELECT * FROM pa{kk} WHERE rn = 1), range(1, {d_sub + 1}) r(i)
          GROUP BY sp, code, i
        ),
        pmm{kk} AS (
          SELECT sp, code, list(mv ORDER BY i) AS mv FROM pm{kk} GROUP BY sp, code
        ),
        pc{kk} AS MATERIALIZED (
          SELECT p.sp, p.code, CASE WHEN mm.code IS NULL THEN p.v ELSE mm.mv END AS v
          FROM pc{kk - 1} p LEFT JOIN pmm{kk} mm ON mm.sp = p.sp AND mm.code = p.code
        )"""

    rounds = ",".join(pq_round(kk) for kk in range(1, MIR_PQ_ITERS + 1))
    enc_d2 = (
        f"{_DOT_D_DD.format(a='cs.sv', b='cs.sv')} - 2 * "
        f"{_DOT_D_DD.format(a='cs.sv', b='c.v')} + "
        f"{_DOT_D_DD.format(a='c.v', b='c.v')}"
    )
    return f"""
    WITH rot AS (SELECT * FROM (VALUES {rot_vals}) t(j, w)),
    xd AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
           FROM embeddings),
    xr AS (SELECT e.vec_id, r.j, {_DOT_D_DD.format(a='e.x', b='r.w')} AS val
           FROM xd e CROSS JOIN rot r),
    rot64 AS MATERIALIZED (SELECT vec_id, list(val ORDER BY j) AS v
                           FROM xr GROUP BY vec_id),
    rot32 AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS v
      FROM rot64
    ),
    rsub AS MATERIALIZED (
      SELECT rr.rnk, s.s AS sp, {sl('r.v')} AS sv
      FROM rot64 r
      JOIN (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rnk
            FROM rot64) rr USING (vec_id),
           (VALUES {sp_values}) s(s)
    ),
    pc0 AS MATERIALIZED (
      SELECT sp, CAST(rn - 1 AS INT) AS code, sv AS v FROM (
        SELECT sp, sv, row_number() OVER (
          PARTITION BY sp ORDER BY first_rnk ASC) AS rn
        FROM (SELECT sp, sv, min(rnk) AS first_rnk FROM rsub GROUP BY sp, sv))
      WHERE rn <= {MIR_CODES}
    ),{rounds},
    esub AS MATERIALIZED (
      SELECT r.vec_id, s.s AS sp, {sl('r.v')} AS sv
      FROM rot32 r, (VALUES {sp_values}) s(s)
    ),
    enc AS MATERIALIZED (
      SELECT vec_id, sp, code FROM (
        SELECT cs.vec_id, cs.sp, c.code, row_number() OVER (
          PARTITION BY cs.vec_id, cs.sp ORDER BY {enc_d2} ASC, c.code ASC) AS rn
        FROM esub cs JOIN pc{MIR_PQ_ITERS} c ON c.sp = cs.sp) WHERE rn = 1
    ),
    cnorm AS (SELECT vec_id,
                     greatest(CAST(CAST({_NORM_DD.format(a='v')} AS REAL) AS DOUBLE),
                              1e-30) AS nrm
              FROM rot32),
    qnorm AS (SELECT vec_id, greatest({_NORM_DD.format(a='v')}, 1e-30) AS nrm
              FROM rot32),
    tbl AS MATERIALIZED (
      SELECT q.vec_id AS query_id, q.sp, cb.code,
             {_DOT_D_DD.format(a='q.sv', b='cb.v')} AS ip_s
      FROM esub q JOIN pc{MIR_PQ_ITERS} cb ON cb.sp = q.sp
    ),
    ips AS (
      SELECT t.query_id, e.vec_id AS neighbor_id, t.sp, t.ip_s
      FROM enc e
      JOIN tbl t ON t.sp = e.sp AND t.code = e.code AND t.query_id <> e.vec_id
    ),
    adc AS (
      SELECT i.query_id, i.neighbor_id,
             round(list_reduce(list_prepend(0.0, list(i.ip_s ORDER BY i.sp)),
                               (acc, x) -> acc + x)
                   / (any_value(qn.nrm) * any_value(cn.nrm)), 6) AS adc_cosine
      FROM ips i
      JOIN qnorm qn ON qn.vec_id = i.query_id
      JOIN cnorm cn ON cn.vec_id = i.neighbor_id
      GROUP BY i.query_id, i.neighbor_id
    )
    SELECT query_id, neighbor_id, adc_cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY adc_cosine DESC, neighbor_id ASC) AS rank
      FROM adc) WHERE rank <= {MIR_K}
    """


def test_search_matches_duckdb_mirror(spark):
    """Cross-engine pin for the OPQ COMPOSITION: rotate (PCA-oracle
    power-deflation to full rank) -> allocate (re-derived greedy on the
    DuckDB eigenvalues) -> rotated Lloyd train -> encode -> ADC scan,
    all rebuilt in DuckDB, reproduces opq_topk row for row (ranks AND
    1e-6-rounded ADC cosines) at oracle-tractable sizes."""
    import duckdb
    import pyarrow as pa

    X = _mir_planted()
    df = _df(spark, X)
    got = sorted(
        map(
            tuple,
            opq_topk(
                opq_encode(
                    df, "vec_id", "embedding",
                    model := train_opq(
                        df, "vec_id", "embedding",
                        m=MIR_M, n_codes=MIR_CODES, iters=MIR_PQ_ITERS,
                        sample_rows=MIR_N, orthonormalize=False,
                    ),
                ),
                df, "vec_id", "embedding", model,
                k=MIR_K, exclude_self=True,
            ).collect(),
        )
    )

    con = duckdb.connect()
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array(
                [[float(np.float32(v)) for v in row] for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )
    con.register("embeddings", tbl)
    rows = con.execute(_mir_rotation_sql()).fetchall()
    comps = np.zeros((MIR_D, MIR_D))
    eigs = np.zeros(MIR_D)
    for tag, kc, i, v in rows:
        if tag == 0:
            comps[kc - 1, i - 1] = v
        else:
            eigs[kc - 1] = v
    # sanity: the distinct-spectrum precondition the orthonormalize=False
    # leg depends on (and the operator's rotation matches the oracle's)
    assert np.all(np.diff(eigs) < 0), eigs
    rotation = comps[_alloc_from_eigs(eigs, MIR_M)]
    assert np.allclose(rotation, np.asarray(model.rotation), atol=1e-9)

    want = sorted(map(tuple, con.execute(_mir_search_sql(rotation)).fetchall()))
    assert len(got) == len(want) == MIR_N * MIR_K
    assert got == want
