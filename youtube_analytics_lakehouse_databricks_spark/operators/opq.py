"""Optimized product quantization (parametric OPQ): rotate, allocate,
then PQ.

Ge et al. 2013, "Optimized Product Quantization for Approximate Nearest
Neighbor Search" (public semantics; engine-original formulation) — the
parametric variant (§4): when the data is roughly Gaussian, the optimal
rotation is the PCA EIGENBASIS with dimensions allocated to subspaces by
BALANCED EIGENVALUE PRODUCTS, so every subspace quantizes a comparable
share of the variance. Raw PQ slices the ORIGINAL axes into contiguous
blocks; when variance concentrates in a few mixed directions (real
embedding spaces), some subspaces see almost all the structure and
others quantize noise — the rotation decorrelates, the allocation
balances.

Correctness constraint that shapes the design: the rotation is applied
UNCENTERED (y = R x, R orthonormal rows = permuted eigenvectors), so
every inner product — and therefore every cosine the ADC scan
approximates — is EXACTLY preserved: <R a, R b> = <a, b>, ||R x|| =
||x||. Centering (as PCA projection does) would change cosines; OPQ
only needs the eigen-DIRECTIONS, which the covariance eigenbasis
supplies regardless of where the mean sits.

Engine split: the rotation trains driver-side from the same one-pass
moments PCA uses (corpus never shuffles) with the deterministic
power-deflation eigensolver; encoding fuses rotate + PQ-encode into ONE
Arrow pass (zero shuffle); search rotates the query batch driver-side
and delegates to the standard ADC scan — codes, norms, tables, ranks
all identical machinery to operators/pq.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from youtube_analytics_lakehouse_databricks_spark.operators.mixing import require_integral_id
from youtube_analytics_lakehouse_databricks_spark.operators.pq import PQModel

__all__ = ["OPQModel", "allocate_eigen_dims", "train_opq", "opq_encode", "opq_topk"]


@dataclass
class OPQModel:
    """rotation: (d, d) orthonormal rows (eigenvectors, allocation-
    permuted); pq: the per-subspace codebooks over the ROTATED space."""

    rotation: "object"
    pq: PQModel

    def save(self, spark: SparkSession, path: str) -> None:
        import numpy as np

        r = np.asarray(self.rotation, dtype=np.float64)
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(r)],
            "i int, v array<double>",
        ).write.mode("overwrite").parquet(f"{path}/rotation")
        self.pq.save(spark, f"{path}/pq_model")

    @classmethod
    def load(cls, path: str, spark=None) -> "OPQModel":
        import numpy as np
        import pyarrow.parquet as pq_

        from youtube_analytics_lakehouse_databricks_spark.fsops import (
            driver_read_parquet,
            is_local_path,
            local_path_or_raise,
            require_session,
        )

        # pyarrow fast path locally; Hadoop-FS-streamed on any other
        # reachable scheme (the PQModel.load stance)
        if is_local_path(path):
            local = local_path_or_raise(path, "OPQModel.load")
            t = pq_.read_table(f"{local}/rotation").to_pydict()
        else:
            t = driver_read_parquet(
                require_session(spark, path, "OPQModel.load"),
                f"{path}/rotation",
                "OPQModel.load",
            ).to_pydict()
        order = sorted(range(len(t["i"])), key=t["i"].__getitem__)
        rot = np.asarray([t["v"][i] for i in order], dtype=np.float64)
        return cls(rotation=rot, pq=PQModel.load(f"{path}/pq_model", spark))


def allocate_eigen_dims(eigenvalues, m: int):
    """Balanced eigenvalue-product allocation (Ge et al. §4.2): walk the
    eigenvalues in DESCENDING order, assigning each to the non-full
    subspace with the smallest current log-product — every subspace ends
    with d/m dimensions carrying a comparable variance share. Returns
    the permutation (list of original eigen indices, subspace-major) —
    deterministic: ties take the lowest subspace index."""
    import numpy as np

    ev = np.asarray(eigenvalues, dtype=np.float64)
    d = len(ev)
    if d % m != 0:
        raise ValueError(f"allocate_eigen_dims: dim {d} is not divisible by m={m}")
    cap = d // m
    order = np.argsort(-ev, kind="stable")
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < cap]
        best = min(open_b, key=lambda b: (logs[b], b))
        buckets[best].append(int(idx))
        # eigenvalues can be ~0 on trailing axes; clamp so the log stays
        # finite and those axes spread round-robin over the buckets
        logs[best] += float(np.log(max(ev[idx], 1e-30)))
    return [i for b in buckets for i in b]


def train_opq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    n_codes: int = 256,
    iters: int = 5,
    sample_rows: int = 8192,
    pca_iters: int = 20,
    orthonormalize: bool = True,
) -> OPQModel:
    """Fit the rotation (full-rank covariance eigenbasis via the
    deterministic power-deflation solver, one shuffle-free moments pass
    over the corpus) and the allocation, then train standard PQ
    codebooks on the ROTATED lowest-id sample. Everything is
    deterministic end to end — same data, same model, any partitioning.

    ``orthonormalize=False`` skips the QR polish below — the ONE step of
    this pipeline with no SQL unroll (Householder QR), so the DuckDB
    mirror test (tests/test_opq.py) pins everything else cross-engine
    without it. Legitimate only for spectra with well-separated DISTINCT
    eigenvalues, where the power basis is already orthonormal to the
    iteration tolerance; the default keeps the exact-geometry guarantee
    for real (degenerate-tailed) embedding spectra."""
    import numpy as np

    from youtube_analytics_lakehouse_databricks_spark.operators.pca import train_pca
    from youtube_analytics_lakehouse_databricks_spark.operators.pq import _fit_codebooks, _sample_matrix

    require_integral_id(df, id_col, "train_opq", hint="map string keys to a surrogate long first")
    mat = _sample_matrix(
        df, id_col, vec_col, max(int(sample_rows), n_codes), op="train_opq"
    )
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"train_opq: dim {d} is not divisible by m={m}")
    model = train_pca(df, vec_col, d, iters=pca_iters)
    comps = np.asarray(model.components, dtype=np.float64)  # (d, d) rows
    if orthonormalize:
        # the power-deflation basis is only approximately orthonormal on
        # DEGENERATE trailing eigenvalues (equal-variance axes converge
        # to an arbitrary, imperfectly orthogonal frame) —
        # re-orthonormalize with QR so <Ra, Rb> = <a, b> holds to
        # machine precision: the informative leading axes barely move,
        # and ANY orthonormal completion of an isotropic tail quantizes
        # equally well. Signs canonicalize on a positive R diagonal so
        # the fix stays deterministic.
        qmat, rmat = np.linalg.qr(comps.T)
        signs = np.sign(np.diag(rmat))
        signs[signs == 0] = 1.0
        comps = (qmat * signs).T
    perm = allocate_eigen_dims(model.eigenvalues, m)
    rotation = comps[perm]  # permuted rows stay orthonormal
    books = _fit_codebooks(mat @ rotation.T, m, n_codes, iters, op="train_opq")
    return OPQModel(rotation=rotation, pq=PQModel(codebooks=books))


def opq_encode(
    df: DataFrame, id_col: str, vec_col: str, model: OPQModel
) -> DataFrame:
    """(id, codes, norm): rotate + PQ-encode fused into ONE Arrow pass,
    zero shuffle. ``norm`` is the ORIGINAL vector's L2 norm — equal to
    the rotated vector's (orthonormal rotation), so the ADC cosine
    denominator is unchanged."""
    import numpy as np

    from youtube_analytics_lakehouse_databricks_spark.operators.pq import pq_encode

    require_integral_id(df, id_col, "opq_encode", hint="map string keys to a surrogate long first")
    rot = np.asarray(model.rotation, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(rot)
    d = rot.shape[1]

    def rotate(batches):
        import pandas as pd

        r = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(f"opq_encode: NULL {vec_col} vector")
            try:
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            except ValueError:
                raise ValueError(
                    f"opq_encode: ragged {vec_col} dimensions in batch"
                ) from None
            if mat.shape[1] != d:
                raise ValueError(
                    f"opq_encode: {vec_col} is {mat.shape[1]}-dim but the "
                    f"rotation was trained on {d}-dim vectors"
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: list((mat @ r.T).astype(np.float32))}
            )

    rotated = df.select(id_col, vec_col).mapInPandas(
        rotate, f"{id_col} long, {vec_col} array<float>"
    )
    return pq_encode(rotated, id_col, vec_col, model.pq)


def opq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    model: OPQModel,
    *,
    k: int = 5,
    exclude_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, adc_cosine, rank): the standard ADC scan
    over OPQ codes — the query batch rotates driver-side (bounded, the
    pq_topk contract) and feeds pq's shared ``_adc_scan`` body directly
    (no createDataFrame+collect round-trip for an already-driver-resident
    matrix). The approximated quantity is the ORIGINAL cosine: rotation
    preserves inner products and norms exactly; the float32 cast matches
    the regime the stored codes were encoded under (opq_encode emits
    rotated array<float>)."""
    import numpy as np

    from youtube_analytics_lakehouse_databricks_spark.operators.pq import _adc_scan

    require_integral_id(queries, id_col, "opq_topk", hint="map string keys to a surrogate long first")
    rot = np.asarray(model.rotation, dtype=np.float64)
    rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    if not rows:
        raise ValueError("opq_topk: empty query batch")
    q_ids = np.array([int(r[id_col]) for r in rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    if q_mat.shape[1] != rot.shape[1]:
        raise ValueError(
            f"opq_topk: {vec_col} is {q_mat.shape[1]}-dim but the rotation "
            f"was trained on {rot.shape[1]}-dim vectors"
        )
    rotated = (q_mat @ rot.T).astype(np.float32).astype(np.float64)
    return _adc_scan(
        codes_df, id_col, q_ids, rotated, model.pq,
        k=k, exclude_self=exclude_self, op="opq_topk", vec_col=vec_col,
    )
