"""Streaming ANN index ingestion: readStream -> foreachBatch
frozen-state encode -> per-batch cell partitions, exactly-once.

The production shape when the EMBEDDING CORPUS arrives as a stream (new
documents embed as they land): the coarse quantizer — and, for the
compressed index, the residual codebooks — train ONCE on a bootstrap
sample and FREEZE (the curate_incremental contract ``append_ivf_index``
already applies to batch appends), then every micro-batch encodes
against the frozen state in one Arrow pass and lands in the index.

Exactly-once under crash replay, the engine's audit-log pattern
(streaming/pca_stream.py): each micro-batch writes its rows under
``batch_id=K/cell=J/`` partitions with dynamic partition overwrite — a
replayed batch recomputes the SAME rows (Structured Streaming replays
identical source offsets), maps them to the SAME cells (the encode is a
deterministic function of the frozen state), and replaces exactly its
own partitions; rows other batches wrote are never touched and never
double-counted.

Searches need no streaming variant: ``batch_id`` leads the directory
layout but ``cell`` is still a partition column, so ``ivf_search`` /
``ivfpq_search`` / ``ivfpq_search_refined`` prune the streamed corpus by
probed cell exactly as they prune an appended one — pinned by a
PartitionFilters plan assertion and a streamed-equals-one-write parity
test.

Path contract: the layout guard and the compaction run DRIVER-SIDE
through the session's Hadoop FileSystem (``fsops.DriverFS``), so they
work on any scheme the session can reach (``file:``, ``hdfs://``,
``s3a://`` with the connector present) and FAIL with a named
``fsops.RemotePathError`` — never a silent no-op — when the scheme is
unreachable. The frozen-state reads (centroids, codebooks) take the
pyarrow fast path locally and stream through the same Hadoop
FileSystem on any other reachable scheme (``ivf_index``'s
object-store-native contract, r14) — a streamed index rooted on an
object store both ingests AND serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from youtube_analytics_lakehouse_databricks_spark.fsops import (
    DriverFS,
    StagedFold,
    batch_partition_ids,
)

__all__ = [
    "bootstrap_ann_stream_index",
    "ingest_ann_batch",
    "ann_index_stream",
    "compact_ann_stream",
    "stream_index_health",
]


def bootstrap_ann_stream_index(
    sample_df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    compressed: bool = False,
    n_cells: int | None = None,
    kmeans_iters: int = 3,
    max_cluster_size: int = 8192,
    m: int = 8,
    n_codes: int = 256,
    pq_iters: int = 5,
) -> None:
    """Train and persist ONLY the frozen state (centroids, meta, and —
    with ``compressed=True`` — the residual codebooks) from a bootstrap
    sample; no corpus rows are written (the builders run with
    ``write_corpus=False``, so the bootstrap never pays an encode pass
    or a corpus write it would throw away, and the state lands on the
    session's real filesystem — no driver-local staging). Every vector,
    including the bootstrap sample's if the caller replays it, enters
    through the stream so the corpus layout is uniformly
    ``batch_id=K/cell=J``."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        build_ivf_index,
        build_ivfpq_index,
    )

    if compressed:
        build_ivfpq_index(
            sample_df, id_col, vec_col, path,
            n_cells=n_cells, kmeans_iters=kmeans_iters,
            max_cluster_size=max_cluster_size,
            m=m, n_codes=n_codes, pq_iters=pq_iters,
            write_corpus=False,
        )
    else:
        build_ivf_index(
            sample_df, id_col, vec_col, path,
            n_cells=n_cells, kmeans_iters=kmeans_iters,
            max_cluster_size=max_cluster_size,
            write_corpus=False,
        )


def ingest_ann_batch(
    batch: DataFrame, batch_id: int, id_col: str, vec_col: str, path: str
) -> None:
    """foreachBatch body: encode the micro-batch against the frozen
    state and write its rows under their ``batch_id=K/cell=J``
    partitions (dynamic overwrite = replay-safe). Sniffs the index kind
    from the persisted state: a ``pq_model`` directory means the
    compressed (IVFPQ) layout, otherwise the flat one. Empty
    micro-batches write nothing."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        _encode_ivfpq,
        load_ivf_centroids,
    )
    from youtube_analytics_lakehouse_databricks_spark.operators.similarity import assign_cells

    if batch.isEmpty():
        return
    # inverse of append_ivf_index's layout guard: streaming writes into
    # a BATCH-BUILT index (top-level cell=J dirs) would leave
    # conflicting directory structures that break partition discovery
    # on the next read — refuse before any data lands. DriverFS, not
    # os.path: on an object-store path the os probe is ALWAYS False and
    # would wave the corruption through silently; this either really
    # lists the directory or raises fsops.RemotePathError up front.
    fs = DriverFS(batch.sparkSession, path, "ingest_ann_batch")
    for d in (f"{path}/corpus_pq", f"{path}/corpus"):
        if fs.listnames(d, prefix="cell="):
            raise ValueError(
                f"ingest_ann_batch: {d} is a BATCH-BUILT index layout "
                "(top-level cell=J partitions) — streamed batch_id "
                "partitions would corrupt its partition discovery; use "
                "append_ivf_index/append_ivfpq_index for batch appends, "
                "or bootstrap a fresh streamed index"
            )
    centroids = load_ivf_centroids(path, batch.sparkSession)
    if fs.isdir(f"{path}/pq_model"):
        from youtube_analytics_lakehouse_databricks_spark.operators.pq import PQModel

        model = PQModel.load(f"{path}/pq_model", batch.sparkSession)
        rows = _encode_ivfpq(batch, id_col, vec_col, centroids, model.codebooks)
        corpus_dir = f"{path}/corpus_pq"
    else:
        rows = assign_cells(batch, id_col, vec_col, centroids).select(
            id_col, "v", F.col("cluster").alias("cell")
        )
        corpus_dir = f"{path}/corpus"
    (
        rows.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "cell")
        .parquet(corpus_dir)
    )


def ann_index_stream(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Wire a streaming DataFrame of (id, vector) rows into the index:
    one frozen-state Arrow encode per micro-batch, exactly-once under
    replay. The index must be bootstrapped first."""

    def body(batch: DataFrame, batch_id: int) -> None:
        ingest_ann_batch(batch, batch_id, id_col, vec_col, path)

    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def compact_ann_stream(
    spark,
    path: str,
    *,
    keep_last: int = 2,
    lock_takeover_after: float | None = None,
) -> int:
    """Fold batch partitions older than the newest ``keep_last`` into ONE
    consolidated batch partition (at the smallest folded batch id) — a
    week of 1-minute micro-batches otherwise leaves ~10k tiny
    ``batch_id=K`` directories whose file count taxes every search's
    planning, even though the DATA doesn't grow with batch count.

    Safety contract, stated honestly: this is a MAINTENANCE operation
    (the OPTIMIZE stance, ops/maintenance.py) — run it while no search
    is mid-flight; concurrent INGEST is fine (new batch ids are never
    touched, and ``keep_last >= 2`` keeps the streaming replay horizon
    out of the fold). It is crash-RECOVERABLE, not reader-atomic — the
    ``fsops.StagedFold`` stage-and-swap protocol: the consolidated
    partition stages under a dot-directory Spark scans ignore, a
    manifest + completion marker commit the fold (both written
    temp -> sync -> atomic rename, so a present marker always implies a
    readable manifest), and a crash at any point either leaves the
    originals intact (before the marker) or is finished by the next
    call (after it — recovery re-deletes the folded dirs from the
    manifest and moves the staged partition in). Folds exclude EACH
    OTHER via ``fsops.maintenance_lock`` (r15): a concurrent fold's
    recover() re-applying the committed manifest mid-swap would delete
    the freshly renamed-in consolidated partition (the fold list
    contains the target id); the lock releases on every exception, so
    only a process death strands it — named error, delete and rerun.
    Returns the number of batch partitions folded (0 = nothing to do).
    """
    if int(keep_last) < 2:
        raise ValueError(
            "compact_ann_stream: keep_last must be >= 2 — the newest batch "
            "can be REPLAYED by the stream after a crash, and replaying a "
            "batch that was already folded would duplicate its rows"
        )
    fs = DriverFS(spark, path, "compact_ann_stream")
    corpus_dir = (
        f"{path}/corpus_pq" if fs.isdir(f"{path}/corpus_pq") else f"{path}/corpus"
    )
    # a missing corpus is a WRONG PATH, not "nothing to fold" — a
    # scheduled maintenance job pointed at a stale path must fail, not
    # report success forever while the real index grows unboundedly
    if not fs.isdir(corpus_dir):
        raise ValueError(
            f"compact_ann_stream: no corpus under {path} — wrong index "
            "path, or a bootstrap that never ingested"
        )
    staging = StagedFold(fs, corpus_dir)

    def finish(manifest: dict) -> int:
        fold = manifest["fold"]
        staged = f"{staging.stage_dir}/batch_id={manifest['target']}"
        # the staged dir's presence IS the state machine: present means
        # the fold hasn't been applied (deletes may be partial — they
        # strictly precede the rename, in this call and in recovery), so
        # (re-)delete the originals and move the consolidated partition
        # in; ABSENT means a prior call already renamed it into place
        # and only the tmp cleanup remains — deleting anything here
        # would destroy the consolidated partition itself (the fold list
        # contains the target id).
        if fs.isdir(staged):
            for bid in fold:
                fs.delete(f"{corpus_dir}/batch_id={bid}")
            fs.rename(staged, f"{corpus_dir}/batch_id={manifest['target']}")
        staging.cleanup()
        return len(fold)

    # fold-vs-fold exclusion (fsops.maintenance_lock): a concurrent
    # fold's recover() re-applying the committed manifest mid-swap would
    # delete the freshly renamed-in consolidated partition — the fold
    # list CONTAINS the target id, so the deletes in finish() hit the
    # only copy. Concurrent INGEST stays fine (new batch ids, no lock).
    from youtube_analytics_lakehouse_databricks_spark.fsops import maintenance_lock

    with maintenance_lock(
        fs, corpus_dir, "compact_ann_stream",
        takeover_stale_after=lock_takeover_after,
    ) as lock_confirm:
        # recovery: a prior call crashed after committing its fold —
        # finish it (uncommitted leftovers are discarded by recover())
        committed = staging.recover()
        if committed is not None:
            lock_confirm()  # re-verify before the apply's deletes
            return finish(committed)

        batches = batch_partition_ids(fs, corpus_dir)
        fold = batches[: max(0, len(batches) - int(keep_last))]
        if len(fold) < 2:
            return 0
        target = fold[0]
        rows = spark.read.parquet(corpus_dir).filter(F.col("batch_id").isin(fold))
        (
            rows.drop("batch_id")
            .withColumn("batch_id", F.lit(int(target)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("batch_id", "cell")
            .parquet(staging.stage_dir)
        )
        manifest = {"fold": fold, "target": target}
        staging.commit(manifest)
        lock_confirm()  # re-verify before the apply's deletes
        return finish(manifest)


def stream_index_health(
    spark,
    path: str,
    *,
    keep_last: int = 2,
    max_foldable_batches: int = 8,
    lock_stale_after: float = 3600.0,
    moments_dir: str | None = None,
) -> DataFrame:
    """One-call serving-health matrix for a STREAMED index — the
    streamed sibling of ``operators.ivf_index.index_health`` (r16; that
    call refuses streamed layouts by name because its checks don't
    model the replay horizon — these do). Same row shape
    ``(check, ok, observed, remediation)``; rows:

    - ``pending_fold`` — a ``compact_ann_stream`` stage dir under the
      corpus (in-flight, committed-but-unapplied, or crash litter).
      Remediation: rerun ``compact_ann_stream`` — its recovery
      finishes or discards the fold.
    - ``fold_lock`` — the fold-vs-fold ``.compact_lock``, age-aware:
      fresh = a fold is legitimately running (``ok`` stays true);
      older than ``lock_stale_after`` = its process died holding it.
      Remediation: ``clear_stale_markers(spark, path, older_than=)``
      (operators.ivf_index), then rerun the fold.
    - ``batch_fragmentation`` — batch-partition count vs the replay
      horizon: partitions beyond the newest ``keep_last`` are FOLDABLE,
      and more than ``max_foldable_batches`` of them is the streamed
      small-file tax (a week of 1-minute micro-batches is ~10k
      ``batch_id=K`` dirs whose file count taxes every search's
      planning). Remediation: ``compact_ann_stream(keep_last=)``.
    - ``replay_horizon`` — where the fold boundary sits: the newest
      ``keep_last`` batch ids stay individually replaceable because
      Structured Streaming may REPLAY the checkpoint frontier after a
      crash (folding a replayable batch would double its rows on
      replay). Informational unless the corpus holds no batches at
      all — then the stream never ingested and every search serves
      empty.
    - ``moments_artifact`` (``moments_dir`` given) — the companion
      ``pca_stream`` artifact: loadable partials, a consistent
      ``covers`` consolidation marker (at most one, at the oldest id,
      never above the newest batch), pending-GC partition count, and
      its OWN fold lock's age. Remediation:
      ``compact_streamed_moments`` finishes the GC;
      ``clear_stale_markers`` clears a stale lock.

    Costs driver-side listings only — no Spark job touches corpus
    DATA; the moments check collects the KB-sized partials exactly as
    ``load_streamed_moments`` does. BATCH-layout indexes (top-level
    ``cell=K`` dirs) raise the named error pointing at
    ``index_health``."""
    from youtube_analytics_lakehouse_databricks_spark.fsops import COMPACT_LOCK_NAME

    fs = DriverFS(spark, path, "stream_index_health")
    corpus_dir = (
        f"{path}/corpus_pq" if fs.isdir(f"{path}/corpus_pq") else f"{path}/corpus"
    )
    if not fs.isdir(corpus_dir):
        raise ValueError(
            f"stream_index_health: no corpus under {path} — wrong index "
            "path, or a bootstrap that never ingested"
        )
    if fs.listnames(corpus_dir, prefix="cell="):
        raise ValueError(
            f"stream_index_health: {corpus_dir} is a BATCH-BUILT index "
            "layout (top-level cell=K partitions) — audit it with "
            "operators.ivf_index.index_health, which models appends "
            "instead of the replay horizon"
        )

    import time as _time

    def _age_of(p: str) -> float | None:
        # tolerate the healthy race: a lock listed a moment ago may be
        # released before its status read
        try:
            st = fs._fs.getFileStatus(fs._path(p))
        except Exception:
            return None
        return max(0.0, _time.time() * 1000.0 - st.getModificationTime()) / 1000.0

    def _lock_rows(check: str, d: str, what: str) -> tuple:
        age = (
            _age_of(f"{d}/{COMPACT_LOCK_NAME}")
            if fs.exists(f"{d}/{COMPACT_LOCK_NAME}")
            else None
        )
        stale = age is not None and age > float(lock_stale_after)
        return (
            check,
            not stale,
            f"no {what} fold lock" if age is None else (
                f"{what} fold lock held {age:.0f}s "
                f"(stale after {lock_stale_after:.0f}s)"
            ),
            "" if not stale else (
                f"a {what} fold's PROCESS died holding its lock — "
                "clear_stale_markers(spark, path, older_than=) removes "
                f"{d}/{COMPACT_LOCK_NAME} after re-checking the age; "
                "then rerun the fold"
            ),
        )

    rows: list[tuple[str, bool, str, str]] = []

    stage = StagedFold(fs, corpus_dir).stage_dir
    pending = fs.isdir(stage)
    rows.append((
        "pending_fold",
        not pending,
        f"fold stage dir {'PRESENT' if pending else 'absent'}: {stage}",
        "compact_ann_stream(spark, path) finishes or discards it"
        if pending else "",
    ))

    rows.append(_lock_rows("fold_lock", corpus_dir, "corpus"))

    batches = batch_partition_ids(fs, corpus_dir)
    foldable = max(0, len(batches) - int(keep_last))
    n_files = len(fs.list_parquet_files(corpus_dir))
    frag_ok = foldable <= int(max_foldable_batches)
    rows.append((
        "batch_fragmentation",
        frag_ok,
        f"{len(batches)} batch partition(s), {n_files} parquet files; "
        f"{foldable} foldable beyond the keep_last={keep_last} horizon "
        f"(budget {max_foldable_batches})",
        "" if frag_ok else (
            f"compact_ann_stream(spark, path, keep_last={keep_last}) — "
            "folds the old partitions into one, planning cost scales "
            "with batch count while the data doesn't"
        ),
    ))

    rows.append((
        "replay_horizon",
        bool(batches),
        "corpus holds NO batch partitions — the stream never ingested"
        if not batches else (
            f"newest batch_id {batches[-1]}; ids {batches[-int(keep_last):]} "
            "stay individually replaceable (checkpoint-frontier replay "
            "rewrites its own partition only)"
        ),
        "" if batches else (
            "start (or fix) the ann_index_stream writer — searches "
            "serve empty until a batch lands"
        ),
    ))

    if moments_dir is None:
        rows.append((
            "moments_artifact",
            True,
            "no moments_dir supplied — pca_stream artifact not audited",
            "",
        ))
    else:
        rows.append(_moments_row(spark, fs, moments_dir))
        rows.append(_lock_rows("moments_fold_lock", moments_dir, "moments"))

    return spark.createDataFrame(
        rows, "check string, ok boolean, observed string, remediation string"
    )


def _moments_row(spark, fs: DriverFS, moments_dir: str) -> tuple:
    """The ``moments_artifact`` matrix row: covers-marker consistency +
    loadability + pending-GC count for a ``pca_stream`` artifact."""
    from youtube_analytics_lakehouse_databricks_spark.operators.pca import _arrays_from_kinded

    if not fs.isdir(moments_dir):
        return (
            "moments_artifact",
            False,
            f"{moments_dir} does not exist",
            "wrong moments_dir, or the pca_moments_stream writer never "
            "ran",
        )
    mids = batch_partition_ids(fs, moments_dir)
    if not mids:
        return (
            "moments_artifact",
            False,
            f"{moments_dir} holds no batch partitions",
            "start (or fix) the pca_moments_stream writer",
        )
    try:
        raw = spark.read.parquet(moments_dir).collect()
        by_batch: dict[int, list] = {}
        for r in raw:
            by_batch.setdefault(int(r["batch_id"]), []).append(r)
        arrays = {bid: _arrays_from_kinded(by_batch[bid]) for bid in by_batch}
    except Exception as exc:
        return (
            "moments_artifact",
            False,
            f"moment partials unreadable: {str(exc).splitlines()[0][:160]}",
            "the artifact is corrupt — re-ingest, or restore from the "
            "landing data",
        )
    covers_at = sorted(bid for bid, by in arrays.items() if "covers" in by)
    problems = []
    if len(covers_at) > 1:
        problems.append(
            f"{len(covers_at)} covers markers at {covers_at} (at most "
            "one expected — concurrent folds corrupted the artifact)"
        )
    covered = int(arrays[covers_at[0]]["covers"][0]) if covers_at else -1
    if covers_at and covers_at[0] != mids[0]:
        problems.append(
            f"covers marker at batch_id {covers_at[0]}, not the oldest "
            f"{mids[0]} (the consolidated partial must lead the "
            "batch_id-ordered reload)"
        )
    if covered > mids[-1]:
        problems.append(
            f"covers horizon {covered} is beyond the newest batch "
            f"{mids[-1]} — the marker covers rows that do not exist"
        )
    gc_pending = sum(
        1
        for bid, by in arrays.items()
        if "covers" not in by and bid <= covered
    )
    if problems:
        return (
            "moments_artifact",
            False,
            "; ".join(problems),
            "restore the artifact from a replay (the load would "
            "double-count or drop partials) — do NOT fold it further",
        )
    return (
        "moments_artifact",
        True,
        f"{len(mids)} batch partition(s); covers horizon "
        f"{covered if covers_at else 'none'}; {gc_pending} folded "
        "partition(s) awaiting GC",
        "" if gc_pending == 0 else (
            "compact_streamed_moments(spark, moments_dir) finishes the "
            "pending garbage collection (loads already skip the folded "
            "partials — informational)"
        ),
    )
