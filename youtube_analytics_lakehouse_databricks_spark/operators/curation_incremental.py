"""Incremental (append-mode) corpus curation.

``curate()`` is linear and audited, but the 100 TB reality is a GROWING
corpus: re-running the full chain on corpus+batch makes every append cost
O(corpus). This module persists a per-representative index of the curated
corpus and, on append, runs the expensive stages (gates, hashing,
shingling, banding, verification) on the BATCH only, joining against the
stored index — the same splice pattern the engine's SCD2 incremental
refresh proves (models/silver.py scd2_incremental_refresh).

Semantics contract — equivalence with the batch operator:

    curate_incremental(batch2, state=curate_incremental(batch1)[1])
        == curate(batch1 ∪ batch2)

row for row (pinned by tests/test_curation_incremental.py), under ONE
assumption: ids are append-only monotone (every batch id > every stored
id) — the natural contract of an ingestion pipeline, and what makes
"min id per cluster" a stable keeper (an earlier doc can never be
displaced by a later near-twin).

Why equivalence is subtle, and how each case is handled:

- a new doc can be an exact duplicate of a STORED doc — even of one that
  was itself near-dropped (exact keeper = min id per hash, regardless of
  the keeper's own near-dup fate). The state therefore indexes every
  exact REPRESENTATIVE (kept or near-dropped), not just kept docs.
- a new doc can bridge two stored clusters: C verifies against D (in
  K's cluster) and E (in M's cluster) — the full run would merge both
  clusters under min(K, M), retroactively folding the other keeper and
  repointing every doc of the losing cluster. The incremental run
  reproduces this by adding ANCHOR EDGES (stored node -> its stored
  final label) for every stored node that appears in a new verified
  pair, running connected components over new pairs + anchors, then
  splicing: stored nodes whose label changed are rewritten, and stored
  near-dup pointers at a folded keeper are repointed to its new label.
- the LSH hot-bucket cap is sized on the MERGED bucket: stored members
  of every band key the batch touches are pulled (broadcast semi-join on
  the touched keys — the stored band index is scanned once, columnar,
  and never shuffled) and counted together with the new members, so a
  bucket that crosses the cap only after the append curtails exactly as
  the full run would, flagging stored and new members alike.
- candidate pairs are restricted to those with >= 1 new member
  (``doc_b > watermark``: new ids are the largest, and pairs are
  ordered) — stored-stored pairs in touched buckets were all generated
  and resolved by the run that built the state, with the same verdicts.

One DOCUMENTED divergence, deliberate: verdicts are MONOTONE. When a
touched bucket was under the cap at state time (its pairs were resolved
and some docs folded) and the append pushes it OVER the cap, a full
re-run of the union would never generate those pairs — RESURRECTING the
previously-folded docs (the batch operator's verdict depends on arrival
time). The incremental operator never retracts a drop already made: the
docs stay folded, and all members of the now-over-cap bucket (stored and
new) are flagged ``near_dup_audit_incomplete`` exactly as the full run
flags them. A production pipeline has already discarded the folded docs;
un-dropping them is not a meaningful operation. Formally: incremental
keeps ⊆ full-run keeps, audit flags identical, and every full-run drop
is an incremental drop (pinned by the hot-bucket test).

Append cost: every per-doc stage is O(batch). The stored index
contributes one columnar scan of the band index (semi-join probe), one
scan of the shingle sets (map-side probe by the broadcast candidate
list), and the audit splice (column-pruned scan + broadcast joins of the
small update sets) — no O(corpus) shuffle anywhere. Measured in
COVERAGE.md: append wall is driven by batch size, and beats full
re-curation by the corpus/batch ratio.

The optional gates (repetition rules, PII scrub before hashing,
binary/graded decontamination, embedding-space semantic decontamination)
thread through exactly like the batch
operator's: each is per-row and batch-local, so append-mode equivalence
holds gate-for-gate as long as the SAME parameters (and eval suite) are
used on every append — the redacted/canonical text the stored index was
built from must match what new batches hash.

The SEMANTIC stage (``semantic_vec_col``, r10) appends with the stage-3
machinery transposed to the embedding space: batch survivors assign to
the FROZEN persisted quantizer (one Arrow pass), stored members of
touched clusters are pulled by a broadcast cluster-list probe, the
per-cluster Arrow kernel emits only pairs with >= 1 new member, anchor
edges (member -> its stored semantic keeper) reconstruct stored groups,
and connected components + a retro splice fold a stored keeper whose
group a new doc bridges into an older one (min-id keepers make the
merged root stable under append-only ids — why the composed gate uses
keeper='min_id'). Equivalence with ``curate(union)`` holds when both
paths use the SAME quantizer (pass explicit ``semantic_centroids``, or
bootstrap the state from the corpus the full run would train on) — the
quantizer is caller-owned state exactly like the perplexity model.
Divergences mirror stage 3's monotone contract: (a) a cluster crossing
``semantic_max_cluster_size`` only after an append keeps its earlier
folds and flags every member, where the full run keeps everyone
flagged; (b) in the doubly-adversarial corner where a stored semantic
KEEPER is near-retro-folded by the same append, its orphaned group
members stay folded (pointers follow the keeper's relabel to a KEPT
doc) and are excluded from this run's comparisons — the full run
reforms the group WITHOUT the keeper, which can both keep a member the
incremental run already dropped AND fold a new doc the incremental run
keeps (the one corner where the divergence runs in both directions;
pinned verbatim by
tests/test_curation_semantic.py::test_orphaned_semantic_group_divergence_is_pinned).
Both paths keep every pointer ending at a kept doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators import dedup as dedup_ops
from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops
from youtube_analytics_lakehouse_databricks_spark.operators.graph import connected_components
from youtube_analytics_lakehouse_databricks_spark.operators.lineage import cut

# audit columns after (id, keep, drop_reason, duplicate_of) — the splice
# selects below re-emit them verbatim
_AUDIT_AUX = (
    "near_dup_audit_incomplete",
    "matched_eval_id",
    "contamination_frac",
    "substring_tokens_dropped",
    "semantic_centroid_sim",
    "semantic_audit_incomplete",
    "max_eval_cosine",
    "semantic_matched_eval_id",
)


class CurationState:
    """The persisted curation index: four core DataFrames plus optional
    stage indexes.

    - ``audit``: the full audit frame so far (one row per doc ever seen,
      same 8-column schema ``curate`` emits);
    - ``hashes``: (id, __h) for every exact representative;
    - ``sets``: (id, shset, n_shingles) — canonical shingle sets of reps;
    - ``banded``: (id, band_idx, band_key) — exploded LSH band keys of
      reps (docs shorter than the shingle width have no rows here, same
      as the batch operator's signature stage);
    - ``paras``: (para_hash) — distinct canonical hashes of every
      dedup-eligible paragraph ever seen, present ONLY when the state
      was built with ``paragraph_dedup=True`` (None otherwise; a state
      built without the stage cannot serve appends that enable it);
    - ``windows``: (h1, h2) — distinct 128-bit window hashes of every
      ``substring_min_tokens``-token sliding window ever seen, present
      ONLY when the state was built with ``substring_dedup=True`` (same
      contract as ``paras``);
    - ``centroids``: (cell, v) — the FROZEN SemDeDup coarse quantizer,
      present ONLY when the state was built with ``semantic_vec_col``
      (trained at bootstrap or caller-provided; appends assign against
      it — retraining on a grown corpus would reassign stored docs and
      re-verdict history, the same reason the perplexity model is
      caller-frozen);
    - ``semvecs``: (id, cluster, centroid_sim, v) — every doc the
      semantic stage ever examined (kept AND folded: a new doc can
      connect through a previously-folded member, and the cluster cap
      counts the true population), same presence contract;
    - ``nearmap``: (id, near_root) — every near-folded doc's NEAR-cluster
      root, present under the same contract. Needed because the audit's
      ``duplicate_of`` for a near row is the FINAL root (hopped past a
      semantically-folded near root to its semantic keeper), so the
      stage-3 anchor edges can no longer read near topology from the
      audit once the semantic stage runs — anchoring a near-folded doc
      at its hopped pointer would drag the semantic keeper into the NEAR
      component and retro-near-fold its own near root (the r10 append
      bug this frame fixes);
    - ``params``: the scalar parameter fingerprint of the run that built
      the state (JSON side file ``params.json``, atomic rename) —
      enforced on append, see ``curate_incremental``.

    ``save``/``load`` round-trip through parquet directories; at cluster
    scale, point them at the lakehouse path the pipeline owns.
    """

    FRAMES = ("audit", "hashes", "sets", "banded")

    def __init__(
        self,
        audit: DataFrame,
        hashes: DataFrame,
        sets: DataFrame,
        banded: DataFrame,
        paras: DataFrame | None = None,
        windows: DataFrame | None = None,
        centroids: DataFrame | None = None,
        semvecs: DataFrame | None = None,
        nearmap: DataFrame | None = None,
        params: dict | None = None,
    ) -> None:
        self.audit = audit
        self.hashes = hashes
        self.sets = sets
        self.banded = banded
        self.paras = paras
        self.windows = windows
        self.centroids = centroids
        self.semvecs = semvecs
        self.nearmap = nearmap
        # the scalar parameter fingerprint of the run that built this
        # state (curate_incremental enforces it on append: the index is
        # shaped by these values and verdict equivalence requires every
        # gate to re-run identically). DataFrame/model inputs (eval_df,
        # quality_model, perplexity_model) are caller-owned state and
        # deliberately NOT fingerprinted — the caller must pass the same
        # ones, as documented.
        self.params = params

    def save(self, path: str) -> None:
        """Write-to-temp then rename: an appended state's frames READ the
        previous state's files (stored ∪ new lineage), so overwriting in
        place would delete inputs mid-scan; the staged swap also means a
        crash during the WRITES leaves the previous state intact.
        Scheme-native since r14: local paths swap with os.rename (atomic
        per frame); any other reachable scheme swaps through the
        session's Hadoop FileSystem (delete + rename per frame — atomic
        on HDFS; on rename-by-copy stores like S3A the per-frame window
        is wider, and a lakehouse deployment should make these frames
        Delta tables so the swap is a transaction). Either way a crash
        INSIDE the swap sequence can leave mixed frame generations —
        re-run the save; unreachable schemes raise the named
        ``fsops.RemotePathError``."""
        import os
        import shutil

        from youtube_analytics_lakehouse_databricks_spark.fsops import (
            DriverFS,
            is_local_path,
            local_path_or_raise,
        )

        frames = list(self.FRAMES) + [
            name
            for name in ("paras", "windows", "centroids", "semvecs", "nearmap")
            if getattr(self, name) is not None
        ]
        import json

        # the frame MANIFEST makes a crashed swap DETECTABLE: it lists
        # the frames this save owns and is written LAST, so a crash
        # between a frame's delete and its staged rename leaves the
        # previous manifest still naming it — load cross-checks and
        # raises instead of silently building a state without an
        # optional frame (mandatory frames already fail loud at read).
        manifest = json.dumps(sorted(frames))

        if not is_local_path(path):
            # fail BEFORE the staged writes if the scheme is unreachable
            fs = DriverFS(self.audit.sparkSession, path, "CurationState.save")
            for name in frames:
                getattr(self, name).write.mode("overwrite").parquet(
                    f"{path}/.{name}.staged"
                )
            for name in frames:
                fs.delete(f"{path}/{name}")
                fs.rename(f"{path}/.{name}.staged", f"{path}/{name}")
            if self.params is not None:
                fs.write_text_committed(
                    f"{path}/params.json", json.dumps(self.params, sort_keys=True)
                )
            fs.write_text_committed(f"{path}/_frames.json", manifest)
            return

        for name in frames:
            getattr(self, name).write.mode("overwrite").parquet(
                f"{path}/.{name}.staged"
            )
        path = local_path_or_raise(path, "CurationState.save")
        for name in frames:
            shutil.rmtree(f"{path}/{name}", ignore_errors=True)
            os.rename(f"{path}/.{name}.staged", f"{path}/{name}")
        if self.params is not None:
            with open(f"{path}/.params.json.staged", "w") as f:
                json.dump(self.params, f, sort_keys=True)
            os.replace(f"{path}/.params.json.staged", f"{path}/params.json")
        with open(f"{path}/._frames.json.staged", "w") as f:
            f.write(manifest)
        os.replace(f"{path}/._frames.json.staged", f"{path}/_frames.json")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "CurationState":
        """Control-plane shape (r11): the per-frame ``spark.read.parquet``
        calls are only driver-side planning (footer schema reads), so they
        run CONCURRENTLY on a thread pool — one round-trip of latency for
        all frames instead of eight. The loaded state also remembers its
        ``path`` so the append can take two driver-side fast paths that
        skip whole Spark jobs: the watermark from parquet footer COLUMN
        STATS (``watermark_of``) and the frozen quantizer from a direct
        pyarrow read (``centroids_np``)."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        from youtube_analytics_lakehouse_databricks_spark.fsops import (
            DriverFS,
            is_local_path,
            local_path_or_raise,
        )

        # the optional-frame probes must really LIST (an os.path probe
        # on a remote scheme is always False and would silently drop
        # stored frames): os.path locally, the session's Hadoop FS on
        # any other reachable scheme (scheme-native since r14),
        # the named error when unreachable
        local = is_local_path(path)
        if local:
            path = local_path_or_raise(path, "CurationState.load")
            isdir = lambda n: os.path.isdir(f"{path}/{n}")
        else:
            fs = DriverFS(spark, path, "CurationState.load")
            isdir = lambda n: fs.isdir(f"{path}/{n}")

        # a saved manifest is authoritative: an optional frame it lists
        # but the directory lacks means a save crashed mid-swap — raise
        # (probing alone would silently build a state WITHOUT the frame
        # and produce wrong incremental output with no error). States
        # saved before the manifest existed fall back to the probes.
        import json

        if local:
            manifest_text = None
            if os.path.exists(f"{path}/_frames.json"):
                with open(f"{path}/_frames.json") as f:
                    manifest_text = f.read()
        else:
            manifest_text = (
                fs.read_text(f"{path}/_frames.json")
                if fs.exists(f"{path}/_frames.json")
                else None
            )
        optional = ("paras", "windows", "centroids", "semvecs", "nearmap")
        if manifest_text is not None:
            saved = set(json.loads(manifest_text))
            missing = [n for n in sorted(saved) if n in optional and not isdir(n)]
            if missing:
                raise ValueError(
                    f"CurationState.load: {path} is missing frames "
                    f"{missing} that its manifest says were saved — a "
                    "save crashed between a frame's delete and its "
                    "staged rename; re-run the save (or restore the "
                    "state) before appending"
                )
            names = list(cls.FRAMES) + [n for n in optional if n in saved]
        else:
            names = list(cls.FRAMES) + [n for n in optional if isdir(n)]
        with ThreadPoolExecutor(max_workers=len(names)) as pool:
            frames = dict(
                zip(
                    names,
                    pool.map(
                        lambda n: spark.read.parquet(f"{path}/{n}"), names
                    ),
                )
            )
        params = None
        if local:
            if os.path.exists(f"{path}/params.json"):
                import json

                with open(f"{path}/params.json") as f:
                    params = json.load(f)
        elif fs.exists(f"{path}/params.json"):
            import json

            params = json.loads(fs.read_text(f"{path}/params.json"))
        st = cls(
            *[frames[n] for n in cls.FRAMES],
            **{
                n: frames.get(n)
                for n in ("paras", "windows", "centroids", "semvecs", "nearmap")
            },
            params=params,
        )
        st._path = path
        st._path_local = local
        return st

    def watermark_of(self, id_col: str):
        """Max stored id — the append-only frontier. For a state loaded
        from disk with an INTEGRAL id column this is a pure DRIVER-SIDE
        read of the audit files' parquet footer column statistics (no
        Spark job); otherwise one max() aggregation. The fast path is
        integral-only by design: parquet writers may truncate binary
        (string) min-max to a bounding prefix — a rounded-UP max is a
        valid scan-pruning bound but EXCEEDS the true max, which would
        inflate the watermark and misclassify genuinely-new ids as
        already stored. Integral stats are exact."""
        path = getattr(self, "_path", None)
        from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

        integral = isinstance(
            self.audit.schema[id_col].dataType,
            (ByteType, ShortType, IntegerType, LongType),
        )
        # the glob fast path is local-only by nature; a remote-rooted
        # state takes the Spark aggregation (correct-by-fallback, no
        # misleading footer-health warning)
        if path is not None and integral and getattr(self, "_path_local", True):
            try:
                import glob as globmod

                import pyarrow.parquet as pq

                mx = None
                for fn in globmod.glob(f"{path}/audit/*.parquet"):
                    md = pq.ParquetFile(fn).metadata
                    idx = {
                        md.schema.column(i).name: i
                        for i in range(md.num_columns)
                    }[id_col]
                    for rg in range(md.num_row_groups):
                        stats = md.row_group(rg).column(idx).statistics
                        if stats is None or not stats.has_min_max:
                            raise ValueError("missing column stats")
                        mx = stats.max if mx is None else max(mx, stats.max)
                if mx is not None:
                    return mx
            except Exception as exc:
                # correct-by-fallback, but a chronically corrupt stats
                # read would silently re-pay the Spark job on EVERY
                # append — surface the fast path's health once
                if not getattr(self, "_watermark_fallback_warned", False):
                    self._watermark_fallback_warned = True
                    import warnings

                    warnings.warn(
                        f"watermark_of: footer-stats fast path failed "
                        f"({exc!r}); falling back to a Spark max() "
                        "aggregation — if this repeats, the stored "
                        "audit's parquet footers are unhealthy",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        from pyspark.sql import functions as F_

        return self.audit.agg(F_.max(id_col)).collect()[0][0]

    @property
    def centroids_np(self):
        """The frozen quantizer as a cell-ordered float64 numpy array —
        read driver-side via pyarrow when the state came from disk (no
        Spark job), collected from the DataFrame otherwise; None when
        the state has no semantic index."""
        if self.centroids is None:
            return None
        cached = getattr(self, "_centroids_np", None)
        if cached is not None:
            return cached
        import numpy as np

        path = getattr(self, "_path", None)
        rows = None
        if path is not None:
            try:
                if getattr(self, "_path_local", True):
                    import pyarrow.parquet as pq

                    tbl = pq.read_table(f"{path}/centroids").to_pydict()
                else:
                    # remote-rooted state: still no Spark JOB — the
                    # artifact streams through the Hadoop FS (r14)
                    from youtube_analytics_lakehouse_databricks_spark.fsops import driver_read_parquet

                    tbl = driver_read_parquet(
                        self.centroids.sparkSession,
                        f"{path}/centroids",
                        "CurationState.centroids_np",
                    ).to_pydict()
                order = sorted(range(len(tbl["cell"])), key=tbl["cell"].__getitem__)
                rows = [tbl["v"][i] for i in order]
            except Exception:
                rows = None
        if rows is None:
            rows = [r["v"] for r in self.centroids.orderBy("cell").collect()]
        self._centroids_np = np.asarray(rows, dtype=np.float64)
        return self._centroids_np


def _band_explode(sig: DataFrame, id_col: str, n_hashes: int, rows_per_band: int) -> DataFrame:
    """(id, band_idx, band_key) from a minhash signature frame — the same
    band derivation curate() uses, already exploded for key joins."""
    bands = n_hashes // rows_per_band
    banded = sig.select(
        id_col,
        *[
            F.sha2(
                F.concat_ws(
                    "|", *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
                ),
                256,
            ).alias(f"band{b}")
            for b in range(bands)
        ],
    )
    return banded.select(
        id_col,
        F.posexplode(F.array(*[f"band{b}" for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )


def curate_incremental(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    *,
    state: CurationState | None = None,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    min_distinct_ratio: float = 0.1,
    shingle_k: int = 3,
    n_hashes: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
    repetition_rules: bool = False,
    redact: bool = False,
    paragraph_dedup: bool = False,
    paragraph_split: str = r"\n{2,}",
    paragraph_min_chars: int = 30,
    substring_dedup: bool = False,
    substring_min_tokens: int = 50,
    quality_model=None,
    quality_min_prob: float = 0.5,
    perplexity_model=None,
    max_perplexity: float | None = None,
    eval_df: DataFrame | None = None,
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    decontam_k: int = 13,
    decontam_min_hits: int = 1,
    decontam_max_frac: float | None = None,
    max_bucket_size: int | None = dedup_ops.DEFAULT_MAX_BUCKET_SIZE,
    canonical_near_dup: bool = True,
    semantic_vec_col: str | None = None,
    semantic_threshold: float = 0.95,
    semantic_n_cells: int | None = None,
    semantic_max_cluster_size: int = 8192,
    semantic_centroids=None,
    semantic_eval_df: DataFrame | None = None,
    semantic_eval_id_col: str | None = None,
    semantic_eval_vec_col: str | None = None,
    semantic_decontam_threshold: float = 0.9,
    semantic_decontam_vec_col: str | None = None,
    durable: bool = False,
) -> tuple[DataFrame, CurationState]:
    """Curate ``batch`` against (and into) the stored corpus.

    Returns ``(audit, new_state)`` where ``audit`` covers EVERY doc ever
    seen (stored ∪ batch) with curate()'s exact schema and — under the
    append-only id contract — curate()'s exact verdicts on the union,
    including retroactive folds of stored keepers bridged by new docs.
    ``state=None`` bootstraps (equivalent to ``curate(batch)``).
    Parameters must match across appends to the same state; they shape
    the index (shingle width, band scheme) and are not re-derivable.
    """
    id_type = dict(batch.dtypes)[id_col]
    null_dup = F.lit(None).cast(id_type)

    # Parameter fingerprint: the index is shaped by these values (shingle
    # width, band scheme, rewrite widths, thresholds) and verdict
    # equivalence requires every gate to re-run identically, so a
    # mismatched append corrupts results SILENTLY — fail loudly instead.
    # DataFrame/model params (eval_df, quality_model, perplexity_model)
    # are caller-owned and not fingerprintable here; states saved before
    # the fingerprint existed (params is None) skip the check and pick
    # the fingerprint up on their next append.
    params_sig = {
        "min_tokens": int(min_tokens),
        "max_stopword_ratio": float(max_stopword_ratio),
        "min_distinct_ratio": float(min_distinct_ratio),
        "shingle_k": int(shingle_k),
        "n_hashes": int(n_hashes),
        "rows_per_band": int(rows_per_band),
        "jaccard_threshold": float(jaccard_threshold),
        "repetition_rules": bool(repetition_rules),
        "redact": bool(redact),
        "paragraph_dedup": bool(paragraph_dedup),
        "paragraph_split": str(paragraph_split),
        "paragraph_min_chars": int(paragraph_min_chars),
        "substring_dedup": bool(substring_dedup),
        "substring_min_tokens": int(substring_min_tokens),
        "quality_min_prob": float(quality_min_prob),
        "max_perplexity": None if max_perplexity is None else float(max_perplexity),
        "decontam_k": int(decontam_k),
        "decontam_min_hits": int(decontam_min_hits),
        "decontam_max_frac": None
        if decontam_max_frac is None
        else float(decontam_max_frac),
        "max_bucket_size": None if max_bucket_size is None else int(max_bucket_size),
        "canonical_near_dup": bool(canonical_near_dup),
        # semantic stage shape: the quantizer itself is PERSISTED frozen
        # state (state.centroids), so n_cells/kmeans_iters/centroids are
        # bootstrap-only inputs and deliberately not fingerprinted here
        "semantic_vec_col": semantic_vec_col,
        "semantic_threshold": float(semantic_threshold),
        "semantic_max_cluster_size": int(semantic_max_cluster_size),
        # semantic decontam gate shape (the eval frame itself is
        # caller-owned state like eval_df, deliberately unfingerprinted)
        "semantic_decontam_threshold": float(semantic_decontam_threshold),
        "semantic_decontam_vec_col": semantic_decontam_vec_col,
    }
    if state is not None and state.params is not None:
        stored_params = {
            # pre-r10 fingerprints predate the semantic stage: default
            # the new keys so an old state appends under unchanged params
            # (it provably ran without the stage — no semvecs frame);
            # same for the r11 semantic-decontam keys
            "semantic_vec_col": None,
            "semantic_threshold": 0.95,
            "semantic_max_cluster_size": 8192,
            "semantic_decontam_threshold": 0.9,
            "semantic_decontam_vec_col": None,
            **state.params,
        }
        if stored_params != params_sig:
            diffs = {
                k: (stored_params.get(k), params_sig.get(k))
                for k in sorted(set(stored_params) | set(params_sig))
                if stored_params.get(k) != params_sig.get(k)
            }
            raise ValueError(
                "curation parameters differ from the ones the stored state was "
                f"built with (stored, requested): {diffs} — parameters must "
                "match across appends to the same state"
            )

    # Watermark: the append-only frontier. For a disk-loaded state this
    # is a pure driver-side parquet-footer-stats read — no Spark job at
    # all (watermark_of); in-memory states pay one max() aggregation.
    if state is not None:
        watermark = state.watermark_of(id_col)
    else:
        watermark = None

    # -- stage 0: optional PII scrub BEFORE any hashing (batch-only;
    # every append scrubs its own batch, so the stored index was built
    # from scrubbed text under the same params — dedup compares like
    # with like across batches)
    if redact:
        batch_scrubbed = cut(
            text_ops.redact_pii(batch, id_col, text_col).select(
                id_col, F.col("redacted_text").alias(text_col)
            ),
            durable=durable,
        )
    else:
        batch_scrubbed = batch

    # -- stage 0b: optional paragraph dedup vs the full stored history --
    # The batch's paragraphs dedup against (a) every paragraph hash the
    # stored corpus ever saw (state.paras — probed via broadcast key
    # list, never shuffled) and (b) each other, first-occurrence-wins —
    # exactly what the full run over the union computes, because the
    # first occurrence is MONOTONE under append-only ids: a later batch
    # can never claim a paragraph away from a stored doc, so stored
    # documents' rewritten text never changes retroactively.
    if paragraph_dedup:
        if state is not None and state.paras is None:
            raise ValueError(
                "paragraph_dedup=True but the stored state has no paragraph "
                "index — the state must be built with paragraph_dedup=True "
                "from its first batch"
            )
        batch_keys = cut(
            dedup_ops.paragraph_hash_keys(
                batch_scrubbed,
                id_col,
                text_col,
                split_pattern=paragraph_split,
                min_chars=paragraph_min_chars,
            ),
            durable=durable,
        )
        batch_scrubbed = cut(
            dedup_ops.paragraph_dedup(
                batch_scrubbed,
                id_col,
                text_col,
                split_pattern=paragraph_split,
                min_chars=paragraph_min_chars,
                seen=state.paras if state is not None else None,
            ).select(id_col, F.col("text_deduped").alias(text_col)),
            durable=durable,
        )
        if state is not None and state.paras is not None:
            stored_hits = state.paras.join(
                F.broadcast(batch_keys), "para_hash", "left_semi"
            )
            new_keys = batch_keys.join(
                F.broadcast(stored_hits), "para_hash", "left_anti"
            )
            paras_all = state.paras.unionByName(new_keys)
        else:
            paras_all = batch_keys
    else:
        if state is not None and state.paras is not None:
            raise ValueError(
                "the stored state carries a paragraph index but this append "
                "sets paragraph_dedup=False — parameters must match across "
                "appends"
            )
        paras_all = None

    # -- stage 0c: optional exact-substring dedup vs the stored history --
    # Same monotonicity argument as the paragraph stage: a window's first
    # occurrence can only live in the stored corpus (smaller ids) or this
    # batch, so batch windows dedup against the stored window-hash index
    # (probed via broadcast key list inside substring_dedup) plus each
    # other, and stored documents' rewritten text never changes. The
    # per-doc removed-token count becomes the batch's
    # substring_tokens_dropped audit column below.
    if substring_dedup:
        if state is not None and state.windows is None:
            raise ValueError(
                "substring_dedup=True but the stored state has no window "
                "index — the state must be built with substring_dedup=True "
                "from its first batch"
            )
        win_keys = cut(
            dedup_ops.substring_hash_keys(
                batch_scrubbed, id_col, text_col, min_tokens=substring_min_tokens
            ),
            durable=durable,
        )
        sub = cut(
            dedup_ops.substring_dedup(
                batch_scrubbed,
                id_col,
                text_col,
                min_tokens=substring_min_tokens,
                seen=state.windows if state is not None else None,
            ),
            durable=durable,
        )
        batch_scrubbed = sub.select(id_col, F.col("text_deduped").alias(text_col))
        sub_audit = sub.select(
            id_col, F.col("n_dropped").alias("substring_tokens_dropped")
        )
        if state is not None and state.windows is not None:
            stored_win_hits = state.windows.join(
                F.broadcast(win_keys), ["h1", "h2"], "left_semi"
            )
            new_win_keys = win_keys.join(
                F.broadcast(stored_win_hits), ["h1", "h2"], "left_anti"
            )
            windows_all = state.windows.unionByName(new_win_keys)
        else:
            windows_all = win_keys
    else:
        if state is not None and state.windows is not None:
            raise ValueError(
                "the stored state carries a window index but this append "
                "sets substring_dedup=False — parameters must match across "
                "appends"
            )
        windows_all = None
        sub_audit = None

    # -- stage 1: quality gate (batch-only, per-row) --------------------
    q = text_ops.quality_scores(batch_scrubbed, id_col, text_col)
    low_quality = cut(
        q.filter(
            (F.col("n_tokens") < min_tokens)
            | (F.col("stopword_ratio") > max_stopword_ratio)
            | (F.col("distinct_ratio") < min_distinct_ratio)
        ).select(id_col),
        durable=durable,
    )
    good = batch_scrubbed.join(low_quality, id_col, "left_anti")

    # -- stage 1b: optional repetition/shape gate (batch-only, per-row)
    if repetition_rules:
        rep_failed = cut(
            text_ops.repetition_flags(good, id_col, text_col)
            .filter(~F.col("passes_repetition_rules"))
            .select(id_col),
            durable=durable,
        )
        good = good.join(rep_failed, id_col, "left_anti")
    else:
        rep_failed = None

    # -- stage 1b2: optional learned quality gate (batch-only, per-row;
    # the SAME fitted model must be passed on every append — it is
    # serialized state the caller owns, like the eval suite)
    if quality_model is not None:
        from youtube_analytics_lakehouse_databricks_spark.operators.classifier import score_quality

        clf_failed = cut(
            score_quality(good, id_col, text_col, quality_model)
            .filter(F.col("quality_prob") < quality_min_prob)
            .select(id_col),
            durable=durable,
        )
        good = good.join(clf_failed, id_col, "left_anti")
    else:
        clf_failed = None

    # -- stage 1b3: optional perplexity gate (batch-only, per-row; like
    # the classifier, the SAME reference-corpus LM must be passed on
    # every append — it is caller-owned serialized state, and a model
    # retrained on a grown corpus would re-score stored docs differently
    # than their audit recorded)
    if perplexity_model is not None:
        if max_perplexity is None:
            raise ValueError("perplexity_model given without max_perplexity")
        from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import score_perplexity

        ppl_failed = cut(
            score_perplexity(good, id_col, text_col, perplexity_model)
            .filter(
                F.col("scored")
                & (F.col("perplexity") > F.lit(float(max_perplexity)))
            )
            .select(id_col),
            durable=durable,
        )
        good = good.join(ppl_failed, id_col, "left_anti")
    else:
        ppl_failed = None

    # -- stage 1c: optional benchmark decontamination (batch-only; the
    # eval suite is fixed across appends, so the per-row verdicts are
    # identical to the batch operator's)
    if eval_df is not None:
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import decontaminate

        dec = cut(
            decontaminate(
                good,
                eval_df,
                id_col,
                text_col,
                eval_id_col=eval_id_col,
                eval_text_col=eval_text_col,
                k=decontam_k,
                min_hits=decontam_min_hits,
            ).select(
                id_col, "contamination_frac", "matched_eval_id", "is_contaminated"
            ),
            durable=durable,
        )
        drop_pred = (
            F.col("contamination_frac") > decontam_max_frac
            if decontam_max_frac is not None
            else F.col("is_contaminated")
        )
        contaminated = dec.filter(drop_pred).select(id_col)
        eval_overlap = dec.filter(F.col("matched_eval_id").isNotNull()).select(
            id_col, "matched_eval_id", "contamination_frac"
        )
        good = good.join(contaminated, id_col, "left_anti")
    else:
        contaminated = None
        eval_overlap = None

    # -- stage 1c2: optional SEMANTIC decontamination (batch-only; the
    # eval embedding suite is fixed across appends, so the per-row
    # verdicts are identical to the batch operator's — mirrors 1c).
    # Same shuffle shape as the batch operator: score EVERY batch row
    # (zero exchange), then select the gate population by semi-joining
    # the id-score verdicts, never the vector column.
    if semantic_eval_df is not None:
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        sdec_vec = semantic_decontam_vec_col or semantic_vec_col
        if sdec_vec is None:
            raise ValueError(
                "semantic_eval_df given without a doc-side vector column — "
                "set semantic_decontam_vec_col= (or semantic_vec_col=)"
            )
        sdec_all = cut(
            semantic_decontaminate(
                batch.select(id_col, sdec_vec),
                semantic_eval_df,
                id_col,
                sdec_vec,
                eval_id_col=semantic_eval_id_col,
                eval_vec_col=semantic_eval_vec_col,
                threshold=semantic_decontam_threshold,
            ),
            durable=durable,
        )
        sdec = sdec_all.join(good.select(id_col), id_col, "left_semi")
        sem_contaminated = sdec.filter(
            F.col("is_semantically_contaminated")
        ).select(id_col)
        sdec_audit = sdec.select(
            id_col,
            "max_eval_cosine",
            F.col("matched_eval_id").alias("semantic_matched_eval_id"),
        )
        good = good.join(sem_contaminated, id_col, "left_anti")
    else:
        sem_contaminated = None
        sdec_audit = None
    good = cut(good, durable=durable)

    # -- stage 2: exact dedup (batch hashes vs batch + stored) ----------
    bh = cut(
        good.select(id_col, F.sha2(text_ops.norm_expr(text_col), 256).alias("__h")),
        durable=durable,
    )
    bk = bh.groupBy("__h").agg(F.min(id_col).alias("__batch_keeper"))
    if state is not None:
        # stored reps have DISTINCT hashes (exact dedup collapsed
        # collisions when they were curated), and every stored id is
        # below every batch id, so a stored hit is always the keeper.
        # Probe shape matters: a plain left join against the full stored
        # frame flips to a shuffle join once the index outgrows the
        # broadcast threshold (measured: 33 MB shuffled per append at a
        # 500k-doc corpus). Instead semi-join the stored index down to
        # the batch-hash hit set (broadcast key list -> one columnar
        # scan, no shuffle; hits <= batch size because stored hashes are
        # distinct), then broadcast the hits into the batch-preserving
        # left join — the same probe shape the band index uses below.
        stored_hits = state.hashes.join(
            F.broadcast(bh.select("__h").distinct()), "__h", "left_semi"
        ).select(F.col(id_col).alias("__stored_id"), "__h")
        matched = bh.join(bk, "__h").join(F.broadcast(stored_hits), "__h", "left")
    else:
        matched = bh.join(bk, "__h").withColumn("__stored_id", null_dup)
    # consumed three times (exact drops, rep selection, state hashes):
    # one cut materializes the gate + hash pass
    matched = cut(matched, durable=durable)
    exact_map = matched.select(
        id_col,
        F.coalesce("__stored_id", "__batch_keeper").alias("__keeper"),
    )
    exact_dropped = exact_map.filter(F.col(id_col) != F.col("__keeper"))
    reps = good.join(
        exact_map.filter(F.col(id_col) == F.col("__keeper")).select(id_col), id_col
    )

    # -- stage 3: near-dup over new reps vs touched stored buckets ------
    if canonical_near_dup:
        reps = reps.select(id_col, text_ops.norm_expr(text_col).alias(text_col))
    reps = cut(reps, durable=durable)
    sets_new = cut(
        dedup_ops.shingle_sets(reps, id_col, text_col, k=shingle_k), durable=durable
    )
    sig = dedup_ops.minhash_signatures(
        dedup_ops.shingles(reps, id_col, text_col, k=shingle_k), id_col, n_hashes
    )
    new_ex = _band_explode(sig, id_col, n_hashes, rows_per_band)

    if state is not None:
        # stored members of every band key the batch touches: broadcast
        # the (small) touched-key list and semi-join — one columnar scan
        # of the stored band index, no corpus-side shuffle
        touched = F.broadcast(new_ex.select("band_idx", "band_key").distinct())
        stored_touched = state.banded.join(
            touched, ["band_idx", "band_key"], "left_semi"
        )
        union_ex = stored_touched.unionByName(new_ex)
    else:
        union_ex = new_ex

    buckets = cut(
        union_ex.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1),
        durable=durable,
    )
    cand = dedup_ops.candidates_from_buckets(buckets, max_bucket_size=max_bucket_size)
    if watermark is not None:
        # pairs are ordered (doc_a < doc_b) and batch ids are the
        # largest, so doc_b > watermark keeps exactly the pairs with at
        # least one new member; stored-stored pairs in touched buckets
        # were already generated and resolved by the state-building run
        cand = cand.filter(F.col("doc_b") > F.lit(watermark))

    sets_all = (
        state.sets.unionByName(sets_new) if state is not None else sets_new
    )
    if state is not None:
        # candidates are batch-proportional by construction (every pair
        # has a new member), so pin the broadcast-probe shape instead of
        # letting AQE guess: restrict the stored sets scan to candidate
        # ids (map-side semi-join probe) and broadcast the pair list into
        # the verify joins. Without this, the verify join can shuffle the
        # ENTIRE stored shingle-set table — the one O(corpus) exchange
        # the append path must not have (measured 28.9 MB shuffle at the
        # 10x corpus before; batch-bounded after).
        cand = cut(cand, durable=durable)
        cand_ids = (
            cand.select(F.col("doc_a").alias(id_col))
            .unionByName(cand.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
        verify_sets = sets_all.join(F.broadcast(cand_ids), id_col, "left_semi")
        cand = F.broadcast(cand)
    else:
        verify_sets = sets_all
    pairs = cut(
        dedup_ops.jaccard_verify_sets(
            verify_sets,
            id_col,
            cand,
            jaccard_threshold,
            durable=durable,
            # the state path above already cuts cand, restricts the
            # stored sets scan to candidate ids, and pins the broadcast
            # probe — skip the operator's own reduction so the pinned
            # shape is not re-derived a second time
            reduce_sets=state is None,
        ).select("doc_a", "doc_b"),
        durable=durable,
    )

    # anchor edges: stored nodes in new pairs pull their stored NEAR
    # label into the component, so a bridge doc merges whole stored
    # clusters (not just the members it directly verified against)
    if state is not None:
        stored_nodes = (
            pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("__n"))
            .filter(F.col("__n") <= F.lit(watermark))
            .distinct()
        )
        if state.nearmap is not None:
            # semantic-mode states: the audit's near pointers are FINAL
            # roots (hopped past semantically-folded near roots to their
            # semantic keepers), so anchoring from the audit would drag a
            # semantic keeper into the NEAR component and retro-near-fold
            # its own near root (found by the r10 append measurement).
            # The dedicated near-root index keeps near topology exact;
            # docs absent from it (kept or semantically folded) are their
            # own near label.
            nm = state.nearmap.select(
                F.col(id_col).alias("__n"), F.col("near_root").alias("__label0")
            )
            anchors = (
                F.broadcast(stored_nodes)
                .join(nm, "__n", "left")
                .select(
                    F.col("__n").alias("doc_a"),
                    F.coalesce("__label0", "__n").alias("doc_b"),
                )
            )
        else:
            stored_label = state.audit.select(
                F.col(id_col).alias("__n"),
                F.when(
                    F.col("drop_reason") == "near_duplicate", F.col("duplicate_of")
                )
                .otherwise(F.col(id_col))
                .alias("__label"),
            )
            anchors = F.broadcast(stored_nodes).join(stored_label, "__n").select(
                F.col("__n").alias("doc_a"), F.col("__label").alias("doc_b")
            )
        edges = pairs.unionByName(anchors)
    else:
        edges = pairs

    comp = connected_components(edges, "doc_a", "doc_b", durable=durable)
    changed = F.col("node") != F.col("component")
    if watermark is not None:
        near_dropped_new = comp.filter(changed & (F.col("node") > F.lit(watermark)))
        # stored nodes whose final label changed: retro-folds (previously
        # kept keepers losing a merge) and pointer updates for previously
        # near-dropped docs that sat in a merged cluster
        retro = cut(
            comp.filter(changed & (F.col("node") <= F.lit(watermark))),
            durable=durable,
        )
    else:
        near_dropped_new = comp.filter(changed)
        retro = None

    # 3c. maintain the near-root index (semantic-mode states only: the
    # audit carries near roots verbatim otherwise). New folds (batch
    # docs AND stored retro relabels) enter at their current component;
    # surviving entries whose root was retro-relabeled follow it.
    if semantic_vec_col is not None:
        near_folds = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col), F.col("component").alias("near_root")
        )
        if state is not None and state.nearmap is not None:
            keptm = state.nearmap.join(
                F.broadcast(near_folds.select(id_col)), id_col, "left_anti"
            )
            if retro is not None:
                rm_nm = F.broadcast(
                    retro.select(
                        F.col("node").alias("__o"), F.col("component").alias("__r")
                    )
                )
                keptm = keptm.join(
                    rm_nm, keptm["near_root"] == rm_nm["__o"], "left"
                ).select(id_col, F.coalesce("__r", "near_root").alias("near_root"))
            nearmap_all = keptm.unionByName(near_folds)
        else:
            nearmap_all = near_folds
    else:
        nearmap_all = None

    # 3b. hot-bucket audit over the merged buckets
    if max_bucket_size is not None:
        curtailed = dedup_ops.dropped_bucket_members(
            buckets, id_col, max_bucket_size=max_bucket_size
        ).withColumn("__curtailed", F.lit(True))
    else:
        curtailed = None

    # -- stored-audit pointer splice -----------------------------------
    # Runs BEFORE the batch assembly: the batch's exact-dup final-root
    # hop below must see stored near-dup pointers AFTER this run's retro
    # relabels, or a dup folding into a just-merged stored keeper would
    # inherit the keeper's stale pre-merge root.
    if state is not None:
        s = state.audit
        if "substring_tokens_dropped" not in s.columns:
            # state saved before the audit grew the substring column
            # (r9): stored docs were never substring-deduped, so the
            # provenance is honestly NULL — upgrade in place instead of
            # failing the select below
            s = s.withColumn("substring_tokens_dropped", F.lit(None).cast("long"))
        if "semantic_centroid_sim" not in s.columns:
            # same in-place upgrade for states saved before the audit
            # grew the semantic columns (r10)
            s = s.withColumn(
                "semantic_centroid_sim", F.lit(None).cast("double")
            ).withColumn("semantic_audit_incomplete", F.lit(None).cast("boolean"))
        if "max_eval_cosine" not in s.columns:
            # ... and the semantic-decontamination columns (r11)
            s = s.withColumn(
                "max_eval_cosine", F.lit(None).cast("double")
            ).withColumn("semantic_matched_eval_id", F.lit(None).cast("long"))
        if retro is not None:
            upd = F.broadcast(
                retro.select(
                    F.col("node").alias(id_col), F.col("component").alias("__new_dup")
                )
            )
            s = (
                s.join(upd, id_col, "left")
                .select(
                    id_col,
                    (F.col("keep") & F.col("__new_dup").isNull()).alias("keep"),
                    F.when(F.col("__new_dup").isNotNull(), F.lit("near_duplicate"))
                    .otherwise(F.col("drop_reason"))
                    .alias("drop_reason"),
                    F.coalesce("__new_dup", "duplicate_of").alias("duplicate_of"),
                    *_AUDIT_AUX,
                )
            )
            # repoint any row whose pointer names a retro-folded node to
            # that node's new label: near-dup survivors of a merged
            # cluster AND exact dups of a retro-folded keeper (both
            # pointer kinds must end at the FINAL cluster root — the
            # leakage_safe_split contract). SEMANTIC pointers are
            # deferred: stage 4 below must read the ORIGINAL keeper id
            # to detect groups orphaned by a keeper's near-retro-fold,
            # and applies this same relabel afterwards.
            rmap = F.broadcast(
                retro.select(
                    F.col("node").alias("__old_label"),
                    F.col("component").alias("__relabel"),
                )
            )
            s = (
                s.join(rmap, s["duplicate_of"] == rmap["__old_label"], "left")
                .select(
                    id_col,
                    "keep",
                    "drop_reason",
                    F.when(
                        F.col("drop_reason") == "semantic_duplicate",
                        F.col("duplicate_of"),
                    )
                    .otherwise(F.coalesce("__relabel", "duplicate_of"))
                    .alias("duplicate_of"),
                    *_AUDIT_AUX,
                )
            )
    else:
        s = None

    # -- stage 4: optional semantic dedup vs the stored cluster index ----
    # SemDeDup (similarity.semantic_dedup's semantics, keeper='min_id')
    # over THIS run's near-dup survivors, against the FROZEN persisted
    # quantizer and the stored per-cluster member index — the stage-3
    # machinery transposed: coarse index probe instead of band keys,
    # anchor edges reconstruct stored duplicate groups (every member
    # points at its min-id keeper, so the star graph preserves
    # components), connected components + retro splice fold a stored
    # keeper whose group a new doc bridges into an older one. Verdicts
    # are MONOTONE exactly like stage 3: cap-crossing clusters flag
    # everyone and never resurrect; a group orphaned by its keeper's
    # near-retro-fold (doubly-adversarial same-append corner) keeps its
    # folded members folded and excludes them from this run's
    # comparisons — the full run would reform the group without the
    # keeper, so incremental keeps stay a subset.
    if semantic_vec_col is not None:
        import numpy as np

        from youtube_analytics_lakehouse_databricks_spark.operators.similarity import (
            assign_cells,
            train_semantic_centroids,
        )

        if state is not None and (
            state.centroids is None or state.semvecs is None or state.nearmap is None
        ):
            raise ValueError(
                "semantic_vec_col given but the stored state has no semantic "
                "index — the state must be built with semantic_vec_col from "
                "its first batch"
            )
        sem_cap = int(semantic_max_cluster_size)
        sem_ids = reps.select(id_col).join(
            near_dropped_new.select(F.col("node").alias(id_col)),
            id_col,
            "left_anti",
        )
        # NULL-embedding docs skip the stage (kept, NULL audit columns) —
        # mirrors the batch operator so append/full verdicts stay equal
        sem_input = (
            batch.select(id_col, semantic_vec_col)
            .filter(F.col(semantic_vec_col).isNotNull())
            .join(sem_ids, id_col, "left_semi")
        )
        if state is not None:
            # bounded read: the quantizer is n_cells rows — a driver-side
            # pyarrow read for disk-loaded states (no Spark job), a
            # collect otherwise (centroids_np caches either way)
            cents = state.centroids_np
            if semantic_centroids is not None and not np.allclose(
                np.asarray(semantic_centroids, dtype=np.float64), cents
            ):
                raise ValueError(
                    "semantic_centroids differ from the quantizer persisted "
                    "in the stored state — the quantizer is frozen at "
                    "bootstrap (see CurationState.centroids)"
                )
        elif semantic_centroids is not None:
            cents = np.asarray(semantic_centroids, dtype=np.float64)
        else:
            cents = train_semantic_centroids(
                sem_input,
                id_col,
                semantic_vec_col,
                n_cells=semantic_n_cells,
                max_cluster_size=sem_cap,
            )
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        # consumed by: sizes, the edge kernel, audit columns, semvecs
        assigned_new = cut(
            assign_cells(sem_input, id_col, semantic_vec_col, cents),
            durable=durable,
        )

        if state is not None:
            # stored members of touched clusters — the coarse-index
            # probe: broadcast the (<= n_cells) touched-cluster list,
            # one columnar semvecs scan, no corpus shuffle. Drop members
            # no longer in the semantic population: retro-NEAR-folds
            # this run (the full run folds them at stage 3, before
            # semantic) and their ORPHANED group members (see above).
            touched = F.broadcast(assigned_new.select("cluster").distinct())
            stored_touched = state.semvecs.join(touched, "cluster", "left_semi")
            tids = F.broadcast(stored_touched.select(id_col).distinct())
            s_probe = s.join(tids, id_col, "left_semi")
            if retro is not None:
                retro_nodes = F.broadcast(
                    retro.select(F.col("node").alias("__rn")).distinct()
                )
                s_probe = (
                    s_probe.join(
                        retro_nodes,
                        s_probe["duplicate_of"] == retro_nodes["__rn"],
                        "left",
                    )
                    .withColumn("__orphaned", F.col("__rn").isNotNull())
                    .drop("__rn")
                )
            else:
                s_probe = s_probe.withColumn("__orphaned", F.lit(False))
            sem_alive = s_probe.filter(
                F.col("keep")
                | (
                    (F.col("drop_reason") == "semantic_duplicate")
                    & ~F.col("__orphaned")
                )
            ).select(id_col)
            stored_members = stored_touched.join(
                F.broadcast(sem_alive), id_col, "left_semi"
            )
            sem_both = stored_members.select(id_col, "cluster", "v").unionByName(
                assigned_new.select(id_col, "cluster", "v")
            )
        else:
            sem_both = assigned_new.select(id_col, "cluster", "v")
        sem_both = cut(sem_both, durable=durable)

        # cap on the MERGED cluster (the stage-3 merged-bucket contract)
        sem_sizes = sem_both.groupBy("cluster").agg(F.count(F.lit(1)).alias("__n"))
        sem_over = sem_sizes.filter(F.col("__n") > sem_cap).select("cluster")
        sem_work = sem_both.join(
            F.broadcast(sem_sizes.filter(F.col("__n") <= sem_cap).select("cluster")),
            "cluster",
            "left_semi",
        )
        sem_thr = float(semantic_threshold)
        sem_wm = -1 if watermark is None else int(watermark)

        def _sem_edges(pdf):
            import pandas as pd

            ids = pdf[id_col].to_numpy(dtype=np.int64)
            if len(ids) < 2:
                return pd.DataFrame({"doc_a": [], "doc_b": []})
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"].iloc[order]]
            )
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cos = np.round(mat @ mat.T, 6)
            ai, bi = np.where(np.triu(cos >= sem_thr, k=1))
            # stored-stored pairs were resolved by the state-building run
            new_mask = (ids[ai] > sem_wm) | (ids[bi] > sem_wm)
            return pd.DataFrame(
                {"doc_a": ids[ai][new_mask], "doc_b": ids[bi][new_mask]}
            )

        sem_pairs = sem_work.groupBy("cluster").applyInPandas(
            _sem_edges, "doc_a long, doc_b long"
        )
        if state is not None:
            # anchor edges: stored node -> its stored semantic label, so
            # a bridging new doc merges whole stored GROUPS. Labels read
            # the PRE-relabel pointers (the rmap deferral above), which
            # for alive members always name kept keepers.
            sem_nodes = (
                sem_pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("__n"))
                .filter(F.col("__n") <= F.lit(sem_wm))
                .distinct()
            )
            sem_label = s.select(
                F.col(id_col).alias("__n"),
                F.when(
                    F.col("drop_reason") == "semantic_duplicate",
                    F.col("duplicate_of"),
                )
                .otherwise(F.col(id_col))
                .alias("__label"),
            )
            sem_anchors = (
                F.broadcast(sem_nodes)
                .join(sem_label, "__n")
                .select(F.col("__n").alias("doc_a"), F.col("__label").alias("doc_b"))
            )
            sem_edges_all = sem_pairs.unionByName(sem_anchors)
        else:
            sem_edges_all = sem_pairs
        sem_comp = connected_components(
            sem_edges_all, "doc_a", "doc_b", durable=durable
        )
        sem_changed = F.col("node") != F.col("component")
        if watermark is not None:
            sem_dropped_new = sem_comp.filter(
                sem_changed & (F.col("node") > F.lit(sem_wm))
            )
            sem_retro = cut(
                sem_comp.filter(sem_changed & (F.col("node") <= F.lit(sem_wm))),
                durable=durable,
            )
        else:
            sem_dropped_new = sem_comp.filter(sem_changed)
            sem_retro = None
        # every member (stored and new) of an over-cap merged cluster
        sem_flagged = sem_both.join(
            F.broadcast(sem_over), "cluster", "left_semi"
        ).select(id_col)

        # -- semantic stored-audit splice (mirrors the stage-3 splice) --
        if s is not None:
            if sem_retro is not None:
                upd2 = F.broadcast(
                    sem_retro.select(
                        F.col("node").alias(id_col),
                        F.col("component").alias("__sem_new"),
                    )
                )
                s = s.join(upd2, id_col, "left").select(
                    id_col,
                    (F.col("keep") & F.col("__sem_new").isNull()).alias("keep"),
                    F.when(
                        F.col("__sem_new").isNotNull(), F.lit("semantic_duplicate")
                    )
                    .otherwise(F.col("drop_reason"))
                    .alias("drop_reason"),
                    F.coalesce("__sem_new", "duplicate_of").alias("duplicate_of"),
                    *_AUDIT_AUX,
                )
            if retro is not None:
                # the deferred stage-3 relabel for semantic pointers:
                # orphaned rows (keeper near-retro-folded) follow the
                # keeper to its near component root
                rmap2 = F.broadcast(
                    retro.select(
                        F.col("node").alias("__old2"),
                        F.col("component").alias("__rel2"),
                    )
                )
                s = s.join(
                    rmap2, s["duplicate_of"] == rmap2["__old2"], "left"
                ).select(
                    id_col,
                    "keep",
                    "drop_reason",
                    F.when(
                        (F.col("drop_reason") == "semantic_duplicate")
                        & F.col("__rel2").isNotNull(),
                        F.col("__rel2"),
                    )
                    .otherwise(F.col("duplicate_of"))
                    .alias("duplicate_of"),
                    *_AUDIT_AUX,
                )
                # a near relabel introduced THIS run can name a doc that
                # was semantically folded at state time — pointers at it
                # resolve one hop further to its semantic keeper (the
                # batch operator's sem_map hop, bounded to this run's
                # introduced labels)
                intro = F.broadcast(
                    retro.select(F.col("component").alias("__c")).distinct()
                )
                hop = F.broadcast(
                    s.join(intro, s[id_col] == intro["__c"], "left_semi")
                    .filter(F.col("drop_reason") == "semantic_duplicate")
                    .select(
                        F.col(id_col).alias("__hop_from"),
                        F.col("duplicate_of").alias("__hop_to"),
                    )
                )
                s = s.join(
                    hop, s["duplicate_of"] == hop["__hop_from"], "left"
                ).select(
                    id_col,
                    "keep",
                    "drop_reason",
                    F.coalesce("__hop_to", "duplicate_of").alias("duplicate_of"),
                    *_AUDIT_AUX,
                )
    else:
        assigned_new = None
        sem_dropped_new = None
        sem_flagged = None

    # -- assemble batch audit rows (curate()'s schema) ------------------
    dropped = low_quality.select(
        id_col,
        F.lit("low_quality").alias("drop_reason"),
        null_dup.alias("duplicate_of"),
    )
    if rep_failed is not None:
        dropped = dropped.unionByName(
            rep_failed.select(
                id_col,
                F.lit("repetition").alias("drop_reason"),
                null_dup.alias("duplicate_of"),
            )
        )
    if clf_failed is not None:
        dropped = dropped.unionByName(
            clf_failed.select(
                id_col,
                F.lit("classifier").alias("drop_reason"),
                null_dup.alias("duplicate_of"),
            )
        )
    if ppl_failed is not None:
        dropped = dropped.unionByName(
            ppl_failed.select(
                id_col,
                F.lit("perplexity").alias("drop_reason"),
                null_dup.alias("duplicate_of"),
            )
        )
    if contaminated is not None:
        dropped = dropped.unionByName(
            contaminated.select(
                id_col,
                F.lit("contaminated").alias("drop_reason"),
                null_dup.alias("duplicate_of"),
            )
        )
    if sem_contaminated is not None:
        dropped = dropped.unionByName(
            sem_contaminated.select(
                id_col,
                F.lit("semantic_contaminated").alias("drop_reason"),
                null_dup.alias("duplicate_of"),
            )
        )
    # exact-dup final-root hop (mirrors curate()): a keeper that was
    # near-folded — in THIS run's components (batch keeper folded, or
    # stored keeper retro-folded: both appear in comp) or in a PRIOR
    # run (stored near_duplicate row, post-relabel) — resolves one hop
    # further to its component root. Precedence: this run's component
    # is the final label when both exist. The stored probe follows the
    # batch-proportional index shape: semi-join the stored audit down
    # to the batch's keeper set via a broadcast key list, then
    # broadcast the (batch-sized) hits into the left join — the stored
    # audit is never shuffled.
    run_folds = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__keeper"), F.col("component").alias("__root")
    )
    exact_final = exact_dropped.join(run_folds, "__keeper", "left")
    if s is not None:
        stored_folds = (
            s.filter(F.col("drop_reason") == "near_duplicate")
            .select(
                F.col(id_col).alias("__keeper"),
                F.col("duplicate_of").alias("__root2"),
            )
            .join(
                F.broadcast(exact_dropped.select("__keeper").distinct()),
                "__keeper",
                "left_semi",
            )
        )
        exact_final = exact_final.join(F.broadcast(stored_folds), "__keeper", "left")
    else:
        exact_final = exact_final.withColumn("__root2", null_dup)
    dropped = (
        dropped
        .unionByName(
            exact_final.select(
                id_col,
                F.lit("exact_duplicate").alias("drop_reason"),
                F.coalesce("__root", "__root2", "__keeper").alias("duplicate_of"),
            )
        )
        .unionByName(
            near_dropped_new.select(
                F.col("node").alias(id_col),
                F.lit("near_duplicate").alias("drop_reason"),
                F.col("component").alias("duplicate_of"),
            )
        )
    )
    if sem_dropped_new is not None:
        dropped = dropped.unionByName(
            sem_dropped_new.select(
                F.col("node").alias(id_col),
                F.lit("semantic_duplicate").alias("drop_reason"),
                F.col("component").alias("duplicate_of"),
            )
        )
        # final-root hop, semantic edition (mirrors curate()'s sem_map
        # repoint): a batch pointer ending at a semantically-folded doc
        # — this run's fold (batch or stored) or a prior run's stored
        # fold — resolves one hop further to the semantic keeper. The
        # stored side follows the batch-proportional probe shape: the
        # stored audit is semi-joined down to the batch's pointer set
        # via a broadcast key list and never shuffled.
        sem_map = sem_dropped_new.select(
            F.col("node").alias("__sem_from"),
            F.col("component").alias("__sem_to"),
        )
        if s is not None:
            stored_sem_map = (
                s.filter(F.col("drop_reason") == "semantic_duplicate")
                .select(
                    F.col(id_col).alias("__sem_from"),
                    F.col("duplicate_of").alias("__sem_to"),
                )
                .join(
                    F.broadcast(
                        dropped.select(
                            F.col("duplicate_of").alias("__sem_from")
                        ).distinct()
                    ),
                    "__sem_from",
                    "left_semi",
                )
            )
            sem_map = sem_map.unionByName(stored_sem_map)
        dropped = dropped.join(
            F.broadcast(sem_map),
            dropped["duplicate_of"] == sem_map["__sem_from"],
            "left",
        ).select(
            id_col,
            "drop_reason",
            F.coalesce("__sem_to", "duplicate_of").alias("duplicate_of"),
        )
    batch_audit = (
        batch.select(id_col)
        .join(dropped, id_col, "left")
        .select(
            id_col,
            F.col("drop_reason").isNull().alias("keep"),
            "drop_reason",
            "duplicate_of",
        )
    )
    if curtailed is not None:
        batch_audit = batch_audit.join(curtailed, id_col, "left").select(
            id_col,
            "keep",
            "drop_reason",
            "duplicate_of",
            F.coalesce("__curtailed", F.lit(False)).alias(
                "near_dup_audit_incomplete"
            ),
        )
    else:
        batch_audit = batch_audit.withColumn(
            "near_dup_audit_incomplete", F.lit(False)
        )
    if eval_overlap is not None:
        batch_audit = batch_audit.join(eval_overlap, id_col, "left")
    else:
        batch_audit = batch_audit.withColumn(
            "matched_eval_id", F.lit(None).cast("string")
        ).withColumn("contamination_frac", F.lit(None).cast("double"))
    if sub_audit is not None:
        batch_audit = batch_audit.join(sub_audit, id_col, "left")
    else:
        batch_audit = batch_audit.withColumn(
            "substring_tokens_dropped", F.lit(None).cast("long")
        )
    if assigned_new is not None:
        batch_audit = (
            batch_audit.join(
                assigned_new.select(
                    id_col, F.col("centroid_sim").alias("semantic_centroid_sim")
                ),
                id_col,
                "left",
            )
            .join(
                F.broadcast(sem_flagged.withColumn("__sem_flag", F.lit(True))),
                id_col,
                "left",
            )
            .withColumn(
                "semantic_audit_incomplete",
                F.coalesce("__sem_flag", F.lit(False)),
            )
            .drop("__sem_flag")
        )
    else:
        batch_audit = batch_audit.withColumn(
            "semantic_centroid_sim", F.lit(None).cast("double")
        ).withColumn("semantic_audit_incomplete", F.lit(None).cast("boolean"))
    if sdec_audit is not None:
        batch_audit = batch_audit.join(sdec_audit, id_col, "left")
    else:
        batch_audit = batch_audit.withColumn(
            "max_eval_cosine", F.lit(None).cast("double")
        ).withColumn("semantic_matched_eval_id", F.lit(None).cast("long"))

    # -- splice stored audit rows (pointers were updated above) ---------
    if s is not None:
        if curtailed is not None:
            stored_curtailed = F.broadcast(
                curtailed.withColumnRenamed("__curtailed", "__now_curtailed")
            )
            s = s.join(stored_curtailed, id_col, "left").select(
                id_col,
                "keep",
                "drop_reason",
                "duplicate_of",
                (
                    F.col("near_dup_audit_incomplete")
                    | F.coalesce("__now_curtailed", F.lit(False))
                ).alias("near_dup_audit_incomplete"),
                "matched_eval_id",
                "contamination_frac",
                "substring_tokens_dropped",
                "semantic_centroid_sim",
                "semantic_audit_incomplete",
                "max_eval_cosine",
                "semantic_matched_eval_id",
            )
        if sem_flagged is not None:
            # OR the over-cap flag into stored members of clusters the
            # append pushed over the semantic cap (stage-3's
            # stored_curtailed contract)
            stored_sem_flag = F.broadcast(
                sem_flagged.withColumn("__now_sem_flag", F.lit(True))
            )
            s = s.join(stored_sem_flag, id_col, "left").select(
                id_col,
                "keep",
                "drop_reason",
                "duplicate_of",
                "near_dup_audit_incomplete",
                "matched_eval_id",
                "contamination_frac",
                "substring_tokens_dropped",
                "semantic_centroid_sim",
                (
                    F.coalesce("semantic_audit_incomplete", F.lit(False))
                    | F.coalesce("__now_sem_flag", F.lit(False))
                ).alias("semantic_audit_incomplete"),
                "max_eval_cosine",
                "semantic_matched_eval_id",
            )
        audit = s.unionByName(batch_audit)
    else:
        audit = batch_audit
    audit = cut(audit, durable=durable)

    # -- new state: extend the rep index with the batch's reps ----------
    new_hashes = matched.filter(F.col(id_col) == F.coalesce("__stored_id", "__batch_keeper")).select(
        id_col, "__h"
    )
    hashes = (
        state.hashes.unionByName(new_hashes) if state is not None else new_hashes
    )
    banded_all = (
        state.banded.unionByName(new_ex) if state is not None else new_ex
    )
    if assigned_new is not None:
        new_semvecs = assigned_new.select(id_col, "cluster", "centroid_sim", "v")
        semvecs_all = (
            state.semvecs.unionByName(new_semvecs)
            if state is not None
            else new_semvecs
        )
        if state is not None:
            centroids_df = state.centroids
        else:
            centroids_df = batch.sparkSession.createDataFrame(
                [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)],
                "cell int, v array<double>",
            )
    else:
        semvecs_all = None
        centroids_df = None
    new_state = CurationState(
        audit=audit,
        hashes=cut(hashes, durable=durable),
        sets=cut(sets_all, durable=durable),
        banded=cut(banded_all, durable=durable),
        paras=cut(paras_all, durable=durable) if paras_all is not None else None,
        windows=cut(windows_all, durable=durable)
        if windows_all is not None
        else None,
        centroids=centroids_df,
        semvecs=cut(semvecs_all, durable=durable)
        if semvecs_all is not None
        else None,
        nearmap=cut(nearmap_all, durable=durable)
        if nearmap_all is not None
        else None,
        params=params_sig,
    )
    return audit, new_state
