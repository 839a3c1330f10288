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
binary/graded decontamination) thread through exactly like the batch
operator's: each is per-row and batch-local, so append-mode equivalence
holds gate-for-gate as long as the SAME parameters (and eval suite) are
used on every append — the redacted/canonical text the stored index was
built from must match what new batches hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators import dedup as dedup_ops
from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops
from youtube_analytics_lakehouse_databricks_spark.operators.graph import connected_components
from youtube_analytics_lakehouse_databricks_spark.operators.lineage import cut


class CurationState:
    """The persisted curation index: four core DataFrames plus up to two
    optional stage indexes.

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
        params: dict | None = None,
    ) -> None:
        self.audit = audit
        self.hashes = hashes
        self.sets = sets
        self.banded = banded
        self.paras = paras
        self.windows = windows
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
        place would delete inputs mid-scan; the rename also means a crash
        mid-save leaves the previous state intact. Local/NFS paths only —
        on a lakehouse these four frames are Delta tables and the swap is
        a transaction."""
        import os
        import shutil

        frames = list(self.FRAMES) + [
            name for name in ("paras", "windows") if getattr(self, name) is not None
        ]
        for name in frames:
            getattr(self, name).write.mode("overwrite").parquet(
                f"{path}/.{name}.staged"
            )
        for name in frames:
            shutil.rmtree(f"{path}/{name}", ignore_errors=True)
            os.rename(f"{path}/.{name}.staged", f"{path}/{name}")
        if self.params is not None:
            import json

            with open(f"{path}/.params.json.staged", "w") as f:
                json.dump(self.params, f, sort_keys=True)
            os.replace(f"{path}/.params.json.staged", f"{path}/params.json")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "CurationState":
        import os

        optional = {
            name: (
                spark.read.parquet(f"{path}/{name}")
                if os.path.isdir(f"{path}/{name}")
                else None
            )
            for name in ("paras", "windows")
        }
        params = None
        if os.path.exists(f"{path}/params.json"):
            import json

            with open(f"{path}/params.json") as f:
                params = json.load(f)
        return cls(
            *[spark.read.parquet(f"{path}/{name}") for name in cls.FRAMES],
            **optional,
            params=params,
        )


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
    }
    if state is not None and state.params is not None and state.params != params_sig:
        diffs = {
            k: (state.params.get(k), params_sig.get(k))
            for k in sorted(set(state.params) | set(params_sig))
            if state.params.get(k) != params_sig.get(k)
        }
        raise ValueError(
            "curation parameters differ from the ones the stored state was "
            f"built with (stored, requested): {diffs} — parameters must "
            "match across appends to the same state"
        )

    # Watermark: the append-only frontier. Parquet column stats make the
    # max() a footer read, not a data scan.
    if state is not None:
        watermark = state.audit.agg(F.max(id_col)).collect()[0][0]
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
            verify_sets, id_col, cand, jaccard_threshold
        ).select("doc_a", "doc_b"),
        durable=durable,
    )

    # anchor edges: stored nodes in new pairs pull their stored FINAL
    # label into the component, so a bridge doc merges whole stored
    # clusters (not just the members it directly verified against)
    if state is not None:
        stored_nodes = (
            pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("__n"))
            .filter(F.col("__n") <= F.lit(watermark))
            .distinct()
        )
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
                    "near_dup_audit_incomplete",
                    "matched_eval_id",
                    "contamination_frac",
                    "substring_tokens_dropped",
                )
            )
            # repoint any row whose pointer names a retro-folded node to
            # that node's new label: near-dup survivors of a merged
            # cluster AND exact dups of a retro-folded keeper (both
            # pointer kinds must end at the FINAL cluster root — the
            # leakage_safe_split contract)
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
                    F.coalesce("__relabel", "duplicate_of").alias("duplicate_of"),
                    "near_dup_audit_incomplete",
                    "matched_eval_id",
                    "contamination_frac",
                    "substring_tokens_dropped",
                )
            )
    else:
        s = None

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
    new_state = CurationState(
        audit=audit,
        hashes=cut(hashes, durable=durable),
        sets=cut(sets_all, durable=durable),
        banded=cut(banded_all, durable=durable),
        paras=cut(paras_all, durable=durable) if paras_all is not None else None,
        windows=cut(windows_all, durable=durable)
        if windows_all is not None
        else None,
        params=params_sig,
    )
    return audit, new_state
