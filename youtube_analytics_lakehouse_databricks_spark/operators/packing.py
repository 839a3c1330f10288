"""Sequence packing: assign documents to fixed-capacity training
sequences so tokenization batches waste as little context as possible.

Training pipelines concatenate documents into fixed-length sequences
(2k/4k/8k tokens); naive one-doc-per-sequence wastes most of the window
on short docs. Exact global bin packing is NP-hard and — more to the
point — inherently serial, so the production shape is PARTITION-LOCAL
first-fit-decreasing: each Spark partition packs its own docs into bins,
and bin ids are namespaced by partition. At 100 TB this is
embarrassingly parallel (no shuffle beyond an optional repartition, no
global coordination), and FFD's guarantee (≤ 11/9·OPT + 1 bins) holds
per partition, so total waste stays within a small constant of optimal
as long as partitions hold many docs — which at any real scale they do.

The packing itself runs in ONE Arrow-batched pass per partition
(mapInPandas): sizes are numpy-sorted descending and placed first-fit.
Oversize docs (n_tokens > capacity) cannot fit any bin; they come back
flagged ``is_oversize`` in a singleton sequence, for the caller to
truncate or split — silently dropping them would be the one unforgivable
packing bug.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ffd_assign(sizes, capacity: int):
    """First-fit-decreasing bin assignment of ``sizes`` (numpy int
    array) into bins of ``capacity``: returns (bin_of, loads) where
    bin_of[i] is doc i's bin index and loads[b] the final token load of
    bin b. EXACT first-fit semantics (each doc, in decreasing-size
    stable order, goes to the LEFTMOST bin it fits; a doc that fits no
    open bin — including any doc > capacity — opens the next bin), but
    implemented with a segment tree of per-bin remaining capacity (max
    over subtree) so "leftmost bin with remaining >= s" is an O(log B)
    descent and packing is O(n log B) — a naive linear bin scan is
    O(n*B) and melts on the ~10^5-doc partitions a 100 TB corpus
    actually produces. Property-tested identical to the naive scan in
    tests/test_decontam_packing.py."""
    import numpy as np

    n = len(sizes)
    order = np.argsort(-sizes, kind="stable")  # first-fit DECREASING
    tree_sz = 1
    while tree_sz < max(n, 1):
        tree_sz *= 2
    rem = np.zeros(2 * tree_sz, dtype=np.int64)  # internal max-tree
    n_bins = 0

    def find_first(s: int) -> int:
        """Leftmost open bin with remaining >= s, else -1."""
        if rem[1] < s:
            return -1
        node = 1
        while node < tree_sz:
            node = 2 * node if rem[2 * node] >= s else 2 * node + 1
        return node - tree_sz

    def update(b: int, value: int) -> None:
        node = b + tree_sz
        rem[node] = value
        node //= 2
        while node:
            rem[node] = max(rem[2 * node], rem[2 * node + 1])
            node //= 2

    bin_of = np.empty(n, dtype=np.int64)
    for i in order:
        s = int(sizes[i])
        placed = find_first(s) if s <= capacity else -1
        if placed < 0 or placed >= n_bins:
            placed = n_bins
            n_bins += 1
            update(placed, capacity)
        update(placed, int(rem[placed + tree_sz]) - s)
        bin_of[i] = placed

    loads = capacity - rem[tree_sz : tree_sz + n_bins].astype(np.float64)
    # oversize singletons carry negative remaining; their load is their
    # own size, which the subtraction already yields
    return bin_of, loads


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    *,
    capacity: int = 2048,
    repartition: int | None = None,
    carry: tuple[str, ...] = (),
    group_col: str | None = None,
) -> DataFrame:
    """One row per input doc: (id, n_tokens, seq_id, seq_fill,
    is_oversize[, *carry]) — ``carry`` names input columns passed
    through unchanged (e.g. the text itself for an export write).

    - seq_id: globally unique sequence label, namespaced by the Spark
      partition that packed it (``p<partition>-<bin>``);
    - seq_fill: the packed sequence's total tokens / capacity — every
      member row of a sequence reports the same value;
    - is_oversize: doc alone exceeds ``capacity`` (singleton sequence,
      seq_fill > 1.0).

    Every input doc appears exactly once; no sequence except oversize
    singletons exceeds ``capacity``. Pass ``repartition`` to rebalance
    a skewed input first (one exchange); otherwise zero shuffles.

    ``group_col``: pack each distinct value of this column SEPARATELY
    within the partition (seq_id namespaced ``p<pid>g<group>-<bin>``),
    so no sequence ever spans two groups. This is how a shard-arranged
    export packs: ``repartition(n, shard)`` hash-partitions the shard
    VALUE, so two shards can share one task — packing the raw partition
    would let a sequence mix docs from different shards, and a
    partitionBy(shard) write would then split that sequence across
    shard directories (misreported seq_fill, double-counted stats).
    ``group_col`` must be among ``carry`` or be the id column; it is a
    docstring-level contract that all rows of one group value sit in
    one partition (true after repartition(n, group_col)). NULL group
    values are packed as their own group (never silently dropped, never
    mixed into a named group).

    Determinism contract: a packing is an ASSIGNMENT, not a fact about
    any single doc — ``seq_id``/``seq_fill`` depend on which docs share
    a partition, so two runs of the same corpus with different partition
    counts produce different (equally valid) packings. What IS invariant
    under repartitioning, and what callers may rely on: the set of doc
    ids covered (each exactly once), each doc's ``is_oversize`` flag and
    ``n_tokens``, and the fill bounds (no multi-doc sequence over
    capacity; oversize docs alone in their sequence). Pinned by
    tests/test_decontam_packing.py::test_packing_invariants_under_repartition.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("seq_id", T.StringType()),
            T.StructField("seq_fill", T.DoubleType()),
            T.StructField("is_oversize", T.BooleanType()),
        ]
        + [T.StructField(c, df.schema[c].dataType) for c in carry]
    )

    if group_col is not None and group_col not in (id_col, *carry):
        raise ValueError(
            f"group_col {group_col!r} must be the id column or in carry"
        )

    src = df.select(
        id_col, F.col(n_tokens_col).cast("long").alias("n_tokens"), *carry
    )
    if repartition is not None:
        src = src.repartition(repartition)
    src = src.withColumn("__pid", F.spark_partition_id())

    def pack(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # one partition may arrive as several Arrow batches: buffer them
        # so packing sees the whole partition (bins must not straddle
        # batch boundaries or fill ratios drop with batch size)
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if not len(pdf):
            return
        pid = int(pdf["__pid"].iloc[0])
        n = len(pdf)
        seq_id = np.empty(n, dtype=object)
        seq_fill = np.empty(n, dtype=np.float64)
        if group_col is None:
            groups = [(None, np.arange(n))]
        else:
            # .indices: group value -> positional index array.
            # dropna=False: pandas groupby silently DROPS null keys by
            # default, which would leave those rows' seq_id/seq_fill
            # uninitialized (np.empty garbage) — NULL group values pack
            # as their own group instead of corrupting silently.
            groups = list(
                pdf.groupby(group_col, sort=False, dropna=False).indices.items()
            )
        for g, idx in groups:
            sizes_g = pdf["n_tokens"].to_numpy()[idx]
            bin_of, loads = _ffd_assign(sizes_g, capacity)
            tag = f"p{pid}" if group_col is None else f"p{pid}g{g}"
            seq_id[idx] = [f"{tag}-{b}" for b in bin_of]
            seq_fill[idx] = loads[bin_of] / float(capacity)
        out = {
            pdf.columns[0]: pdf.iloc[:, 0],
            "n_tokens": pdf["n_tokens"],
            "seq_id": seq_id,
            "seq_fill": seq_fill,
            "is_oversize": pdf["n_tokens"].to_numpy() > capacity,
        }
        for c in carry:
            out[c] = pdf[c]
        yield pd.DataFrame(out)

    return src.mapInPandas(pack, schema=out_schema)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split every document into <= ``max_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks —
    the complement of pack_sequences' ``is_oversize`` contract: packing
    never truncates an over-capacity doc, chunking is how the caller
    makes every row fit. Chunk before packing (max_tokens <= capacity)
    and the export has no oversize singletons; the standard pretraining
    shape (fixed windows with a small overlap so no boundary context is
    lost).

    Output: one row per chunk — (id, chunk_idx, text_chunk, n_tokens) —
    in document order (chunk_idx 0..k-1); chunk starts advance by
    ``max_tokens - overlap``, the final chunk is whatever remains (>= 1
    token past the previous chunk's new content), and empty/whitespace
    docs yield a single empty chunk 0 so no input id ever vanishes.
    Reconstruction is whitespace-normalizing (tokens rejoined with a
    single space — substring_dedup's token-stream contract).

    Scale shape: pure per-row JVM array math (split -> transform over a
    start sequence -> posexplode) — whole-stage codegen, ZERO shuffle at
    any corpus size, linear output inflation of exactly
    overlap/(max_tokens-overlap) on full windows.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} vs {max_tokens}"
        )
    step = max_tokens - overlap
    toks = df.select(
        id_col, F.expr(f"filter(split({text_col}, ' '), x -> x <> '')").alias("__t")
    )
    # start positions: 0, step, 2*step, ... while start < n (and at least
    # one chunk for empty docs); slice() is 1-based
    chunks = F.expr(
        f"transform(sequence(0, greatest(ceil((size(__t) - {overlap}) / {step}) - 1, 0)), "
        f"i -> slice(__t, int(i) * {step} + 1, {max_tokens}))"
    )
    return toks.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "__chunk")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", "__chunk").alias("text_chunk"),
        F.size("__chunk").cast("long").alias("n_tokens"),
    )
