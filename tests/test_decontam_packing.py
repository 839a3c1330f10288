"""Benchmark decontamination + sequence packing operators."""

from __future__ import annotations

import io
import random
from contextlib import redirect_stdout

from youtube_analytics_lakehouse_databricks_spark.operators.decontam import decontaminate
from youtube_analytics_lakehouse_databricks_spark.operators.packing import pack_sequences


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap(spark):
    bench = "what is the capital of france the answer is paris of course"
    train = _mkdocs(
        spark,
        [
            # verbatim benchmark leak inside a longer doc
            (1, "some preamble text " + bench + " and a closing remark"),
            # clean doc, no 5-gram shared
            (2, "entirely unrelated content about gardening and soil quality here"),
            # shares words but no contiguous 5-gram
            (3, "the capital answer paris france what is of course the"),
        ],
    )
    ev = _mkdocs(spark, [(100, bench)])
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, ev, "doc_id", "text", k=5).collect()
    }
    assert len(out) == 3  # every training doc exactly once
    assert out[1]["is_contaminated"] and out[1]["matched_eval_id"] == 100
    assert out[1]["n_hit_grams"] >= 8  # the whole leaked span's 5-grams
    assert not out[2]["is_contaminated"] and out[2]["matched_eval_id"] is None
    assert not out[3]["is_contaminated"]
    assert out[2]["contamination_frac"] == 0.0


def test_decontaminate_normalizes_cosmetic_variants(spark):
    ev = _mkdocs(spark, [(1, "What is the Capital of France? The answer is Paris!")])
    train = _mkdocs(
        spark, [(10, "prefix words what is the capital of france the answer is paris")]
    )
    flagged = decontaminate(train, ev, "doc_id", "text", k=5).collect()[0]
    assert flagged["is_contaminated"]
    # ...and with normalization off, the case difference hides the match
    raw = decontaminate(train, ev, "doc_id", "text", k=5, normalize=False).collect()[0]
    assert not raw["is_contaminated"]


def test_decontaminate_short_docs_report_clean(spark):
    train = _mkdocs(spark, [(1, "too short"), (2, "")])
    ev = _mkdocs(spark, [(9, "some benchmark text long enough for five grams here")])
    out = {r["doc_id"]: r for r in decontaminate(train, ev, "doc_id", "text", k=5).collect()}
    assert len(out) == 2
    for r in out.values():
        assert r["n_grams"] == 0 and not r["is_contaminated"]
        assert r["contamination_frac"] is None


def test_decontaminate_plan_broadcasts_eval(spark):
    train = _mkdocs(spark, [(1, "a b c d e f g h")])
    ev = _mkdocs(spark, [(2, "a b c d e f")])
    plan = _plan(decontaminate(train, ev, "doc_id", "text", k=5))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_pack_sequences_invariants(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(10, 900)) for i in range(2000)]
    rows += [(9000, 5000), (9001, 3000)]  # oversize docs must surface, not vanish
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=2048, repartition=4).collect()

    assert len(out) == len(rows)  # every doc exactly once
    assert len({r["doc_id"] for r in out}) == len(rows)

    loads: dict[str, int] = {}
    fills: dict[str, float] = {}
    for r in out:
        loads[r["seq_id"]] = loads.get(r["seq_id"], 0) + r["n_tokens"]
        fills[r["seq_id"]] = r["seq_fill"]
        if r["doc_id"] >= 9000:
            assert r["is_oversize"]
        else:
            assert not r["is_oversize"]
    oversize_seqs = {r["seq_id"] for r in out if r["is_oversize"]}
    assert len(oversize_seqs) == 2  # each oversize doc alone in its own bin
    for seq, load in loads.items():
        if seq not in oversize_seqs:
            assert load <= 2048
        # reported fill is the true bin load in every member row
        assert abs(fills[seq] - load / 2048.0) < 1e-9

    # FFD on many small docs should pack tightly: total waste bounded.
    normal = {s: l for s, l in loads.items() if s not in oversize_seqs}
    mean_fill = sum(normal.values()) / (2048.0 * len(normal))
    assert mean_fill > 0.85


def test_packing_invariants_under_repartition(spark):
    """A packing is an assignment, not a fact: seq_id/seq_fill legitimately
    differ across partition counts. The INVARIANTS must not: coverage
    (every doc exactly once), per-doc is_oversize flags, fill bounds
    (no multi-doc sequence over capacity, oversize docs alone), and the
    FFD tightness floor — identical guarantees at any parallelism."""
    rng = random.Random(11)
    rows = [(i, rng.randint(10, 900)) for i in range(3000)]
    rows += [(9000, 5000), (9001, 2500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    per_doc: dict[int, dict[int, tuple]] = {}
    for nparts in (1, 4, 17):
        out = pack_sequences(
            df, "doc_id", "n_tokens", capacity=2048, repartition=nparts
        ).collect()
        assert len(out) == len(rows)
        assert len({r["doc_id"] for r in out}) == len(rows)
        loads: dict[str, int] = {}
        members: dict[str, int] = {}
        oversize_seqs = set()
        for r in out:
            loads[r["seq_id"]] = loads.get(r["seq_id"], 0) + r["n_tokens"]
            members[r["seq_id"]] = members.get(r["seq_id"], 0) + 1
            if r["is_oversize"]:
                oversize_seqs.add(r["seq_id"])
            per_doc.setdefault(nparts, {})[r["doc_id"]] = (
                r["n_tokens"],
                r["is_oversize"],
            )
        for seq, load in loads.items():
            if seq in oversize_seqs:
                assert members[seq] == 1  # oversize docs never share a bin
            else:
                assert load <= 2048
        normal = {s: l for s, l in loads.items() if s not in oversize_seqs}
        assert sum(normal.values()) / (2048.0 * len(normal)) > 0.85

    # per-doc facts (n_tokens, is_oversize) are identical at any parallelism
    assert per_doc[1] == per_doc[4] == per_doc[17]


def test_pack_sequences_zero_token_docs(spark):
    df = spark.createDataFrame([(1, 0), (2, 0), (3, 100)], "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=128, repartition=1).collect()
    assert len(out) == 3
    assert not any(r["is_oversize"] for r in out)
    total = sum(r["n_tokens"] for r in out)
    assert total == 100


def test_pack_sequences_null_group_col_not_dropped(spark):
    """NULL group_col values must pack (as their own group), never be
    silently dropped with garbage seq_id/seq_fill — pandas groupby drops
    null keys by default (guarded with dropna=False)."""
    df = spark.createDataFrame(
        [(1, 40, "a"), (2, 50, None), (3, 60, None), (4, 70, "a")],
        "doc_id long, n_tokens long, shard string",
    )
    out = pack_sequences(
        df, "doc_id", "n_tokens", capacity=128, repartition=1,
        carry=("shard",), group_col="shard",
    ).collect()
    assert len(out) == 4
    assert all(r["seq_id"] is not None for r in out)
    assert all(r["seq_fill"] is not None and 0 < r["seq_fill"] <= 1.0 for r in out)
    # null-group rows never share a sequence with a named group
    null_seqs = {r["seq_id"] for r in out if r["shard"] is None}
    named_seqs = {r["seq_id"] for r in out if r["shard"] is not None}
    assert null_seqs and null_seqs.isdisjoint(named_seqs)


def test_ffd_segment_tree_matches_naive_first_fit():
    """The O(n log B) segment-tree first-fit must be EXACTLY the naive
    linear-scan first-fit, doc for doc — property-tested over random
    workloads including zero-size and oversize docs."""
    import numpy as np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from youtube_analytics_lakehouse_databricks_spark.operators.packing import _ffd_assign

    def naive_ffd(sizes, capacity):
        order = np.argsort(-sizes, kind="stable")
        bin_of = np.empty(len(sizes), dtype=np.int64)
        loads: list[int] = []
        for i in order:
            s = int(sizes[i])
            placed = -1
            if s <= capacity:
                for b, load in enumerate(loads):
                    if load + s <= capacity:
                        placed = b
                        break
            if placed < 0:
                placed = len(loads)
                loads.append(0)
            loads[placed] += s
            bin_of[i] = placed
        return bin_of, np.asarray(loads, dtype=np.float64)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=120),
        st.integers(min_value=1, max_value=250),
    )
    def check(sizes, capacity):
        arr = np.asarray(sizes, dtype=np.int64)
        got_bins, got_loads = _ffd_assign(arr, capacity)
        want_bins, want_loads = naive_ffd(arr, capacity)
        assert np.array_equal(got_bins, want_bins)
        assert np.array_equal(got_loads, want_loads)

    check()


def test_pack_sequences_zero_extra_shuffles(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    plan = _plan(pack_sequences(df, "doc_id", "n_tokens", capacity=64))
    assert "Exchange" not in plan  # partition-local: no shuffle at all


class TestSemanticDecontaminate:
    """Embedding-space decontamination (r10): brute cosine vs the
    broadcast eval matrix, one Arrow pass, zero shuffle."""

    DIM = 12

    def _fixture(self, spark):
        import numpy as np

        rng = np.random.default_rng(21)
        dirs = rng.standard_normal((3, self.DIM))
        dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)

        def emb(g, seed, eps=0.2):
            r = np.random.default_rng(seed)
            v = dirs[g] + eps * r.standard_normal(self.DIM)
            return [float(x) for x in v / np.linalg.norm(v)]

        ev = [(900 + i, emb(i % 3, 50 + i)) for i in range(6)]
        train = [(i, emb(i % 3, 100 + i)) for i in range(20)]
        # doc 7 is a PARAPHRASE of eval 903: near-identical embedding
        base = np.asarray(ev[3][1])
        v = base + 0.005 * rng.standard_normal(self.DIM)
        train[7] = (7, [float(x) for x in v / np.linalg.norm(v)])
        return train, ev

    def _reference(self, train, ev):
        import numpy as np

        ids = np.array([i for i, _ in ev])
        em = np.stack([np.asarray(v, dtype=np.float64) for _, v in ev])
        em = em / np.linalg.norm(em, axis=1, keepdims=True)
        out = {}
        for i, v in train:
            m = np.asarray(v, dtype=np.float64)
            m = m / np.linalg.norm(m)
            cos = em @ m
            j = int(np.argmax(cos))
            out[i] = (round(float(cos[j]), 5), int(ids[j]))
        return out

    def test_matches_reference_and_flags_paraphrase(self, spark):
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        got = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                tdf, edf, "doc_id", "emb", threshold=0.95
            ).collect()
        }
        want = self._reference(train, ev)
        assert len(got) == len(train)
        for i, (cos, eid) in want.items():
            # float32 matmul vs float64 reference: equal at 1e-5
            assert abs(got[i]["max_eval_cosine"] - cos) < 2e-5, i
            assert got[i]["matched_eval_id"] == eid, i
        # only the planted paraphrase crosses 0.95
        flagged = {i for i, r in got.items() if r["is_semantically_contaminated"]}
        assert flagged == {7}
        assert got[7]["matched_eval_id"] == 903

    def test_partition_invariant_and_no_shuffle(self, spark):
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        a = sorted(
            map(tuple, semantic_decontaminate(tdf, edf, "doc_id", "emb").collect())
        )
        b = sorted(
            map(
                tuple,
                semantic_decontaminate(
                    tdf.repartition(7), edf, "doc_id", "emb", eval_chunk_rows=2
                ).collect(),
            )
        )
        assert a == b  # partitioning AND eval chunking are invisible
        plan = (
            semantic_decontaminate(tdf, edf, "doc_id", "emb")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero shuffle at any corpus size

    def test_guards(self, spark):
        import pytest

        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        with pytest.raises(ValueError, match="threshold"):
            semantic_decontaminate(tdf, edf, "doc_id", "emb", threshold=0.0)
        with pytest.raises(ValueError, match="empty"):
            semantic_decontaminate(
                tdf, edf.filter("doc_id < 0"), "doc_id", "emb"
            )

    def test_string_ids_raise_loudly(self, spark):
        """r10 verdict #1: a string-keyed corpus must raise the documented
        ValueError, not die inside the Arrow kernel's numpy cast."""
        import pytest

        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        tdf_s = spark.createDataFrame(
            [(f"d{i}", v) for i, v in train], "doc_id string, emb array<float>"
        )
        with pytest.raises(ValueError, match="integral id"):
            semantic_decontaminate(tdf_s, edf, "doc_id", "emb")
        edf_s = spark.createDataFrame(
            [(f"e{i}", v) for i, v in ev], "doc_id string, emb array<float>"
        )
        with pytest.raises(ValueError, match="integral id"):
            semantic_decontaminate(tdf, edf_s, "doc_id", "emb")

    def test_zero_norm_vectors(self, spark):
        """r10 verdict #2: a planted zero-vector doc yields a NULL/False
        row (never a silent -inf); a zero-norm EVAL vector raises."""
        import pytest

        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        train = train + [(99, [0.0] * self.DIM)]
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        rows = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                tdf, edf, "doc_id", "emb", threshold=0.95
            ).collect()
        }
        z = rows[99]
        assert z["max_eval_cosine"] is None
        assert z["matched_eval_id"] is None
        assert z["is_semantically_contaminated"] is False
        # the rest of the corpus is untouched by the guard
        assert rows[7]["is_semantically_contaminated"] is True
        assert all(
            rows[i]["max_eval_cosine"] is not None for i, _ in train if i != 99
        )
        ev_bad = ev + [(999, [0.0] * self.DIM)]
        with pytest.raises(ValueError, match="zero norm"):
            semantic_decontaminate(
                tdf,
                spark.createDataFrame(ev_bad, "doc_id long, emb array<float>"),
                "doc_id",
                "emb",
            )

    def test_null_vectors(self, spark):
        """A NULL embedding (doc with no vector, e.g. after a left join)
        scores like a zero-norm one: NULL cosine/match, False flag —
        never a shard-killing np.stack shape error. Matters since the
        r11 gate composition scores EVERY input row."""
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        train = train + [(98, None)]
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        rows = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                tdf, edf, "doc_id", "emb", threshold=0.95
            ).collect()
        }
        z = rows[98]
        assert z["max_eval_cosine"] is None
        assert z["matched_eval_id"] is None
        assert z["is_semantically_contaminated"] is False
        assert rows[7]["is_semantically_contaminated"] is True

    def test_wrong_dimension_vectors(self, spark):
        """A corrupt (wrong-dimension) embedding is scored like a
        missing one: NULL cosine/match, False flag — the gate
        composition scores every row, so a bad embed on an
        already-dropped doc must not kill the shard."""
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        train = train + [(97, [1.0, 2.0, 3.0])]  # 3-dim in a DIM-dim corpus
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        rows = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                tdf, edf, "doc_id", "emb", threshold=0.95
            ).collect()
        }
        z = rows[97]
        assert z["max_eval_cosine"] is None
        assert z["matched_eval_id"] is None
        assert z["is_semantically_contaminated"] is False
        assert rows[7]["is_semantically_contaminated"] is True

    def test_non_finite_vectors(self, spark):
        """A NaN/inf component gives a non-finite norm — without the
        isfinite mask such a row sailed past every cosine comparison and
        emitted -inf with matched_eval_id=0 (silently naming a real eval
        doc). It must report the NULL/False audit row like every other
        unusable embedding."""
        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        nan_vec = [float("nan")] + [0.0] * (self.DIM - 1)
        inf_vec = [float("inf")] + [1.0] * (self.DIM - 1)
        train = train + [(96, nan_vec), (95, inf_vec)]
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        edf = spark.createDataFrame(ev, "doc_id long, emb array<float>")
        rows = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                tdf, edf, "doc_id", "emb", threshold=0.95
            ).collect()
        }
        for bad in (96, 95):
            z = rows[bad]
            assert z["max_eval_cosine"] is None, z
            assert z["matched_eval_id"] is None, z
            assert z["is_semantically_contaminated"] is False, z
        assert rows[7]["is_semantically_contaminated"] is True

    def test_non_finite_eval_vectors_raise(self, spark):
        """An EVAL embedding with an inf component passes the zero-norm
        guard (inf norm > 0) but normalizes to a NaN-bearing row, and the
        chunked argmax then latches onto the NaN column — every doc's
        `cand > best` goes False and the whole scoring chunk silently
        contributes no matches. A NaN component used to die with a
        misleading 'zero norm' message. Both must raise NAMING the
        offending ids as non-finite."""
        import pytest

        from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate

        train, ev = self._fixture(spark)
        tdf = spark.createDataFrame(train, "doc_id long, emb array<float>")
        for comp in (float("inf"), float("nan")):
            bad_vec = [comp] + [1.0] * (self.DIM - 1)
            edf = spark.createDataFrame(
                ev + [(998, bad_vec)], "doc_id long, emb array<float>"
            )
            with pytest.raises(ValueError, match=r"non-finite.*998"):
                semantic_decontaminate(tdf, edf, "doc_id", "emb")


class TestChunkDocuments:
    """Fixed-window chunking with overlap (r10) — the complement of
    pack_sequences' is_oversize contract."""

    def test_reconstruction_and_overlap_property(self, spark):
        import random

        from youtube_analytics_lakehouse_databricks_spark.operators.packing import chunk_documents

        rng = random.Random(3)
        rows = [
            (i, " ".join(f"t{i}_{j}" for j in range(rng.randint(0, 37))))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {}
        for r in chunk_documents(df, "id", "text", max_tokens=8, overlap=3).collect():
            out.setdefault(r["id"], {})[r["chunk_idx"]] = (
                r["text_chunk"], r["n_tokens"]
            )
        step = 8 - 3
        for i, text in rows:
            toks = text.split(" ") if text else []
            toks = [t for t in toks if t]
            chunks = out[i]
            assert sorted(chunks) == list(range(len(chunks)))  # dense idx
            # every chunk is the exact window; de-overlapped concat is
            # the original token stream; consecutive chunks share the
            # overlap verbatim
            rebuilt = []
            for k in range(len(chunks)):
                ctoks = chunks[k][0].split(" ") if chunks[k][0] else []
                assert ctoks == toks[k * step : k * step + 8]
                assert chunks[k][1] == len(ctoks)
                rebuilt.extend(ctoks if k == 0 else ctoks[3:])
            assert rebuilt == toks
            if not toks:
                assert len(chunks) == 1 and chunks[0] == ("", 0)
            else:
                assert len(chunks[len(chunks) - 1][0].split(" ")) >= 1

    def test_compose_with_packing_no_oversize(self, spark):
        from youtube_analytics_lakehouse_databricks_spark.operators.packing import (
            chunk_documents,
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(1, " ".join(f"w{j}" for j in range(100))), (2, "a b c")],
            "id long, text string",
        )
        chunks = chunk_documents(df, "id", "text", max_tokens=16, overlap=0)
        keyed = chunks.selectExpr(
            "concat(id, '#', chunk_idx) AS cid", "text_chunk", "n_tokens"
        )
        packed = pack_sequences(keyed, "cid", "n_tokens", capacity=16)
        assert not any(r["is_oversize"] for r in packed.collect())

    def test_guards_and_plan(self, spark):
        import pytest

        from youtube_analytics_lakehouse_databricks_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "a b")], "id long, text string")
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_documents(df, "id", "text", max_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, "id", "text", max_tokens=4, overlap=4)
        plan = (
            chunk_documents(df, "id", "text", max_tokens=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "EvalPython" not in plan


def test_chunk_documents_parameter_sweep(spark):
    """Hypothesis-style sweep over (max_tokens, overlap, doc length):
    the reconstruction property holds for every combination."""
    import random

    from youtube_analytics_lakehouse_databricks_spark.operators.packing import chunk_documents

    rng = random.Random(17)
    cases = [(1, 0), (2, 0), (2, 1), (5, 0), (5, 4), (8, 3), (16, 15), (64, 7)]
    rows = [
        (i, " ".join(f"x{i}_{j}" for j in range(rng.randint(0, 130))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for max_tokens, overlap in cases:
        step = max_tokens - overlap
        out = {}
        for r in chunk_documents(
            df, "id", "text", max_tokens=max_tokens, overlap=overlap
        ).collect():
            out.setdefault(r["id"], {})[r["chunk_idx"]] = r["text_chunk"]
        for i, text in rows:
            toks = [t for t in text.split(" ") if t]
            chunks = out[i]
            assert sorted(chunks) == list(range(len(chunks))), (max_tokens, overlap, i)
            rebuilt = []
            for k in range(len(chunks)):
                ctoks = [t for t in chunks[k].split(" ") if t]
                assert len(ctoks) <= max_tokens
                assert ctoks == toks[k * step : k * step + max_tokens]
                rebuilt.extend(ctoks if k == 0 else ctoks[overlap:])
            assert rebuilt == toks, (max_tokens, overlap, i)
