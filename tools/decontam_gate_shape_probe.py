"""Measure the r11 decontam-gate shuffle-shape claim (verdict semi-join).

curate()'s semantic decontamination stage scores EVERY input row with
the zero-exchange broadcast-eval Arrow pass and selects the gate
population by semi-joining the (id, score) VERDICTS; the code comment
CLAIMS that the alternative — restricting the vector frame first —
would shuffle dim*4 bytes/row of vectors against a corpus-sized id set
at 100 TB, while the extra matmuls the chosen shape pays for
already-dropped docs are bounded and exchange-free. This tool turns the
claim into a measurement: both shapes run on the scaling corpus with
``spark.sql.autoBroadcastJoinThreshold=-1`` (the 100 TB regime — a
corpus-sized survivor set can never broadcast; at toy scale it would,
hiding the exchange the claim is about), recording per-run shuffle
bytes + executor CPU + wall via the scaling harness's StageMeter:

  restrict_then_score   docs.select(id, vec) SEMI-JOIN survivors,
                        then semantic_decontaminate over the survivors
                        (the shape r11 replaced) — the semi-join
                        exchange carries the VECTOR column;
  score_then_restrict   semantic_decontaminate over every row (zero
                        exchange), then SEMI-JOIN the id+score verdicts
                        (the shipped shape) — the exchange carries tens
                        of bytes/row.

The survivor set is ~90% of the corpus (doc_id % 10 != 0 — the quality
gate's typical pass rate), so the honest cost of the shipped shape (the
Arrow pass scoring the dropped ~10% too) is also visible in cpu_s.

Usage: python tools/decontam_gate_shape_probe.py [--mult 10] [--pairs 3]
Prints one JSON object; paste the numbers into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_curve import OUT_ROOT, StageMeter, ensure_embedded, generate  # noqa: E402

from youtube_analytics_lakehouse_databricks_spark.operators.decontam import semantic_decontaminate  # noqa: E402


def _inputs(spark, d: str):
    docs = spark.read.parquet(ensure_embedded(spark, d)).select("doc_id", "embedding")
    ev = (
        spark.read.parquet(f"{OUT_ROOT}/x1/embeddings.parquet")
        .filter("vec_id % 80 = 0")
        .limit(25)
        .selectExpr("vec_id AS doc_id", "embedding")
    )
    survivors = docs.filter("doc_id % 10 != 0").select("doc_id")
    return docs, ev, survivors


def restrict_then_score(spark, d: str):
    docs, ev, survivors = _inputs(spark, d)
    gated = docs.join(survivors, "doc_id", "left_semi")
    return semantic_decontaminate(gated, ev, "doc_id", "embedding", threshold=0.9)


def score_then_restrict(spark, d: str):
    docs, ev, survivors = _inputs(spark, d)
    scored = semantic_decontaminate(docs, ev, "doc_id", "embedding", threshold=0.9)
    return scored.join(survivors, "doc_id", "left_semi")


SHAPES = {
    "restrict_then_score": restrict_then_score,
    "score_then_restrict": score_then_restrict,
}


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    mult, pairs = 10, 3
    for i, a in enumerate(sys.argv):
        if a == "--mult" and i + 1 < len(sys.argv):
            mult = int(sys.argv[i + 1])
        if a == "--pairs" and i + 1 < len(sys.argv):
            pairs = int(sys.argv[i + 1])
    for m in {1, mult}:
        d = f"{OUT_ROOT}/x{m}"
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"generating {m}x corpus ...", file=sys.stderr)
            generate(m, d, hot=(m >= 10))
    d = f"{OUT_ROOT}/x{mult}"

    spark = get_spark(app_name="decontam_gate_shape_probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "1000000",
        # the 100 TB regime: a corpus-sized survivor set never broadcasts
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    })
    # warmup both shapes (JIT/codegen/footers), noop sink
    for build in SHAPES.values():
        build(spark, d).write.format("noop").mode("overwrite").save()

    meter = StageMeter(spark)
    out: dict[str, dict] = {}
    rows: dict[str, int] = {}
    for _ in range(pairs):
        for shape, build in SHAPES.items():
            df = build(spark, d)
            meter.delta()  # reset
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            shuffle, cpu = meter.delta()
            rec = out.setdefault(shape, {"wall_s": [], "shuffle_mb": [], "cpu_s": []})
            rec["wall_s"].append(round(wall, 2))
            rec["shuffle_mb"].append(round(shuffle / 1e6, 2))
            rec["cpu_s"].append(round(cpu / 1e9, 2))
            if shape not in rows:
                rows[shape] = df.count()
    # both shapes must gate the SAME population or the comparison lies
    assert len(set(rows.values())) == 1, rows
    for rec in out.values():
        rec["wall_min_s"] = min(rec["wall_s"])
        rec["shuffle_min_mb"] = min(rec["shuffle_mb"])
        rec["cpu_min_s"] = min(rec["cpu_s"])
    print(json.dumps({"mult": mult, "gated_rows": rows.popitem()[1], "shapes": out}, indent=2))


if __name__ == "__main__":
    main()
