"""Core-scaling evidence at a 10x corpus (r17, VERDICT item 8).

The sf0.1 bench stopped demonstrating parallel speedups: 33/40 rows run
as fast or faster on 8 cores than 32 (PERF_r16 scaling block) because
~100 ms stages are scheduling/AQE-wave bound, not compute bound. This
tool reruns the heaviest query families at the 10x scaling corpus
(50k docs / 20k vecs — tools/scaling_curve.py's deterministic generator)
on local[32] vs local[8] so per-query core-scaling claims rest on inputs
large enough to mean something.

Usage: python tools/core_scaling_r17.py [out_json]
Writes plans/r17/core_scaling_10x.json by default.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ngram_lm_train",
    "ngram_lm_perplexity",
    "lsh_verified_near_dups",
    "paragraph_dedup_documents",
    "substring_dedup_documents",
    "embedding_ivf_ann",
    "quality_classifier_scores",
]


def main() -> None:
    from tools.scaling_curve import OUT_ROOT, generate

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "plans/r17/core_scaling_10x.json")
    )
    d = f"{OUT_ROOT}/10x"
    if not os.path.exists(f"{d}/documents.parquet"):
        os.makedirs(d, exist_ok=True)
        generate(10, d, hot=True)

    results: dict[str, dict[str, float]] = {}
    for cpus in ("32", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools/time_query.py"), *QUERIES,
             "--sf", d, "--runs", "3"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            m = re.match(r"(\w+): min=([\d.]+)", line.strip())
            if m:
                results.setdefault(m.group(1), {})[f"sec_c{cpus}"] = float(m.group(2))
    for name, r in results.items():
        if "sec_c32" in r and "sec_c8" in r and r["sec_c32"] > 0:
            r["ratio_8_over_32"] = round(r["sec_c8"] / r["sec_c32"], 2)
    payload = {"corpus": "10x scaling corpus (50k docs / 20k vecs)", "runs": "min of 3",
               "queries": results}
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
