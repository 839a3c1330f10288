"""Multi-process soak worker for the IVF maintenance concurrency
protocol (r16; the r15 VERDICT's #1 ask).

Every prior concurrency test simulated interleavings in ONE process
(monkeypatched ``StagedFold.commit``, hand-placed marker files). This
worker gives the protocol what those can't: two real OS processes with
separate SparkSessions and separate JVMs racing ``append_ivf_index``
against ``compact_ivf_index`` on one shared index — the only setting
that actually exercises ``create_exclusive``'s exists+create
non-atomicity on the local filesystem and the read-back + ``confirm()``
mitigation built for it (``fsops.maintenance_lock``).

Run as a subprocess from ``tests/test_ivf_soak.py``:

    python tests/soak_worker.py appender <index> <log> <done> <n> <bsz> <start> <d>
    python tests/soak_worker.py folder   <index> <log> <done>

Events land in <log> as JSON lines; the parent test asserts the
protocol's three claims over them (no silent row loss, only named
refusals, search parity with a sequential replay).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batch_df(spark, batch: int, batch_size: int, start_id: int, d: int):
    """Deterministic batch #``batch`` — the parent replays the exact
    same frames sequentially for the parity check, so generation must
    be a pure function of the batch number."""
    import numpy as np

    rng = np.random.default_rng(1000 + batch)
    x = rng.standard_normal((batch_size, d))
    base = start_id + batch * batch_size
    return spark.createDataFrame(
        [(base + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def _session(name: str):
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    return get_spark(
        app_name=name,
        master="local[3]",
        shuffle_partitions=3,
        extra_conf={"spark.driver.memory": "3g"},
    )


def _log(fh, **kv):
    kv["t"] = round(time.time(), 3)
    fh.write(json.dumps(kv) + "\n")
    fh.flush()


def run_appender(index, log_path, done_file, n_batches, batch_size, start_id, d):
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import append_ivf_index

    spark = _session("soak-appender")
    with open(log_path, "a") as fh:
        try:
            for b in range(n_batches):
                df = batch_df(spark, b, batch_size, start_id, d)
                # retry each named refusal until the batch lands: the
                # parent's row-accounting then expects ALL batches, and
                # every refusal still gets logged for the pattern check
                for attempt in range(60):
                    try:
                        append_ivf_index(df, "vec_id", "embedding", index)
                        _log(fh, role="appender", event="append_ok", batch=b)
                        break
                    except (ValueError, RuntimeError) as exc:
                        _log(
                            fh,
                            role="appender",
                            event="refused",
                            batch=b,
                            msg=str(exc)[:400],
                        )
                        time.sleep(0.15)
                else:
                    _log(fh, role="appender", event="gave_up", batch=b)
                    return 2
                # a short gap between batches: without it the sentinel
                # windows are back-to-back and the folder almost never
                # gets to STAGE, so the append-refuses-pending-fold and
                # fold-abort paths go unexercised
                time.sleep(0.3)
        except Exception:
            _log(
                fh,
                role="appender",
                event="crashed",
                msg=traceback.format_exc()[-1500:],
            )
            return 3
        finally:
            # written INSIDE the appender so the folder stops hammering
            # as soon as no more appends can arrive
            with open(done_file, "w") as df_fh:
                df_fh.write("done")
    return 0


def run_folder(index, log_path, done_file):
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        compact_ivf_index,
    )

    spark = _session("soak-folder")
    with open(log_path, "a") as fh:
        try:
            while True:
                finished = os.path.exists(done_file)
                try:
                    folded = compact_ivf_index(spark, index)
                    _log(fh, role="folder", event="fold_ok", cells=folded)
                except (ValueError, RuntimeError) as exc:
                    _log(fh, role="folder", event="refused", msg=str(exc)[:400])
                if finished:
                    # one pass AFTER the appender's last batch: leaves
                    # the index folded for the parent's layout check
                    return 0
                time.sleep(0.05)
        except Exception:
            _log(
                fh,
                role="folder",
                event="crashed",
                msg=traceback.format_exc()[-1500:],
            )
            return 3


def main(argv):
    role, index, log_path, done_file = argv[1:5]
    if role == "appender":
        n, bsz, start, d = (int(a) for a in argv[5:9])
        return run_appender(index, log_path, done_file, n, bsz, start, d)
    if role == "folder":
        return run_folder(index, log_path, done_file)
    raise SystemExit(f"unknown role {role!r}")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
