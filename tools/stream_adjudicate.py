#!/usr/bin/env python
"""Round-9 adjudication of the streaming sysmon throughput slide
(BENCH_r07 858k ev/s / 0.79x batch -> BENCH_r08 777k ev/s / 0.72x):
re-measure BOTH legs N times on a verified-idle machine and print
per-run numbers + best-of ratios, so noise and real regressions are
distinguishable.  Mirrors bench.py's exact leg construction (same
2.56M-row replay, same warmup discipline, availableNow trigger).

Usage: python tools/stream_adjudicate.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # reuse the bench suite's fixture builders verbatim


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    load0 = os.getloadavg()[0]
    print(f"loadavg at start: {load0:.2f}", flush=True)

    from dagger_spark.rules.builtin import active_rules
    from dagger_spark.rules.engine import apply_rules_single_pass
    from dagger_spark.session import get_spark
    from dagger_spark.streaming import build_alert_stream, file_stream_events

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "stream_adjudicate", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    rules = active_rules()
    sysmon = spark.read.parquet(bench._sysmon_bench_path())
    stream_dir = bench._sysmon_stream_dir()

    # batch leg: one untimed warm + n timed runs
    apply_rules_single_pass(sysmon, rules).count()
    batch_runs, batch_alerts = [], None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        batch_alerts = apply_rules_single_pass(sysmon, rules).count()
        batch_runs.append(round(time.perf_counter() - t0, 3))
    print(f"batch runs (s): {batch_runs}  alerts={batch_alerts}", flush=True)

    # streaming warmup, identical to bench.py: 2 one-file micro-batches
    import pyarrow.parquet as pq

    warm_dir = tempfile.mkdtemp(prefix="dagger_adj_warm_")
    for i in range(2):
        pq.write_table(
            pq.read_table(bench._sysmon_bench_path()).slice(i * 10_000, 10_000),
            os.path.join(warm_dir, f"part-{i:03d}.parquet"),
        )
    wq = (
        build_alert_stream(
            file_stream_events(
                spark, warm_dir, watermark=None, max_files_per_trigger=1
            ),
            rules,
        )
        .writeStream.foreachBatch(lambda b, i: b.count())
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dagger_adj_wck_")
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()

    stream_runs, stream_alerts_per_run = [], []
    for _ in range(n_runs):
        alerts = {"n": 0}

        def _count(bdf, _bid, alerts=alerts):
            alerts["n"] += bdf.count()

        events = file_stream_events(
            spark,
            stream_dir,
            watermark=None,
            max_files_per_trigger=bench.STREAM_FILES_PER_TRIGGER,
        )
        t0 = time.perf_counter()
        q = (
            build_alert_stream(events, rules)
            .writeStream.foreachBatch(_count)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="dagger_adj_ck_"),
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stream_runs.append(round(time.perf_counter() - t0, 3))
        stream_alerts_per_run.append(alerts["n"])
    print(
        f"stream runs (s): {stream_runs}  alerts={stream_alerts_per_run}",
        flush=True,
    )

    rows = bench.SYSMON_BENCH_ROWS
    out = {
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "n_runs": n_runs,
        "batch_s": batch_runs,
        "stream_s": stream_runs,
        "batch_best_ev_s": round(rows / min(batch_runs)),
        "stream_best_ev_s": round(rows / min(stream_runs)),
        "ratio_best": round(min(batch_runs) / min(stream_runs), 3),
        "ratio_per_run": [
            round(min(batch_runs) / s, 3) for s in stream_runs
        ],
        "alerts_equal": len(
            {batch_alerts, *stream_alerts_per_run}
        ) == 1,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
