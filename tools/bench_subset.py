#!/usr/bin/env python
"""Spot-bench named catalog queries with bench.py's exact methodology.

Usage:
    python tools/bench_subset.py QUERY [QUERY ...]

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], split conf,
shuffle partitions = cpus), same timing loop (best-of-3 `.collect()`,
clearCache between runs), same stateful-fixture pre-materialization for
entries that read /tmp state.  Prints one JSON line with first/best/spread
per query so a change's effect can be measured without the ~30-min full
suite.  Diagnostic tool only — the committed regression baseline stays
bench_full.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    names = sys.argv[1:]
    from dagger_spark.catalog import QUERIES
    from dagger_spark.session import get_spark

    spark = get_spark(
        "dagger_bench_subset",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", str(1024 * 1024)
            ),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # untimed fixture warmup (same as bench.py): first touch builds any
    # /tmp state the entry reads
    for name in names:
        QUERIES[name].fn(spark, SF_DIR)
        spark.catalog.clearCache()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_subset: {name}")
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            rows = QUERIES[name].fn(spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 3))
            del rows
            spark.catalog.clearCache()
        out[name] = {
            "first": runs[0],
            "best": min(runs),
            "spread": round(max(runs) - min(runs), 3),
        }
        print(f"{name}: best={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
