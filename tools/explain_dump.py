#!/usr/bin/env python
"""Dump `.explain("formatted")` for named catalog queries to files.

Usage:
    python tools/explain_dump.py SUFFIX [sf_dir] QUERY [QUERY ...]

Writes plans/$PLANS_ROUND (default r14)/<query>_<SUFFIX>.txt at the repo root.  SUFFIX is
typically `before` or `after`.  Uses the bench's session shape
(local[$SPARK_GRAFT_CPUS], split conf) so the captured plan is the plan
the bench actually runs.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from dagger_spark.catalog import QUERIES
    from dagger_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "explain_dump",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    out_dir = os.path.join(ROOT, "plans", os.environ.get("PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
