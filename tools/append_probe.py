#!/usr/bin/env python
"""Append-cost probe for the incremental IVF+SQ8 index (round-9 verdict
ask #6's 'probe row'): time ``append_to_sq8_ivf_index`` for the SAME
fixed 32-vector delta against (a) the sf0.1 base index and (b) the 20x
scale-probe corpus's index.  If append cost is proportional to the DELTA
(the design claim), the two times are ~equal; a corpus-proportional
implementation would read ~20x.

Appends go into throwaway COPIES of the built indexes, so the canonical
fingerprinted index dirs are never mutated.  The delta vectors are base
corpus rows re-labeled with fresh ids — guaranteed in-grid for both
corpora (the 20x tiling repeats values verbatim, so both grids are
identical).  Usage:

    python tools/append_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.scale_probe import BASE, build_probe_corpus  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from dagger_spark.ops.ivf_index import (
        append_to_sq8_ivf_index,
        build_sq8_ivf_index,
    )
    from dagger_spark.session import get_spark
    from dagger_spark.sources.files import load_table

    probe = build_probe_corpus()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "append_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    results = {}
    for label, sf_dir in (("sf0.1", BASE), ("20x", probe)):
        idx = build_sq8_ivf_index(spark, sf_dir)  # untimed; cached per corpus
        scratch = f"/tmp/dagger_append_probe_{label}"
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.copytree(idx, scratch)
        delta = (
            load_table(spark, BASE, "embeddings")
            .filter(
                F.col("embedding").isNotNull()
                & (F.col("vec_id") >= 16)
                & (F.col("vec_id") < 48)
            )
            .select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
            )
        )
        append_to_sq8_ivf_index(  # untimed warm run on a fresh copy
            spark, scratch, delta
        )
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.copytree(idx, scratch)
        t0 = time.perf_counter()
        n = append_to_sq8_ivf_index(spark, scratch, delta)
        dt = time.perf_counter() - t0
        n_corpus = load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        ).count()
        results[label] = {
            "append_s": round(dt, 3),
            "delta_rows": n,
            "corpus_rows": n_corpus,
        }
        shutil.rmtree(scratch, ignore_errors=True)
        print(label, results[label], flush=True)

    results["factor_20x_vs_base"] = round(
        results["20x"]["append_s"] / results["sf0.1"]["append_s"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
