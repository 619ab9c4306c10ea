#!/usr/bin/env python
"""Lifecycle-cost probe for the incremental IVF+SQ8 index.

Three legs, each against (a) the sf0.1 base index and (b) the 20x
scale-probe corpus's index where corpus size matters:

* APPEND (round-9 ask #6): time ``append_to_sq8_ivf_index`` for the SAME
  fixed 32-vector delta on both indexes.  If append cost is proportional
  to the DELTA (the design claim), the two times are ~equal; a
  corpus-proportional implementation would read ~20x.
* DELETE (round-10 ask #2): time ``delete_from_sq8_ivf_index`` for the
  same 32-vector slice on both indexes — tombstone cost is one delta
  scan + one tiny write (cells recomputed from frozen literals), so it
  too must be flat across the 20x corpus.
* SEQUENTIAL APPENDS + AUTO-COMPACTION (round-10 ask #4): N successive
  deltas into the sf0.1 index with ``auto_compact_max_files=2``,
  recording per-step max files/cell and probe latency — file counts must
  stay bounded and probe latency flat no matter how many deltas arrive.

All mutations go into throwaway COPIES of the built indexes, so the
canonical fingerprinted index dirs are never mutated.  The delta vectors
are base corpus rows re-labeled with fresh ids — guaranteed in-grid for
both corpora (the 20x tiling repeats values verbatim, so both grids are
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
        delete_from_sq8_ivf_index,
        sq8_ivf_topk,
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
        # delete leg: tombstone the just-appended slice (warm plan shapes
        # already built above); cost must be delta-proportional too
        del_vecs = delta.select("vec_id", "embedding")
        t0 = time.perf_counter()
        n_del = delete_from_sq8_ivf_index(spark, scratch, vectors=del_vecs)
        dt_del = time.perf_counter() - t0
        n_corpus = load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        ).count()
        results[label] = {
            "append_s": round(dt, 3),
            "delete_s": round(dt_del, 3),
            "delta_rows": n,
            "deleted_rows": n_del,
            "corpus_rows": n_corpus,
        }
        shutil.rmtree(scratch, ignore_errors=True)
        print(label, results[label], flush=True)

    results["factor_20x_vs_base"] = round(
        results["20x"]["append_s"] / results["sf0.1"]["append_s"], 2
    )
    results["delete_factor_20x_vs_base"] = round(
        results["20x"]["delete_s"] / results["sf0.1"]["delete_s"], 2
    )

    # sequential-append leg: N deltas under auto-compaction — file counts
    # bounded, probe latency flat (the LSM-decay answer, measured)
    idx = build_sq8_ivf_index(spark, BASE)
    scratch = "/tmp/dagger_append_probe_seq"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(idx, scratch)
    sq8_ivf_topk(spark, scratch, k=5, nprobe=2).collect()  # warm probe
    seq = []
    for i in range(8):
        delta = (
            load_table(spark, BASE, "embeddings")
            .filter(
                F.col("embedding").isNotNull()
                & (F.col("vec_id") >= 16)
                & (F.col("vec_id") < 48)
            )
            .select(
                (F.col("vec_id") + 1_000_000 * (i + 1)).alias("vec_id"),
                "embedding",
            )
        )
        t0 = time.perf_counter()
        append_to_sq8_ivf_index(
            spark, scratch, delta, auto_compact_max_files=2
        )
        dt_app = time.perf_counter() - t0
        from dagger_spark.ops.ivf_index import live_cell_file_counts

        worst = max(live_cell_file_counts(scratch).values())
        t0 = time.perf_counter()
        sq8_ivf_topk(spark, scratch, k=5, nprobe=2).collect()
        dt_probe = time.perf_counter() - t0
        seq.append(
            {
                "step": i + 1,
                "append_s": round(dt_app, 3),
                "max_files_per_cell": worst,
                "probe_s": round(dt_probe, 3),
            }
        )
        print(seq[-1], flush=True)
    shutil.rmtree(scratch, ignore_errors=True)
    results["sequential_appends_autocompact"] = seq
    results["seq_max_files_bounded"] = max(
        s["max_files_per_cell"] for s in seq
    )
    results["seq_probe_flat_last_vs_first"] = round(
        seq[-1]["probe_s"] / seq[0]["probe_s"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
