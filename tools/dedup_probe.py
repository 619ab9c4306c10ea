#!/usr/bin/env python
"""Lifecycle-cost probe for the dedup state at rest (round-11 verdict
ask #2 — the measurement ``dedup_append_clusters_docs``'s from-scratch
stand-in could not give, and the dedup twin of tools/append_probe.py).

Legs:

* ADMIT: time ``admit_docs`` for the SAME fixed 40-doc delta against the
  sf0.1 state (5k docs) and against a 20x tiled corpus's state (100k
  docs).  The design claim is cost ∝ delta: the delta is shingled/
  hashed/banded on its own, new edges come from a pushed-down
  ``bucket IN (delta's buckets)`` scan of the bucket-sorted base (row
  groups skip), and only the touched components re-cluster — so the two
  times should be ~flat, not 20x.  (The 20x corpus is 20 verbatim
  clones per doc, so each touched component is ~20x larger — the
  admission's re-cluster leg honestly pays that multiplicity; what must
  NOT appear is a corpus-proportional scan.)
* RETIRE: time ``retire_docs`` for a fixed 40-doc slice on both states —
  one tombstone write + survivor re-clustering of the affected
  components.
* STACKED ADMISSIONS + COMPACTION: N successive deltas into the sf0.1
  state, recording per-step admit time and the ``state_clusters`` read
  latency (base + growing override set), then one ``compact_dedup_state``
  and the read latency after the fold — read cost must stay bounded and
  compaction must restore the single-base layout.

All mutations run against throwaway COPIES of the built states; the
canonical fingerprinted dirs are never mutated.  Usage:

    python tools/dedup_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/root/testdata/sf0.1"
TILE = 20
PROBE_DIR = f"/tmp/dagger_dedup_probe_{TILE}x"
DONE = "_DONE_v1"


def build_probe_docs() -> str:
    """documents.parquet tiled TILE times with disjoint id ranges (texts
    verbatim — both corpora shingle identically), written with real row
    groups so splits engage."""
    import pyarrow.parquet as pq

    os.makedirs(PROBE_DIR, exist_ok=True)
    marker = os.path.join(PROBE_DIR, DONE)
    dst = os.path.join(PROBE_DIR, "documents.parquet")
    if os.path.exists(marker):
        return PROBE_DIR
    import pyarrow as pa

    t = pq.read_table(os.path.join(BASE, "documents.parquet"))
    tiles = []
    for i in range(TILE):
        tt = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pa.compute.add(t["doc_id"], i * 10_000_000),
        )
        tiles.append(tt)
    tiled = pa.concat_tables(tiles)
    # temp + os.replace, never opening dst in place (scale_probe lesson:
    # O_TRUNC through a stale hard link corrupts the canonical table)
    tmp = dst + ".tmp"
    pq.write_table(tiled, tmp, row_group_size=20_000)
    os.replace(tmp, dst)
    open(marker, "w").close()
    return PROBE_DIR


def main() -> None:
    from pyspark.sql import functions as F

    from dagger_spark.ops.dedup_state import (
        admit_docs,
        build_dedup_state,
        compact_dedup_state,
        retire_docs,
        state_clusters,
    )
    from dagger_spark.session import get_spark
    from dagger_spark.sources.files import load_table

    probe = build_probe_docs()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "dedup_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    docs_base = load_table(spark, BASE, "documents")
    delta = docs_base.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
    ).select((F.col("doc_id") + 500_000_000).alias("doc_id"), "text")
    retire_slice = (
        docs_base.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 240))
        .select("doc_id")
    )

    results = {}
    for label, sf_dir in (("sf0.1", BASE), (f"{TILE}x", probe)):
        built = build_dedup_state(spark, sf_dir)  # untimed; cached
        scratch = f"/tmp/dagger_dedup_probe_state_{label}"
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.copytree(built, scratch)
        admit_docs(spark, scratch, delta)  # untimed warm run, fresh copy
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.copytree(built, scratch)
        t0 = time.perf_counter()
        stats = admit_docs(spark, scratch, delta)
        dt_admit = time.perf_counter() - t0
        t0 = time.perf_counter()
        rstats = retire_docs(spark, scratch, retire_slice)
        dt_retire = time.perf_counter() - t0
        n_corpus = load_table(spark, sf_dir, "documents").count()
        results[label] = {
            "admit_s": round(dt_admit, 3),
            "retire_s": round(dt_retire, 3),
            "admitted": stats["admitted"],
            "new_pairs": stats["new_pairs"],
            "affected_components_admit": stats["affected_components"],
            "affected_components_retire": rstats["affected_components"],
            "corpus_docs": n_corpus,
        }
        shutil.rmtree(scratch, ignore_errors=True)
        print(label, results[label], flush=True)

    results["admit_factor_20x_vs_base"] = round(
        results[f"{TILE}x"]["admit_s"] / results["sf0.1"]["admit_s"], 2
    )
    results["retire_factor_20x_vs_base"] = round(
        results[f"{TILE}x"]["retire_s"] / results["sf0.1"]["retire_s"], 2
    )

    # stacked admissions + compaction: read latency bounded
    built = build_dedup_state(spark, BASE)
    scratch = "/tmp/dagger_dedup_probe_state_seq"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(built, scratch)
    state_clusters(spark, scratch).count()  # warm read
    seq = []
    for i in range(5):
        d_i = docs_base.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
        ).select(
            (F.col("doc_id") + 1_000_000 * (i + 1)).alias("doc_id"), "text"
        )
        t0 = time.perf_counter()
        admit_docs(spark, scratch, d_i)
        dt_adm = time.perf_counter() - t0
        t0 = time.perf_counter()
        state_clusters(spark, scratch).count()
        dt_read = time.perf_counter() - t0
        seq.append({
            "step": i + 1,
            "admit_s": round(dt_adm, 3),
            "read_s": round(dt_read, 3),
        })
        print(seq[-1], flush=True)
    t0 = time.perf_counter()
    compact_dedup_state(spark, scratch)
    dt_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    state_clusters(spark, scratch).count()
    dt_read_after = time.perf_counter() - t0
    shutil.rmtree(scratch, ignore_errors=True)
    results["stacked_admissions"] = seq
    results["compact_s"] = round(dt_c, 3)
    results["read_after_compact_s"] = round(dt_read_after, 3)
    results["read_flat_last_vs_first"] = round(
        seq[-1]["read_s"] / seq[0]["read_s"], 2
    )

    # AUTO-compaction leg (round-12 verdict ask #2, the dedup twin of
    # append_probe's sequential leg): N admissions with
    # auto_compact_max_files=2 and NO manual compact — manifest file
    # counts must stay bounded and the maintained read flat
    from dagger_spark.ops.dedup_state import _read_manifest

    scratch = "/tmp/dagger_dedup_probe_state_auto"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(built, scratch)
    state_clusters(spark, scratch).count()  # warm read
    auto_seq = []
    for i in range(8):
        d_i = docs_base.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
        ).select(
            (F.col("doc_id") + 2_000_000 * (i + 1)).alias("doc_id"), "text"
        )
        t0 = time.perf_counter()
        admit_docs(spark, scratch, d_i, auto_compact_max_files=2)
        dt_adm = time.perf_counter() - t0
        m = _read_manifest(scratch)
        worst = max(
            len(m["buckets"]), len(m["pairs"]),
            len(m["cluster_overrides"]), len(m["retired"]),
        )
        t0 = time.perf_counter()
        state_clusters(spark, scratch).count()
        dt_read = time.perf_counter() - t0
        auto_seq.append({
            "step": i + 1,
            "admit_s": round(dt_adm, 3),
            "max_manifest_files": worst,
            "read_s": round(dt_read, 3),
        })
        print(auto_seq[-1], flush=True)
    shutil.rmtree(scratch, ignore_errors=True)
    results["auto_compact_admissions"] = auto_seq
    results["auto_max_manifest_files"] = max(
        s["max_manifest_files"] for s in auto_seq
    )
    results["auto_read_flat_last_vs_first"] = round(
        auto_seq[-1]["read_s"] / auto_seq[0]["read_s"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
