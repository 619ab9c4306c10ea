#!/usr/bin/env python
"""Scale probe: run representative document-pipeline operators at sf0.1
(5k docs) and at a 20x tiled corpus (100k docs, written with REAL row
groups so Spark's native splits engage and parallelize_narrow no-ops —
i.e. the production layout, not the miniature-fixture path).

Prints per-query wall seconds at both scales and the scaling factor; a
map-heavy operator scaling ~linearly (factor ~<= 20 with parallel slack)
is the evidence the ARCHITECTURE scale claims rest on.  Usage:

    python tools/scale_probe.py [queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TILE = 20
BASE = "/root/testdata/sf0.1"
PROBE_DIR = f"/tmp/dagger_scale_probe_{TILE}x"
DONE_MARKER = "_DONE_v4"


def safe_write_table(table, dst, **kwargs) -> None:
    """Write parquet via a temp file + os.replace, NEVER opening `dst`
    in place.  pq.write_table(dst) opens with O_TRUNC; if `dst` is a
    hard link left over from an older probe-dir version, that truncates
    the shared inode and silently corrupts the canonical table it links
    to (this bit us in round 8: sf0.1/customer.parquet was replaced by
    its own 20x tiling through a stale _DONE_v2 hard link).  os.replace
    swaps in a brand-new inode, so an existing link can never be hit."""
    import pyarrow.parquet as pq

    tmp = dst + ".tmp"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, dst)

DEFAULT_QUERIES = [
    "gopher_quality_docs",
    "quality_classifier_docs",
    "winnowing_docs",
    "exact_dedup_docs",
    "unigram_logprob_docs",
    "text_stats_docs",
    "token_entropy_docs",
    # round-3 continuation wave
    "cdc_chunk_docs",
    "line_scrub_docs",
    "bpe_encode_docs",
    "keywords_per_doc",
    "bigram_logprob_docs",
    "compress_ratio_docs",
]


def build_probe_corpus() -> str:
    """Tile documents 20x with per-tile doc_id offsets and a tile marker
    token appended to text (so the tiled corpus is 20x DISTINCT docs, not
    20 copies — copies would make dedup-family timings meaningless).
    Written with 8k-row row groups: many native splits, production-like.

    Round 7 extends the probe dir to the ops/rank + graph + RRF families:
    events / orders / embeddings tile 20x with per-tile ID-COLUMN offsets
    (event_id; o_orderkey AND o_custkey — so rank-over-customers inputs
    really grow 20x, not just the pre-aggregation scan; vec_id — tile 0
    keeps the originals so the vec_id=0 query vector survives), values
    kept verbatim (fine for ordering: ties resolve on the unique id
    tiebreak, and a 20x-duplicated value still lands in one range
    bucket).  customer tiles on the SAME custkey stride as orders so
    orders->customer joins stay 20x (see comment below); every remaining
    table hard-links from sf0.1 so load_table works for any catalog query
    pointed at the probe dir."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(PROBE_DIR, DONE_MARKER)
    if os.path.exists(done):
        return PROBE_DIR
    # A dir without the CURRENT marker is stale (older version or a
    # half-finished build): wipe it entirely so leftover files — above
    # all leftover HARD LINKS into the canonical testdata — can never
    # survive into a rebuild.
    shutil.rmtree(PROBE_DIR, ignore_errors=True)
    os.makedirs(PROBE_DIR, exist_ok=True)

    base = pq.read_table(os.path.join(BASE, "documents.parquet"))
    n = base.num_rows
    tiles = []
    for t in range(TILE):
        ids = pc.add(base["doc_id"], t * n)
        texts = pc.binary_join_element_wise(
            base["text"].cast(pa.string()), f"tile{t}", " "
        )
        tiles.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": base["lang"],
                    "source": base["source"],
                    "n_chars": pc.add(base["n_chars"], len(f" tile{t}")),
                }
            )
        )
    safe_write_table(
        pa.concat_tables(tiles),
        os.path.join(PROBE_DIR, "documents.parquet"),
        row_group_size=8192,
    )

    # customer tiles WITH orders on a SHARED custkey stride: tiled
    # o_custkey values must land on tiled c_custkey values, otherwise an
    # orders->customer join probe silently drops 19/20 of the tiled rows
    # and measures a 1/20-sized join while appearing to run at 20x.
    orders_tbl = pq.read_table(os.path.join(BASE, "orders.parquet"))
    cust_tbl = pq.read_table(os.path.join(BASE, "customer.parquet"))
    cust_stride = (
        max(
            pc.max(orders_tbl["o_custkey"]).as_py(),
            pc.max(cust_tbl["c_custkey"]).as_py(),
        )
        + 1
    )

    ID_COLS = {
        "events": ["event_id"],
        "orders": ["o_orderkey", "o_custkey"],
        "embeddings": ["vec_id"],
        "customer": ["c_custkey"],
    }
    SHARED_STRIDES = {"o_custkey": cust_stride, "c_custkey": cust_stride}
    for name, id_cols in ID_COLS.items():
        tbl = pq.read_table(os.path.join(BASE, f"{name}.parquet"))
        strides = {
            c: SHARED_STRIDES.get(c, pc.max(tbl[c]).as_py() + 1)
            for c in id_cols
        }
        parts = []
        for t in range(TILE):
            cols = {}
            for f in tbl.schema.names:
                cols[f] = (
                    pc.add(tbl[f], t * strides[f]) if f in id_cols else tbl[f]
                )
            parts.append(pa.table(cols))
        safe_write_table(
            pa.concat_tables(parts),
            os.path.join(PROBE_DIR, f"{name}.parquet"),
            row_group_size=8192,
        )

    # COPIES, not hard links: a link into the canonical testdata is the
    # exact mechanism that corrupted sf0.1/customer.parquet in round 8
    # (any in-place write through the link truncates the shared inode).
    # tests/test_testdata_integrity.py pins nlink==1 on every canonical
    # file, so a reintroduced link fails the suite.
    for name in ("region", "nation", "supplier", "part", "lineitem"):
        dst = os.path.join(PROBE_DIR, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(BASE, f"{name}.parquet"), dst)

    open(done, "w").close()
    return PROBE_DIR


def main() -> None:
    from dagger_spark.catalog import QUERIES
    from dagger_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    probe = build_probe_corpus()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "scale_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    results = {}
    for name in names:
        fn = QUERIES[name].fn
        fn(spark, BASE).collect()  # warm both code paths
        t = time.time()
        n_small = len(fn(spark, BASE).collect())
        t_small = time.time() - t
        fn(spark, probe).collect()
        t = time.time()
        n_big = len(fn(spark, probe).collect())
        t_big = time.time() - t
        results[name] = {
            "sf0.1_s": round(t_small, 2),
            f"{TILE}x_s": round(t_big, 2),
            "factor": round(t_big / t_small, 1) if t_small > 0 else None,
            "rows": [n_small, n_big],
        }
        print(name, results[name], flush=True)
    print(json.dumps({"tile": TILE, "cpus": cpus, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
