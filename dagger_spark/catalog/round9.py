"""Round-9 catalog additions.

Leads with the materialized-index twin of ann_ivf_sq8 (round-8 verdict
ask #4): same results, production query-time plan.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import CatalogQuery, QUERIES, F, SparkSession, DataFrame, register
from .round8 import _ivf_sq8_oracle


@register(
    "ann_ivf_sq8_indexed",
    None,  # oracle attached below: ann_ivf_sq8's composed oracle verbatim
    "ann_ivf_sq8 answered from a MATERIALIZED index — the production "
    "FAISS shape (quantize once, probe many): build_sq8_ivf_index packs "
    "the SQ8 codes + coarse-cell assignment into a cell-PARTITIONED "
    "parquet layout once per corpus (fingerprinted against the source "
    "file, temp-dir + rename write), and the query path reads ONLY the "
    "index: reconstruction is a codegen transform over the packed codes "
    "against grid array-literals — no posexplode, no dim-stats "
    "aggregate, no re-assembly groupBy at query time — and the probed "
    "cells hit the postings scan through the partition column (broadcast "
    "query side -> dynamic partition pruning), so each query batch scans "
    "~nprobe/n_centroids of the corpus.  Results bit-identical to "
    "ann_ivf_sq8 (same grid arithmetic over exact ints + roundtripped "
    "doubles, same deterministic centroids, rounding, tie-breaks) — "
    "pinned by test and by sharing its composed oracle",
)
def ann_ivf_sq8_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.ivf_index import build_sq8_ivf_index, sq8_ivf_topk

    idx = build_sq8_ivf_index(spark, sf_dir, n_centroids=16)
    return sq8_ivf_topk(spark, idx, k=5, nprobe=2, n_queries=8)


QUERIES["ann_ivf_sq8_indexed"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_indexed"].fn,
    _ivf_sq8_oracle(),
    QUERIES["ann_ivf_sq8_indexed"].description,
)
