"""Materialized IVF+SQ8 index: quantize once, probe many.

``ann_ivf_sq8`` (catalog/round8.py) re-derives the whole quantization
inside every query — posexplode the corpus, dim-stats aggregate,
re-assembly groupBy — which is the right *definition* but the wrong
*production shape*: FAISS-style deployments build the index once and
amortize it over every query batch.  This module materializes that
layout (reference parity target: the Dagger reference has no ANN surface
at all — this is part of the LLM-pipeline extension surface):

* ``build_sq8_ivf_index`` writes, once per corpus:
    - ``postings/cell=N/*.parquet`` — one row per vector (vec_id,
      codes array<int>, label), PARTITIONED BY coarse cell.  The
      partition-by-cell layout IS the inverted file: a probe of
      nprobe/n_centroids cells scans only that fraction of the corpus,
      enforced by Spark partition pruning rather than a post-scan filter.
    - ``grid.parquet`` — the per-dimension (j, mn, mx) SQ8 grid.
    - ``centroids.parquet`` — the coarse quantizer's (cid, vector) rows,
      vectors already SQ8-reconstructed so query-time assignment matches
      ``ann_ivf_sq8`` bit-for-bit.
  The index dir name carries a fingerprint (size + mtime) of the source
  embeddings parquet, so a changed corpus can never serve a stale index;
  the build goes to a temp dir + ``os.rename``.

* ``sq8_ivf_topk`` answers top-k from the index alone: reconstruction is
  a pure ``transform`` projection over the packed codes against the grid
  shipped as two array literals — NO posexplode, NO aggregate, NO
  re-assembly on the query path.  Probed cells reach the postings scan as
  a partition-column join key (broadcast query side → dynamic partition
  pruning does the cell pruning a hand-built inverted file would).

Lifecycle protocol (round-12 verdict ask #1 — the versioned-manifest
pointer discipline ``ops/dedup_state.py`` proved, via ``ops/manifest``):
every mutation — ``append_to_sq8_ivf_index``,
``delete_from_sq8_ivf_index``, ``compact_sq8_ivf_index``,
``split_hot_cells`` — writes ONLY new immutable files, then publishes a
new ``manifest_vN.json`` and swings the ``_CURRENT`` pointer atomically.
The manifest owns the data: a FILE-LEVEL postings list ([relpath, cell]
pairs), the tombstone file list, the cell-split tree, and NAMED
per-stream ingest watermarks.  Consequences:

* **Exactly-once streaming ingest** (closing the round-12 documented
  one-rename crash window): a micro-batch's postings files and its
  batch-id watermark commit in the SAME pointer swing
  (``append_batch_exactly_once``) — either both are live or neither is.
  A crash mid-append leaves unreferenced orphan files (swept by the next
  compaction's GC) and an unchanged manifest; the replayed batch simply
  applies again.
* **Readers are never blocked and never torn**: every read resolves the
  file list through one manifest version; compaction publishes new files
  and keeps the previous version's files for ONE more cycle
  (vacuum-retention, the dedup-state discipline) so in-flight lazy reads
  finish.
* **Partition pruning survives**: the postings read hands Spark the
  manifest's file list under a single ``basePath``, so the ``cell``
  partition column, static partition pruning, AND dynamic partition
  pruning all work exactly as a directory-discovery read (pinned by
  tests/test_ivf_index.py).

Writer model: mutations take the index dir's single-writer lease
(``ops/lease.py``: lockfile + heartbeat + stale takeover) for their full
duration — concurrent writers serialize or are refused, never
interleaved.  ``build_sq8_ivf_index`` needs no lease: it builds in a
private tmp dir and publishes with a rename whose losing racer verifies
the winner's ``_BUILT`` marker and discards itself.

Hot-cell splits (round-12 verdict ask #6): at 100 TB a skewed coarse
cell is one straggler partition per probe.  ``split_hot_cells`` rewrites
an oversized cell's rows under k child cells (deterministic maximin
sub-centroids over the reconstructed vectors; the SQ8 grid and the
top-level quantizer stay FROZEN) and records the split tree in the
manifest.  Appends descend the tree when assigning; probes expand a
probed parent to ALL its leaf descendants — so results are IDENTICAL to
the unsplit index while the probe reads k balanced partitions instead
of one hot one.  ``ivf_cell_size_report`` is the gauge that finds such
cells (the postings twin of ``key_skew_report_events``).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lease import writer_lease
from .manifest import (
    merged_watermarks,
    publish_manifest,
    read_manifest,
    stream_watermark,
)
from .similarity import (
    _cell_of_from_centroids,
    _centroid_literals,
    cosine_from_norms,
    lit_double_array,
    norm,
    sq8_quantize,
)

INDEX_ROOT = "/tmp/dagger_sq8_ivf"
# layout version: v2 added the label payload column; v3 moved the whole
# lifecycle onto the versioned-manifest pointer protocol (file-level
# postings list, manifest-owned tombstones/watermarks/splits).  Bumped so
# cached dirs from an older layout can never serve a reader expecting the
# new one.
_LAYOUT = "v3"

_POSTINGS_SCHEMA = "vec_id bigint, codes array<int>, label int, cell int"


def _source_fingerprint(path: str) -> str:
    st = os.stat(path)
    # nanosecond mtime: a same-size rewrite within the same wall-clock
    # second (int(st_mtime) granularity) must still change the fingerprint
    return f"{st.st_size}_{st.st_mtime_ns}"


def index_dir_for(sf_dir: str, n_centroids: int) -> str:
    src = os.path.join(sf_dir, "embeddings.parquet")
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        INDEX_ROOT,
        f"{base}_c{n_centroids}_{_LAYOUT}_{_source_fingerprint(src)}",
    )


def _packed(sq: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """(vec_id, out_col): per-vector array of ``value_col`` in dimension
    order — the same array_sort(collect_list(struct)) re-assembly
    ann_ivf_sq8 uses, run ONCE at build time."""
    return sq.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", value_col))),
            lambda x: x[value_col],
        ).alias(out_col)
    )


# ---------------------------------------------------------------------------
# staging: write a partitioned delta, move its files under postings/
# ---------------------------------------------------------------------------


def _stage_and_move(df: DataFrame, index_dir: str, n_parts: int = 1) -> list:
    """Write ``df`` (must carry a ``cell`` column) to a private staging
    dir partitioned by cell, then MOVE each parquet file under
    ``postings/cell=N/`` with a unique name.  Returns the new
    [relpath, cell] manifest entries.  Files are invisible to every
    reader until a manifest referencing them is published — a crash
    mid-move leaves unreferenced orphans for compaction GC, never a torn
    read."""
    tag = uuid.uuid4().hex[:12]
    stage = os.path.join(index_dir, ".stage", tag)
    (df.repartition(n_parts, F.col("cell")) if n_parts > 1 else df.coalesce(1)
     ).write.partitionBy("cell").parquet(stage)
    entries = []
    for d in sorted(os.listdir(stage)):
        if not d.startswith("cell="):
            continue
        cell = int(d.split("=", 1)[1])
        dst_dir = os.path.join(index_dir, "postings", d)
        os.makedirs(dst_dir, exist_ok=True)
        for i, fn in enumerate(sorted(os.listdir(os.path.join(stage, d)))):
            if not fn.endswith(".parquet"):
                continue
            name = f"{tag}-{i:03d}.parquet"
            os.rename(os.path.join(stage, d, fn), os.path.join(dst_dir, name))
            entries.append([f"postings/{d}/{name}", cell])
    shutil.rmtree(stage, ignore_errors=True)
    return entries


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_sq8_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = 16,
    corpus: DataFrame = None,
    tag: str = "",
) -> str:
    """Build (or reuse) the materialized index for ``sf_dir``'s embeddings
    corpus.  Returns the index directory.

    ``corpus`` overrides the default full-table scan (the incremental-append
    path builds its base index from a subset); ``tag`` suffixes the index
    dir so a subset build can never shadow the canonical full index."""
    from ..sources.files import load_table

    idx = index_dir_for(sf_dir, n_centroids) + (f"_{tag}" if tag else "")
    if os.path.exists(os.path.join(idx, "_BUILT")):
        return idx

    emb = corpus if corpus is not None else load_table(spark, sf_dir, "embeddings")
    sq = sq8_quantize(emb)

    tmp = f"{idx}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    # per-dimension grid: dim rows, tiny — single file
    grid = sq.groupBy("j").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    grid.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "grid.parquet")
    )

    # reconstructed corpus (build-time only — this groupBy is exactly what
    # the indexed query path no longer pays)
    recon = _packed(sq, "recon", "embedding")
    cell_of = _centroid_literals(recon, n_centroids, "vec_id", "embedding")

    # coarse quantizer rows, reconstructed — n_centroids rows, tiny
    recon.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("vector")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "centroids.parquet")
    )

    codes = _packed(sq, "code", "codes").select(
        "vec_id", F.col("codes").cast("array<int>").alias("codes")
    )
    # metadata payload: postings carry the label column (null when the
    # source has none) so FILTERED search answers from the index alone —
    # the schema is uniform across build and append files either way
    if "label" in emb.columns:
        labels = emb.select("vec_id", F.col("label").cast("int").alias("label"))
    else:
        labels = emb.select("vec_id", F.lit(None).cast("int").alias("label"))
    assigned = codes.join(recon, "vec_id").join(labels, "vec_id", "left").select(
        "vec_id",
        "codes",
        "label",
        cell_of(
            F.col("embedding"), norm(F.col("embedding")), 1
        )[0]["c"].cast("int").alias("cell"),
    )
    assigned.write.partitionBy("cell").parquet(os.path.join(tmp, "postings"))
    entries = []
    post = os.path.join(tmp, "postings")
    for d in sorted(os.listdir(post)):
        if not d.startswith("cell="):
            continue
        cell = int(d.split("=", 1)[1])
        for fn in sorted(os.listdir(os.path.join(post, d))):
            if fn.endswith(".parquet"):
                entries.append([f"postings/{d}/{fn}", cell])

    publish_manifest(tmp, {
        "version": 1,
        "seq": 0,
        "postings": entries,
        "tombstones": [],
        "splits": [],
        "next_cell": n_centroids,
        "watermarks": {},
    })
    open(os.path.join(tmp, "_BUILT"), "w").close()
    try:
        os.rename(tmp, idx)
    except OSError:
        # The only benign cause is losing the publish race (another
        # process renamed its complete build first) — verify that before
        # discarding ours.  EXDEV/EACCES/partial leftovers would otherwise
        # silently return a missing or invalid index dir.
        if not os.path.exists(os.path.join(idx, "_BUILT")):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return idx


# ---------------------------------------------------------------------------
# manifest-resolved readers
# ---------------------------------------------------------------------------


def _read_postings(spark: SparkSession, index_dir: str, m: dict) -> DataFrame:
    """All manifest-referenced postings rows (tombstones NOT yet masked).
    One FileScan over the manifest's file list with ``postings/`` as the
    basePath — the ``cell`` partition column, static partition pruning,
    and dynamic partition pruning all behave exactly as a directory read,
    while unreferenced files (crash orphans, one-cycle-retained
    pre-compaction files) are invisible by construction."""
    files = [os.path.join(index_dir, p) for p, _c in m["postings"]]
    if not files:
        return spark.createDataFrame([], _POSTINGS_SCHEMA)
    return spark.read.option(
        "basePath", os.path.join(index_dir, "postings")
    ).parquet(*files)


def _tombstones(spark: SparkSession, index_dir: str, m: dict):
    """The index's pending-delete set as a DataFrame (vec_id, cell), or
    None when empty — resolved through the manifest's file list."""
    if not m["tombstones"]:
        return None
    return spark.read.parquet(
        *[os.path.join(index_dir, p) for p in m["tombstones"]]
    )


def live_postings(
    spark: SparkSession, index_dir: str, m: dict = None
) -> DataFrame:
    """(vec_id, codes, label, cell) — the index's LIVE rows: manifest
    postings anti-join tombstones.  The tombstone side is delete-delta-
    sized (compaction drains it), so the anti-join broadcasts."""
    if m is None:
        m = read_manifest(index_dir)
    post = _read_postings(spark, index_dir, m)
    tomb = _tombstones(spark, index_dir, m)
    if tomb is not None:
        post = post.join(
            F.broadcast(tomb.select("vec_id")), "vec_id", "left_anti"
        )
    return post


def live_cell_file_counts(index_dir: str, m: dict = None) -> dict:
    """{cell: live file count} straight from the manifest — bounded
    metadata, no directory listing (the auto-compaction trigger and the
    probes read this)."""
    if m is None:
        m = read_manifest(index_dir)
    counts: dict = {}
    for _p, c in m["postings"]:
        counts[c] = counts.get(c, 0) + 1
    return counts


def _splits(m: dict) -> dict:
    """{parent_cell: [(child_cell, centroid_vector), ...]} from the
    manifest's split tree (bounded: splits are rare, hot-cell-sized)."""
    return {
        int(parent): [(int(c), list(v)) for c, v in children]
        for parent, children in m.get("splits") or []
    }


def _leaf_map(m: dict) -> dict:
    """{split cell: [leaf descendant cells]} — the probe-side expansion
    (a probed parent reads ALL its leaves: identical candidate set,
    balanced partitions)."""
    sp = _splits(m)

    def leaves(c: int) -> list:
        if c not in sp:
            return [c]
        out = []
        for child, _v in sp[c]:
            out.extend(leaves(child))
        return out

    return {p: leaves(p) for p in sp}


def _leaf_assign(recon: Column, rnorm: Column, top_cell: Column, sp: dict):
    """Descend the split tree: a vector assigned to a split parent is
    re-assigned to its nearest child (same cosine/tie arithmetic as the
    top-level quantizer), repeated until it lands on a leaf.  Bounded
    expression: one descend step per split generation."""
    expr = top_cell
    for _ in range(len(sp)):
        branches = None
        for parent, children in sorted(sp.items()):
            child = _cell_of_from_centroids(children)(recon, rnorm, 1)[0][
                "c"
            ].cast("int")
            branches = (
                F.when(expr == parent, child)
                if branches is None
                else branches.when(expr == parent, child)
            )
        expr = branches.otherwise(expr)
    return expr


def _grid_literals(spark: SparkSession, idx: str) -> tuple:
    """(mn_arr, mx_arr, dim) — the frozen per-dimension grid as two array
    literals plus its dimensionality (the staleness gate needs the length:
    a delta vector of the WRONG length must count as out-of-grid, not slip
    past NULL element_at lookups — advice r10)."""
    rows = sorted(
        (r["j"], r["mn"], r["mx"])
        for r in spark.read.parquet(os.path.join(idx, "grid.parquet")).collect()
    )  # bounded: one row per embedding dimension
    # one-py4j-call literals (similarity.lit_double_array): the element-wise
    # F.lit(list) path cost a driver round trip per grid cell
    mn_arr = lit_double_array([r[1] for r in rows])
    mx_arr = lit_double_array([r[2] for r in rows])
    return mn_arr, mx_arr, len(rows)


def _centroids(spark: SparkSession, index_dir: str) -> list:
    return [
        (r["cid"], list(r["vector"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids.parquet")
        ).collect()
    ]  # bounded: n_centroids rows


def _recon_expr(codes: Column, mn_arr: Column, mx_arr: Column) -> Column:
    """SQ8 reconstruction as a pure projection: the identical
    ``mn + code * (mx - mn) / 255.0`` tree sq8_quantize/ann_ivf_sq8 use,
    so doubles (and therefore scores) are bit-equal to the unindexed
    query."""

    def one(c: Column, i: Column) -> Column:
        mn = F.element_at(mn_arr, i + 1)
        mx = F.element_at(mx_arr, i + 1)
        return mn + c * (mx - mn) / F.lit(255.0)

    return F.transform(codes, one)


# ---------------------------------------------------------------------------
# probe
# ---------------------------------------------------------------------------


def sq8_ivf_topk(
    spark: SparkSession,
    index_dir: str,
    k: int = 5,
    nprobe: int = 2,
    n_queries: int = 8,
    filter_same_label: bool = False,
) -> DataFrame:
    """Top-k retrieval from the materialized index: grid + centroids ride
    as plan-time literals (dim- and n_centroids-sized bounded collects),
    reconstruction is a codegen projection, and the candidate scan is
    pruned to the probed cells via the partition column.

    Tombstoned vectors disappear both as neighbors AND as queries —
    results equal an index over the reduced corpus with the same frozen
    grid/centroids.  Probed cells that were SPLIT expand to all their
    leaf descendants (identical candidates, balanced partitions).

    ``filter_same_label`` answers the metadata-FILTERED search from the
    index alone: postings carry a label payload column, and the predicate
    (candidate label == query label, PRE-filter semantics) fuses into the
    broadcast join condition beside the cell key — after partition
    pruning the label filter is a row filter inside the probed cells; at
    100 TB parquet row-group min/max stats on the payload column prune
    within cells too.  Output gains the ``label`` column.
    """
    m = read_manifest(index_dir)
    mn_arr, mx_arr, _ = _grid_literals(spark, index_dir)
    cell_of = _cell_of_from_centroids(_centroids(spark, index_dir))

    post = live_postings(spark, index_dir, m)
    corpus = post.select(
        F.col("vec_id").alias("neighbor_id"),
        _recon_expr(F.col("codes"), mn_arr, mx_arr).alias("cvec"),
        "cell",
        *(["label"] if filter_same_label else []),
    ).withColumn("__cn", norm(F.col("cvec")))

    q_recon = post.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _recon_expr(F.col("codes"), mn_arr, mx_arr).alias("qvec"),
        *([F.col("label").alias("__qlabel")] if filter_same_label else []),
    ).withColumn("__qn", norm(F.col("qvec")))
    q = q_recon.select(
        "query_id",
        "qvec",
        "__qn",
        *(["__qlabel"] if filter_same_label else []),
        F.explode(
            F.transform(
                cell_of(F.col("qvec"), F.col("__qn"), nprobe),
                lambda e: e["c"].cast("int"),
            )
        ).alias("cell"),
    )
    lm = _leaf_map(m)
    if lm:
        # expand probed split parents to their leaves: a bounded map
        # literal (split cells only); unsplit cells pass through
        keys = sorted(lm)
        expand = F.map_from_arrays(
            F.lit(keys).cast("array<int>"),
            F.lit([lm[c] for c in keys]).cast("array<array<int>>"),
        )
        q = q.withColumn(
            "cell",
            F.explode(
                F.coalesce(
                    F.element_at(expand, F.col("cell")),
                    F.array(F.col("cell")),
                )
            ),
        )

    joined = corpus.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if filter_same_label:
        joined = joined.filter(F.col("label") == F.col("__qlabel"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        *(["label"] if filter_same_label else []),
        F.round(
            cosine_from_norms(
                F.col("qvec"), F.col("cvec"), F.col("__qn"), F.col("__cn")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_cell_size_report(spark: SparkSession, index_dir: str) -> DataFrame:
    """(cell, n_vectors, frac) — live postings row count per physical
    cell, the skew gauge that finds the hot cells ``split_hot_cells``
    rebalances (the postings twin of ``key_skew_report_events``: at
    100 TB one oversized cell = one straggler partition per probe).
    One partial-aggregated scan; output is n_cells rows."""
    live = live_postings(spark, index_dir)
    counts = live.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = F.sum("n_vectors").over(Window.partitionBy())
    return counts.select(
        F.col("cell").cast("int").alias("cell"),
        "n_vectors",
        F.round(F.col("n_vectors") / total + F.lit(1e-9), 6).alias("frac"),
    ).orderBy("cell")


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


def _code_expr(vec: Column, mn_arr: Column, mx_arr: Column) -> Column:
    """SQ8 encoding as a pure projection against a FROZEN grid: the
    identical ``round((v - mn) * 255 / (mx - mn))`` tree sq8_quantize uses
    (constant dims -> code 0), so codes for in-grid vectors are bit-equal
    to a full rebuild's."""

    def one(v: Column, i: Column) -> Column:
        mn = F.element_at(mn_arr, i + 1)
        mx = F.element_at(mx_arr, i + 1)
        span = mx - mn
        return (
            F.when(span == F.lit(0.0), F.lit(0))
            .otherwise(F.round((v - mn) * F.lit(255.0) / span, 0))
            .cast("int")
        )

    return F.transform(vec, one)


def _oob_expr(mn_arr: Column, mx_arr: Column, dim: int) -> Column:
    """Out-of-grid predicate over a column ``v`` (array<double>): true when
    any dimension falls outside the frozen [mn, mx] grid, the length is
    wrong, or an element is NULL (advice r10: a longer vector made
    element_at NULL, the predicate NULL, and a bare filter silently passed
    it — hence the size check and the coalesce-to-true)."""
    return (F.size(F.col("v")) != F.lit(dim)) | F.exists(
        F.zip_with(
            F.col("v"),
            F.sequence(F.lit(1), F.size(F.col("v"))),
            lambda x, i: F.coalesce(
                (x < F.element_at(mn_arr, i.cast("int")))
                | (x > F.element_at(mx_arr, i.cast("int"))),
                F.lit(True),
            ),
        ),
        lambda b: b,
    )


def split_in_grid(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple:
    """Split a delta into (appendable, rejected_with_reason) against the
    index's frozen grid and live tombstones — the streaming-ingest
    pre-gate (streaming/ann_ingest.py): ``append_to_sq8_ivf_index``
    refuses a whole batch on the first violation, which is right for a
    transactional caller but wrong for a stream, where refusals must
    become DEAD-LETTER rows instead of a stuck query.  Rejected rows keep
    the original id/vector plus a ``reject_reason`` column
    ('out_of_grid' | 'tombstoned_id' | 'null_id').  Both frames are
    delta-sized."""
    m = read_manifest(index_dir)
    mn_arr, mx_arr, dim = _grid_literals(spark, index_dir)
    vecs = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *(["label"] if "label" in vectors.columns else []),
    )
    # coalesce-to-true: a NULL embedding makes the oob predicate NULL
    # (size(NULL) is NULL under ANSI), and a bare filter would drop the
    # row from BOTH splits — silently vanishing instead of dead-lettering
    # (review r12).  NULL vector => out_of_grid.
    oob = F.coalesce(_oob_expr(mn_arr, mx_arr, dim), F.lit(True))
    # NULL id (advice r12): a NULL vec_id made the isin-tombstone gate
    # NULL and the row vanished from both splits (or, with no tombstones,
    # appended a NULL-id row).  A row with no id is a reject in its own
    # right — gate it FIRST, with its own reason.
    null_id = F.col("vec_id").isNull()
    tomb = _tombstones(spark, index_dir, m)
    tombed = (
        F.lit(False)
        if tomb is None
        else F.coalesce(
            F.col("vec_id").isin(
                [int(r["vec_id"]) for r in tomb.select("vec_id").distinct().collect()]
            ),  # bounded: the delete delta between compactions
            F.lit(False),
        )
    )
    ok = vecs.filter(~null_id & ~oob & ~tombed).withColumnRenamed("v", vec_col)
    bad = vecs.filter(null_id | oob | tombed).select(
        "vec_id",
        F.col("v").alias(vec_col),
        F.when(null_id, F.lit("null_id"))
        .when(oob, F.lit("out_of_grid"))
        .otherwise(F.lit("tombstoned_id"))
        .alias("reject_reason"),
    )
    if id_col != "vec_id":
        ok = ok.withColumnRenamed("vec_id", id_col)
        bad = bad.withColumnRenamed("vec_id", id_col)
    return ok, bad


# ---------------------------------------------------------------------------
# append
# ---------------------------------------------------------------------------


def append_to_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact_max_files: int = None,
    expect_seq: int = None,
) -> int:
    """Incrementally append vectors to a BUILT index — the 100 TB common
    case (new corpus slice arrives -> assign -> quantize -> append its
    cells' postings files), vs the rebuild-only path that re-quantizes
    the whole corpus.

    The grid and centroids are FROZEN: new vectors are SQ8-encoded against
    the existing per-dimension grid and assigned to the existing coarse
    cells (descending the split tree where cells were split), so query
    results after append are IDENTICAL to a full rebuild *provided the
    frozen grid still covers the new vectors* (per-dim min/max unchanged)
    and the centroid ids were in the base corpus — the grid-staleness
    bound.  Out-of-grid vectors would silently clamp-distort codes, so the
    function REFUSES them (raises ValueError with the violating count);
    the caller's signal to rebuild.

    Cost is proportional to the DELTA, not the corpus: one scan of
    ``new_vectors`` (grid/centroids ride as plan-time literals), one
    staged partitioned write, one manifest publish.  Returns the number
    of vectors appended.

    ``auto_compact_max_files`` (opt-in) wires the LSM decay answer into the
    write path: after the append, if any TOUCHED cell's live file count
    (read from the manifest — bounded metadata) exceeds the threshold,
    ``compact_sq8_ivf_index`` runs with that threshold — which itself
    rewrites only over-threshold cells, so steady-state append cost stays
    delta-proportional while file counts (and therefore probe open/footer
    cost) stay bounded no matter how many deltas arrive
    (tools/append_probe.py measures exactly this).

    Id reuse after delete (advice r11): an appended id that still carries a
    live tombstone is REFUSED (ValueError) — the tombstone masks by vec_id,
    so clearing it would resurrect the old, not-yet-compacted postings row
    beside the new one, and dropping it would hide the new row until the
    next rewrite; either way visibility would depend on incidental
    fragmentation.  The deterministic upsert sequence is delete -> compact
    (drains tombstones, physically drops the old row) -> append.

    ``expect_seq`` (opt-in compare-and-swap): refuse with ValueError if
    the manifest's op sequence moved past the caller's read — the O(1)
    lease-held guard for apply-once-per-state callers (two processes
    racing the same one-time append both observe seq 0; the loser's CAS
    fails instead of silently appending duplicate rows — advice r12's
    suite-vs-bench contention shape).
    """
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        return _append_locked(
            spark, index_dir, new_vectors, id_col, vec_col,
            auto_compact_max_files, None, "ingest", expect_seq,
        )["appended"]


def append_batch_exactly_once(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    batch_id: int,
    stream: str = "ingest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact_max_files: int = None,
) -> dict:
    """The streaming-ingest append (round-12 verdict ask #1): the
    micro-batch's postings files and its batch-id watermark commit in ONE
    manifest pointer swing — EXACTLY-ONCE under at-least-once replay,
    with no crash window between "data live" and "batch recorded" (the
    v2 layout's two-rename gap).  A replayed batch (id <= the recorded
    watermark for this named ``stream``) is skipped with
    {skipped: True}; an empty-but-watermarked batch still publishes so
    its replay is recognized.  Returns {appended, version, skipped}."""
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        return _append_locked(
            spark, index_dir, new_vectors, id_col, vec_col,
            auto_compact_max_files, batch_id, stream, None,
        )


def _append_locked(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    auto_compact_max_files: int,
    batch_id: int,
    stream: str,
    expect_seq: int,
) -> dict:
    m = read_manifest(index_dir)
    last_bid = stream_watermark(m, stream)
    if batch_id is not None and last_bid is not None and batch_id <= last_bid:
        return {"appended": 0, "version": m["version"], "skipped": True}
    if expect_seq is not None and m["seq"] != expect_seq:
        raise ValueError(
            f"manifest seq moved ({m['seq']} != expected {expect_seq}) — "
            "another writer applied a mutation since the caller's read "
            "(compare-and-swap refused; re-read the manifest)"
        )

    mn_arr, mx_arr, dim = _grid_literals(spark, index_dir)
    cell_of = _cell_of_from_centroids(_centroids(spark, index_dir))
    sp = _splits(m)

    label_col = (
        F.col("label").cast("int")
        if "label" in new_vectors.columns
        else F.lit(None).cast("int")
    )
    vecs = new_vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        label_col.alias("label"),
    )
    # grid-staleness gate: every dimension of every new vector must lie in
    # [mn, mx] (one delta-sized scan; the grid rides as literals) —
    # wrong-length and NULL-element vectors are out-of-grid by definition
    # (see _oob_expr)
    oob = _oob_expr(mn_arr, mx_arr, dim)
    n_oob = vecs.filter(oob).count()
    if n_oob:
        raise ValueError(
            f"{n_oob} new vector(s) fall outside the frozen SQ8 grid — "
            "appending would distort their codes; rebuild the index "
            "(grid-staleness bound, see module docstring)"
        )

    # id-reuse gate (advice r11): an id with a LIVE tombstone is refused.
    # Clearing the tombstone instead would resurrect the old postings row
    # (physically present until compaction) alongside the new one, so
    # visibility would depend on incidental fragmentation.  Deterministic
    # contract: delete -> compact (drains tombstones) -> re-append.
    tomb = _tombstones(spark, index_dir, m)
    if tomb is not None:
        n_reuse = vecs.join(
            F.broadcast(tomb.select("vec_id").distinct()), "vec_id"
        ).count()
        if n_reuse:
            raise ValueError(
                f"{n_reuse} appended id(s) carry a live tombstone — id "
                "reuse before compaction would make the row's visibility "
                "depend on fragmentation; run compact_sq8_ivf_index first "
                "(drains tombstones), then re-append"
            )

    staged = vecs.select(
        "vec_id",
        _code_expr(F.col("v"), mn_arr, mx_arr).alias("codes"),
        "label",
    )
    # assignment must match the build bit-for-bit: cells are chosen on the
    # RECONSTRUCTED vector (the build assigns on recon), then descend any
    # split tree to a leaf — post-split appends land beside the rows the
    # split rewrote
    recon = _recon_expr(F.col("codes"), mn_arr, mx_arr)
    assigned = staged.select(
        "vec_id",
        "codes",
        "label",
        cell_of(recon, norm(recon), 1)[0]["c"].cast("int").alias("__top"),
        recon.alias("__recon"),
    )
    leaf = (
        _leaf_assign(
            F.col("__recon"), norm(F.col("__recon")), F.col("__top"), sp
        )
        if sp
        else F.col("__top")
    )
    assigned = assigned.select(
        "vec_id", "codes", "label", leaf.alias("cell")
    )
    # persist the delta-sized frame: the count and the staged write both
    # read it — without the cache each would re-run the quantize/assign
    # lineage (and a non-deterministic new_vectors could even assign
    # cells differently between the two)
    assigned = assigned.persist()
    try:
        n_new = assigned.count()
        if n_new == 0:
            if batch_id is not None:
                # an empty-but-watermarked append (e.g. a micro-batch whose
                # every row was dead-lettered) must still advance the
                # watermark, or its replay would re-emit dead letters
                publish_manifest(index_dir, {
                    **m,
                    "version": m["version"] + 1,
                    "watermarks": merged_watermarks(m, stream, batch_id),
                })
                return {"appended": 0, "version": m["version"] + 1,
                        "skipped": False}
            return {"appended": 0, "version": m["version"], "skipped": False}
        entries = _stage_and_move(assigned, index_dir)
        publish_manifest(index_dir, {
            **m,
            "version": m["version"] + 1,
            "seq": m["seq"] + 1,
            "postings": m["postings"] + entries,
            # direct calls (batch_id None) PRESERVE every stream's
            # watermark: erasing one would let a stream resume
            # double-apply replayed batches
            "watermarks": merged_watermarks(m, stream, batch_id),
        })
        if auto_compact_max_files is not None:
            # threshold check reads only the NEW manifest's file counts
            # for the touched cells (bounded metadata); compact itself
            # then rewrites only the over-threshold cells.  The lease is
            # already held — call the unlocked body.
            touched = {c for _p, c in entries}
            counts = live_cell_file_counts(index_dir)
            if any(counts.get(c, 0) > auto_compact_max_files for c in touched):
                _compact_locked(
                    spark, index_dir,
                    max_files_per_cell=auto_compact_max_files,
                )
        return {"appended": n_new, "version": m["version"] + 1,
                "skipped": False}
    finally:
        assigned.unpersist()


# ---------------------------------------------------------------------------
# delete
# ---------------------------------------------------------------------------


def delete_from_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame = None,
    vectors: DataFrame = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Delete vectors from a BUILT index — the takedown/TTL half of the
    lifecycle (a 100 TB index must also RETIRE vectors without a rebuild).

    Deletes are tombstones: a (vec_id, cell) parquet file under
    ``tombstones/``, referenced by the manifest.  ``sq8_ivf_topk``
    anti-joins them at probe time (deleted vectors vanish as neighbors
    and as queries), and ``compact_sq8_ivf_index`` physically drops
    tombstoned codes when it rewrites their cells, then drains the
    tombstone set — the same delete-marker -> merge-purge shape every LSM
    store uses.  Grid and centroids stay FROZEN (quantizer geometry is
    corpus statistics, not membership), so post-delete results equal an
    index over the reduced corpus under the same grid — which equals a
    full rebuild-without-deleted whenever the deleted vectors weren't
    per-dim extreme achievers (the exact dual of the append path's
    staleness bound; pinned by test).

    Two calling shapes:
    * ``vectors`` (id + embedding): the cell is recomputed from the frozen
      grid/centroid literals (descending any split tree) exactly as the
      build/append assigned it — cost proportional to the DELTA, zero
      index scans.  Out-of-grid vectors are refused (they cannot be IN
      the index; a wrong-grid cell assignment would tombstone the wrong
      partition).
    * ``ids`` only: one postings scan locates the cells (the fallback when
      the caller lost the vectors — a takedown list of bare ids).

    Returns the number of NEW tombstones written: repeat deletes of an
    already-tombstoned (vec_id, cell) are deduped to no-ops (the set stays
    bounded by distinct deleted ids between compactions — advice r11).
    Ids not present in the index still record tombstones under the
    ``vectors`` shape — harmless: the anti-join and compaction both treat
    them as no-ops.  Id REUSE after delete is gated on the append side:
    ``append_to_sq8_ivf_index`` refuses ids with a live tombstone (compact
    first), so a deleted id's visibility never depends on fragmentation.
    """
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    if (ids is None) == (vectors is None):
        raise ValueError("pass exactly one of ids= or vectors=")
    with writer_lease(index_dir):
        return _delete_locked(
            spark, index_dir, ids, vectors, id_col, vec_col, None, "takedown"
        )["deleted"]


def retire_batch_exactly_once(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    batch_id: int,
    stream: str = "takedown",
    id_col: str = "vec_id",
) -> dict:
    """The takedown-feed delete: tombstone file and batch-id watermark
    commit in one manifest pointer swing (the dedup state's
    ``retire_docs`` twin) — a replayed micro-batch is skipped.  Ids not
    present in the index drop out in the postings lookup (nothing is
    recorded), so an out-of-order takedown never blocks a later append.
    Returns {deleted, version, skipped}."""
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        return _delete_locked(
            spark, index_dir, ids, None, id_col, "embedding",
            batch_id, stream,
        )


def _delete_locked(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    batch_id: int,
    stream: str,
) -> dict:
    m = read_manifest(index_dir)
    last_bid = stream_watermark(m, stream)
    if batch_id is not None and last_bid is not None and batch_id <= last_bid:
        return {"deleted": 0, "version": m["version"], "skipped": True}

    if vectors is not None:
        mn_arr, mx_arr, dim = _grid_literals(spark, index_dir)
        cell_of = _cell_of_from_centroids(_centroids(spark, index_dir))
        sp = _splits(m)
        vecs = vectors.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        oob = _oob_expr(mn_arr, mx_arr, dim)
        n_oob = vecs.filter(oob).count()
        if n_oob:
            raise ValueError(
                f"{n_oob} vector(s) fall outside the frozen SQ8 grid — "
                "they cannot be in this index; deleting by recomputed "
                "cell would tombstone the wrong partition (pass ids= to "
                "delete by postings lookup instead)"
            )
        codes = _code_expr(F.col("v"), mn_arr, mx_arr)
        recon = _recon_expr(codes, mn_arr, mx_arr)
        staged = vecs.select(
            "vec_id",
            cell_of(recon, norm(recon), 1)[0]["c"].cast("int").alias("__top"),
            recon.alias("__recon"),
        )
        leaf = (
            _leaf_assign(
                F.col("__recon"), norm(F.col("__recon")), F.col("__top"), sp
            )
            if sp
            else F.col("__top")
        )
        marks = staged.select("vec_id", leaf.alias("cell"))
    else:
        post = _read_postings(spark, index_dir, m)
        marks = post.join(
            F.broadcast(ids.select(F.col(id_col).alias("vec_id"))),
            "vec_id",
        ).select("vec_id", "cell")

    # dedupe (advice r11): repeated deletes of the same id must not grow
    # the tombstone set — dedupe within the call by (vec_id, cell) and
    # anti-join tombstones already recorded, so the set stays bounded by
    # the number of DISTINCT deleted ids between compactions and the
    # returned count means "new tombstones written"
    marks = marks.dropDuplicates(["vec_id", "cell"])
    existing = _tombstones(spark, index_dir, m)
    if existing is not None:
        marks = marks.join(
            F.broadcast(existing.select("vec_id", "cell").distinct()),
            ["vec_id", "cell"],
            "left_anti",
        )
    # persist the delta-sized marks so the count and the write share ONE
    # evaluation — the ids path otherwise pays its postings scan twice and
    # the vectors path re-runs the quantize/assign pipeline
    marks = marks.persist()
    try:
        n = marks.count()
        if n == 0:
            if batch_id is not None:
                publish_manifest(index_dir, {
                    **m,
                    "version": m["version"] + 1,
                    "watermarks": merged_watermarks(m, stream, batch_id),
                })
                return {"deleted": 0, "version": m["version"] + 1,
                        "skipped": False}
            return {"deleted": 0, "version": m["version"], "skipped": False}
        rel = f"tombstones/t{m['seq'] + 1:06d}_{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(index_dir, ".stage", f"tomb_{uuid.uuid4().hex[:8]}")
        marks.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell").cast("int").alias("cell"),
        ).coalesce(1).write.parquet(tmp)
        os.makedirs(os.path.join(index_dir, "tombstones"), exist_ok=True)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        os.rename(os.path.join(tmp, part), os.path.join(index_dir, rel))
        shutil.rmtree(tmp, ignore_errors=True)
        publish_manifest(index_dir, {
            **m,
            "version": m["version"] + 1,
            "seq": m["seq"] + 1,
            "tombstones": m["tombstones"] + [rel],
            "watermarks": merged_watermarks(m, stream, batch_id),
        })
        return {"deleted": n, "version": m["version"] + 1, "skipped": False}
    finally:
        marks.unpersist()


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def compact_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    max_files_per_cell: int = 1,
) -> dict:
    """Compact fragmented postings cells after repeated appends, purging
    tombstoned codes along the way.

    Every append adds file(s) to the cells its delta touches; after many
    small deltas a probe pays per-file open/footer cost instead of one
    sequential read — the standard LSM-ish decay every append-optimized
    layout suffers.  This rewrites ONLY the cells whose live file count
    exceeds ``max_files_per_cell`` PLUS the cells holding tombstoned
    vectors (dropping those rows physically), leaving untouched cells
    alone, so compaction cost is proportional to the fragmented-or-dirty
    fraction, not the index.  Once every dirty cell is rewritten the
    tombstone set is drained.

    Crash-safety is the manifest's: new files are staged and moved in
    (unreferenced until publish), then ONE pointer swing replaces the
    dirty cells' file entries and drains the tombstone list — query
    results are unchanged at every point, and a crash anywhere leaves
    the previous version fully live.  Garbage collection runs with
    ONE-VERSION retention (the dedup-state vacuum discipline): files
    referenced by neither the new nor the immediately-previous manifest
    are removed — crash orphans go at once, while the previous version's
    files survive one cycle so a reader that resolved the old manifest
    can finish its lazy reads.  Returns {cells_compacted, files_before,
    files_after, tombstones_purged, gc_files}.
    """
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        return _compact_locked(spark, index_dir, max_files_per_cell)


def _compact_locked(
    spark: SparkSession,
    index_dir: str,
    max_files_per_cell: int,
) -> dict:
    m = read_manifest(index_dir)
    counts = live_cell_file_counts(index_dir, m)

    tomb = _tombstones(spark, index_dir, m)
    tomb_by_cell: dict = {}
    if tomb is not None:
        for r in tomb.collect():  # bounded: delete-delta between compactions
            tomb_by_cell.setdefault(int(r["cell"]), set()).add(int(r["vec_id"]))

    dirty = sorted(
        c for c in counts
        if counts[c] > max_files_per_cell or c in tomb_by_cell
    )
    new_entries: list = []
    purged = 0
    if dirty:
        dead_ids = sorted(
            i for ids in tomb_by_cell.values() for i in ids
        )  # bounded: the delete delta between compactions
        # ONE distributed pass over all dirty cells' live files (file-level
        # pruning straight from the manifest — no other cell is even
        # listed), tombstoned ids dropped, one file per cell out
        dirty_files = [
            os.path.join(index_dir, p) for p, c in m["postings"] if c in dirty
        ]
        live_df = spark.read.option(
            "basePath", os.path.join(index_dir, "postings")
        ).parquet(*dirty_files)
        if dead_ids:
            live_df = live_df.join(
                F.broadcast(
                    spark.createDataFrame(
                        [(i,) for i in dead_ids], "vec_id long"
                    )
                ),
                "vec_id",
                "left_anti",
            )
        new_entries = _stage_and_move(live_df, index_dir, n_parts=len(dirty))
        purged = sum(
            len(ids) for c, ids in tomb_by_cell.items() if c in dirty
        )

    files_before = len(m["postings"]) + len(m["tombstones"])
    if not dirty and not tomb_by_cell and not m["tombstones"]:
        # clean no-op: nothing to rewrite, nothing to drain — still GC
        # (crash orphans may exist)
        gc_files = _gc(index_dir, m, m)
        return {
            "cells_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
            "tombstones_purged": 0,
            "gc_files": gc_files,
        }

    dirty_set = set(dirty)
    new_manifest = {
        **m,
        "version": m["version"] + 1,
        "postings": [
            [p, c] for p, c in m["postings"] if c not in dirty_set
        ] + new_entries,
        # the whole tombstone set is drained: every tombstone-dirty cell
        # was rewritten above; phantom tombstones (ids absent from the
        # index, cells with no files) mask nothing and drop with the list
        "tombstones": [],
    }
    publish_manifest(index_dir, new_manifest)
    gc_files = _gc(index_dir, new_manifest, m)
    return {
        "cells_compacted": len(dirty),
        "files_before": files_before,
        "files_after": len(new_manifest["postings"]),
        "tombstones_purged": purged,
        "gc_files": gc_files,
    }


def _gc(index_dir: str, new_m: dict, prev_m: dict) -> int:
    """Remove data files referenced by NEITHER the new nor the previous
    manifest (one-version retention: a reader that resolved the previous
    manifest may still be running lazy Spark jobs over its files — they
    survive one compaction cycle; crash orphans are referenced by no
    manifest and go at once).  Also sweeps stage leftovers and manifests
    older than the previous — safe under the held lease (no concurrent
    writer is mid-stage)."""
    keep = {p for p, _c in new_m["postings"]}
    keep |= {p for p, _c in prev_m["postings"]}
    keep |= set(new_m["tombstones"]) | set(prev_m["tombstones"])
    n = 0
    for table in ("postings", "tombstones"):
        tdir = os.path.join(index_dir, table)
        if not os.path.isdir(tdir):
            continue
        for root, _dirs, files in os.walk(tdir):
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), index_dir)
                if fn.endswith(".parquet") and rel not in keep:
                    os.unlink(os.path.join(root, fn))
                    n += 1
    shutil.rmtree(os.path.join(index_dir, ".stage"), ignore_errors=True)
    live = {f"manifest_v{new_m['version']}.json", prev_m.get("__name")}
    for fn in os.listdir(index_dir):
        if fn.startswith("manifest_v") and fn not in live:
            os.unlink(os.path.join(index_dir, fn))
    return n


# ---------------------------------------------------------------------------
# hot-cell split
# ---------------------------------------------------------------------------


def split_hot_cells(
    spark: SparkSession,
    index_dir: str,
    multiple: float = 4.0,
    k_children: int = 2,
    cells: list = None,
) -> dict:
    """Rebalance oversized coarse cells by splitting them into
    ``k_children`` sub-cells (round-12 verdict ask #6): at 100 TB a hot
    cell is one straggler partition in every probe that touches it.

    The SQ8 grid and the TOP-LEVEL quantizer stay frozen — a split only
    re-partitions one cell's rows under deterministic sub-centroids
    (maximin-seeded: the cell's min-id member, then the member farthest
    from the chosen set, on the reconstructed vectors — data-dependent
    but fully deterministic).  Probes expand a probed parent to all its
    leaf descendants, so the candidate set — and therefore every result —
    is IDENTICAL to the unsplit index, while the probe now reads k
    balanced partitions instead of one hot one.  Appends descend the
    split tree when assigning, so post-split deltas land in the leaves.

    Targets: explicit ``cells``, or every cell whose live row count
    exceeds ``multiple`` x the mean (the ``ivf_cell_size_report`` gauge's
    finding).  Cost is proportional to the SPLIT cells' rows, never the
    index.  Returns {split: {parent: [children]}, version}.
    """
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        m = read_manifest(index_dir)
        mn_arr, mx_arr, _ = _grid_literals(spark, index_dir)
        live = live_postings(spark, index_dir, m)
        sizes = {
            int(r["cell"]): r["n"]
            for r in live.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }  # bounded: one row per physical cell
        if cells is not None:
            targets = [int(c) for c in cells]
            bad = [c for c in targets if c not in sizes]
            if bad:
                raise ValueError(
                    f"cells {bad} have no live rows (unknown or already "
                    "split) — split targets must be live physical cells"
                )
        else:
            mean = sum(sizes.values()) / max(len(sizes), 1)
            targets = sorted(
                c for c, n in sizes.items()
                if n > multiple * mean and n >= k_children
            )
        targets = [c for c in targets if sizes.get(c, 0) >= k_children]
        if not targets:
            return {"split": {}, "version": m["version"]}

        next_cell = int(m.get("next_cell", 0))
        new_splits = list(m.get("splits") or [])
        postings = list(m["postings"])
        done: dict = {}
        for parent in targets:
            rows = live.filter(F.col("cell") == parent).select(
                "vec_id", "codes", "label",
                _recon_expr(F.col("codes"), mn_arr, mx_arr).alias("__recon"),
            ).persist()
            try:
                # deterministic maximin seeds on the reconstructed vectors
                seed = rows.orderBy("vec_id").select(
                    "vec_id", "__recon"
                ).first()
                chosen = [(next_cell, [float(x) for x in seed["__recon"]])]
                for _ in range(k_children - 1):
                    dists = [
                        F.lit(1.0) - cosine_from_norms(
                            F.col("__recon"), F.lit(cv),
                            norm(F.col("__recon")), F.lit(
                                sum(x * x for x in cv) ** 0.5
                            ),
                        )
                        for _cid, cv in chosen
                    ]
                    far = (
                        rows.select(
                            "vec_id", "__recon",
                            F.least(*dists).alias("__mind")
                            if len(dists) > 1 else dists[0].alias("__mind"),
                        )
                        .orderBy(F.desc("__mind"), F.asc("vec_id"))
                        .first()
                    )
                    chosen.append(
                        (next_cell + len(chosen),
                         [float(x) for x in far["__recon"]])
                    )
                # two k-means refinement steps: maximin seeds alone leave
                # an outlier-shaped cell lopsided (the far seed captures
                # one point); moving each sub-centroid to its members'
                # mean splits the actual mass.  Distributed: one
                # (child, dim)-keyed aggregate per step, k*dim rows back.
                for _ in range(2):
                    child_of = _cell_of_from_centroids(chosen)
                    means = (
                        rows.select(
                            child_of(
                                F.col("__recon"), norm(F.col("__recon")), 1
                            )[0]["c"].alias("__child"),
                            "__recon",
                        )
                        # two-step: a generator in the SAME select as the
                        # struct-field access loses the struct names
                        # (Spark quirk — FIELD_NOT_FOUND col1/col2)
                        .select(
                            "__child", F.posexplode("__recon").alias("j", "x")
                        )
                        .groupBy("__child", "j")
                        .agg(F.avg("x").alias("mx"))
                        .collect()
                    )  # bounded: k_children x dim rows
                    by_child: dict = {}
                    for r in means:
                        by_child.setdefault(int(r["__child"]), {})[
                            int(r["j"])
                        ] = float(r["mx"])
                    chosen = [
                        (cid,
                         [by_child[cid][j] for j in sorted(by_child[cid])]
                         if cid in by_child else cv)  # empty child: keep seed
                        for cid, cv in chosen
                    ]
                child_of = _cell_of_from_centroids(chosen)
                re_assigned = rows.select(
                    "vec_id", "codes", "label",
                    child_of(
                        F.col("__recon"), norm(F.col("__recon")), 1
                    )[0]["c"].cast("int").alias("cell"),
                )
                entries = _stage_and_move(
                    re_assigned, index_dir, n_parts=k_children
                )
            finally:
                rows.unpersist()
            postings = [
                [p, c] for p, c in postings if c != parent
            ] + entries
            new_splits.append([parent, [[cid, cv] for cid, cv in chosen]])
            done[parent] = [cid for cid, _cv in chosen]
            next_cell += k_children

        new_manifest = {
            **m,
            "version": m["version"] + 1,
            "seq": m["seq"] + 1,
            "postings": postings,
            "splits": new_splits,
            "next_cell": next_cell,
        }
        publish_manifest(index_dir, new_manifest)
        _gc(index_dir, new_manifest, m)
        return {"split": done, "version": new_manifest["version"]}
