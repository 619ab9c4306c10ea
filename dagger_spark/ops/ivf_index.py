"""Materialized IVF+SQ8 index: quantize once, probe many.

``ann_ivf_sq8`` (catalog/round8.py) re-derives the whole quantization
inside every query — posexplode the corpus, dim-stats aggregate,
re-assembly groupBy — which is the right *definition* but the wrong
*production shape*: FAISS-style deployments build the index once and
amortize it over every query batch.  This module materializes that
layout (reference parity target: the Dagger reference has no ANN surface
at all — this is part of the LLM-pipeline extension surface):

* ``build_sq8_ivf_index`` writes, once per corpus:
    - ``postings/`` — parquet PARTITIONED BY coarse cell, one row per
      vector: (vec_id, codes array<int>).  Partition-by-cell IS the
      inverted file: a probe of nprobe/n_centroids cells scans only that
      fraction of the corpus, enforced by Spark partition pruning rather
      than a post-scan filter.
    - ``grid.parquet`` — the per-dimension (j, mn, mx) SQ8 grid (dim
      rows).
    - ``centroids.parquet`` — the coarse quantizer's (cid, vector)
      rows (n_centroids rows), vectors already SQ8-reconstructed so
      query-time assignment matches ``ann_ivf_sq8`` bit-for-bit.
  The index dir name carries a fingerprint (size + mtime) of the source
  embeddings parquet, so a changed corpus can never serve a stale index;
  the build goes to a temp dir + ``os.rename`` (the scale_probe lesson:
  never write through a path that might already exist).

* ``sq8_ivf_topk`` answers top-k from the index alone: reconstruction is
  a pure ``transform`` projection over the packed codes against the grid
  shipped as two array literals — NO posexplode, NO aggregate, NO
  re-assembly on the query path.  Probed cells reach the postings scan as
  a partition-column join key (broadcast query side → dynamic partition
  pruning does the cell pruning a hand-built inverted file would).

Results are IDENTICAL to ``ann_ivf_sq8``: same grid arithmetic (exact
int codes + parquet-roundtripped doubles through the identical
expression tree), same deterministic centroids (reconstructed rows with
id < n_centroids), same rounding and tie-breaks — pinned by test and by
sharing the composed DuckDB oracle.

Writer model (round-11 verdict ask #3): the lifecycle mutations —
``append_to_sq8_ivf_index``, ``delete_from_sq8_ivf_index``,
``compact_sq8_ivf_index`` — take the index dir's single-writer lease
(``ops/lease.py``: lockfile + stale-lease takeover) for their full
duration, so two concurrent appends, or an append racing a compaction's
rename swap, SERIALIZE or are refused with ``ConcurrentWriterError`` —
never interleaved.  Readers (``sq8_ivf_topk``) are never blocked: every
mutation publishes via atomic rename, so a probe sees either the old or
the new state.  ``build_sq8_ivf_index`` needs no lease — it builds in a
private tmp dir and publishes with a rename whose losing racer verifies
the winner's ``_BUILT`` marker and discards itself.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lease import writer_lease
from .similarity import (
    _cell_of_from_centroids,
    _centroid_literals,
    cosine_from_norms,
    norm,
    sq8_quantize,
)

INDEX_ROOT = "/tmp/dagger_sq8_ivf"
# postings layout version: bumped when the row schema changes (v2 added the
# label metadata column for filtered search) so cached dirs from an older
# layout can never serve a reader expecting the new one
_LAYOUT = "v2"


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
    os.makedirs(tmp, exist_ok=True)

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
        )[0]["c"].alias("cell"),
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(tmp, "postings")
    )

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
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return idx


def _grid_literals(spark: SparkSession, idx: str) -> tuple:
    """(mn_arr, mx_arr, dim) — the frozen per-dimension grid as two array
    literals plus its dimensionality (the staleness gate needs the length:
    a delta vector of the WRONG length must count as out-of-grid, not slip
    past NULL element_at lookups — advice r10)."""
    rows = sorted(
        (r["j"], r["mn"], r["mx"])
        for r in spark.read.parquet(os.path.join(idx, "grid.parquet")).collect()
    )  # bounded: one row per embedding dimension
    mn_arr = F.lit([r[1] for r in rows])
    mx_arr = F.lit([r[2] for r in rows])
    return mn_arr, mx_arr, len(rows)


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

    If the index carries tombstones (``delete_from_sq8_ivf_index``), the
    postings scan anti-joins them first: deleted vectors disappear both as
    neighbors AND as queries — results equal an index over the reduced
    corpus with the same frozen grid/centroids.  The tombstone side is
    delete-delta-sized (compaction drains it), so the anti-join broadcasts.

    ``filter_same_label`` answers the metadata-FILTERED search from the
    index alone: postings carry a label payload column (layout v2), and
    the predicate (candidate label == query label, PRE-filter semantics)
    fuses into the broadcast join condition beside the cell key — after
    partition pruning the label filter is a row filter inside the probed
    cells; at 100 TB parquet row-group min/max stats on the payload
    column prune within cells too.  Output gains the ``label`` column.
    """
    mn_arr, mx_arr, _ = _grid_literals(spark, index_dir)
    cents = [
        (r["cid"], list(r["vector"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids.parquet")
        ).collect()
    ]  # bounded: n_centroids rows
    cell_of = _cell_of_from_centroids(cents)

    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    tomb = _tombstones(spark, index_dir)
    if tomb is not None:
        post = post.join(
            F.broadcast(tomb.select("vec_id")), "vec_id", "left_anti"
        )
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
                lambda e: e["c"],
            )
        ).alias("cell"),
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
    ('out_of_grid' | 'tombstoned_id').  Both frames are delta-sized."""
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
    tomb = _tombstones(spark, index_dir)
    tombed = (
        F.lit(False)
        if tomb is None
        else F.col("vec_id").isin(
            [int(r["vec_id"]) for r in tomb.select("vec_id").distinct().collect()]
        )  # bounded: the delete delta between compactions
    )
    ok = vecs.filter(~oob & ~tombed).withColumnRenamed("v", vec_col)
    bad = vecs.filter(oob | tombed).select(
        "vec_id",
        F.col("v").alias(vec_col),
        F.when(oob, F.lit("out_of_grid"))
        .otherwise(F.lit("tombstoned_id"))
        .alias("reject_reason"),
    )
    if id_col != "vec_id":
        ok = ok.withColumnRenamed("vec_id", id_col)
        bad = bad.withColumnRenamed("vec_id", id_col)
    return ok, bad


def append_to_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact_max_files: int = None,
) -> int:
    """Incrementally append vectors to a BUILT index — the 100 TB common
    case (new corpus slice arrives -> assign -> quantize -> append its
    cells' postings partitions), vs the rebuild-only path that re-quantizes
    the whole corpus.

    The grid and centroids are FROZEN: new vectors are SQ8-encoded against
    the existing per-dimension grid and assigned to the existing coarse
    cells, so query results after append are IDENTICAL to a full rebuild
    *provided the frozen grid still covers the new vectors* (per-dim
    min/max unchanged) and the centroid ids were in the base corpus — the
    grid-staleness bound.  Out-of-grid vectors would silently clamp-distort
    codes, so the function REFUSES them (raises ValueError with the
    violating count); the caller's signal to rebuild.

    Cost is proportional to the DELTA, not the corpus: one scan of
    ``new_vectors`` (grid/centroids ride as plan-time literals), one
    partitioned append write.  Returns the number of vectors appended.

    ``auto_compact_max_files`` (opt-in) wires the LSM decay answer into the
    write path: after the append, if any TOUCHED cell's file count exceeds
    the threshold, ``compact_sq8_ivf_index`` runs with that threshold —
    which itself rewrites only over-threshold cells, so steady-state append
    cost stays delta-proportional while file counts (and therefore probe
    open/footer cost) stay bounded no matter how many deltas arrive
    (tools/append_probe.py measures exactly this).

    Id reuse after delete (advice r11): an appended id that still carries a
    live tombstone is REFUSED (ValueError) — the tombstone masks by vec_id,
    so clearing it would resurrect the old, not-yet-compacted postings row
    beside the new one, and dropping it would hide the new row until the
    next rewrite; either way visibility would depend on incidental
    fragmentation.  The deterministic upsert sequence is delete -> compact
    (drains tombstones, physically drops the old row) -> append.
    """
    if not os.path.exists(os.path.join(index_dir, "_BUILT")):
        raise ValueError(f"not a built index: {index_dir}")
    with writer_lease(index_dir):
        return _append_locked(
            spark, index_dir, new_vectors, id_col, vec_col,
            auto_compact_max_files,
        )


def _append_locked(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    auto_compact_max_files: int,
) -> int:
    mn_arr, mx_arr, dim = _grid_literals(spark, index_dir)
    cents = [
        (r["cid"], list(r["vector"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids.parquet")
        ).collect()
    ]  # bounded: n_centroids rows
    cell_of = _cell_of_from_centroids(cents)

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
    tomb = _tombstones(spark, index_dir)
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
    # RECONSTRUCTED vector (the build assigns on recon, ivf_index.py:128-134)
    assigned = staged.select(
        "vec_id",
        "codes",
        "label",
        cell_of(
            _recon_expr(F.col("codes"), mn_arr, mx_arr),
            norm(_recon_expr(F.col("codes"), mn_arr, mx_arr)),
            1,
        )[0]["c"].alias("cell"),
    )
    # persist the delta-sized frame: the count, the write, and the
    # auto-compaction's touched-cell listing all read it — without the
    # cache each would re-run the quantize/assign lineage (and a
    # non-deterministic new_vectors could even assign cells differently
    # between the write and the touched-cell recompute)
    assigned = assigned.persist()
    try:
        n_new = assigned.count()
        assigned.write.mode("append").partitionBy("cell").parquet(
            os.path.join(index_dir, "postings")
        )
        if auto_compact_max_files is not None:
            # threshold check reads only the TOUCHED cells' directory
            # listings (bounded by n_centroids); compact itself then
            # rewrites only the over-threshold cells
            touched = [
                r["cell"]
                for r in assigned.select("cell").distinct().collect()
            ]  # bounded: <= n_centroids values
            post_dir = os.path.join(index_dir, "postings")
            if any(
                _n_cell_files(os.path.join(post_dir, f"cell={c}"))
                > auto_compact_max_files
                for c in touched
            ):
                # the lease is already held by the enclosing append — call
                # the unlocked body (writer_lease is not re-entrant)
                _compact_locked(
                    spark, index_dir,
                    max_files_per_cell=auto_compact_max_files,
                )
    finally:
        assigned.unpersist()
    return n_new


def _n_cell_files(cell_dir: str) -> int:
    if not os.path.isdir(cell_dir):
        return 0
    return sum(
        1
        for f in os.listdir(cell_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def _tombstones(spark: SparkSession, index_dir: str):
    """The index's pending-delete set as a DataFrame (vec_id, cell), or
    None when empty.  Tombstones live OUTSIDE postings/ so partition
    discovery never sees them."""
    d = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return None
    return spark.read.parquet(d)


def delete_from_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame = None,
    vectors: DataFrame = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Delete vectors from a BUILT index — the takedown/TTL half of the
    lifecycle (append landed in r10; a 100 TB index must also RETIRE
    vectors without a rebuild).

    Deletes are tombstones: a (vec_id, cell) parquet row appended under
    ``index_dir/tombstones/``.  ``sq8_ivf_topk`` anti-joins them at probe
    time (deleted vectors vanish as neighbors and as queries), and
    ``compact_sq8_ivf_index`` physically drops tombstoned codes when it
    rewrites their cells, then drains the tombstone set — the same
    delete-marker -> merge-purge shape every LSM store uses.  Grid and
    centroids stay FROZEN (quantizer geometry is corpus statistics, not
    membership), so post-delete results equal an index over the reduced
    corpus under the same grid — which equals a full rebuild-without-
    deleted whenever the deleted vectors weren't per-dim extreme achievers
    (the exact dual of the append path's staleness bound; pinned by test).

    Two calling shapes:
    * ``vectors`` (id + embedding): the cell is recomputed from the frozen
      grid/centroid literals exactly as the build/append assigned it —
      cost proportional to the DELTA, zero index scans.  Out-of-grid
      vectors are refused (they cannot be IN the index; a wrong-grid cell
      assignment would tombstone the wrong partition).
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
        return _delete_locked(spark, index_dir, ids, vectors, id_col, vec_col)


def _delete_locked(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
) -> int:
    if vectors is not None:
        mn_arr, mx_arr, dim = _grid_literals(spark, index_dir)
        cents = [
            (r["cid"], list(r["vector"]))
            for r in spark.read.parquet(
                os.path.join(index_dir, "centroids.parquet")
            ).collect()
        ]  # bounded: n_centroids rows
        cell_of = _cell_of_from_centroids(cents)
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
        marks = vecs.select(
            "vec_id",
            cell_of(
                _recon_expr(codes, mn_arr, mx_arr),
                norm(_recon_expr(codes, mn_arr, mx_arr)),
                1,
            )[0]["c"].alias("cell"),
        )
    else:
        post = spark.read.parquet(os.path.join(index_dir, "postings"))
        marks = post.join(
            F.broadcast(ids.select(F.col(id_col).alias("vec_id"))),
            "vec_id",
        ).select("vec_id", "cell")

    # dedupe (advice r11): repeated deletes of the same id must not grow
    # the tombstone set — dedupe within the call by (vec_id, cell) and
    # anti-join tombstones already on disk, so the set stays bounded by
    # the number of DISTINCT deleted ids between compactions and the
    # returned count means "new tombstones written"
    marks = marks.dropDuplicates(["vec_id", "cell"])
    existing = _tombstones(spark, index_dir)
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
        if n:
            marks.select(
                F.col("vec_id").cast("long").alias("vec_id"),
                F.col("cell").cast("int").alias("cell"),
            ).coalesce(1).write.mode("append").parquet(
                os.path.join(index_dir, "tombstones")
            )
    finally:
        marks.unpersist()
    return n


def _recover_interrupted_compaction(post_dir: str, work_dir: str) -> None:
    """Make an interrupted compaction harmless before starting a new one
    (advice r10: a crash between the two renames left the live cell dir
    absent, silently dropping that cell from every later probe).  For each
    saved ``<cell>.old`` whose live cell dir is missing, restore it; then
    clear the work dir."""
    import shutil

    if not os.path.isdir(work_dir):
        return
    for d in os.listdir(work_dir):
        if d.endswith(".old"):
            cell = d[: -len(".old")]
            live = os.path.join(post_dir, cell)
            if not os.path.exists(live):
                os.rename(os.path.join(work_dir, d), live)
    shutil.rmtree(work_dir, ignore_errors=True)


def compact_sq8_ivf_index(
    spark: SparkSession,
    index_dir: str,
    max_files_per_cell: int = 1,
) -> dict:
    """Compact fragmented postings cells after repeated appends, purging
    tombstoned codes along the way.

    Every ``append_to_sq8_ivf_index`` adds file(s) to the cells its delta
    touches; after many small deltas a probe pays per-file open/footer
    cost instead of one sequential read — the standard LSM-ish decay every
    append-optimized layout suffers.  This rewrites ONLY the cells whose
    file count exceeds ``max_files_per_cell`` PLUS the cells holding
    tombstoned vectors (dropping those rows physically), leaving untouched
    cells alone, so compaction cost is proportional to the fragmented-or-
    dirty fraction, not the index.  Once every dirty cell is rewritten the
    tombstone set is drained.  Query results are unchanged at every point
    (tombstones keep masking until their rows are dropped — pinned by
    test).  Returns {cells_compacted, files_before, files_after,
    tombstones_purged}.

    Crash-safety (advice r10): per-cell temp/saved dirs live under
    ``index_dir/.compact/`` — OUTSIDE postings/, so concurrent partition
    discovery never sees half-written files — and the swap is
    rename(live -> saved), rename(tmp -> live), verify row count, delete
    saved.  On entry, any saved dir from an interrupted run whose live
    cell is missing is restored first.
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
    import shutil

    post_dir = os.path.join(index_dir, "postings")
    work_dir = os.path.join(index_dir, ".compact")
    _recover_interrupted_compaction(post_dir, work_dir)

    tomb = _tombstones(spark, index_dir)
    tomb_by_cell: dict = {}
    if tomb is not None:
        for r in tomb.collect():  # bounded: delete-delta between compactions
            tomb_by_cell.setdefault(int(r["cell"]), set()).add(int(r["vec_id"]))

    cells = [
        d
        for d in os.listdir(post_dir)
        if d.startswith("cell=") and os.path.isdir(os.path.join(post_dir, d))
    ]
    before = {c: _n_cell_files(os.path.join(post_dir, c)) for c in cells}
    rewrite = [
        c
        for c in cells
        if before[c] > max_files_per_cell
        or int(c.split("=", 1)[1]) in tomb_by_cell
    ]
    os.makedirs(work_dir, exist_ok=True)
    purged = 0
    # all-empty guard (advice r11): if no rewrite cell holds any parquet
    # file (e.g. a prior compaction already emptied them and only stale/
    # phantom tombstones remain), there is nothing to physically rewrite —
    # and reading an all-empty tree would fail schema inference.  Skip the
    # rewrite and just drain the tombstones below.
    if rewrite and not any(before[c] for c in rewrite):
        rewrite = []
    if rewrite:
        # ONE distributed pass over all dirty cells (a per-cell driver loop
        # would pay 3 Spark jobs per cell — at real cell counts the rewrite
        # must be a single shuffle-free scan): read the dirty cells with the
        # partition filter, drop every tombstoned id (vec_ids are corpus-
        # unique so the global set is correct per cell), repartition BY CELL
        # so each cell's rows land in exactly one task, and write one
        # partitioned tmp tree -> one file per cell.
        rewrite_vals = [int(c.split("=", 1)[1]) for c in rewrite]
        dead_ids = sorted(
            i for ids in tomb_by_cell.values() for i in ids
        )  # bounded: the delete delta between compactions
        tmp_tree = os.path.join(work_dir, "cells.tmp")
        shutil.rmtree(tmp_tree, ignore_errors=True)
        live_df = spark.read.parquet(post_dir).filter(
            F.col("cell").isin(rewrite_vals)
        )
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
        live_df.repartition(len(rewrite), F.col("cell")).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(tmp_tree)
        # every rewritten cell fully tombstoned -> the tmp tree holds no
        # parquet at all and a read would fail schema inference; the
        # expected counts are then simply all-zero
        tmp_has_rows = any(
            f.endswith(".parquet")
            for d, _s, fs in os.walk(tmp_tree)
            for f in fs
        )
        expected = {
            int(r["cell"]): r["n"]
            for r in spark.read.parquet(tmp_tree)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        } if tmp_has_rows else {}  # bounded: one row per rewritten cell
        # per-cell swap: live -> saved, tmp -> live (recovery on entry
        # covers a crash anywhere in this loop)
        for c in rewrite:
            val = int(c.split("=", 1)[1])
            src = os.path.join(post_dir, c)
            tmp = os.path.join(tmp_tree, c)
            old = os.path.join(work_dir, c + ".old")
            shutil.rmtree(old, ignore_errors=True)
            os.rename(src, old)
            if os.path.isdir(tmp):
                os.rename(tmp, src)
            else:  # every row tombstoned: the cell becomes empty
                os.makedirs(src, exist_ok=True)
        # verify the swapped set in ONE job before dropping the saved dirs
        # (pure-listing check when every rewritten cell is expected empty —
        # a read of an all-empty tree cannot infer a schema)
        if any(expected.values()):
            got = {
                int(r["cell"]): r["n"]
                for r in spark.read.parquet(post_dir)
                .filter(F.col("cell").isin(rewrite_vals))
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        else:
            got = {
                int(c.split("=", 1)[1]): _n_cell_files(
                    os.path.join(post_dir, c)
                )
                for c in rewrite
            }
        bad = [
            c for c in rewrite
            if got.get(int(c.split("=", 1)[1]), 0)
            != expected.get(int(c.split("=", 1)[1]), 0)
        ]
        if bad:  # never observed; the saved dirs make restore safe
            for c in bad:
                src = os.path.join(post_dir, c)
                shutil.rmtree(src, ignore_errors=True)
                os.rename(os.path.join(work_dir, c + ".old"), src)
            raise RuntimeError(
                f"compaction row-count mismatch in {bad}; originals restored"
            )
        for c in rewrite:
            shutil.rmtree(os.path.join(work_dir, c + ".old"))
            purged += len(tomb_by_cell.get(int(c.split("=", 1)[1]), set()))
    if tomb_by_cell:
        # every dirty cell was rewritten above -> the whole set is drained.
        # (A crash before this point leaves tombstones in place: rows are
        # already gone, and anti-joining absent rows is a no-op.)
        shutil.rmtree(os.path.join(index_dir, "tombstones"), ignore_errors=True)
    shutil.rmtree(work_dir, ignore_errors=True)
    after = {c: _n_cell_files(os.path.join(post_dir, c)) for c in cells}
    return {
        "cells_compacted": len(rewrite),
        "files_before": sum(before.values()),
        "files_after": sum(after.values()),
        "tombstones_purged": purged,
    }
