"""Materialized dedup state: build the MinHash/LSH corpus state once,
then admit and retire documents at delta cost (round-11 verdict ask #2
— the dedup twin of ``ops/ivf_index.py``'s measured index lifecycle).

The catalog's admission/retirement entries (catalog/round11.py) prove
the maintenance ALGEBRA — maintained state hash-matches a full recompute
— but rebuild their "state" from scratch inside every run, so nothing
MEASURED the maintained path's cost the way tools/append_probe.py does
for the IVF index.  This module puts the state at rest:

State layout — a poor-man's transaction log (the ``streaming/ivm.py``
versioned-pointer discipline, generalized to a multi-table manifest; at
100 TB the same shape is a Delta/Iceberg table group and its commit
log)::

    <root>/<corpus>_k3_h16_b4_<layout>_<fingerprint>/
      _BUILT                         build-complete marker
      _CURRENT                       -> "manifest_vN.json"   (tmp+rename)
      manifest_vN.json               file lists per logical table
      buckets/base, buckets/dNNNNNN  (id, band, bucket)   append-only
      pairs/base,   pairs/dNNNNNN    (id_a, id_b)         append-only
      clusters/base                  (doc_id, cluster)
      clusters/oNNNNNN               (doc_id, cluster, seq) overrides
      retired/rNNNNNN                (doc_id)             tombstones

Every mutation writes ONLY delta-sized files, then publishes a new
manifest and swings the pointer atomically — a reader always sees a
complete consistent version, and a crash mid-mutation leaves the
previous version live plus unreferenced garbage that the next
compaction removes.  The logical tables are resolved at read time:

* ``state_buckets``  = union(bucket files)  anti-join retired
* ``state_pairs``    = union(pair files)    anti-join retired (either
  endpoint) — pair RETIREMENT therefore writes nothing to the pair
  table at all: MinHash signatures and bucket memberships are strictly
  per-document, so a doc's retirement invalidates exactly the pairs
  that mention it, which the tombstone anti-join expresses for free.
* ``state_clusters`` = base rows not overridden and not retired, union
  the LATEST override per doc (overrides carry the op sequence number;
  the latest-wins window runs over the override set only, which is
  bounded by the deltas since the last compaction).

Maintenance algebra (identical to the catalog entries it twins,
hash-match pinned by tests/test_dedup_state.py):

* ``admit_docs`` — delta docs are shingled/hashed/banded (delta-sized);
  new candidate pairs come from the delta's buckets joined against the
  live bucket table **pre-filtered with a pushed-down ``bucket IN
  (delta's bucket hashes)`` predicate** — the base bucket table is
  written SORTED BY bucket, so parquet row-group min/max stats skip
  everything a real delta doesn't touch (the IO story that keeps
  admission ∝ delta at 100 TB, measured locally by
  tools/dedup_probe.py); only the state components those new edges
  touch are re-clustered together with the delta (merges — connected
  components run on an affected-subgraph, never the corpus).
* ``retire_docs`` — a tombstone write (pair/bucket state needs nothing
  else) plus an affected-component re-cluster of the SURVIVORS, since
  removing a bridge doc can SPLIT its cluster.
* ``compact_dedup_state`` — folds base+deltas+overrides+tombstones into
  fresh sorted base files, drains the tombstone/override sets, and
  garbage-collects unreferenced dirs (including crash leftovers).

Id discipline mirrors the IVF index (advice r11): admitting an id that
is live, or retired-but-not-yet-compacted, is REFUSED — visibility must
never depend on which files happen to be compacted.  Writer model: all
three mutations take the state dir's single-writer lease
(``ops/lease.py``); readers are never blocked.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import (
    candidate_pairs_from_buckets,
    connected_components,
    hashed_docs,
    lsh_buckets,
    minhash_signatures,
    shingled_docs,
)
from .lease import writer_lease
from .manifest import (
    merged_watermarks,
    publish_manifest,
    read_manifest,
    stream_watermark,
)

STATE_ROOT = "/tmp/dagger_dedup_state"
_LAYOUT = "v1"

_SHINGLE_K = 3
_NUM_HASHES = 16
_BANDS = 4


def _source_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}_{st.st_mtime_ns}"


def state_dir_for(sf_dir: str, tag: str = "") -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    base = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(
        STATE_ROOT,
        f"{base}_k{_SHINGLE_K}_h{_NUM_HASHES}_b{_BANDS}_{_LAYOUT}"
        f"_{_source_fingerprint(src)}",
    )
    return d + (f"_{tag}" if tag else "")


# ---------------------------------------------------------------------------
# manifest + pointer (shared protocol: ops/manifest.py)
# ---------------------------------------------------------------------------

_read_manifest = read_manifest
_publish = publish_manifest
_watermark = stream_watermark
_merged_watermarks = merged_watermarks


def _union_dirs(spark: SparkSession, state_dir: str, rels: list) -> DataFrame:
    return spark.read.parquet(*[os.path.join(state_dir, r) for r in rels])


# ---------------------------------------------------------------------------
# logical-table readers
# ---------------------------------------------------------------------------


def _retired(spark: SparkSession, state_dir: str, m: dict):
    if not m["retired"]:
        return None
    return _union_dirs(spark, state_dir, m["retired"]).select("doc_id")


def state_buckets(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id, band, bucket) — live LSH bucket memberships."""
    m = _read_manifest(state_dir)
    b = _union_dirs(spark, state_dir, m["buckets"])
    r = _retired(spark, state_dir, m)
    if r is not None:
        b = b.join(
            F.broadcast(r.select(F.col("doc_id").alias("id"))),
            "id", "left_anti",
        )
    return b.select("id", "band", "bucket")


def state_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id_a, id_b) — live candidate pairs.  Retirement is the tombstone
    anti-join: a pair is dead iff either endpoint is retired."""
    m = _read_manifest(state_dir)
    p = _union_dirs(spark, state_dir, m["pairs"])
    r = _retired(spark, state_dir, m)
    if r is not None:
        p = p.join(
            F.broadcast(r.select(F.col("doc_id").alias("id_a"))),
            "id_a", "left_anti",
        ).join(
            F.broadcast(r.select(F.col("doc_id").alias("id_b"))),
            "id_b", "left_anti",
        )
    # joins move their key to the front — pin the public column order
    return p.select("id_a", "id_b")


def state_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, cluster) — live cluster assignments: base rows not
    overridden/retired ∪ latest override per doc (not retired).  The
    latest-wins window runs over the OVERRIDE set only — bounded by the
    deltas since the last compaction, never corpus-sized."""
    m = _read_manifest(state_dir)
    base = _union_dirs(spark, state_dir, [m["cluster_base"]])
    r = _retired(spark, state_dir, m)
    if m["cluster_overrides"]:
        ov = _union_dirs(spark, state_dir, m["cluster_overrides"])
        latest = (
            ov.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy(F.desc("seq"))
                ),
            )
            .filter(F.col("__rk") == 1)
            .select("doc_id", "cluster")
        )
        base = base.join(
            F.broadcast(ov.select("doc_id").distinct()), "doc_id", "left_anti"
        ).unionByName(latest)
    if r is not None:
        base = base.join(F.broadcast(r), "doc_id", "left_anti")
    return base.select("doc_id", "cluster")


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def _delta_stage(new_docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, hs, nsh, sig) for a doc batch — the family's shared stage."""
    return minhash_signatures(
        hashed_docs(shingled_docs(new_docs, text_col, id_col, _SHINGLE_K)),
        _NUM_HASHES,
    )


def build_dedup_state(
    spark: SparkSession,
    sf_dir: str,
    corpus: DataFrame = None,
    tag: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Build (or reuse) the materialized dedup state for ``sf_dir``'s
    documents corpus.  Returns the state directory.  ``corpus`` overrides
    the default full-table scan (the admission tests build their base
    from a subset); ``tag`` keeps such a build from shadowing the
    canonical one.  Build publishes via tmp-dir + rename, losing racers
    verify the winner's marker — the ivf_index discipline."""
    from ..sources.files import load_table

    sd = state_dir_for(sf_dir, tag)
    if os.path.exists(os.path.join(sd, "_BUILT")):
        return sd
    docs = corpus if corpus is not None else load_table(spark, sf_dir, "documents")

    tmp = f"{sd}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    sigs = _delta_stage(docs, text_col, id_col).persist()
    try:
        buckets = lsh_buckets(sigs, _BANDS, _NUM_HASHES // _BANDS)
        # base sorted by bucket: the admission path's pushed-down
        # ``bucket IN (...)`` predicate then skips row groups via min/max
        # stats — the reason admission IO is ∝ delta, not corpus
        buckets.repartitionByRange(F.col("bucket")).sortWithinPartitions(
            "bucket"
        ).write.parquet(os.path.join(tmp, "buckets", "base"))
        pairs = candidate_pairs_from_buckets(
            spark.read.parquet(os.path.join(tmp, "buckets", "base"))
        )
        pairs.repartitionByRange("id_a", "id_b").sortWithinPartitions(
            "id_a", "id_b"
        ).write.parquet(os.path.join(tmp, "pairs", "base"))
        clusters = connected_components(
            docs.select(F.col(id_col).alias("id")),
            spark.read.parquet(os.path.join(tmp, "pairs", "base")).select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ),
        ).select(F.col("id").alias("doc_id"), "cluster")
        clusters.repartitionByRange("doc_id").sortWithinPartitions(
            "doc_id"
        ).write.parquet(os.path.join(tmp, "clusters", "base"))
    finally:
        sigs.unpersist()

    _publish(tmp, {
        "version": 1,
        "seq": 0,
        "buckets": ["buckets/base"],
        "pairs": ["pairs/base"],
        "cluster_base": "clusters/base",
        "cluster_overrides": [],
        "retired": [],
    })
    open(os.path.join(tmp, "_BUILT"), "w").close()
    try:
        os.rename(tmp, sd)
    except OSError:
        if not os.path.exists(os.path.join(sd, "_BUILT")):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return sd


# ---------------------------------------------------------------------------
# admission
# ---------------------------------------------------------------------------


def _maybe_auto_compact(
    spark: SparkSession, state_dir: str, max_files: int
) -> bool:
    """Run ``_compact_locked`` (the caller already holds the lease) when
    any logical table's manifest file list outgrew ``max_files`` — the
    LSM decay answer wired into the mutation path (round-12 verdict ask
    #2, mirroring the IVF index's ``auto_compact_max_files``): a
    long-running ingest feed otherwise stacks delta/override/tombstone
    files until a MANUAL compaction, degrading every read unboundedly.
    The check is pure manifest metadata (no IO); the fold itself is the
    ordinary compaction, so steady-state mutation cost stays
    delta-proportional while read cost stays bounded no matter how many
    micro-batches arrive (tools/dedup_probe.py measures exactly this)."""
    m = _read_manifest(state_dir)
    if max(
        len(m["buckets"]), len(m["pairs"]),
        len(m["cluster_overrides"]), len(m["retired"]),
    ) <= max_files:
        return False
    _compact_locked(spark, state_dir)
    return True


def admit_docs(
    spark: SparkSession,
    state_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int = None,
    stream: str = "ingest",
    auto_compact_max_files: int = None,
) -> dict:
    """Admit a document batch into the state at delta cost.  Writes the
    delta's buckets, the new candidate pairs, and cluster overrides for
    the affected components ∪ delta, then publishes a new manifest
    version.  After admission the state is indistinguishable from a
    from-scratch build over the enlarged corpus (pinned by test + the
    catalog twin's verbatim full-recompute oracle).

    Refuses ids that are live (duplicate admission) or retired-without-
    compaction (resurrection ambiguity — the ivf_index id-reuse rule).
    Returns {admitted, new_pairs, affected_components, version}.

    ``batch_id`` (the streaming-ingest form, streaming/dedup_ingest.py)
    makes admission EXACTLY-ONCE under at-least-once replay: the id is
    recorded under the ``stream`` key of the manifest's watermarks dict,
    and the manifest's atomic pointer swing is the single commit point
    of the whole mutation — a replayed micro-batch (id <= the recorded
    watermark) is skipped with {skipped: True}.  There is NO crash
    window: either the new manifest is live (files + watermark together)
    or the old one is — the protocol the IVF index adopted in round 13
    (ops/manifest.py).  Named streams keep an admission feed and a
    takedown feed independent on one state.

    ``auto_compact_max_files`` (opt-in) folds the state when any logical
    table's delta-file count crosses the threshold — see
    ``_maybe_auto_compact``.
    """
    if not os.path.exists(os.path.join(state_dir, "_BUILT")):
        raise ValueError(f"not a built dedup state: {state_dir}")
    with writer_lease(state_dir):
        out = _admit_locked(
            spark, state_dir, new_docs, text_col, id_col, batch_id, stream
        )
        if auto_compact_max_files is not None and not out.get("skipped"):
            _maybe_auto_compact(spark, state_dir, auto_compact_max_files)
        return out


def _admit_locked(
    spark: SparkSession,
    state_dir: str,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    batch_id: int = None,
    stream: str = "ingest",
) -> dict:
    m = _read_manifest(state_dir)
    last_bid = _watermark(m, stream)
    if batch_id is not None and last_bid is not None and batch_id <= last_bid:
        return {
            "admitted": 0, "new_pairs": 0, "affected_components": 0,
            "version": m["version"], "skipped": True,
        }
    seq = m["seq"] + 1

    pinned = []  # persisted frames to release on exit

    def _pin(df: DataFrame) -> DataFrame:
        pinned.append(df.persist())
        return df

    sigs = _pin(_delta_stage(new_docs, text_col, id_col))
    try:
        delta_ids = [r["id"] for r in sigs.select("id").distinct().collect()]
        # ^ bounded: admission batches are operationally delta-sized (the
        #   probe admits 40 docs; a production ingest admits a micro-batch)
        if not delta_ids:
            if batch_id is not None:
                # an empty-but-watermarked admission (e.g. a micro-batch
                # whose every row was dead-lettered) must still advance
                # the watermark, or its replay would re-emit dead letters
                _publish(state_dir, {
                    **{k: v for k, v in m.items() if not k.startswith("__")},
                    "version": m["version"] + 1,
                    "watermarks": _merged_watermarks(m, stream, batch_id),
                })
                return {
                    "admitted": 0, "new_pairs": 0,
                    "affected_components": 0, "version": m["version"] + 1,
                }
            return {
                "admitted": 0, "new_pairs": 0,
                "affected_components": 0, "version": m["version"],
            }

        # id gates (advice-r11 discipline shared with the IVF index).
        # ONE pinned cluster resolution serves the live gate, the
        # affected-component lookup, and the member expansion (review
        # r12: the gate used to build state_clusters a second time,
        # doubling the dominant base+override read per admission)
        cur = _pin(state_clusters(spark, state_dir))
        r = _retired(spark, state_dir, m)
        if r is not None:
            n_res = r.filter(F.col("doc_id").isin(delta_ids)).count()
            if n_res:
                raise ValueError(
                    f"{n_res} admitted id(s) are retired but not yet "
                    "compacted — re-admitting would resurrect their old "
                    "bucket/pair rows; run compact_dedup_state first"
                )
        live_clash = cur.filter(F.col("doc_id").isin(delta_ids)).count()
        if live_clash:
            raise ValueError(
                f"{live_clash} admitted id(s) are already live in the "
                "state — admission is insert-only (retire first to replace)"
            )

        delta_b = _pin(lsh_buckets(sigs, _BANDS, _NUM_HASHES // _BANDS))
        bucket_vals = [
            r["bucket"] for r in delta_b.select("bucket").distinct().collect()
        ]  # bounded: <= |delta| x bands values

        # new edges: delta buckets vs (live ∪ delta) buckets.  The live
        # side is PRE-FILTERED with bucket IN (delta's buckets) — pushed
        # to the parquet scan, where the sorted base's row-group min/max
        # stats skip every untouched range
        live_hit = state_buckets(spark, state_dir).filter(
            F.col("bucket").isin(bucket_vals)
        )
        right = live_hit.unionByName(delta_b)
        new_pairs = _pin(
            delta_b.select(
                F.col("id").alias("__did"),
                F.col("band").alias("__db"),
                F.col("bucket").alias("__dbk"),
            )
            .join(
                right,
                (F.col("__db") == F.col("band"))
                & (F.col("__dbk") == F.col("bucket"))
                & (F.col("__did") != F.col("id")),
            )
            .select(
                F.least(F.col("__did"), F.col("id")).alias("id_a"),
                F.greatest(F.col("__did"), F.col("id")).alias("id_b"),
            )
            .distinct()
        )

        # affected components: state components owning an endpoint of a
        # new edge — delta-bounded
        touched_old = (
            new_pairs.select(F.col("id_a").alias("doc_id"))
            .unionByName(new_pairs.select(F.col("id_b").alias("doc_id")))
            .filter(~F.col("doc_id").isin(delta_ids))
            .distinct()
        )
        affected = _pin(
            cur.join(F.broadcast(touched_old), "doc_id", "left_semi")
            .select("cluster")
            .distinct()
        )
        n_affected = affected.count()
        members = (
            cur.join(F.broadcast(affected), "cluster", "left_semi")
            .select("doc_id")
            .unionByName(
                sigs.select(F.col("id").alias("doc_id")).distinct()
            )
        )
        # edges among members: state edges live inside state components
        # (both endpoints affected or neither), new edges made their old
        # endpoint's component affected — so a both-endpoint restriction
        # of (state ∪ new) pairs is exactly the affected subgraph
        m_a = F.broadcast(members.select(F.col("doc_id").alias("id_a")))
        m_b = F.broadcast(members.select(F.col("doc_id").alias("id_b")))
        edges = (
            state_pairs(spark, state_dir)
            .unionByName(new_pairs)
            .join(m_a, "id_a", "left_semi")
            .join(m_b, "id_b", "left_semi")
        )
        re_cc = connected_components(
            members.select(F.col("doc_id").alias("id")),
            edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        )

        # delta-sized writes, then the atomic publish
        b_rel = f"buckets/d{seq:06d}"
        p_rel = f"pairs/d{seq:06d}"
        o_rel = f"clusters/o{seq:06d}"
        # mode("overwrite") on every seq-owned dir: a mutation that crashed
        # before its pointer swing leaves these same paths as
        # UNREFERENCED garbage (the manifest still names the old seq) —
        # the next mutation reuses the seq number and must clobber them,
        # not fail with path-already-exists (review r12)
        delta_b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, b_rel)
        )
        new_pairs.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, p_rel)
        )
        re_cc.select(
            F.col("id").alias("doc_id"),
            "cluster",
            F.lit(seq).cast("long").alias("seq"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, o_rel)
        )

        n_new_pairs = new_pairs.count()
        out = {
            "admitted": len(delta_ids),
            "new_pairs": n_new_pairs,
            "affected_components": n_affected,
            "version": m["version"] + 1,
        }
        _publish(state_dir, {
            **{k: v for k, v in m.items() if not k.startswith("__")},
            "version": m["version"] + 1,
            "seq": seq,
            "buckets": m["buckets"] + [b_rel],
            "pairs": m["pairs"] + [p_rel],
            "cluster_overrides": m["cluster_overrides"] + [o_rel],
            # direct calls (batch_id None) PRESERVE every stream's
            # watermark (the ivm.py advice-r11 lesson): erasing one would
            # let a stream resume double-apply replayed batches
            "watermarks": _merged_watermarks(m, stream, batch_id),
        })
        return out
    finally:
        for df in pinned:
            df.unpersist()


# ---------------------------------------------------------------------------
# retirement
# ---------------------------------------------------------------------------


def retire_docs(
    spark: SparkSession,
    state_dir: str,
    doc_ids: DataFrame,
    id_col: str = "doc_id",
    batch_id: int = None,
    stream: str = "takedown",
    auto_compact_max_files: int = None,
) -> dict:
    """Retire documents from the state at delta cost: one tombstone write
    (the pair/bucket tables are maintained for free by the read-time
    anti-join) plus cluster overrides for the SURVIVING members of the
    affected components — a bridge doc's retirement SPLITS its cluster,
    so the survivors re-run connected components over their surviving
    edges.  Retiring an id that is not live is a TRUE no-op: it is
    reported in the stats (``not_live``) and nothing is recorded, so an
    out-of-order takedown (id retired before it was ever admitted) can
    never block that id's later admission (review r12 — a recorded
    tombstone would have, until a compaction).
    Returns {retired, not_live, affected_components, version}.

    ``batch_id`` gives a TAKEDOWN FEED the same exactly-once manifest
    watermark admissions have (streaming/dedup_ingest.py
    run_dedup_takedown_stream); the default stream name 'takedown' keeps
    its batch-id sequence independent of the admission feed's.
    ``auto_compact_max_files``: as in ``admit_docs``."""
    if not os.path.exists(os.path.join(state_dir, "_BUILT")):
        raise ValueError(f"not a built dedup state: {state_dir}")
    with writer_lease(state_dir):
        out = _retire_locked(
            spark, state_dir, doc_ids, id_col, batch_id, stream
        )
        if auto_compact_max_files is not None and not out.get("skipped"):
            _maybe_auto_compact(spark, state_dir, auto_compact_max_files)
        return out


def _retire_locked(
    spark: SparkSession,
    state_dir: str,
    doc_ids: DataFrame,
    id_col: str,
    batch_id: int = None,
    stream: str = "takedown",
) -> dict:
    m = _read_manifest(state_dir)
    last_bid = _watermark(m, stream)
    if batch_id is not None and last_bid is not None and batch_id <= last_bid:
        return {"retired": 0, "affected_components": 0,
                "version": m["version"], "skipped": True}
    seq = m["seq"] + 1
    req = doc_ids.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    req_list = [r["doc_id"] for r in req.collect()]
    # ^ bounded: retirement batches are takedown/TTL lists, delta-sized

    pinned = [state_clusters(spark, state_dir).persist()]
    cur = pinned[0]
    try:
        # retire only ids that are LIVE (review r12): tombstoning an id
        # that was never admitted would BLOCK its later admission until a
        # compaction — making the docstring's "not live is a harmless
        # no-op" false and an out-of-order takedown feed a silent trap.
        # Not-live ids are reported, not recorded.
        rid_list = [
            r["doc_id"]
            for r in cur.filter(F.col("doc_id").isin(req_list))
            .select("doc_id").collect()
        ] if req_list else []
        rids = req.filter(F.col("doc_id").isin(rid_list))
        if not rid_list:
            if batch_id is not None:
                _publish(state_dir, {
                    **{k: v for k, v in m.items() if not k.startswith("__")},
                    "version": m["version"] + 1,
                    "watermarks": _merged_watermarks(m, stream, batch_id),
                })
                return {"retired": 0, "not_live": len(req_list),
                        "affected_components": 0,
                        "version": m["version"] + 1}
            return {"retired": 0, "not_live": len(req_list),
                    "affected_components": 0, "version": m["version"]}
        affected = (
            cur.filter(F.col("doc_id").isin(rid_list))
            .select("cluster")
            .distinct()
            .persist()
        )
        pinned.append(affected)
        n_affected = affected.count()
        members = (
            cur.join(F.broadcast(affected), "cluster", "left_semi")
            .filter(~F.col("doc_id").isin(rid_list))
            .select("doc_id")
        )
        m_a = F.broadcast(members.select(F.col("doc_id").alias("id_a")))
        m_b = F.broadcast(members.select(F.col("doc_id").alias("id_b")))
        sub_edges = (
            state_pairs(spark, state_dir)
            .join(m_a, "id_a", "left_semi")
            .join(m_b, "id_b", "left_semi")
        )
        re_cc = connected_components(
            members.select(F.col("doc_id").alias("id")),
            sub_edges.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ),
        )

        r_rel = f"retired/r{seq:06d}"
        o_rel = f"clusters/o{seq:06d}"
        # overwrite: the seq-owned path may hold a crashed predecessor's
        # unreferenced garbage (review r12)
        rids.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, r_rel)
        )
        re_cc.select(
            F.col("id").alias("doc_id"),
            "cluster",
            F.lit(seq).cast("long").alias("seq"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, o_rel)
        )

        _publish(state_dir, {
            **{k: v for k, v in m.items() if not k.startswith("__")},
            "version": m["version"] + 1,
            "seq": seq,
            "cluster_overrides": m["cluster_overrides"] + [o_rel],
            "retired": m["retired"] + [r_rel],
            "watermarks": _merged_watermarks(m, stream, batch_id),
        })
        return {
            "retired": len(rid_list),
            "not_live": len(req_list) - len(rid_list),
            "affected_components": n_affected,
            "version": m["version"] + 1,
        }
    finally:
        for df in pinned:
            df.unpersist()


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def compact_dedup_state(spark: SparkSession, state_dir: str) -> dict:
    """Fold base+deltas+overrides+tombstones into fresh sorted base files,
    drain the tombstone/override sets, and garbage-collect data dirs with
    ONE-VERSION retention: dirs referenced by neither the new nor the
    immediately-previous manifest are removed (crash leftovers go at
    once), while the previous version's files survive one compaction
    cycle so a reader that resolved the old manifest can finish its lazy
    reads — the vacuum-retention discipline every transaction-log store
    needs.  Readers are never blocked: the fold writes new dirs and the
    pointer swing is atomic.  Returns {version, gc_dirs}."""
    if not os.path.exists(os.path.join(state_dir, "_BUILT")):
        raise ValueError(f"not a built dedup state: {state_dir}")
    with writer_lease(state_dir):
        return _compact_locked(spark, state_dir)


def _compact_locked(spark: SparkSession, state_dir: str) -> dict:
    m = _read_manifest(state_dir)
    v = m["version"] + 1
    b_rel = f"buckets/base_{v:06d}"
    p_rel = f"pairs/base_{v:06d}"
    c_rel = f"clusters/base_{v:06d}"
    state_buckets(spark, state_dir).repartitionByRange(
        F.col("bucket")
    ).sortWithinPartitions("bucket").write.mode("overwrite").parquet(
        os.path.join(state_dir, b_rel)
    )
    state_pairs(spark, state_dir).repartitionByRange(
        "id_a", "id_b"
    ).sortWithinPartitions("id_a", "id_b").write.mode("overwrite").parquet(
        os.path.join(state_dir, p_rel)
    )
    state_clusters(spark, state_dir).repartitionByRange(
        "doc_id"
    ).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
        os.path.join(state_dir, c_rel)
    )
    _publish(state_dir, {
        "version": v,
        "seq": m["seq"],
        "buckets": [b_rel],
        "pairs": [p_rel],
        "cluster_base": c_rel,
        "cluster_overrides": [],
        "retired": [],
        # the fold must not erase any stream's watermark: a stream
        # resuming after a compaction would otherwise re-apply
        # replayed batches
        "watermarks": m.get("watermarks") or {},
    })
    # GC with ONE-VERSION retention (review r12): a reader that
    # resolved the pre-compaction manifest may still be running its
    # (lazy) Spark jobs over that version's files — deleting them at
    # the pointer swing would fail those reads mid-flight.  Keep
    # everything the PREVIOUS manifest references (and the manifest
    # itself) for one more compaction cycle; GC only dirs that
    # neither manifest names — which still sweeps crash leftovers
    # immediately.  The retained version falls out on the NEXT
    # compaction; readers only need to re-resolve within one cycle.
    keep = {b_rel, p_rel, c_rel}
    keep |= set(m["buckets"]) | set(m["pairs"]) | {m["cluster_base"]}
    keep |= set(m["cluster_overrides"]) | set(m["retired"])
    gc = 0
    for table in ("buckets", "pairs", "clusters", "retired"):
        tdir = os.path.join(state_dir, table)
        if not os.path.isdir(tdir):
            continue
        for d in os.listdir(tdir):
            rel = f"{table}/{d}"
            if rel not in keep:
                shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                gc += 1
    # manifests: keep the live one and its predecessor
    live = {f"manifest_v{v}.json", m["__name"]}
    for fn in os.listdir(state_dir):
        if fn.startswith("manifest_v") and fn not in live:
            os.unlink(os.path.join(state_dir, fn))
    return {"version": v, "gc_dirs": gc}
