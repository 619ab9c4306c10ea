"""Scoped runtime tuning for iterative rounds.

AQE's partition coalescing defaults to ``parallelismFirst=true``: small
post-shuffle outputs are split to keep every core busy rather than packed
to ``advisoryPartitionSizeInBytes``.  That is the right default for ONE
compute-heavy stage, but an iterative operator (PageRank, label
propagation, large-star/small-star components, k-core peeling) runs tens
of back-to-back stages whose shuffled payload is a few thousand
(long, long) rows — per-task overhead times 32 partitions times ~30
stages dwarfs the compute, and the guide's own production advice
(§2.2 "fewer, larger reduce partitions", §9) is to size partitions by
bytes and let parallelism follow data volume.

``size_coalesced_rounds`` flips ``parallelismFirst`` off for the duration
of an iterative loop and restores it after, so:

  * in-loop jobs (convergence fingerprints, the consumers that
    materialize the lazily-checkpointed round state) run with
    byte-sized coalescing — a 40 KB shuffle becomes one task, a
    10 GB shuffle still gets ~160 tasks at the 64 MB advisory default, so
    the setting is scale-ADAPTIVE, not a local-core-count constant;
  * everything outside the loop (Python stages, scans, wide aggregations)
    keeps the stock behaviour — a session-wide flip would serialize
    small-byte but CPU-heavy stages such as grouped pandas UDFs.

Measured (sf0.1, local[32], warm): pagerank_docs' 10 rounds 11.6 s ->
7.2 s with no other change; see OPTIMIZATION_r13.md.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_PFIRST = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


@contextmanager
def size_coalesced_rounds(spark: SparkSession):
    """Within the block, AQE packs post-shuffle partitions to the
    advisory byte size instead of splitting for parallelism.  Restores
    the previous value on exit (exception-safe).  The conf is
    runtime-settable and read per-query, so only jobs *submitted inside
    the block* are affected."""
    try:
        saved = spark.conf.get(_PFIRST)
    except Exception:  # pragma: no cover - conf always exists on 3.2+
        saved = None
    spark.conf.set(_PFIRST, "false")
    try:
        yield
    finally:
        if saved is None:
            spark.conf.unset(_PFIRST)
        else:
            spark.conf.set(_PFIRST, saved)
