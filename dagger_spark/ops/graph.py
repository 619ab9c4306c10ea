"""Graph centrality: integer-scaled PageRank over DataFrame edge lists.

The production use in a training-data pipeline is quality weighting —
CommonCrawl-scale corpora weight documents/domains by link centrality
(Harmonic/PageRank) before sampling — and the similarity graph the dedup
family already builds (LSH candidate pairs) gives every corpus that
structure even without hyperlinks.

Why INTEGER-scaled: float PageRank sums contributions in partition order,
so cross-engine (and cross-partitioning) bit-equality is unattainable.
Ranks here live in micro-units (start 1_000_000); per-edge contributions
use integer division (``r div deg``), the damped update is
``150_000 + (85 * sum) div 100`` — every operation is order-free integer
arithmetic, so the DuckDB oracle (the same 10 iterations unrolled as
chained CTEs) matches hash-exactly.  The floor divisions shed mass, so
ranks are a deterministic centrality SCORE, not a probability
distribution — documented, and irrelevant for the ranking use.

Scale shape: one (src)-keyed join + one (dst)-keyed aggregate per
iteration — the textbook Pregel round as two shuffles (round one skips
the join: the initial rank vector is uniform); rank state is SPARSE
(only nodes with in-edges; everything else is pinned at the damped base
150_000 and re-attached once after the loop).  Lineage truncated per
round exactly like connected_components, and every join against the
truncated frame is hinted shuffle-hash (checkpointed frames carry no
stats; the files.py join-statistics rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    id_col: str = "id",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Ten damped rounds over a directed edge list (``src``, ``dst``).
    Returns (id, degree, rank_micro); dangling/isolated nodes hold the
    base rank 150_000.  ``nodes`` must carry every vertex (including
    edge-less ones).

    ``checkpoint_every`` trades lineage/plan depth against cached-state
    count: truncation is LAZY (``localCheckpoint(eager=False)`` — no
    dedicated job; the next consumer materializes and persists the
    partitions), so the stride's cost is how deep the plan grows between
    truncations vs how many checkpoint RDDs stay cached.  A 3-round
    stride bounds the plan at 3 iterations deep; set to 1 for very large
    graphs where executor memory pressure beats plan depth."""
    from .tuning import size_coalesced_rounds

    # deg is referenced twice (the edge-weight join AND the final degree
    # join): unpersisted, the final join's plan re-runs the whole edge
    # aggregation — which re-runs the caller's candidate-pair lineage
    # (guide §7.2 duplicated-subtree audit).  Node-sized; persist (it
    # stays persisted: it is in the returned frame's lineage).
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    # e ends in a src-keyed shuffled-hash join, so the persisted frame
    # carries hashpartitioning(src, P) — every round's contribution join
    # reuses it exchange-free (guide §2.4: two operations keyed the same
    # way share one exchange).
    e = edges.join(deg.hint("shuffle_hash"), "src").persist()
    base = nodes.select(F.col(id_col).alias("src"))
    # populate the edge cache BEFORE the size-coalesced scope: e's
    # lineage is the caller's pair pipeline, and byte-coalescing those
    # compute-heavy stages would serialize them (the CC lesson)
    e.count()
    # SPARSE rank state: after any round, a node's rank is 150_000 exactly
    # when it has no in-edge (the damped update with sum 0), and the
    # in-edge set is static — so `r` only needs the nodes the aggregate
    # produces, and the dense per-round `base` LEFT JOIN that re-attached
    # rank-150_000 rows disappears (guide §2.3: shuffle fewer rows, §1.2:
    # don't compute what the next step can infer).  Round 1 needs no rank
    # join at all: every node starts at the same 1_000_000.  The missing
    # rows are re-attached ONCE after the loop with the same coalesce.
    r = None  # None = the uniform initial rank vector
    # the in-loop jobs (eager checkpoints) shuffle a few (long, long)
    # columns per row: size-coalesce their post-shuffle partitions so the
    # ~2 stages/round stop paying 32 near-empty tasks each (ops/tuning)
    with size_coalesced_rounds(nodes.sparkSession):
        for i in range(iters):
            if r is None:
                contrib = e.select(
                    F.col("dst").alias("src"),
                    F.expr("1000000L div deg").alias("c"),
                )
            else:
                contrib = e.join(
                    r.hint("shuffle_hash"), "src", "left"
                ).select(
                    F.col("dst").alias("src"),
                    F.expr("coalesce(r, 150000L) div deg").alias("c"),
                )
            inc = contrib.groupBy("src").agg(F.sum("c").alias("s"))
            r = inc.select(
                "src",
                (F.lit(150_000) + F.expr("(85 * s) div 100"))
                .cast("long").alias("r"),
            )
            if (i + 1) % checkpoint_every == 0 or i == iters - 1:
                # LAZY: truncation (LogicalRDD) happens either way; the
                # eager count job is redundant because the next round's
                # contrib join (and the final dense join) reference r
                # exactly ONCE — correctness never depends on WHEN the
                # marked RDD materializes, only that it is persisted.
                # With AQE on (this engine's default) the shuffle stages
                # materialize at the first consumer and the cached blocks
                # are reused; with AQE off nothing runs until the caller's
                # first action and back-to-back checkpoint marks can leave
                # an inner marked RDD cached-but-untruncated until GC
                # (checkpointAllMarkedAncestors defaults false) — a memory
                # profile note, not a correctness one
                r = r.localCheckpoint(eager=False)  # truncate lineage
    if r is None:  # iters == 0: every node still holds the initial rank
        dense = base.select("src", F.lit(1_000_000).cast("long").alias("r"))
    else:
        dense = base.join(r.hint("shuffle_hash"), "src", "left").select(
            "src", F.coalesce(F.col("r"), F.lit(150_000).cast("long"))
            .alias("r"),
        )
    out = (
        dense.withColumnRenamed("src", id_col)
        .join(
            deg.withColumnRenamed("src", id_col).hint("shuffle_hash"),
            id_col, "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("degree"),
            F.col("r").alias("rank_micro"),
        )
    )
    e.unpersist()
    return out


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    id_col: str = "id",
    label_col: str = "community",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.)
    made DETERMINISTIC: each round every node adopts the most frequent
    label among its NEIGHBORS, ties broken by the smallest label, isolated
    nodes keep their own.  Classic LPA randomizes update order to escape
    oscillation; this engine instead fixes a bounded round count and a
    total tie-order, trading convergence guarantees for reproducibility —
    the same determinism-over-asymptotics choice as the bounded k-core
    peel, and what makes the unrolled-CTE DuckDB oracle hash-match.

    Differs from connected components (min-label) in that labels move by
    LOCAL MAJORITY, so a sparse bridge between two dense near-dup blobs
    does not merge them — community structure, not mere reachability.

    Scale shape per round: one (neighbor)-keyed join to fetch labels + one
    (node, label) count aggregate + one max_by reduce — three shuffles on
    the edge list (round one skips the join: labels start as own ids),
    state is one label per CONNECTED node (sparse; isolated nodes are
    re-attached once after the loop).  ``max_by(label, struct(cnt,
    -label))`` picks (max count, then min label) in a single order-free
    reduce; lineage truncates on a stride like pagerank_int.

    ``edges`` must be SYMMETRIZED (src, dst); ``nodes`` carries every
    vertex via ``id_col``."""
    from .tuning import size_coalesced_rounds

    e = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).persist()
    # populate the edge cache before the scope (see pagerank_int)
    e.count()
    # SPARSE label state: a node's label can only ever move if it has a
    # neighbor, and the winner aggregate produces exactly the nodes with
    # ≥1 edge — so `win` alone IS the label state (everything else keeps
    # its own id forever), and the dense per-round `lab` LEFT JOIN that
    # re-attached never-updated rows disappears (same algebra as
    # pagerank_int's sparse rank).  Round 1 needs no label join at all:
    # every neighbor's label starts as its own id.
    win = None  # None = the initial own-id labelling
    # size-coalesce the rounds' tiny post-shuffle partitions (ops/tuning:
    # same rationale as pagerank_int)
    with size_coalesced_rounds(nodes.sparkSession):
        for i in range(rounds):
            if win is None:
                nbr_labels = e.select(
                    "node", F.col("nbr").cast("long").alias("lbl")
                )
            else:
                nbr_labels = e.join(
                    win.withColumnRenamed("node", "nbr")
                    .hint("shuffle_hash"),
                    "nbr", "left",
                ).select(
                    "node",
                    F.coalesce(F.col("w"), F.col("nbr").cast("long"))
                    .alias("lbl"),
                )
            votes = nbr_labels.groupBy("node", "lbl").agg(
                F.count(F.lit(1)).alias("c")
            )
            # max over (count, -label) == most frequent, smallest label
            # on ties
            win = votes.groupBy("node").agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), (-F.col("lbl")))
                ).alias("w")
            )
            if (i + 1) % checkpoint_every == 0 or i == rounds - 1:
                # LAZY for the same single-consumer reason as pagerank_int
                win = win.localCheckpoint(eager=False)
    base = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).cast("long").alias("own")
    )
    if win is None:  # rounds == 0: every node keeps its own id
        lab = base.select("node", F.col("own").alias("lbl"))
    else:
        lab = base.join(win.hint("shuffle_hash"), "node", "left").select(
            "node", F.coalesce("w", "own").alias("lbl")
        )
    out = lab.select(
        F.col("node").alias(id_col), F.col("lbl").alias(label_col)
    )
    e.unpersist()
    return out
