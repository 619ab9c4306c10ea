"""Round-12 catalog additions: the dedup lifecycle measured AGAINST the
state at rest (round-11 verdict ask #2).

The round-11 admission/retirement entries (catalog/round11.py) prove the
maintenance algebra but rebuild their "state" from scratch inside every
run — their bench numbers price a full clustering, not the maintained
delta.  These twins read ``ops/dedup_state.py``'s materialized state
dir: the state is built ONCE per corpus fingerprint and the
admission/retirement applied ONCE (idempotent via the manifest's op
sequence), so a repeated run — and therefore the bench — pays only the
versioned-manifest READ path: base + delta files, tombstone anti-joins,
and the latest-override window over the bounded override set.  The
delta cost of the mutations themselves is measured by
tools/dedup_probe.py (COVERAGE.md).  Oracles are the same full/reduced
recomputes the round-11 entries pinned: the maintained state must stay
indistinguishable from recomputing.
"""

from __future__ import annotations

from ._base import (
    DataFrame,
    F,
    QUERIES,
    SparkSession,
    _load_wide,
    register,
)
from .round11 import _RETIRE_MOD, _retire_clusters_oracle


def _apply_once(sd: str, mutate) -> None:
    """Apply a one-time state mutation guarded by manifest seq 0, treating
    a concurrent run's win as already-applied (advice r12): a bench and a
    correctness suite building the same tagged state can both observe
    seq == 0; the loser's admit/retire then raises the live-id / not-live
    ValueError (or finds the lease held) — re-read the manifest and
    accept seq > 0 as success instead of failing the run."""
    from ..ops.dedup_state import _read_manifest
    from ..ops.lease import ConcurrentWriterError, retry_concurrent

    if _read_manifest(sd)["seq"] != 0:
        return
    try:
        retry_concurrent(mutate)
    except (ValueError, ConcurrentWriterError):
        if _read_manifest(sd)["seq"] == 0:
            raise


def _admitted_state(spark: SparkSession, sf_dir: str) -> str:
    """State built over the corpus WITHOUT the delta slice (doc_id % 10
    == 0), the delta admitted exactly once — manifest seq 0 means the
    mutation has not been applied yet to this fingerprint's state."""
    from ..ops.dedup_state import admit_docs, build_dedup_state

    is_delta = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    docs = _load_wide(spark, sf_dir, "documents")
    sd = build_dedup_state(
        spark, sf_dir, corpus=docs.filter(~is_delta), tag="cat_admit"
    )
    _apply_once(sd, lambda: admit_docs(spark, sd, docs.filter(is_delta)))
    return sd


def _retired_state(spark: SparkSession, sf_dir: str) -> str:
    """Full-corpus state with the retirement slice (doc_id % 10 ==
    _RETIRE_MOD) retired exactly once."""
    from ..ops.dedup_state import build_dedup_state, retire_docs

    docs = _load_wide(spark, sf_dir, "documents")
    sd = build_dedup_state(spark, sf_dir, tag="cat_retire")
    _apply_once(
        sd,
        lambda: retire_docs(
            spark, sd,
            docs.filter(
                F.pmod(F.col("doc_id"), F.lit(10)) == _RETIRE_MOD
            ).select("doc_id"),
        ),
    )
    return sd


@register(
    "dedup_state_clusters_docs",
    None,  # oracle attached below: dedup_clusters_docs' SQL VERBATIM
    "Cluster assignments read from the dedup state AT REST after an "
    "admission (ops/dedup_state.py — the state-at-rest twin of "
    "dedup_append_clusters_docs): the corpus-without-delta state was "
    "built once (fingerprinted dir, versioned manifest + atomic "
    "pointer), the delta slice admitted once at delta cost (delta-sized "
    "bucket/pair files + cluster overrides for affected components; new "
    "edges found via a pushed-down bucket IN-filter against the "
    "bucket-sorted base, so row-group stats skip untouched ranges), and "
    "every read — including this entry — resolves base ∪ latest "
    "overrides through the manifest.  What this entry benches is "
    "therefore the MAINTAINED read path, not a from-scratch clustering; "
    "the mutation's ∝-delta cost is measured by tools/dedup_probe.py.  "
    "Oracle: dedup_clusters_docs' recursive-CTE closure VERBATIM — the "
    "maintained state must be indistinguishable from a full recompute",
)
def dedup_state_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup_state import state_clusters

    sd = _admitted_state(spark, sf_dir)
    return state_clusters(spark, sd).orderBy("doc_id")


QUERIES["dedup_state_clusters_docs"] = QUERIES[
    "dedup_state_clusters_docs"
].__class__(
    QUERIES["dedup_state_clusters_docs"].fn,
    QUERIES["dedup_clusters_docs"].oracle,
    QUERIES["dedup_state_clusters_docs"].description,
)


@register(
    "dedup_state_pairs_docs",
    QUERIES["minhash_pairs_docs"].oracle,
    "Candidate-pair state read from the dedup state AT REST after the "
    "same admission as dedup_state_clusters_docs: the pair table is "
    "base ∪ delta-appended pair files with retirement expressed as a "
    "tombstone anti-join at read time (pairs are per-document facts, so "
    "a doc's retirement invalidates exactly the pairs naming it — no "
    "rewrite ever needed).  Oracle: the registered minhash-LSH pair SQL "
    "over the full corpus — base ∪ admitted deltas must equal the "
    "from-scratch bucket join",
)
def dedup_state_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup_state import state_pairs

    sd = _admitted_state(spark, sf_dir)
    return state_pairs(spark, sd).orderBy("id_a", "id_b")


@register(
    "dedup_state_retire_docs",
    None,  # composed oracle attached below (reduced recompute)
    "Cluster assignments read from the dedup state AT REST after a "
    "RETIREMENT (the state-at-rest twin of dedup_retire_clusters_docs): "
    "the full-corpus state was built once, the retirement slice "
    "tombstoned once (one delta-sized tombstone file — the bucket/pair "
    "tables need no write at all) with survivor re-clustering overrides "
    "for the affected components only (a bridge doc's removal SPLITS "
    "its cluster).  Reads resolve base minus tombstones ∪ latest "
    "overrides.  Oracle: the cluster closure recomputed over the "
    "reduced corpus — retire-then-read must equal recomputing without "
    "the retired docs",
)
def dedup_state_retire_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup_state import state_clusters

    sd = _retired_state(spark, sf_dir)
    return state_clusters(spark, sd).orderBy("doc_id")


QUERIES["dedup_state_retire_docs"] = QUERIES[
    "dedup_state_retire_docs"
].__class__(
    QUERIES["dedup_state_retire_docs"].fn,
    _retire_clusters_oracle(),
    QUERIES["dedup_state_retire_docs"].description,
)
