"""Driver-window rotation invariants (round-5 verdict item 6).

The driver's correctness gate verifies the FIRST ~50 entries of
``__spark_entry__.queries()``.  Rounds 3-4 re-proved the same 50 names
while 122 catalog queries never earned a driver-verified row; rotation is
now the convention, and this module makes it mechanical: the committed
CORRECTNESS_r*.json artifacts ARE the persistent record of cumulative
driver coverage (round-5 advice: derive the verified set from the
artifacts rather than a hand-maintained list), and the current window must
keep converting never-verified names until the catalog is fully covered.
"""

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_SIZE = 50  # the driver checks the first ~50 queries() entries


def _artifacts() -> dict:
    """{round_number: path} for every committed CORRECTNESS_r*.json."""
    out = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        num = os.path.basename(f)[len("CORRECTNESS_r"):-len(".json")]
        if num.isdigit():
            out[int(num)] = f
    return out


def _driver_verified(before_round: int) -> set:
    """Union of names with a green driver row across the committed
    CORRECTNESS artifacts of rounds STRICTLY BEFORE ``before_round``
    (hash-match, or rows-match for oracle-less)."""
    out = set()
    for rnd, f in _artifacts().items():
        if rnd >= before_round:
            continue
        for name, r in json.load(open(f)).items():
            if r.get("err") is None and (
                r.get("hash_match") or r.get("rows_match")
            ):
                out.add(name)
    return out


def test_window_names_exist_and_unique():
    from __spark_entry__ import _DRIVER_WINDOW, queries

    qs = queries()
    assert len(_DRIVER_WINDOW) == len(set(_DRIVER_WINDOW)), "duplicate names"
    missing = [n for n in _DRIVER_WINDOW if n not in qs]
    assert not missing, missing
    # the window is the front of the ordering the driver consumes
    assert list(qs)[: len(_DRIVER_WINDOW)] == _DRIVER_WINDOW


def test_rotation_advances_until_full_coverage():
    """While oracle-paired queries remain that no committed correctness
    artifact has verified, the gate window must be spending most of its
    non-anchor budget on them — the mechanical form of 'rotate ≥35 new
    names per round' that would have caught rounds 3-4's stagnation."""
    from __spark_entry__ import _DRIVER_WINDOW, _WINDOW_ROUND
    from dagger_spark.catalog import QUERIES

    # stall guard: a committed artifact from _WINDOW_ROUND or later means a
    # round has completed since this window was authored — re-author it
    stale = [r for r in _artifacts() if r > _WINDOW_ROUND]
    assert not stale, (
        f"CORRECTNESS round(s) {stale} postdate the window authored in "
        f"round {_WINDOW_ROUND}: rotate _DRIVER_WINDOW and bump "
        f"_WINDOW_ROUND in __spark_entry__.py"
    )
    verified = _driver_verified(_WINDOW_ROUND)
    assert verified, "no CORRECTNESS artifacts committed?"
    never = {
        n for n, q in QUERIES.items()
        if q.oracle is not None and n not in verified
    }
    if not never:
        pytest.skip("full oracle-paired driver coverage reached")
    window = set(_DRIVER_WINDOW[:GATE_SIZE])
    converting = window & never
    # demand the window converts as many never-verified names as fit beside
    # the ~15 family anchors (or all of them, once fewer remain)
    need = min(len(never), GATE_SIZE - 15)
    assert len(converting) >= need, (
        f"window converts only {len(converting)} never-driver-verified "
        f"names; {len(never)} remain: {sorted(never - window)[:10]}..."
    )


def test_changed_code_queries_in_gate_window():
    """Queries whose implementation changed this round must sit inside the
    driver-checked window: changed code re-earns its driver row.  Round 14:
    the one-call literal-array conversion (LSH planes, IVF centroids, PQ
    codebook, JL sign matrix, SQ8 grid, classifier hashing weights,
    language-id profiles), the memoized rule-condition/metadata builders,
    and the rank-primitive _bucket rewrite."""
    from __spark_entry__ import _DRIVER_WINDOW

    window = set(_DRIVER_WINDOW[:GATE_SIZE])
    for name in (
        # one-call literal arrays (ops/similarity + ops/ivf_index)
        "ann_rp", "ann_lsh", "ann_ivf", "ann_pq_adc", "ann_recall",
        "ann_ndcg_embeddings", "ann_ivf_sq8", "ann_ivf_sq8_indexed",
        "lsh_recall_docs", "kmeans_step_embeddings",
        "power_iteration_embeddings", "semdedup_embeddings",
        "embedding_neardup",
        # classifier weights + language profiles (ops/text)
        "quality_policy_docs", "quality_classifier_docs",
        "classifier_auc_docs", "pipeline_verdict_docs",
        "language_id_ngram_docs",
        # rank primitive (_bucket / percentile array)
        "hybrid_rrf_docs", "quantile_normalize_docs",
        "customer_rfm_segments", "orders_woe_binning",
    ):
        assert name in window, name
