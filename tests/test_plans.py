"""Plan-quality regression tests: the physical properties the 100 TB design
depends on must survive refactors — pushdown reaching parquet, pruned read
schemas, shuffle-free stateless rule evaluation, broadcast dimensions."""

import contextlib
import io

import pytest

from dagger_spark.catalog import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(QUERIES["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed
    # projection pruning: only the three involved columns reach the scan
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_returnflag" not in schema
    assert "l_extendedprice" in schema


def test_stateless_rules_plan_has_no_shuffle(spark, sysmon_df):
    from dagger_spark.rules.builtin import active_rules
    from dagger_spark.rules.engine import apply_rules_single_pass

    plan = _plan(apply_rules_single_pass(sysmon_df, active_rules()))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    # the only join is the broadcast against rule metadata
    assert "BroadcastHashJoin" in plan


def test_rules_scan_prunes_event_data_fields(spark, sysmon_df):
    from dagger_spark.rules.builtin import active_rules
    from dagger_spark.rules.engine import apply_rules_single_pass

    alerts = apply_rules_single_pass(sysmon_df, active_rules())
    fmt = _formatted(alerts)
    schema_line = next(l for l in fmt.splitlines() if "ReadSchema" in l)
    # predicates touch a subset of the 40+ event_data members; a field no
    # rule references must not be read
    assert "TargetImage" in schema_line
    assert "Company" not in schema_line
    assert "LogonId" not in schema_line


def test_dim_joins_broadcast_small_side(spark, sf_dir):
    plan = _plan(QUERIES["q5_region_volume"].fn(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3  # region/nation/customer/supplier
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        ("q1_pricing_summary", 1),
        ("exact_dedup_docs", 1),
        # events_hourly carries count(DISTINCT user_id): Spark expands the
        # exact distinct into a two-level aggregate — 2 shuffles is the
        # semantic minimum, not a regression
        ("events_hourly", 2),
    ],
)
def test_minimal_shuffle_aggregations(spark, sf_dir, name, max_shuffles):
    plan = _plan(QUERIES[name].fn(spark, sf_dir))
    n = plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
    assert n <= max_shuffles, f"{name} plans {n} shuffles:\n{plan[:1500]}"
    assert "partial_" in plan  # map-side partial aggregation present


def test_jaccard_verify_runs_on_hashed_arrays(spark, sf_dir):
    """The Jaccard verify loop must stay on 60-bit integer arrays with the
    union size computed arithmetically: no union array materialized, no
    md5/string work inside the per-pair expressions (all string hashing is
    staged once per doc, upstream of the candidate join)."""
    df = QUERIES["jaccard_pairs_docs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_union" not in plan, "union array re-materialized in verify"
    post_join = plan.split("Join", 1)[0]  # ops above the verify join
    assert "md5" not in post_join, "string hashing leaked into the pair loop"


def _walk_physical(jnode):
    """Yield every physical node, descending through AQE wrappers (the
    adaptive root re-plans behind ``executedPlan()``; materialized query
    stages hide their subtree behind ``plan()``)."""
    yield jnode
    name = jnode.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from _walk_physical(jnode.executedPlan())
        return
    if "QueryStage" in name:
        yield from _walk_physical(jnode.plan())
        return
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _walk_physical(ch.apply(i))


def _is_literal_class(jnode) -> bool:
    """A subtree is literal-class (safe to broadcast into a nested-loop
    join at ANY corpus scale) when its row count is bounded by construction:
    a grand-total aggregate (1 row), an in-plan literal batch, an explicit
    limit/top-k cap, or a literal range/IN cap on a unique id column (the
    query-batch and tuning-gauge patterns: ``vec_id < 8``, ``id < 500``)."""
    import re

    for n in _walk_physical(jnode):
        name = n.nodeName()
        if name == "HashAggregate" and n.groupingExpressions().isEmpty():
            return True
        if name in ("LocalTableScan", "TakeOrderedAndProject"):
            return True
        if name.endswith("Limit") or name == "CollectLimit":
            return True
        if name == "Filter":
            cond = n.condition().toString()
            if re.search(r"\b\w*id#\d+L? (?:<|<=|=) \d+\b", cond) or re.search(
                r"\b\w*id#\d+L? IN \(", cond
            ):
                return True
    return False


# BNLJ-bearing representatives across the three intentional patterns:
# crossJoin(broadcast(1-row aggregate)) [cusum, zipf slope], broadcast
# literal query batch [ann_brute_force's 3-row query terms], and the
# capped tuning-gauge truth side [lsh_recall_docs, <=500 docs].
_BNLJ_QUERIES = [
    "events_cusum_shift",
    "zipf_slope_docs",
    "ann_brute_force",
    "lsh_recall_docs",
]


@pytest.mark.parametrize("name", _BNLJ_QUERIES)
def test_bnlj_build_side_is_literal_class(spark, sf_dir, name):
    """Round-3 audit blind spot, now pinned: BroadcastNestedLoopJoin is the
    one join shape that degenerates at scale unless its broadcast side is a
    literal-class frame.  Every BNLJ in the catalog must broadcast a
    1-row/limited/literal subtree — and CartesianProduct must never appear."""
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()  # finalize AQE: runtime stats decide the actual join shapes
    root = df._jdf.queryExecution().executedPlan()
    n_cartesian = 0
    bnljs = []
    for n in _walk_physical(root):
        nm = n.nodeName()
        if nm == "CartesianProduct":
            n_cartesian += 1
        elif nm == "BroadcastNestedLoopJoin":
            bnljs.append(n)
    assert n_cartesian == 0, f"{name}: cartesian product in final plan"
    for j in bnljs:
        ch = j.children()
        sides = [ch.apply(i) for i in range(ch.size())]
        assert any(_is_literal_class(s) for s in sides), (
            f"{name}: BNLJ broadcasts an UNBOUNDED side:\n"
            + j.toString()[:1200]
        )


def test_pairwise_cosine_norms_are_staged(spark, sf_dir):
    """Pairwise similarity joins must stage each side's norm in a per-row
    projection: above the join there is exactly one aggregate fold per score
    (the dot product), not three (dot + two norm re-folds per pair)."""
    df = QUERIES["embedding_neardup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    above_join = plan.split("Join", 1)[0]
    assert above_join.count("aggregate(") == 1, above_join[:800]
