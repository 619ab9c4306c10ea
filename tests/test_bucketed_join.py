"""Bucketed co-located join: the custkey join must read join-ready
buckets — zero Exchange AND zero Sort anywhere under the SortMergeJoin."""

from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from tests.test_plans import _walk_physical

SF = "/root/testdata/sf0.01"


def _subtree_nodes(jnode):
    out = []
    stack = [jnode]
    while stack:
        n = stack.pop()
        out.append(n.nodeName())
        name = n.nodeName()
        if "QueryStage" in name:
            stack.append(n.plan())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def test_bucketed_join_has_no_exchange_or_sort_under_join(spark):
    from dagger_spark.catalog.round9 import _bucketed_join_lazy, _scoped_conf

    with _scoped_conf(
        spark, "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    ):
        df = _bucketed_join_lazy(spark, SF)
        df.collect()  # finalize AQE
        root = df._jdf.queryExecution().executedPlan()
    smj = [n for n in _walk_physical(root) if n.nodeName() == "SortMergeJoin"]
    assert smj, "expected a SortMergeJoin over the bucketed tables"
    for j in smj:
        names = _subtree_nodes(j)[1:]  # exclude the join node itself
        bad = [n for n in names if "Exchange" in n or n == "Sort"]
        assert not bad, f"bucketed join subtree contains {bad}"
        assert any("Scan" in n for n in names)


def test_bucketed_layout_on_disk(spark):
    QUERIES["orders_customer_bucketed_join"].fn(spark, SF)
    import os

    from dagger_spark.catalog.round9 import _BUCKET_WAREHOUSE, _bucketed_tables

    orders_t, customer_t = _bucketed_tables(spark, SF)
    for t in (orders_t, customer_t):
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        }
        assert desc.get("Num Buckets") == "8", desc.get("Num Buckets")
        # one file per bucket — the layout the sorted-scan elision needs
        loc = os.path.join(_BUCKET_WAREHOUSE, t.split(".", 1)[1])
        files = [f for f in os.listdir(loc) if f.endswith(".parquet")]
        assert len(files) == 8, files


def test_catalog_entry_restores_planner_conf(spark):
    """The catalog fn must not leak the legacy bucketed-scan flag into the
    shared session (bench/driver run all 230+ queries on one session)."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    before = spark.conf.get(key)
    QUERIES["orders_customer_bucketed_join"].fn(spark, SF).collect()
    assert spark.conf.get(key) == before


def test_bucketed_results_match_plain_join(spark):
    from dagger_spark.sources.files import load_table

    got = sorted(
        tuple(r)
        for r in QUERIES["orders_customer_bucketed_join"].fn(spark, SF).collect()
    )
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    want = sorted(
        tuple(r)
        for r in o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    )
    assert got == want
