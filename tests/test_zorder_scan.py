"""Materialized z-order layout: data skipping measured from the scan
node's own metrics, not asserted from theory."""

from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from dagger_spark.catalog.round9 import _zorder_materialized

SF = "/root/testdata/sf0.01"
BOX = lambda df: df.filter(  # noqa: E731
    F.col("x").between(100, 163) & F.col("y").between(200, 263)
).select("event_id", "x", "y")


def _scan_metrics(df):
    df.collect()
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        n = stack.pop()
        if "Scan" in n.nodeName():
            out = {}
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
            return out
        if n.nodeName() == "AdaptiveSparkPlan":
            stack.append(n.executedPlan())
            continue
        if "QueryStage" in n.nodeName():
            stack.append(n.plan())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    raise AssertionError("no scan node found")


def test_zorder_layout_skips_more_than_single_column_sort(spark):
    zdir, xdir = _zorder_materialized(spark, SF)
    zm = _scan_metrics(BOX(spark.read.parquet(zdir)))
    xm = _scan_metrics(BOX(spark.read.parquet(xdir)))
    total = spark.read.parquet(zdir).count()
    # row-group min/max skipping engages on BOTH layouts (pushed filters
    # reach the scan) ...
    assert zm["numOutputRows"] < 0.4 * total
    assert xm["numOutputRows"] < 0.6 * total
    # ... and the z-order layout bounds BOTH dimensions, so it decodes
    # strictly fewer rows than the x-only sort for the same 2-D box
    assert zm["numOutputRows"] < xm["numOutputRows"], (zm, xm)


def test_zorder_scan_has_pushed_filters(spark):
    df = QUERIES["events_zorder_scan"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # toString ellipsizes the filter list; the leading bounds prove the
    # box reached the scan (y-skipping itself is proven by the metrics
    # test above)
    assert "GreaterThanOrEqual(x,100)" in plan
    assert "LessThanOrEqual(x,163)" in plan


def test_zorder_scan_results_match_canonical(spark):
    from dagger_spark.sources.files import load_table

    got = [tuple(r) for r in QUERIES["events_zorder_scan"].fn(spark, SF).collect()]
    ev = load_table(spark, SF, "events").filter(F.col("user_id").isNotNull())
    want = [
        tuple(r)
        for r in ev.select(
            "event_id",
            (F.col("user_id") % 1024).cast("long").alias("x"),
            (F.col("event_id") % 1024).cast("long").alias("y"),
        )
        .filter(F.col("x").between(100, 163) & F.col("y").between(200, 263))
        .orderBy("event_id")
        .collect()
    ]
    assert got == want and len(got) > 0
