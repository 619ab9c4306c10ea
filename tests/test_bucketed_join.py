"""Bucketed-table co-located join: the 100 TB shuffle-elimination proof.

Writing both join sides bucketed by the join key (same bucket count) lets
Spark join them with ZERO Exchange — each task reads matching buckets from
both tables.  At the design point this is how the repeated corpus-vs-
signals joins (quality verdicts, dedup labels, embeddings) avoid paying a
corpus shuffle per join: bucket once at ingest, join free forever.

The plan assertions parse the ACTUAL physical plan, not configuration —
the same evidence standard as test_ivf_layout's PartitionFilters."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    # external tables (explicit path=): the static warehouse dir never
    # comes into play, so no session restart is needed
    wh = str(tmp_path_factory.mktemp("warehouse"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).alias("n")
    )
    for name, df in (("b_docs", docs), ("b_stats", stats)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .option("path", f"{wh}/{name}").saveAsTable(name))
    yield "b_docs", "b_stats"
    for name in ("b_docs", "b_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_zero_exchanges(spark, bucketed_pair):
    a, b = bucketed_pair
    # suppress broadcast: at test scale the small side would broadcast and
    # prove nothing about bucketing (at 100 TB neither side broadcasts —
    # that asymmetry is the point of this test)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(a).join(spark.table(b), "doc_id")
            .select("doc_id", "lang", "n")
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the join result is right, not just shuffle-free
    row = j.filter(F.col("doc_id") == 1).head()
    src = spark.table(a).filter(F.col("doc_id") == 1).head()
    assert row["n"] == len(src["text"] or "")


def test_bucketed_aggregation_reuses_bucketing(spark, bucketed_pair):
    a, _ = bucketed_pair
    # grouping by the bucket key needs no shuffle either
    agg = spark.table(a).groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    assert "Exchange" not in _plan(agg)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    # the control: the same join over plain parquet pays real exchanges
    # (broadcast suppressed so the comparison is shuffle-vs-bucket, not
    # shuffle-vs-broadcast)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).alias("n")
    )
    j = docs.hint("shuffle_hash").join(stats.hint("shuffle_hash"), "doc_id")
    assert "Exchange" in _plan(j)
