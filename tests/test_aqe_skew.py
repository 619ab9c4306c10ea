"""AQE skew-join handling: the runtime half of the skew story.

ops/skew.py::salted_join is the PLAN-time answer (explicit salting);
Spark's adaptive execution can instead split oversized partitions at RUN
time with zero query rewrite.  This pins that the knob actually engages —
the final adaptive plan marks the join `skew=true` — on a join Spark
would otherwise process with one straggler task holding ~97% of rows.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skew_conf(spark):
    keep = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # tiny thresholds so the miniature fixture trips the optimizer
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    # 97% of left rows share key 0; right side is uniform
    left = spark.range(200_000).select(
        F.when(F.col("id") % 30 != 0, F.lit(0)).otherwise(F.col("id") % 97)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(97).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    j = left.join(right.hint("merge"), "k")
    # materialize THIS dataframe's own queryExecution (count()/write wrap
    # new ones whose adaptive plans finalize separately)
    rows = j.collect()
    assert len(rows) == 200_000
    final = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, final[:2000]


def test_salted_join_matches_aqe_answer(spark, skew_conf):
    # both skew strategies — explicit salting and AQE splitting — must
    # produce the same join result
    from dagger_spark.ops.skew import salted_join

    left = spark.range(50_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    a = salted_join(left, right, "k", n_salts=8).agg(
        F.count(F.lit(1)), F.sum("lv"), F.sum("rv")
    ).head()
    b = left.join(right, "k").agg(
        F.count(F.lit(1)), F.sum("lv"), F.sum("rv")
    ).head()
    assert tuple(a) == tuple(b)
