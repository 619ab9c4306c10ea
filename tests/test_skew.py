"""Skew mitigation + bucketing: salted results must equal unsalted ones, and
same-bucketed joins must plan without a shuffle."""

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.skew import salted_join, two_phase_agg
from dagger_spark.sources.files import load_table, write_bucketed


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% behind one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(97)]
    return spark.createDataFrame(rows, "k string, label string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "label")
    salted = salted_join(skewed, dim, ["k"], n_salts=8).select("k", "v", "label")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_keeps_unmatched(spark, dim):
    left = spark.createDataFrame([("hot", 1), ("missing", 2)], "k string, v int")
    out = salted_join(left, dim, ["k"], n_salts=4, how="left")
    rows = {r["k"]: r["label"] for r in out.collect()}
    assert rows == {"hot": "H", "missing": None}


def test_salted_join_rejects_right_and_full(spark, dim):
    # right/full are not salt-invariant (unmatched right rows would surface
    # once per replica) — the API must refuse, not silently multiply rows
    left = spark.createDataFrame([("hot", 1)], "k string, v int")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(left, dim, ["k"], n_salts=4, how=how)


def test_two_phase_agg_equals_plain_agg(skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count("*").alias("n"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    two = two_phase_agg(
        skewed, ["k"],
        {"sv": ("v", "sum"), "n": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
        n_salts=8,
    ).select("k", "sv", "n", "mn", "mx")
    assert _sorted_rows(two) == _sorted_rows(plain.select("k", "sv", "n", "mn", "mx"))


def test_bucketed_join_plans_without_exchange(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = str(tmp_path / "wh")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=f"{warehouse}/o")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, path=f"{warehouse}/l")

    # at test scale Catalyst would just broadcast the small side; force the
    # sort-merge path that the bucketing exists for (at sf100 both sides are
    # far beyond any broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert "SortMergeJoin" in plan

        # and it returns the same rows as the unbucketed join
        n_plain = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date/type-partitioned layout: a filter on the partition column must
    prune at planning time (PartitionFilters), reading only matching dirs —
    at 100 TB this is the difference between scanning a day and a year."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_parted")
    ev.write.partitionBy("event_type").parquet(path)

    parted = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = parted._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must appear in PartitionFilters, not as a
    # post-scan data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf
    assert parted.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DYNAMIC partition pruning — the star-join runtime twin of the static
    PartitionFilters test above: the fact side is partitioned on the join
    key, the dimension carries the selective filter, and Catalyst must
    inject a runtime subquery (dynamicpruning) into the fact scan's
    partition filters so only the dimension-selected partitions are read.
    At 100 TB this is what keeps `fact JOIN dim WHERE dim.attr = x` from
    scanning the whole fact table when the filter never mentions the
    partition column directly."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_dpp")
    ev.write.partitionBy("event_type").parquet(path)

    fact = spark.read.parquet(path)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    dim = spark.createDataFrame(
        [(t, "hot" if t == "purchase" else "cold") for t in types],
        "event_type string, tier string",
    )
    joined = (
        fact.join(F.broadcast(dim), "event_type")
        .filter(F.col("tier") == "hot")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    rows = {(r["event_type"], r["n"]) for r in joined.collect()}
    want = {
        (r["event_type"], r["n"])
        for r in ev.filter(F.col("event_type") == "purchase")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert rows == want
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "dynamicpruning" in pf


def test_connected_components_chain_and_isolated(spark):
    """A 4-chain, a 2-clique and an isolated vertex: labels must converge to
    the component minimum even across multi-hop chains."""
    from dagger_spark.ops.dedup import connected_components

    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3, pair 4-5, isolated 6
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    got = {r["id"]: r["cluster"] for r in connected_components(verts, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_connected_components_chain_logarithmic_rounds(spark):
    """Pathological topology for label propagation: a 10k-vertex PATH.
    Min-label propagation needs diameter (~10k) rounds; the large-star/
    small-star formulation must converge in O(log n) — well under 15."""
    from dagger_spark.ops.dedup import connected_components

    n = 10_000
    verts = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    stats = {}
    labels = connected_components(verts, edges, max_iters=30, stats=stats)
    distinct_clusters = labels.select("cluster").distinct().collect()
    assert [r["cluster"] for r in distinct_clusters] == [0]
    assert labels.count() == n
    assert stats["rounds"] <= 15, stats


def test_connected_components_empty_edges(spark):
    from dagger_spark.ops.dedup import connected_components

    verts = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r["id"]: r["cluster"] for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 2}


def test_salted_join_accepts_spark_aliases(spark):
    """'left_outer'/'leftouter'/case variants are the same salt-invariant
    join type as 'left' and must not be rejected."""
    import pytest
    from dagger_spark.ops.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, w string")
    for how in ("left_outer", "leftouter", "LEFT", "Inner"):
        out = salted_join(left, right, ["k"], how=how, n_salts=4)
        assert out.count() == (2 if how.lower().startswith("l") else 1)
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full", n_salts=4)


def test_zorder_key_interleaves_bits(spark):
    from dagger_spark.ops.skew import zorder_key
    from pyspark.sql import functions as F

    # x=0b101, y=0b011 -> z bits (y2 x2 y1 x1 y0 x0) = 0b011011 = 27
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).collect()[0]["z"]
    assert z == 27
    # identity cases
    df2 = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1023, 1023)], "x long, y long")
    zs = [r["z"] for r in df2.select(zorder_key(F.col("x"), F.col("y")).alias("z")).collect()]
    assert zs == [0, 1, 2, (1 << 20) - 1]
