"""Differential + determinism tests for ops/rank — the two-pass
range-partitioned global ordering primitives that replaced the catalog's
single-partition `Window.orderBy(...)` family (round-6 verdict item 1).

The operators must be EXACT vs the single-partition window forms (the
catalog's DuckDB oracles were written against those), and — the failure
mode that killed the first implementation — must stay self-consistent when
several ranks are composed in ONE plan, where column pruning can defeat
exchange reuse and any sampling-dependent partitioning diverges between
branches."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dagger_spark.ops.rank import (
    boundaries_for, global_cumsum, global_ntile, global_quantiles_exact,
    global_rank, global_row_number, ntile_from_rank,
)


def _rand_df(spark, n=5000, seed=7, partitions=16):
    rng = random.Random(seed)
    # heavy ties in v (only 40 distinct values) so bucket-boundary tie
    # handling is actually exercised; id is the unique tiebreak
    rows = [(i, rng.randrange(40), rng.randrange(1000)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, w long").repartition(
        partitions
    )


def test_global_row_number_matches_window(spark):
    df = _rand_df(spark)
    ref = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn_ref")
    )
    got = global_row_number(df, ["v", "id"], "rn", num_ranges=8)
    j = ref.join(got.select("id", "rn"), "id")
    assert j.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_global_row_number_desc_matches_window(spark):
    df = _rand_df(spark, seed=11)
    ref = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("id")))
        .alias("rn_ref"),
    )
    got = global_row_number(
        df, [F.col("v").desc(), F.col("id")], "rn",
        part_key=-F.col("v"), num_ranges=8,
    )
    j = ref.join(got.select("id", "rn"), "id")
    assert j.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_global_ntile_matches_window_uneven(spark):
    # 5003 rows, k=7: N % k != 0 exercises the first-rem-buckets-one-larger
    # branch of the exact formula
    df = _rand_df(spark, n=5003, seed=3)
    for k in (7, 64):
        ref = df.select(
            "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("t_ref")
        )
        got = global_ntile(df, ["v", "id"], k, "t", num_ranges=8)
        j = ref.join(got.select("id", "t"), "id")
        assert j.filter(F.col("t") != F.col("t_ref")).count() == 0, k


def test_ntile_from_rank_formula_exact(spark):
    # every (N, k) shape in a grid, checked against Spark's own ntile
    for n, k in [(1, 4), (3, 4), (4, 4), (10, 4), (11, 3), (100, 7)]:
        df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
        ref = df.select(
            "rn", F.ntile(k).over(Window.orderBy("rn")).alias("t_ref")
        )
        got = df.select(
            "rn", ntile_from_rank(F.col("rn"), F.lit(n), k).alias("t")
        )
        j = ref.join(got, "rn")
        assert j.filter(F.col("t") != F.col("t_ref")).count() == 0, (n, k)


def test_global_cumsum_matches_window(spark):
    df = _rand_df(spark, seed=23)
    ref = df.select(
        "id",
        F.sum("w")
        .over(
            Window.orderBy(F.col("v").desc(), F.col("id")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("c_ref"),
    )
    got = global_cumsum(
        df, [F.col("v").desc(), F.col("id")], "w", "c",
        part_key=-F.col("v"), total_col="tot", num_ranges=8,
    )
    j = ref.join(got.select("id", "c", "tot"), "id")
    assert j.filter(F.col("c") != F.col("c_ref")).count() == 0
    total = df.agg(F.sum("w")).head()[0]
    assert got.select("tot").distinct().collect() == [(total,)]


def test_composed_ranks_stay_consistent_in_one_plan(spark):
    """The regression that sank the repartitionByRange+monotonic-id design:
    two global ntiles composed in one plan (one joined against the other)
    drifted by ±1-2 buckets because the local-rank and offsets branches
    stopped sharing an exchange and re-sampled split points independently.
    With literal boundaries the bucket id is a pure function of the row, so
    composition cannot drift."""
    df = _rand_df(spark, seed=5)
    a = global_ntile(df, ["v", "id"], 64, "ta", num_ranges=8)
    b = global_ntile(df, ["w", "id"], 64, "tb", num_ranges=8)
    joined = a.select("id", "ta").join(b.select("id", "tb"), "id")
    ref = df.select(
        "id",
        F.ntile(64).over(Window.orderBy("v", "id")).alias("ra"),
        F.ntile(64).over(Window.orderBy("w", "id")).alias("rb"),
    )
    j = joined.join(ref, "id")
    assert j.filter(
        (F.col("ta") != F.col("ra")) | (F.col("tb") != F.col("rb"))
    ).count() == 0
    # and the same result twice from one composed df — run-to-run stability
    p1 = joined.toPandas().sort_values("id").reset_index(drop=True)
    p2 = joined.toPandas().sort_values("id").reset_index(drop=True)
    assert p1.equals(p2)


def test_no_single_partition_window_in_plan(spark):
    """The whole point of the operator: the data-sized window is
    partitioned by the range bucket, and even the ≤num_ranges offsets
    prefix-sum carries a (non-foldable constant) partition spec — so the
    plan contains NO unpartitioned window specs at all, and WindowExec
    never logs `No Partition Defined` from a rank query."""
    df = _rand_df(spark)
    got = global_row_number(df, ["v", "id"], "rn", num_ranges=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    # a windowspecdefinition whose first argument is already a sort spec
    # has no partition columns (the shape that triggers the warning)
    unpart = re.findall(
        r"windowspecdefinition\([^,()]*? (?:ASC|DESC)", plan
    )
    assert not unpart, unpart
    # both windows present and partitioned: the bucket-partitioned local
    # rank and the offsets prefix-sum (whose non-foldable constant spec is
    # projected to an alias below the Window node)
    assert len(re.findall(r"windowspecdefinition\(", plan)) >= 2


def test_global_rank_and_dense_rank_match_window(spark):
    """Tie-aware ranks: rank() keeps gaps after tie groups, dense_rank()
    doesn't — both must match the single-partition window forms on data
    with HEAVY ties (40 distinct v over 5000 rows), including ties that
    sit on range-bucket boundaries (equal keys never split buckets)."""
    df = _rand_df(spark, seed=41)
    ref = df.select(
        "id",
        F.rank().over(Window.orderBy("v")).alias("rk_ref"),
        F.dense_rank().over(Window.orderBy("v")).alias("dr_ref"),
    )
    rk = global_rank(df, ["v"], "rk", num_ranges=8)
    dr = global_rank(df, ["v"], "dr", dense=True, num_ranges=8)
    j = (
        ref.join(rk.select("id", "rk"), "id")
        .join(dr.select("id", "dr"), "id")
    )
    assert j.filter(
        (F.col("rk") != F.col("rk_ref")) | (F.col("dr") != F.col("dr_ref"))
    ).count() == 0


def test_global_dense_rank_desc(spark):
    df = _rand_df(spark, seed=43)
    ref = df.select(
        "id",
        F.dense_rank().over(Window.orderBy(F.col("v").desc())).alias("d_ref"),
    )
    got = global_rank(
        df, [F.col("v").desc()], "d", dense=True,
        part_key=-F.col("v"), num_ranges=8,
    )
    j = ref.join(got.select("id", "d"), "id")
    assert j.filter(F.col("d") != F.col("d_ref")).count() == 0


def test_global_percent_rank_and_cume_dist_match_window(spark):
    from dagger_spark.ops.rank import global_percent_rank

    df = _rand_df(spark, seed=47)
    ref = df.select(
        "id",
        F.percent_rank().over(Window.orderBy("v")).alias("p_ref"),
        F.cume_dist().over(Window.orderBy("v")).alias("c_ref"),
    )
    p = global_percent_rank(df, ["v"], "p", num_ranges=8)
    c = global_percent_rank(df, ["v"], "c", cume=True, num_ranges=8)
    j = (
        ref.join(p.select("id", "p"), "id").join(c.select("id", "c"), "id")
    )
    assert j.filter(
        (F.abs(F.col("p") - F.col("p_ref")) > 1e-12)
        | (F.abs(F.col("c") - F.col("c_ref")) > 1e-12)
    ).count() == 0
    # single-row input: percent_rank is 0 by SQL definition
    one = spark.createDataFrame([(1, 5)], "id long, v long")
    assert global_percent_rank(one, ["v", "id"], "p", num_ranges=4).head()[
        "p"] == 0.0


def test_global_quantiles_exact_vs_sorted_list(spark):
    """percentile_cont ground truth computed driver-side over the sorted
    values (lo + (hi-lo)*frac at position (n-1)q) — odd and even n, dyadic
    and non-dyadic q, exact to double arithmetic."""
    for n_rows, seed in ((999, 13), (1000, 17)):
        df = _rand_df(spark, n=n_rows, seed=seed)
        vals = sorted(r["w"] for r in df.select("w").collect())
        got = global_quantiles_exact(
            df, "w", "id", [0.25, 0.5, 0.75], num_ranges=8
        ).head()
        assert got["n"] == n_rows
        for q in (0.25, 0.5, 0.75):
            pos = (n_rows - 1) * q
            lo = int(pos)
            frac = pos - lo
            want = vals[lo] + (vals[min(lo + 1, n_rows - 1)] - vals[lo]) * frac
            assert got[f"p{int(q*100)}"] == want, (n_rows, q)


def test_boundaries_for_matches_per_call_result(spark):
    """Precomputed boundaries must yield the identical ranks as the
    per-call sketch (they run the same percentile_approx), so callers can
    batch several orderings into one pass safely."""
    from pyspark.sql import functions as F

    df = _rand_df(spark, seed=31)
    bnds = boundaries_for(df, {"v": F.col("v"), "w": F.col("w")},
                          num_ranges=8)
    a = global_row_number(df, ["v", "id"], "rn", num_ranges=8)
    b = global_row_number(df, ["v", "id"], "rn", boundaries=bnds["v"])
    j = a.select("id", "rn").join(
        b.select("id", F.col("rn").alias("rn2")), "id")
    assert j.filter(F.col("rn") != F.col("rn2")).count() == 0


def test_empty_and_tiny_inputs(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert global_row_number(empty, ["v", "id"], "rn", num_ranges=8).count() == 0
    one = spark.createDataFrame([(1, 5)], "id long, v long")
    assert global_row_number(one, ["v", "id"], "rn", num_ranges=8).select(
        "rn"
    ).collect() == [(1,)]
    # all-identical part keys degenerate to one bucket but stay correct
    same = spark.createDataFrame([(i, 9) for i in range(50)], "id long, v long")
    rn = global_row_number(same, ["v", "id"], "rn", num_ranges=8)
    assert [r["rn"] for r in rn.orderBy("id").collect()] == list(range(1, 51))
    # exact quantiles over an empty input: the one output row must say
    # n=0 (NOT NULL — DuckDB's count(*) oracle is 0) with NULL percentiles
    q = global_quantiles_exact(empty, "v", "id", [0.5], num_ranges=4)
    row = q.collect()[0]
    assert row["n"] == 0 and row["p50"] is None


def test_shuffled_shards_is_exact_permutation(spark):
    from dagger_spark.ops.rank import shuffled_shards

    df = spark.createDataFrame(
        [(i,) for i in range(1003)], "doc_id long"
    ).repartition(16)
    out = shuffled_shards(df, "doc_id", seed=3, n_shards=7, num_ranges=8)
    rows = out.collect()
    # positions are a permutation of 1..N
    assert sorted(r["pos"] for r in rows) == list(range(1, 1004))
    # the order is exactly ORDER BY (md5 key, id): recompute driver-side
    by_key = sorted(rows, key=lambda r: (r["shuffle_key"], r["doc_id"]))
    assert [r["pos"] for r in by_key] == list(range(1, 1004))
    # shards are contiguous in pos, sized base/base+1, 0-indexed
    n, k = 1003, 7
    base, rem = divmod(n, k)
    sizes = {}
    for r in rows:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert sizes == {
        s: base + 1 if s < rem else base for s in range(k)
    }
    # shard_pos is 1..size within each shard, following global pos order
    for s in range(k):
        in_shard = sorted(
            (r for r in rows if r["shard"] == s), key=lambda r: r["pos"]
        )
        assert [r["shard_pos"] for r in in_shard] == list(
            range(1, len(in_shard) + 1)
        )


def test_shuffled_shards_deterministic_across_recompute(spark):
    from dagger_spark.ops.rank import shuffled_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = shuffled_shards(df, "doc_id", seed=42, n_shards=4, num_ranges=8)
    b = shuffled_shards(df, "doc_id", seed=42, n_shards=4, num_ranges=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # a different seed is a different permutation
    c = shuffled_shards(df, "doc_id", seed=43, n_shards=4, num_ranges=8)
    pos_a = {r["doc_id"]: r["pos"] for r in a.collect()}
    pos_c = {r["doc_id"]: r["pos"] for r in c.collect()}
    assert pos_a != pos_c


# ------------------------------------------------------------- skyline2d

def _brute_skyline(pts):
    """Reference strict-dominance skyline (minimize x, maximize y)."""
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (bx <= x and by >= y and (bx < x or by > y))
            for j, (bx, by) in enumerate(pts) if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline2d_matches_brute_force_fuzz(spark):
    from dagger_spark.ops.rank import skyline2d

    rng = random.Random(11)
    for trial, (n, lo, hi) in enumerate(
        [(1, 0, 5), (2, 0, 0), (40, 0, 9), (300, -50, 50), (500, 0, 14)]
    ):
        pts = [(rng.randint(lo, hi), rng.randint(lo, hi)) for _ in range(n)]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "id int, x long, y long",
        )
        got = sorted(
            (r["x"], r["y"])
            for r in skyline2d(df, "x", "y", num_ranges=7).collect()
        )
        assert got == _brute_skyline(pts), (trial, n, lo, hi)


def test_skyline2d_duplicates_and_nulls(spark):
    """Duplicate (x, y) points do not strictly dominate each other — BOTH
    survive; NULL in either dimension excludes the row entirely."""
    from dagger_spark.ops.rank import skyline2d

    df = spark.createDataFrame(
        [
            (1, 10, 5), (2, 10, 5),        # duplicate frontier point
            (3, 10, 4),                    # same x, strictly worse y
            (4, 5, 5),                     # dominates (10,5)? x<10, y=5 -> yes
            (5, None, 99), (6, 1, None),   # NULL rows: never frontier
        ],
        "id int, x int, y int",
    )
    got = sorted(
        (r["id"], r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect()
    )
    assert got == [(4, 5, 5)]
    # remove the dominator: both duplicates return
    got2 = sorted(
        r["id"]
        for r in skyline2d(df.filter("id <> 4"), "x", "y").collect()
    )
    assert got2 == [1, 2]


def test_skyline2d_no_unbounded_single_partition_window(spark):
    """Every window in the plan is bucket-partitioned or the
    deliberately-bounded <= num_ranges offsets window — never a bare
    global ORDER BY over unbounded input (the catalog-wide checker from
    test_plans.py, applied directly to the operator)."""
    from dagger_spark.ops.rank import skyline2d
    from tests.test_plans import _unpartitioned_window_violations

    df = spark.createDataFrame(
        [(i, i % 37, i % 11) for i in range(1000)], "id int, x int, y int"
    )
    assert not _unpartitioned_window_violations(skyline2d(df, "x", "y"))


def test_mega_key_skew_contained_and_exact(spark):
    """The module docstring's skew caveat pinned (ops/rank.py: 'a single
    mega-frequent value bounds parallelism for its bucket ... salting
    cannot apply: equal keys must meet one rank counter').  With ONE
    part_key value carrying 50% of all rows:

    * ranks stay EXACT vs the single-partition window form,
    * the hot value is confined to exactly ONE bucket — that bucket is the
      lone straggler — while every other bucket stays near the
      N/num_ranges design size (degradation is contained, not cascading),
    * AQE skew handling is inert here BY DESIGN: skewedPartitionFactor
      splits join/rebalance reads, never a window's hash exchange, because
      all rows of one key must meet one rank counter — which is why the
      caveat documents degraded parallelism instead of promising a rescue.
    """
    from dagger_spark.ops.rank import _bucket

    n, hot, ranges = 4000, 7, 16
    rows = [(i, hot) for i in range(n // 2)] + [
        (n // 2 + i, 1000 + (i * 37) % 997) for i in range(n // 2)
    ]
    df = spark.createDataFrame(rows, "id long, v long").repartition(16)

    got = global_row_number(df, ["v", "id"], "rn", num_ranges=ranges)
    want = df.select(
        "id", "v", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    bounds = boundaries_for(df, {"k": F.col("v")}, num_ranges=ranges)["k"]
    sizes = {
        r["b"]: r["count"]
        for r in df.select(_bucket(F.col("v"), bounds).alias("b"))
        .groupBy("b").count().collect()
    }
    hot_bucket = sum(1 for x in bounds if hot > x)
    # the straggler: every hot row shares one bucket...
    assert sizes[hot_bucket] >= n // 2
    # ...and no other bucket inflates past ~3x the design size
    rest = [c for b, c in sizes.items() if b != hot_bucket]
    assert rest and max(rest) <= 3 * (n / ranges), sizes
