"""The driver-facing query catalog: every operator exposed as a named query
over the testdata tables, each (where SQL-expressible) paired with an ANSI
SQL twin that DuckDB replays for the differential-correctness gate.

Conventions that make hash-comparison robust across engines:
  * every computed column is aliased IDENTICALLY in Spark and oracle SQL;
  * output timestamps are date_trunc'd ('second'/'hour') — the raw events.ts
    is nanosecond in DuckDB but microsecond in Spark;
  * exact-decimal aggregates round to 2, derived ratios/averages to 6;
  * embeddings are cast to double before any dot product so both engines
    accumulate identically;
  * top-k orderings always carry a unique tiebreak column.

Queries marked ``oracle=None`` are the genuinely non-SQL-expressible ops
(sysmon rule engine over generated fixtures, multimodal Pandas-UDF
plumbing); the driver records a rows-only check for those (see
__spark_entry__.py docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import pandas as pd  # module-level: pandas_udf resolves type hints here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops.dedup import (
    exact_dedup, minhash_candidate_pairs, ngram_jaccard_pairs, simhash,
)
from .ops.similarity import (
    brute_force_topk, cosine_neardup_pairs, ivf_topk, lsh_topk, _plane_coeffs,
)
from .ops.quality import (
    GOPHER_STOPWORDS, PII_PATTERNS, gopher_pass, gopher_stats, pii_counts,
    redact_pii, repetition_stats, word_ngrams,
)
from .ops.text import (
    bpe_ish_token_count, doc_fingerprint, language_id, quality_score,
    text_stats, token_count, tokens, LANG_STOPWORDS,
)
from .sources.files import load_table, load_tables


@dataclass(frozen=True)
class CatalogQuery:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str = ""


def _load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """documents/embeddings loader for the compute-heavy per-row operators:
    the testdata files are single-row-group miniatures, and parquet splits
    only at row-group boundaries — so every scan is ONE task and md5-heavy
    map stages run single-core.  parallelize_narrow repartitions ONLY when
    splits < cores; at real file sizes it is a no-op (see
    sources/files.py).  Measured: winnowing_docs 4.1 -> 0.95 s at sf0.1."""
    import os

    from .sources.files import parallelize_narrow

    return parallelize_narrow(
        load_table(spark, sf_dir, name),
        path=os.path.join(sf_dir, f"{name}.parquet"),
    )


QUERIES: dict = {}


def register(name: str, oracle: Optional[str], description: str = ""):
    def deco(fn):
        QUERIES[name] = CatalogQuery(fn, oracle, description)
        return fn
    return deco


def _shared_sql(name: str, sql: str, description: str = "", oracle_sql: Optional[str] = None):
    """Register a query whose Spark plan and DuckDB oracle share one ANSI SQL
    text (dialect-portable by construction)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)

    QUERIES[name] = CatalogQuery(fn, oracle_sql or sql, description)
    return fn


# ===========================================================================
# TPC-H-flavored batch analytics (joins, aggs, windows, sets, subqueries)
# ===========================================================================

_shared_sql(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: wide grouped aggregation with arithmetic",
)

_shared_sql(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           date_trunc('day', o_orderdate)                     AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1999-06-01 00:00:00'
    GROUP BY l_orderkey, date_trunc('day', o_orderdate), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3: 3-way join + grouped agg + deterministic top-10",
)

_shared_sql(
    "q5_region_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM region, nation, customer, orders, lineitem, supplier
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: 6-way star join (broadcastable dims) + grouped agg",
)

_shared_sql(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "TPC-H Q6: pure scan-filter-agg; predicate pushdown showcase",
)

_shared_sql(
    "top_customers_per_nation",
    """
    SELECT c_custkey, c_nationkey, c_acctbal, rn
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    """,
    "ranking window function: top-3 per group",
)

_shared_sql(
    "orders_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "grouping sets / rollup aggregation",
)

_shared_sql(
    "semi_join_high_value",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "left-semi join via EXISTS",
)

_shared_sql(
    "anti_join_no_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    "left-anti join via correlated NOT EXISTS (customers with no urgent "
    "orders; every customer has SOME order in this data, so the naive "
    "no-orders variant would be vacuously empty)",
)

_shared_sql(
    "set_intersect",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    "INTERSECT set operation",
)

_shared_sql(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "EXCEPT set operation",
)

_shared_sql(
    "distinct_agg",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "multi distinct aggregation (expand + two-phase agg)",
)

_shared_sql(
    "correlated_subquery",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
    "correlated scalar subquery (decorrelated by Catalyst)",
)

_shared_sql(
    "scalar_funcs_showcase",
    """
    SELECT year(l_shipdate) AS ship_year,
           count(*) AS n_items,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * l_discount ELSE 0 END), 4) AS promo_value,
           count(DISTINCT upper(l_returnflag) || '-' || l_linestatus) AS flag_combos,
           min(length(l_returnflag || l_linestatus)) AS min_len
    FROM lineitem
    GROUP BY year(l_shipdate)
    """,
    "scalar function library: date/string/case-when inside aggregation",
)

_shared_sql(
    "q7_nation_trade",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             cast(extract(year FROM l_shipdate) AS bigint) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7: 6-way join, self-joined dimension, disjunctive nation pairing, "
    "year rollup",
)

_shared_sql(
    "q9_profit_by_nation",
    """
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             cast(extract(year FROM o_orderdate) AS bigint) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity * 0.08 AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey
        AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    "TPC-H Q9 (retailprice cost proxy): 5-way join + LIKE filter + "
    "nation/year profit rollup",
)

_shared_sql(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10: returned-item revenue, 4-way join + date range + top-20",
)

_shared_sql(
    "q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    "TPC-H Q14: conditional-aggregate ratio over a month of shipments",
)

_shared_sql(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    """,
    "TPC-H Q19: OR-of-AND predicate pushed into a join (CNF conversion "
    "exercises Catalyst's join-condition pushdown)",
)

_shared_sql(
    "revenue_moving_avg",
    """
    WITH daily AS (
      SELECT date_trunc('day', l_shipdate) AS ship_day,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem
      GROUP BY date_trunc('day', l_shipdate)
    )
    SELECT ship_day, revenue,
           -- PARTITION BY (ship_day = ship_day): constant true over the
           -- non-null days (a null day would already be engine-divergent
           -- in the ORDER BY), so semantics are the single global frame —
           -- but the spec is non-foldable, which keeps WindowExec from
           -- logging its `No Partition Defined` warning for a window that
           -- is single-partition BY DESIGN (per-day rollup: one row per
           -- calendar day at any corpus size).  Same trick as
           -- ops/rank._offsets; valid in both dialects.
           round(avg(revenue) OVER (PARTITION BY (ship_day = ship_day)
                                    ORDER BY ship_day
                                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS ma7
    FROM daily
    """,
    "window frames: 7-day moving average over daily revenue (ROWS BETWEEN); "
    "the window runs over per-DAY aggregates — bounded rows (one per "
    "calendar day) at any corpus size, so the single-partition frame is "
    "safe by construction (named in tests/test_plans.py's "
    "_DOMAIN_BOUNDED_WINDOW)",
)

_shared_sql(
    "grouping_sets_orders",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
    "GROUPING SETS: priority x status, priority subtotal, grand total",
)

_shared_sql(
    "percentile_prices",
    """
    SELECT l_returnflag,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "ordered-set aggregates: exact linear-interpolated quartiles per flag "
    "(dyadic fractions so both engines interpolate identically)",
)


_shared_sql(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, p_name, s_name,
           round(s_acctbal, 2) AS acctbal,
           n_name
    FROM part, supplier, lineitem, nation
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey
      AND p_size = 25
      AND s_acctbal = (
        SELECT max(s2.s_acctbal)
        FROM supplier s2, lineitem l2
        WHERE l2.l_partkey = p_partkey AND l2.l_suppkey = s2.s_suppkey)
    GROUP BY p_partkey, p_name, s_name, s_acctbal, n_name
    ORDER BY acctbal DESC, p_partkey
    LIMIT 25
    """,
    "TPC-H Q2 shape: correlated scalar aggregate subquery over a join "
    "(best-supplier-per-part), decorrelated by Catalyst into an agg+rejoin",
)

_shared_sql(
    "cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "CUBE: all four grouping combinations of status x priority in one pass",
)

_shared_sql(
    "window_funcs_showcase",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d, o_orderpriority AS prio,
             round(sum(o_totalprice), 2) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
      GROUP BY date_trunc('day', o_orderdate), o_orderpriority
    )
    SELECT d, prio, rev,
           cast(rank()       OVER w AS bigint) AS rnk,
           cast(dense_rank() OVER w AS bigint) AS drnk,
           cast(ntile(4)     OVER w AS bigint) AS quartile,
           round(rev - lag(rev, 1, 0.0)  OVER (PARTITION BY prio ORDER BY d), 2) AS delta_prev,
           round(lead(rev, 1, 0.0) OVER (PARTITION BY prio ORDER BY d), 2) AS next_rev,
           round(first_value(rev) OVER (PARTITION BY prio ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_rev
    FROM daily
    WINDOW w AS (PARTITION BY prio ORDER BY rev DESC, d)
    """,
    "window-function family: rank/dense_rank/ntile/lag/lead/first_value "
    "with named WINDOW clause and frames",
)


@register(
    "skew_salted_join",
    """
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    "salted join (ops/skew.py): hot-key fan-out across 8 salted reducers; "
    "salt-invariant, so the oracle is the plain equi-join it must equal",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), "c_name", "c_mktsegment"
    )
    out = salted_join(
        ev.withColumnRenamed("user_id", "c_custkey"), cust, ["c_custkey"], n_salts=8
    )
    return out.select(
        "event_id",
        F.col("c_custkey").alias("user_id"),
        "event_type",
        "c_name",
        "c_mktsegment",
    )


@register(
    "distinct_twophase",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    "skew-resistant exact distinct: dedupe on (key, value) first, then "
    "count per key — two small shuffles instead of one hot-key shuffle",
)
def distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # phase 1: (event_type, user_id) distinct — the hot key's rows spread
    # over the full (key, value) space; phase 2: count per key.
    # count(user_id), NOT count(*): COUNT(DISTINCT x) excludes NULLs, so the
    # re-count must skip the NULL-user distinct row too
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("user_id").alias("n_users"))
    )


_shared_sql(
    "q4_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4: EXISTS semi-join + grouped count",
)

_shared_sql(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN n_name = 'NATION_6' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT cast(extract(year FROM o_orderdate) AS bigint) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS n_name
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "TPC-H Q8: national market share — 8-relation join (nation twice, "
    "customer-side region gate vs supplier-side share nation) + "
    "conditional-sum ratio per year",
)

_shared_sql(
    "q12_late_shipments",
    """
    SELECT l_linestatus,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL '60' DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    "TPC-H Q12 shape (no l_shipmode in this schema: 'late' = shipped >60 "
    "days after order): join + FILTER'd conditional counts by priority class",
)

_shared_sql(
    "q13_order_distribution",
    """
    SELECT c_count, cast(count(*) AS bigint) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "TPC-H Q13: customer order-count distribution — outer join with an "
    "ON-clause filter (kept pre-join, not a WHERE), double aggregation",
)

_shared_sql(
    "q21_waiting_supplier",
    """
    SELECT s_name, cast(count(*) AS bigint) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL '365' DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL '365' DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "TPC-H Q21 shape ('late' = shipped >1y after order; no receipt/commit "
    "dates in this schema): the hardest decorrelation pattern — EXISTS + "
    "NOT EXISTS self-joins on lineitem with a non-equality correlated "
    "predicate through two join levels",
)

_shared_sql(
    "q20_part_suppliers",
    """
    SELECT s_name, n_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100)
      AND s_nationkey = n_nationkey
    ORDER BY s_name
    """,
    "TPC-H Q20 shape: nested IN subqueries with HAVING (two semi-join "
    "levels after decorrelation)",
)

_shared_sql(
    "q11_important_nations",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS nation_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           (SELECT 0.05 * sum(l_extendedprice * (1 - l_discount)) FROM lineitem)
    ORDER BY nation_value DESC, n_name
    """,
    "TPC-H Q11 shape: HAVING against an uncorrelated scalar-aggregate "
    "subquery (global-total fraction threshold)",
)

_shared_sql(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15: CTE revenue view reused twice (join + scalar max subquery)",
)

_shared_sql(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "TPC-H Q17: correlated scalar-average subquery (decorrelates to an "
    "agg + rejoin on partkey)",
)

_shared_sql(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           date_trunc('day', o_orderdate) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    "TPC-H Q18: IN-subquery with HAVING over an aggregate (plans as a "
    "semi-join after decorrelation), top-20",
)

_shared_sql(
    "q22_idle_customers",
    """
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substring(c_name, 10, 1) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    """,
    "TPC-H Q22: scalar-aggregate subquery + NOT EXISTS anti-join",
)

_shared_sql(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < -900.0)
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16 (lineitem as partsupp proxy): NOT IN subquery (null-aware "
    "anti-join) + count distinct per group",
)

_shared_sql(
    "events_multires_rollup",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
             count(*) AS n, round(sum(value), 4) AS v
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
    )
    SELECT date_trunc('day', bucket_hour) AS bucket_day, event_type,
           cast(sum(n) AS bigint) AS n_events,
           round(sum(v), 4) AS total_value,
           count(*) AS hours_active
    FROM hourly
    GROUP BY date_trunc('day', bucket_hour), event_type
    """,
    "hypertable-style multi-resolution rollup: hourly continuous aggregate "
    "re-aggregated to daily (the downsample-cascade shape)",
)


@register(
    "events_approx_distinct",
    """
    SELECT event_type,
           cast(count(DISTINCT user_id) AS bigint) AS exact_users,
           cast(count(*) AS bigint) AS n_events,
           TRUE AS approx_within_band
    FROM events GROUP BY event_type
    """,
    "HLL sketch with a BOUNDED oracle: the raw approx_count_distinct value "
    "is engine-specific, so the emitted columns are the exact distinct "
    "count plus a flag asserting |approx - exact| <= 5% of exact (5x the "
    "rsd=0.01 the sketch is configured for — far outside plausible HLL "
    "error, so a broken sketch flips the flag and fails the hash compare "
    "while a healthy one matches the oracle's literal TRUE)",
)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.01)
    exact = F.count_distinct(F.col("user_id"))
    within = F.when(
        exact == 0, approx == 0
    ).otherwise(
        F.abs(approx.cast("double") - exact.cast("double")) <= 0.05 * exact.cast("double")
    )
    return ev.groupBy("event_type").agg(
        exact.cast("long").alias("exact_users"),
        F.count("*").alias("n_events"),
        within.alias("approx_within_band"),
    )


@register(
    "events_hll_rollup",
    """
    SELECT event_type,
           cast(count(DISTINCT user_id) AS bigint) AS exact_users,
           cast(count(*) AS bigint) AS n_events,
           TRUE AS rollup_within_band
    FROM events GROUP BY event_type
    """,
    "mergeable-sketch rollup: per-day HLL partials (hll_sketch_agg) "
    "union-merged per event_type (hll_union_agg) — the two-level shape "
    "that lets a 100 TB hypertable answer distinct-count rollups from "
    "stored partials instead of rescanning raw data; BOUNDED oracle like "
    "events_approx_distinct (exact counts + a within-8%-band flag; "
    "lgConfigK=12 gives ~1.6% rsd, so a broken merge flips the flag)",
)
def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # level 1: per-(type, day) sketch partials — in production these are
    # what you PERSIST; level 2 never touches raw rows again
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk"),
        F.count("*").alias("n"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n").alias("n_events"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("exact_users"))
    a, e = F.col("approx_users").cast("double"), F.col("exact_users").cast("double")
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        F.col("n_events").cast("long").alias("n_events"),
        F.when(F.col("exact_users") == 0, F.col("approx_users") == 0)
         .otherwise(F.abs(a - e) <= 0.08 * e).alias("rollup_within_band"),
    )


@register(
    "grouped_stats_pandas",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "custom grouped-map UDAF via applyInPandas (Arrow batch per group, "
    "numpy quartiles); linear interpolation matches percentile_cont, so "
    "the oracle is exact — the shape a custom Python aggregation takes "
    "when built-ins genuinely can't express it",
)
def grouped_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401 (worker-side)

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")

    def stats(pdf):
        import numpy as np
        import pandas as pd

        p25, p50, p75 = np.percentile(
            pdf["l_extendedprice"].to_numpy(), [25, 50, 75]
        )  # linear interpolation == percentile_cont
        return pd.DataFrame(
            [[pdf["l_returnflag"].iloc[0], len(pdf),
              round(p25, 6), round(p50, 6), round(p75, 6)]],
            columns=["l_returnflag", "n", "p25", "p50", "p75"],
        )

    return li.groupBy("l_returnflag").applyInPandas(
        stats, "l_returnflag string, n bigint, p25 double, p50 double, p75 double"
    )


@register(
    "pivot_returnflag_qty",
    """
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
    FROM lineitem
    GROUP BY l_linestatus
    """,
    "DataFrame-API pivot (returnflag -> columns); oracle is the CASE-WHEN "
    "expansion Catalyst lowers pivot to",
)
def pivot_returnflag_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ===========================================================================
# events: streaming-shaped analytics in batch (windowed counts, sessions,
# rules, JSON extraction)
# ===========================================================================

_shared_sql(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    "tumbling-window aggregation (batch twin of the streaming hourly rollup)",
)

@register(
    "events_burst_detection",
    """
    SELECT date_trunc('hour', ts) AS w_start,
           user_id,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    "timeframe/count rule shape (SURVEY §2.5-T3, the reference's "
    "designed-but-skipped Sigma timeframe gap): tumbling event-time window "
    "+ keyed count with HAVING threshold + min/max bounds — the batch twin "
    "of rules/timeframe.py's streaming windowed aggregation",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("__w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            F.col("__w.start").alias("w_start"),
            "user_id",
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


@register(
    "events_burst_sliding",
    """
    WITH hits AS (
      SELECT user_id, ts, cast(floor(epoch(ts) / 1800) AS BIGINT) AS halfslot
      FROM events WHERE event_type = 'error'
    ), w AS (
      SELECT user_id, ts, (halfslot - k.k) * 1800 AS wstart_s
      FROM hits CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
    )
    SELECT make_timestamp(wstart_s * 1000000) AS w_start, user_id,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM w GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    "sliding-window burst detection (1 h window, 30 min slide): the fix for "
    "tumbling's boundary under-detection — a burst shorter than "
    "window - slide is fully contained in SOME window no matter where it "
    "falls.  Spark explodes each event into its 2 windows (F.window with "
    "slide); the oracle mirrors the epoch-aligned floor arithmetic with a "
    "generate_series cross join.  Same shape rules/timeframe.py runs "
    "batch+streaming when RuleSpec.timeframe_slide_seconds is set",
)
def events_burst_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes").alias("__w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            F.col("__w.start").alias("w_start"),
            "user_id",
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


@register(
    "events_burst_exact",
    """
    WITH h AS (
      SELECT user_id, event_id, ts,
             cast(floor(epoch(ts)) AS BIGINT) AS tsec
      FROM events WHERE event_type = 'error'
    ), c AS (
      SELECT user_id, event_id, ts, tsec,
             cast(count(*) OVER (
               PARTITION BY user_id ORDER BY tsec
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_trail
      FROM h
    ), f AS (
      SELECT user_id, event_id, ts, n_trail,
             CASE WHEN n_trail >= 2 THEN 1 ELSE 0 END AS trig,
             lag(CASE WHEN n_trail >= 2 THEN 1 ELSE 0 END, 1, 0) OVER (
               PARTITION BY user_id ORDER BY tsec, event_id
             ) AS prev_trig
      FROM c
    )
    SELECT user_id, event_id AS trigger_event_id,
           date_trunc('second', ts) AS trigger_ts, n_trail
    FROM f WHERE trig = 1 AND prev_trig = 0
    """,
    "EXACT Sigma timeframe semantics — N events within ANY 3600-second "
    "span, zero discretization loss: trailing RANGE frame over whole epoch "
    "seconds counts each event's preceding hour, an event with n_trail >= 2 "
    "is a trigger, and lag() keeps only episode-starting triggers (previous "
    "event not triggering) so a sustained burst yields one row, not one per "
    "event.  One shuffle keyed by user_id; the frame is time-valued so "
    "same-second rows share one frame in both engines (floor(epoch) == "
    "unix_timestamp truncation parity, see events_rolling_7d)",
)
def events_burst_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "user_id", "event_id", "ts",
            F.unix_timestamp("ts").alias("tsec"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("tsec").rangeBetween(-3599, 0)
    wl = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    c = h.withColumn("n_trail", F.count(F.lit(1)).over(wr).cast("long"))
    c = c.withColumn(
        "trig", F.when(F.col("n_trail") >= 2, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("prev_trig", F.lag("trig", 1, 0).over(wl))
    return (
        c.filter((F.col("trig") == 1) & (F.col("prev_trig") == 0))
        .select(
            "user_id",
            F.col("event_id").alias("trigger_event_id"),
            F.date_trunc("second", F.col("ts")).alias("trigger_ts"),
            "n_trail",
        )
    )


@register(
    "events_sigma_corr_counts",
    """
    SELECT 'driver error burst' AS correlation,
           user_id,
           date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           cast(count(*) AS bigint) AS value,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= 2
    """,
    "Sigma CORRELATION rule (event_count) end-to-end through the real "
    "compiler path on the driver table: YAML document -> parse_correlation "
    "-> compile_correlation -> run over events — the modern SigmaHQ "
    "meta-rule surface the reference skips entirely (sigma-transf/"
    "main.py:194-195 drops every aggregation-shaped rule).  The compiled "
    "plan is one watermark-legal tumbling-window keyed aggregate "
    "(map-side partials; identical code runs streaming, pinned "
    "batch==stream in tests/test_sigma_correlation.py); the oracle mirrors "
    "the epoch-aligned hour windows in plain SQL",
)
def events_sigma_corr_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from .rules.spec import RuleSpec
    from .sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: driver error burst
level: high
correlation:
  type: event_count
  rules: [driver_error]
  group-by: [user_id]
  timespan: 1h
  condition:
    gte: 2
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_error": RuleSpec(
            name="driver_error", predicate_sql="event_type = 'error'"
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_sigma_corr_temporal",
    """
    SELECT 'error then purchase' AS correlation,
           a.user_id AS entity,
           a.event_id AS a_uuid,
           b.event_id AS b_uuid,
           cast(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS bigint) AS lag_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND floor(epoch(b.ts)) >= floor(epoch(a.ts))
     AND floor(epoch(b.ts)) - floor(epoch(a.ts)) <= 1800
     AND a.event_id <> b.event_id
    WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    """,
    "Sigma CORRELATION rule (temporal_ordered) through the compiler on the "
    "driver table: 'error then purchase on the same user within 30 min'.  "
    "Candidate pairs come from the time-bucketed equi-join of "
    "ops/asof.interval_join — per-(entity, bucket) pair space, never a "
    "cartesian — refined by the exact ordered-lag predicate; the oracle is "
    "the naive theta self-join DuckDB can afford at sf0.01.  Correlation "
    "lag is DEFINED at second resolution: the join bounds AND lag_s use "
    "whole-second truncation on both engines (unix_timestamp parity, see "
    "events_rolling_7d) — full-precision oracle bounds would diverge on "
    "sub-second pairs like a=.9s before b=.1s (floor lag 0, admitted).  "
    "Streaming twin is the watermarked stream-stream join with the GC "
    "range predicate widened 1 s each end and the same floor-second "
    "refinement after, batch==stream pinned in tests",
)
def events_sigma_corr_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from .rules.spec import RuleSpec
    from .sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: error then purchase
level: high
correlation:
  type: temporal_ordered
  rules: [driver_error, driver_purchase]
  group-by: [user_id]
  timespan: 30m
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_error": RuleSpec(
            name="driver_error", predicate_sql="event_type = 'error'"
        ),
        "driver_purchase": RuleSpec(
            name="driver_purchase", predicate_sql="event_type = 'purchase'"
        ),
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "uuid", F.col("event_id")
    )
    return run(ev)


@register(
    "events_sigma_corr_distinct",
    """
    SELECT 'diverse activity' AS correlation,
           user_id,
           date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           cast(count(DISTINCT event_type) AS bigint) AS value,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type IN ('click', 'view', 'error', 'purchase', 'signup')
    GROUP BY 1, 2, 3, 4
    HAVING count(DISTINCT event_type) >= 5
    """,
    "Sigma CORRELATION rule (value_count) through the compiler on the "
    "driver table: users exercising all 5 event types inside one "
    "epoch-aligned day — windowed count(DISTINCT field) per group key "
    "compared against the condition.  Batch is one keyed "
    "distinct-aggregate; the streaming leg of the same compiled callable "
    "dedupes (window, key, value) under the watermark then counts "
    "survivors (exact distinct, state expires with the window), pinned "
    "batch==stream in tests/test_sigma_correlation.py",
)
def events_sigma_corr_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from .rules.spec import RuleSpec
    from .sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: diverse activity
correlation:
  type: value_count
  rules: [driver_any]
  group-by: [user_id]
  field: event_type
  timespan: 1d
  condition:
    gte: 5
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_any": RuleSpec(
            name="driver_any",
            predicate_sql=(
                "event_type IN ('click', 'view', 'error', 'purchase', "
                "'signup')"
            ),
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_sigma_corr_cooccur",
    """
    SELECT 'incident signature' AS correlation,
           user_id,
           make_timestamp(cast(floor(epoch(ts) / 10800) AS bigint)
                          * 10800 * 1000000) AS window_start,
           make_timestamp((cast(floor(epoch(ts) / 10800) AS bigint) + 1)
                          * 10800 * 1000000) AS window_end,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type IN ('error', 'purchase', 'signup')
    GROUP BY 1, 2, 3, 4
    HAVING count(DISTINCT event_type) = 3
    """,
    "Sigma CORRELATION rule (temporal, 3+ referenced rules) through the "
    "compiler on the driver table: error AND purchase AND signup all "
    "firing for one user inside one epoch-aligned 3-hour window — the "
    "tumbling co-occurrence form (count of DISTINCT referenced rules == "
    "rule count; the discretization trade is documented in "
    "sigma/correlation.py, same as tumbling timeframe rules).  The oracle "
    "mirrors the epoch window arithmetic with floor(epoch/10800); "
    "n_events counts every matched event in the window because the three "
    "base predicates are disjoint",
)
def events_sigma_corr_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from .rules.spec import RuleSpec
    from .sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: incident signature
correlation:
  type: temporal
  rules: [driver_error, driver_purchase, driver_signup]
  group-by: [user_id]
  timespan: 3h
"""
    )
    spec = parse_correlation(doc)
    registry = {
        name: RuleSpec(name=name, predicate_sql=f"event_type = '{etype}'")
        for name, etype in (
            ("driver_error", "error"),
            ("driver_purchase", "purchase"),
            ("driver_signup", "signup"),
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_rolling_7d",
    """
    SELECT user_id, event_id,
           date_trunc('second', ts) AS ts_sec,
           -- floor(epoch) to whole seconds: Spark's unix_timestamp
           -- truncates, DuckDB's epoch() keeps the µs fraction — frame
           -- membership at the exact 7-day boundary must agree
           round(sum(value) OVER (
             PARTITION BY user_id
             ORDER BY cast(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ), 2) AS spend_7d,
           cast(count(*) OVER (
             PARTITION BY user_id
             ORDER BY cast(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS bigint) AS n_7d
    FROM events
    WHERE event_type = 'purchase'
    """,
    "rolling 7-day per-user aggregates via a RANGE window frame over epoch "
    "seconds (time-valued, not row-counted: simultaneous rows share one "
    "frame) — one shuffle keyed by user; the per-entity trailing-window "
    "feature shape",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604800, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        F.round(F.sum("value").over(w), 2).alias("spend_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
    )


_shared_sql(
    "events_median_sketch",
    """
    WITH h AS (
      SELECT event_type,
             cast(floor(value / 10.0) AS bigint) AS bin,
             cast(count(*) AS bigint) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, floor(value / 10.0)
    ), t AS (
      SELECT event_type, cast(sum(c) AS bigint) AS n FROM h GROUP BY event_type
    ), cum AS (
      SELECT h.event_type, h.bin, h.c, t.n,
             cast(sum(h.c) OVER (
               PARTITION BY h.event_type ORDER BY h.bin
             ) AS bigint) AS cc
      FROM h JOIN t ON h.event_type = t.event_type
    )
    SELECT event_type,
           cast(min(n) AS bigint) AS n,
           cast(min(CASE WHEN cc * 2 >= n THEN bin END) AS bigint)
             AS median_bin,
           -- cast before the 10.0 multiply: Spark types the literal as
           -- DECIMAL (bigint*decimal stays decimal), DuckDB as DOUBLE
           round(cast(min(CASE WHEN cc * 2 >= n THEN bin END) AS double)
                 * 10.0, 1) AS median_lo
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    "histogram median sketch: fixed-width bins (one groupBy = the mergeable "
    "sketch) + cumulative reconstruction picking the bin where the running "
    "count crosses n/2 — the deterministic, oracle-matchable shape of "
    "approximate quantiles (percentile_approx's KLL can't cross-engine "
    "hash-match; a histogram can).  At 100 TB the sketch is the only "
    "full-data pass; reconstruction runs on |types|x|bins| rows",
)

_shared_sql(
    "events_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           date_trunc('second', min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    "sessionization (30-min gap) via lag + running sum — gaps-and-islands",
)


@register(
    "events_session_window",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             -- Spark's session_window is INCLUSIVE at the gap boundary: an
             -- event exactly 30min after the previous one still merges
             -- (verified empirically: 1800s gap -> one session, 1801s ->
             -- two), so the island break here is > (not >=)
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           date_trunc('second', min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    "built-in session_window aggregation (30-min gap); oracle is the "
    "gaps-and-islands expansion with Spark's strict-gap merge semantics",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_trunc("second", F.col("session_window.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )

# JSON extraction differs by dialect: get_json_object (Spark) vs
# json_extract_string (DuckDB); same aliases, same math.
_SPARK_JSON_STATS = """
    SELECT event_type,
           count(*) AS n,
           round(avg(cast(get_json_object(props, '$.k') AS INT)), 6) AS avg_k,
           max(cast(get_json_object(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
"""
_DUCK_JSON_STATS = """
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::INT), 6) AS avg_k,
           max(json_extract_string(props, '$.k')::INT) AS max_k
    FROM events
    GROUP BY event_type
"""
_shared_sql("events_json_stats", _SPARK_JSON_STATS, "JSON field extraction + stats",
            oracle_sql=_DUCK_JSON_STATS)


@register(
    "events_rules_engine",
    """
    SELECT 'high_value_error' AS rule_name, 7 AS severity, event_id, user_id,
           date_trunc('second', ts) AS ts_sec
    FROM events WHERE event_type = 'error' AND value > 150
    UNION ALL
    SELECT 'signup_k_gt_90', 5, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE event_type = 'signup'
      AND json_extract_string(props, '$.k')::INT > 90
    UNION ALL
    SELECT 'purchase_low_value', 3, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE event_type = 'purchase' AND value < 10
    UNION ALL
    SELECT 'auth_like_pattern', 4, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE regexp_matches(event_type, '^(error|signup)$')
      AND contains(props, '"k": 1')
    """,
    "the SIEM rule-engine shape on the generic events table: multi-predicate "
    "filter + enrich + UNION ALL fan-in (operators F1-F11/P1-P5/U1 of SURVEY §2)",
)
def events_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ts_sec = F.date_trunc("second", F.col("ts")).alias("ts_sec")
    k = F.get_json_object("props", "$.k").cast("int")

    def rule(name, severity, cond):
        return (
            events.filter(cond)
            .select(
                F.lit(name).alias("rule_name"),
                F.lit(severity).cast("int").alias("severity"),
                "event_id", "user_id", ts_sec,
            )
        )

    branches = [
        rule("high_value_error", 7, (F.col("event_type") == "error") & (F.col("value") > 150)),
        rule("signup_k_gt_90", 5, (F.col("event_type") == "signup") & (k > 90)),
        rule("purchase_low_value", 3, (F.col("event_type") == "purchase") & (F.col("value") < 10)),
        rule("auth_like_pattern", 4,
             F.col("event_type").rlike("^(error|signup)$") & F.col("props").contains('"k": 1')),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# ===========================================================================
# documents: dedup + text analysis
# ===========================================================================

_DUCK_TOKS = ("CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[] "
              "ELSE string_split_regex(trim(coalesce(text, '')), '\\s+') END")


@register(
    "exact_dedup_docs",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
    "exact deduplication: hash-groupBy, deterministic survivor",
)
def exact_dedup_docs(spark, sf_dir):
    return exact_dedup(_load_wide(spark, sf_dir, "documents"))


def _duck_minhash_mins(num_hashes: int = 16) -> str:
    """The 16 affine-hash min expressions over a precomputed hash list `hs`
    — same (a, b) family as ops.dedup.minhash_params."""
    from .ops.dedup import minhash_params

    return ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * (h % 2147483648) + {b}) % 2147483647))"
        for a, b in minhash_params(num_hashes)
    )


def _duck_lsh_cte(shingle_k: int, bands: int, rows_per_band: int) -> str:
    """Tokens → k-shingles → 60-bit hashes → 16 minhash mins → (band,
    bucket) assignments, replayed in DuckDB (same md5 + affine family as
    ops.dedup; banding is a parameter because the dedup family shares ONE
    signature stage and each operator slices its own band layout)."""
    r = rows_per_band
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {shingle_k - 1}, 1) + 1),
               i -> array_to_string(list_slice(t, i, i + {shingle_k - 1}), ' '))) AS s
      FROM toks
    ), hsh AS (
      SELECT doc_id,
             list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
      FROM sh
    ), sig AS (
      SELECT doc_id, [{_duck_minhash_mins(16)}] AS g FROM hsh
    ), buckets AS (
      SELECT doc_id, b,
             md5(array_to_string(list_slice(g, b * {r} + 1, b * {r} + {r}), '|')) AS bucket
      FROM sig, (SELECT unnest(range(0, {bands})) AS b)
    )
"""


_DUCK_MINHASH_CTE = _duck_lsh_cte(3, 4, 4)

# one persisted (id, hs, nsh, sig) stage shared by the whole minhash dedup
# family (candidates / Jaccard verify / clustering): the corpus is
# tokenized, shingled (k=3), md5'd, and min-folded ONCE per (session,
# sf_dir); each operator derives its own band layout from the cached
# signatures.  Single-slot memo: switching sf_dir unpersists the old stage
# so test sessions touching many corpora don't accumulate storage.
_DEDUP_STAGE: dict = {}


def _dedup_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import hashed_docs, minhash_signatures, shingled_docs

    key = (spark.sparkContext.applicationId, sf_dir)
    if _DEDUP_STAGE.get("key") != key:
        old = _DEDUP_STAGE.pop("df", None)
        if old is not None:
            old.unpersist()
        docs = _load_wide(spark, sf_dir, "documents")
        _DEDUP_STAGE["key"] = key
        _DEDUP_STAGE["df"] = minhash_signatures(
            hashed_docs(shingled_docs(docs, "text", "doc_id", 3)), 16
        )
    df = _DEDUP_STAGE["df"]
    df.persist()  # no-op when cached; re-arms after a clearCache
    return df

@register(
    "minhash_pairs_docs",
    _DUCK_MINHASH_CTE + """
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM buckets l JOIN buckets r
      ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    """,
    "MinHash+LSH near-dup candidates: shingle -> minhash -> band -> bucket-join",
)
def minhash_pairs_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )


@register(
    "dedup_clusters_docs",
    _DUCK_MINHASH_CTE.replace("WITH toks", "WITH RECURSIVE toks") + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT d.doc_id,
           cast(least(d.doc_id, coalesce(m.mn, d.doc_id)) AS bigint) AS cluster
    FROM documents d
    LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
      ON d.doc_id = m.a
    """,
    "near-dup cluster assignment: LSH pair graph -> connected components "
    "(iterative min-label propagation; oracle = recursive-CTE closure)",
)
def dedup_clusters_docs(spark, sf_dir):
    from .ops.dedup import dedup_clusters

    docs = _load_wide(spark, sf_dir, "documents")
    return dedup_clusters(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )


@register(
    "jaccard_pairs_docs",
    _duck_lsh_cte(3, 8, 2) + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.hs, b.hs))::DOUBLE
                 / (len(a.hs) + len(b.hs)
                    - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
    FROM cand c
    JOIN hsh a ON c.id_a = a.doc_id
    JOIN hsh b ON c.id_b = b.doc_id
    WHERE round(len(list_intersect(a.hs, b.hs))::DOUBLE
                / (len(a.hs) + len(b.hs)
                   - len(list_intersect(a.hs, b.hs))), 6) >= 0.2
    """,
    "n-gram Jaccard near-dup: high-recall LSH candidates (8 bands x 2 rows "
    "over the SHARED trigram signature stage) + exact verify >= 0.2 "
    "(verify on 60-bit hashed shingles; union size by arithmetic)",
)
def jaccard_pairs_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, threshold=0.2, num_hashes=16, bands=8,
        sigs=_dedup_stage(spark, sf_dir),
    )


@register(
    "simhash_docs",
    f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    hsh AS (
      SELECT doc_id,
             list_transform(t, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS ht
      FROM toks
    )
    SELECT doc_id,
           list_aggregate(list_transform(range(0, 32), p ->
             CASE WHEN list_sum(list_transform(ht, h ->
                    CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                  THEN '1' ELSE '0' END), 'string_agg', '') AS sig
    FROM hsh
    """,
    "SimHash document signatures (32-bit, md5-nibble votes)",
)
def simhash_docs(spark, sf_dir):
    from .ops.dedup import simhash_df

    return simhash_df(_load_wide(spark, sf_dir, "documents"), "text", "doc_id", 32)


_SIMHASH_SIG_CTE = f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    hsh AS (
      SELECT doc_id,
             list_transform(t, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS ht
      FROM toks
    ), sigs AS (
      SELECT doc_id,
             list_aggregate(list_transform(range(0, 32), p ->
               CASE WHEN list_sum(list_transform(ht, h ->
                      CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN '1' ELSE '0' END), 'string_agg', '') AS sig
      FROM hsh
    )
"""

_SIMHASH_INT_CTE = f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    hsh AS (
      SELECT doc_id,
             list_transform(t, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS ht
      FROM toks
    ), sigs AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 32), p ->
               CASE WHEN list_sum(list_transform(ht, h ->
                      CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << p) ELSE 0 END))::BIGINT AS isig
      FROM hsh
    )
"""

_MULTIPROBE_BRANCH = """
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.isig AS sa, b.isig AS sb
      FROM sigs a JOIN sigs b
        ON ((a.isig >> {shift}) & 255) = ((b.isig >> {shift}) & 255)
       AND a.doc_id < b.doc_id
"""

@register(
    "simhash_multiprobe",
    _SIMHASH_INT_CTE + """
    , cand AS (
    """ + "\n      UNION\n".join(
        _MULTIPROBE_BRANCH.format(shift=r * 8) for r in range(4)
    ) + """
    )
    SELECT id_a, id_b,
           cast(bit_count(xor(sa, sb)) AS bigint) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 4
    """,
    "multi-probe SimHash near-dup: candidates from 4 disjoint 8-bit "
    "signature fields (pigeonhole guarantees recall of every pair at "
    "Hamming<=3, vs prefix-only blocking which can miss them), unioned and "
    "verified by bit_count(xor)",
)
def simhash_multiprobe(spark, sf_dir):
    from .ops.dedup import simhash_multiprobe_pairs

    docs = _load_wide(spark, sf_dir, "documents")
    out = simhash_multiprobe_pairs(docs, bits=32, probes=4, probe_bits=8, max_hamming=4)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "simhash_neardup",
    _SIMHASH_SIG_CTE + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           cast(len(list_filter(range(1, 33),
                p -> substr(a.sig, p, 1) <> substr(b.sig, p, 1))) AS bigint)
             AS hamming
    FROM sigs a JOIN sigs b
      ON substr(a.sig, 1, 8) = substr(b.sig, 1, 8) AND a.doc_id < b.doc_id
    WHERE len(list_filter(range(1, 33),
              p -> substr(a.sig, p, 1) <> substr(b.sig, p, 1))) <= 4
    """,
    "SimHash near-dup pairs: 8-bit prefix blocking + Hamming<=4 verify",
)
def simhash_neardup(spark, sf_dir):
    from .ops.dedup import simhash_neardup_pairs

    docs = _load_wide(spark, sf_dir, "documents")
    out = simhash_neardup_pairs(docs, bits=32, prefix_bits=8, max_hamming=4)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "docs_stratified_sample",
    """
    SELECT lang, doc_id, rk
    FROM (
      SELECT lang, doc_id,
             cast(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS bigint) AS rk
      FROM documents
    )
    WHERE rk <= 20
    """,
    "deterministic stratified sampling: fixed-size per-class subset (20 per "
    "language), ranked by md5(doc_id) so the draw is pseudo-random yet "
    "reproducible across engines/runs/partitionings — the class-balancing "
    "primitive for training-data mixes.  One shuffle keyed by the stratum; "
    "at 100 TB the rank is per-partition-truncatable (each partition only "
    "needs its top-20 candidates before the merge)",
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "lang", "doc_id", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= 20)
    )


@register(
    "docs_pack_bins",
    """
    SELECT source, doc_id, n_tok,
           cast(coalesce(sum(n_tok) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // 4096 AS bigint) AS bin
    FROM (
      SELECT source, doc_id,
             cast(len({toks}) AS bigint) AS n_tok
      FROM documents
    )
    """.format(toks=_DUCK_TOKS),
    "sequence packing for training: documents stream into 4096-token bins "
    "per source shard — bin = (running token count before this doc) div "
    "budget, the deterministic distributed approximation of greedy packing "
    "(a doc can straddle its bin boundary; the streaming writer splits it). "
    "One window shuffle keyed by shard, order by doc_id",
)
def docs_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return sized.select(
        "source",
        "doc_id",
        "n_tok",
        (cum_before / 4096).cast("long").alias("bin"),
    )


_BLOOM_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, list_distinct(CASE WHEN len(t) >= 5
        THEN [md5(array_to_string(list_slice(t, i, i + 4), ' ')) FOR i IN range(1, len(t) - 3)]
        ELSE []::VARCHAR[] END) AS gs
      FROM toks
    ), ex AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    ks AS (SELECT unnest(generate_series(0, 2)) AS i),
    bench_bits AS (
      SELECT DISTINCT ('0x' || substr(md5(i::VARCHAR || ':' || g), 1, 8))::BIGINT % 262144 AS pos
      FROM (SELECT DISTINCT g FROM ex WHERE doc_id % 17 = 0) b, ks
    ), sparse AS (
      SELECT (pos // 32)::INT AS w, sum(1::BIGINT << (pos % 32)::INT)::BIGINT AS word
      FROM bench_bits GROUP BY 1
    ), dense AS (
      SELECT g.w, coalesce(s.word, 0)::BIGINT AS word
      FROM (SELECT unnest(generate_series(0, 8191)) AS w) g LEFT JOIN sparse s ON g.w = s.w
    ), words AS (
      SELECT list(word ORDER BY w) AS ws FROM dense
    ), probes AS (
      SELECT e.doc_id, e.g,
             min(CASE WHEN ((w.ws[(('0x' || substr(md5(k.i::VARCHAR || ':' || e.g), 1, 8))::BIGINT % 262144 // 32)::INT + 1]
                            >> (('0x' || substr(md5(k.i::VARCHAR || ':' || e.g), 1, 8))::BIGINT % 262144 % 32)::INT) & 1) = 1
                      THEN 1 ELSE 0 END) AS hit
      FROM ex e, ks k, words w
      WHERE e.doc_id % 17 <> 0
      GROUP BY e.doc_id, e.g
    ), bench_set AS (SELECT DISTINCT g FROM ex WHERE doc_id % 17 = 0),
    per_doc AS (
      SELECT p.doc_id,
             count(*)::BIGINT AS n_grams,
             sum(p.hit)::BIGINT AS n_bloom_hits,
             sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_true_hits
      FROM probes p LEFT JOIN bench_set b ON p.g = b.g
      GROUP BY p.doc_id
    )
    SELECT doc_id, n_grams, n_bloom_hits, n_true_hits,
           n_bloom_hits >= n_true_hits AS bloom_never_misses
    FROM per_doc WHERE n_bloom_hits > 0
"""

@register(
    "bloom_decontam_docs",
    _BLOOM_ORACLE,
    "Bloom-filter decontamination pre-filter: benchmark 5-gram shingles "
    "packed into a 262144-bit / 3-hash filter (8192 32-bit words, 64 KB), "
    "corpus probed with O(1) bitwise tests against the broadcast word "
    "array; no-false-negative guarantee pinned by the oracle "
    "(n_bloom_hits >= n_true_hits).  At 100 TB the eval-set filter stays "
    "KBs where the exact shingle set is GBs — probe first, verify "
    "survivors exactly",
)
def bloom_decontam_docs(spark, sf_dir):
    M, K, NWORDS = 262144, 3, 8192
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    grams = F.array_distinct(
        F.transform(word_ngrams(F.col("__toks"), 5), lambda g: F.md5(g)))
    ex = staged.select("doc_id", F.explode(grams).alias("g"))
    bench = ex.filter((F.col("doc_id") % 17) == 0).select("g").distinct()

    def pos_of(i, g):
        key = F.concat_ws(":", i.cast("string"), g)
        return (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % M
        )

    bits = (
        bench.select("g", F.explode(F.lit(list(range(K)))).alias("i"))
        .select(pos_of(F.col("i"), F.col("g")).alias("pos"))
        .distinct()
    )
    sparse = (
        bits.groupBy(F.floor(F.col("pos") / 32).cast("int").alias("w"))
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            ).alias("word")
        )
    )
    dense = (
        spark.range(NWORDS)
        .select(F.col("id").cast("int").alias("w"))
        .join(sparse, "w", "left")
        .select("w", F.coalesce(F.col("word"), F.lit(0)).cast("long").alias("word"))
    )
    words_row = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda x: x["word"],
        ).alias("ws")
    )
    train = ex.filter((F.col("doc_id") % 17) != 0)
    probes = (
        train.select("doc_id", "g", F.explode(F.lit(list(range(K)))).alias("i"))
        .select("doc_id", "g", pos_of(F.col("i"), F.col("g")).alias("pos"))
        .crossJoin(F.broadcast(words_row))
        .select(
            "doc_id",
            "g",
            F.expr(
                "CASE WHEN ((ws[CAST(pos / 32 AS INT)]"
                " >> CAST(pos % 32 AS INT)) & 1) = 1 THEN 1 ELSE 0 END"
            ).alias("hitbit"),
        )
        .groupBy("doc_id", "g")
        .agg(F.min("hitbit").alias("hit"))
    )
    bench_set = bench.withColumn("__b", F.lit(1))
    per_doc = (
        probes.join(bench_set, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").cast("long").alias("n_bloom_hits"),
            F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_true_hits"),
        )
    )
    return per_doc.filter(F.col("n_bloom_hits") > 0).select(
        "doc_id",
        "n_grams",
        "n_bloom_hits",
        "n_true_hits",
        (F.col("n_bloom_hits") >= F.col("n_true_hits")).alias("bloom_never_misses"),
    )


def _zorder_sql(x: str, y: str, bits: int = 10) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZORDER_ORACLE = f"""
    WITH pts AS (
      SELECT (user_id % 1024)::BIGINT AS x, (event_id % 1024)::BIGINT AS y,
             event_id AS tie
      FROM events WHERE user_id IS NOT NULL
    ), keyed AS (
      SELECT x, y, tie, {_zorder_sql('x', 'y')} AS zkey FROM pts
    ), buck AS (
      SELECT x, y,
             ntile(64) OVER (ORDER BY zkey, tie) AS zb,
             ntile(64) OVER (ORDER BY x, y, tie) AS xb
      FROM keyed
    ), ze AS (
      SELECT zb, max(x) - min(x) AS ex, max(y) - min(y) AS ey FROM buck GROUP BY zb
    ), xe AS (
      SELECT xb, max(x) - min(x) AS ex, max(y) - min(y) AS ey FROM buck GROUP BY xb
    )
    SELECT 'zorder' AS ordering, round(avg(ex), 2) AS avg_extent_x,
           round(avg(ey), 2) AS avg_extent_y, CAST(count(*) AS BIGINT) AS n_buckets
    FROM ze
    UNION ALL
    SELECT 'xorder', round(avg(ex), 2), round(avg(ey), 2), CAST(count(*) AS BIGINT)
    FROM xe
"""

@register(
    "events_zorder_layout",
    _ZORDER_ORACLE,
    "Z-order (Morton) layout gauge: rows bucketed 64 ways under z-key "
    "order vs single-column order, per-bucket min/max extents averaged — "
    "z bounds BOTH dimensions (data skipping prunes on either filter "
    "column) where x-order leaves y unbounded; the ntiles run on "
    "ops/rank.global_ntile (range-partitioned two-pass — this table is "
    "corpus-scale, the old single-partition windowed ntile was the one "
    "shape that melts at 100x), which is also exactly the "
    "repartitionByRange+sortWithinPartitions layout a production "
    "z-ordered write would use",
)
def events_zorder_layout(spark, sf_dir):
    from .ops.rank import global_ntile
    from .ops.skew import zorder_key

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            (F.col("user_id") % 1024).cast("long").alias("x"),
            (F.col("event_id") % 1024).cast("long").alias("y"),
            F.col("event_id").alias("tie"),
        )
    )
    keyed = ev.select("x", "y", "tie", zorder_key(F.col("x"), F.col("y")).alias("zkey"))

    def extents(buck, col, name):
        return (
            buck.groupBy(col)
            .agg(
                (F.max("x") - F.min("x")).alias("ex"),
                (F.max("y") - F.min("y")).alias("ey"),
            )
            .agg(
                F.lit(name).alias("ordering"),
                F.round(F.avg("ex"), 2).alias("avg_extent_x"),
                F.round(F.avg("ey"), 2).alias("avg_extent_y"),
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
            )
        )

    # the two orderings feed two DISJOINT aggregates, so each gets its own
    # independent range-partitioned ntile over keyed (no join, no chain);
    # one combined boundaries pass serves both
    from .ops.rank import boundaries_for

    bnds = boundaries_for(keyed, {"zb": F.col("zkey"), "xb": F.col("x")})
    zbuck = global_ntile(keyed, ["zkey", "tie"], 64, "zb",
                         boundaries=bnds["zb"])
    xbuck = global_ntile(keyed, ["x", "y", "tie"], 64, "xb",
                         boundaries=bnds["xb"])
    return extents(zbuck, "zb", "zorder").unionByName(
        extents(xbuck, "xb", "xorder")
    )


_CMS_ORACLE = """
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    depths AS (SELECT unnest(generate_series(0, 3)) AS j),
    cells AS (
      SELECT j, ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT % 256 AS bucket,
             count(*)::BIGINT AS c
      FROM ev, depths GROUP BY 1, 2
    ), queries AS (
      SELECT DISTINCT user_id FROM ev WHERE user_id < 50
    ), probes AS (
      SELECT q.user_id, d.j,
             ('0x' || substr(md5(d.j::VARCHAR || ':' || q.user_id::VARCHAR), 1, 8))::BIGINT % 256 AS bucket
      FROM queries q, depths d
    ), est AS (
      SELECT p.user_id, min(coalesce(c.c, 0))::BIGINT AS cms_est
      FROM probes p LEFT JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
      GROUP BY p.user_id
    ), exact AS (
      SELECT user_id, count(*)::BIGINT AS exact_cnt FROM ev GROUP BY user_id
    )
    SELECT e.user_id, x.exact_cnt, e.cms_est,
           (e.cms_est - x.exact_cnt)::BIGINT AS overcount,
           e.cms_est >= x.exact_cnt AS never_undercounts
    FROM est e JOIN exact x ON e.user_id = x.user_id
"""

@register(
    "events_cms_counts",
    _CMS_ORACLE,
    "count-min sketch (depth 4 x width 256, md5 row-hashes): per-user count "
    "estimates from the sketch vs exact, overcount >= 0 pinned by the "
    "oracle — the mergeable heavy-hitter sketch; the 4x row fan-out is "
    "absorbed map-side by partial aggregation, sketch size is O(d*w) "
    "regardless of key cardinality",
)
def events_cms_counts(spark, sf_dir):
    depth, width = 4, 256
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )

    def bucket_of(j, uid):
        key = F.concat_ws(":", j.cast("string"), uid.cast("string"))
        return (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % width
        )

    fan = ev.select("user_id", F.explode(F.lit(list(range(depth)))).alias("j"))
    cells = (
        fan.select("j", bucket_of(F.col("j"), F.col("user_id")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    queries = ev.filter(F.col("user_id") < 50).distinct()
    probes = queries.select(
        "user_id", F.explode(F.lit(list(range(depth)))).alias("j")
    ).select(
        "user_id", "j", bucket_of(F.col("j"), F.col("user_id")).alias("bucket")
    )
    est = (
        probes.join(cells, ["j", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return est.join(exact, "user_id").select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        (F.col("cms_est") >= F.col("exact_cnt")).alias("never_undercounts"),
    )


@register(
    "sentences_docs",
    r"""
    WITH arrs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[.!?]+[ \t\n\r\f]+'), s -> s <> '') AS arr
      FROM documents WHERE text IS NOT NULL
    ), pos AS (
      SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS p FROM arrs
    )
    SELECT doc_id, p::INT AS pos, arr[p] AS sentence FROM pos
    """,
    "sentence segmentation via a Python UDTF (LATERAL table function, the "
    "one UDF flavor the rest of the catalog doesn't exercise): split on "
    "terminal punctuation + whitespace, 1-based ordinal per doc — regex "
    "chosen lookbehind-free so Python re and DuckDB RE2 split identically",
)
def sentences_docs(spark, sf_dir):
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SentenceSplit:
        def eval(self, text):
            if text is None:
                return
            pos = 0
            # explicit class, not \s: Python's \s is Unicode (NBSP,
            # U+2028) and even re.ASCII \s includes \v, while RE2's \s
            # is exactly [\t\n\f\r ] — the oracle uses the same class
            for p in _re.split(r"[.!?]+[ \t\n\r\f]+", text):
                if p != "":
                    pos += 1
                    yield pos, p

    _load_wide(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence "
        "FROM documents d, LATERAL sentence_split(d.text) s "
        "WHERE d.text IS NOT NULL"
    )


@register(
    "normalize_docs",
    """
    SELECT doc_id,
           nfc_normalize(text) AS nfc_text,
           (text IS NOT DISTINCT FROM nfc_normalize(text)) AS is_nfc,
           length(nfc_normalize(text))::BIGINT AS nfc_len
    FROM documents
    """,
    "Unicode NFC normalization via an Arrow-vectorized scalar Pandas UDF "
    "(Spark has no built-in normalizer) — the one verified-against-oracle "
    "Python op: byte-identical to DuckDB's nfc_normalize, NULL-preserving",
)
def normalize_docs(spark, sf_dir):
    from .ops.text import nfc_normalize_udf

    docs = _load_wide(spark, sf_dir, "documents")
    nfc = nfc_normalize_udf()(F.col("text"))
    return docs.select(
        "doc_id",
        nfc.alias("nfc_text"),
        F.col("text").eqNullSafe(nfc).alias("is_nfc"),
        F.length(nfc).cast("long").alias("nfc_len"),
    )


_COHORT_SQL = """
    WITH user_first AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events WHERE user_id IS NOT NULL
    ), joined AS (
      SELECT f.cohort_day, CAST({datediff} AS BIGINT) AS day_offset, a.user_id
      FROM activity a JOIN user_first f ON a.user_id = f.user_id
    ), sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM user_first GROUP BY cohort_day
    ), ret AS (
      SELECT cohort_day, day_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM joined GROUP BY cohort_day, day_offset
    )
    SELECT r.cohort_day, r.day_offset, r.n_users, s.cohort_size,
           round(CAST(r.n_users AS DOUBLE) / s.cohort_size, 6) AS retention_frac
    FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
"""

_shared_sql(
    "events_cohort_retention",
    _COHORT_SQL.format(datediff="datediff(a.day, f.cohort_day)"),
    "cohort retention matrix: users bucketed by first-seen day, distinct "
    "actives per (cohort, day-offset) with retention fraction — two "
    "user-keyed aggregations plus a broadcast-size cohort join",
    oracle_sql=_COHORT_SQL.format(datediff="date_diff('day', f.cohort_day, a.day)"),
)


_shared_sql(
    "events_funnel",
    """
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ), depth AS (
      SELECT user_id,
             CASE
               WHEN t_signup IS NOT NULL AND t_view IS NOT NULL AND t_purchase IS NOT NULL
                    AND t_signup <= t_view AND t_view <= t_purchase THEN 3
               WHEN t_signup IS NOT NULL AND t_view IS NOT NULL AND t_signup <= t_view THEN 2
               WHEN t_signup IS NOT NULL THEN 1
               ELSE 0 END AS funnel_depth
      FROM steps
    )
    SELECT funnel_depth, CAST(count(*) AS BIGINT) AS n_users
    FROM depth GROUP BY funnel_depth
    """,
    "ordered-step funnel (signup -> view -> purchase by first occurrence): "
    "one user-keyed aggregation computes every step time via min(CASE), "
    "depth classification is a pure projection — a single shuffle at any "
    "scale, no per-step self-joins",
)


_MIXTURE_SAMPLE_ORACLE = f"""
    WITH toks AS (
      SELECT source, doc_id, len({_DUCK_TOKS})::BIGINT AS t FROM documents
    ), src AS (
      SELECT source, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS c_tokens
      FROM toks GROUP BY source
    ), w AS (
      SELECT *, round(sqrt(c_tokens), 6) AS wv FROM src
    ), tot AS (
      SELECT round(sum(wv), 6) AS w_total, sum(c_tokens)::BIGINT AS tot_tokens FROM w
    ), rates AS (
      SELECT w.source, w.n_docs, w.c_tokens,
             CASE WHEN tot.w_total > 0
                  THEN round(w.wv / tot.w_total, 6) ELSE 0.0 END AS weight,
             CASE WHEN w.c_tokens > 0 AND tot.w_total > 0
                  THEN round(least(1.0, 0.3 * tot.tot_tokens * w.wv
                                   / (tot.w_total * w.c_tokens)), 6)
                  ELSE 0.0 END AS rate
      FROM w, tot
    ), acc AS (
      SELECT t.source, t.t FROM toks t JOIN rates r USING (source)
      WHERE (('0x' || substr(md5(t.doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
            / 1000000.0 < r.rate
    ), agg AS (
      SELECT source, count(*)::BIGINT AS n_sampled, sum(t)::BIGINT AS tokens_sampled
      FROM acc GROUP BY source
    )
    SELECT r.source, r.n_docs, r.c_tokens, r.weight, r.rate,
           coalesce(a.n_sampled, 0)::BIGINT AS n_sampled,
           coalesce(a.tokens_sampled, 0)::BIGINT AS tokens_sampled
    FROM rates r LEFT JOIN agg a USING (source)
"""

@register(
    "mixture_sample_docs",
    _MIXTURE_SAMPLE_ORACLE,
    "temperature-weighted mixture sampling (alpha=0.5, 30% token budget): "
    "per-source budgets proportional to tokens^alpha, then a deterministic "
    "md5(doc_id) acceptance gate — two passes: tiny stats agg, broadcast "
    "rates, map-side filter (no corpus shuffle)",
)
def mixture_sample_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", token_count(F.col("text")).alias("t")
    )
    src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("c_tokens")
    ).withColumn("wv", F.round(F.sqrt(F.col("c_tokens")), 6))
    tot = src.agg(
        F.round(F.sum("wv"), 6).alias("w_total"),
        F.sum("c_tokens").alias("tot_tokens"),
    )
    rates = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "c_tokens",
        F.when(
            F.col("w_total") > 0, F.round(F.col("wv") / F.col("w_total"), 6)
        ).otherwise(F.lit(0.0)).alias("weight"),
        F.when(
            (F.col("c_tokens") > 0) & (F.col("w_total") > 0),
            F.round(
                F.least(
                    F.lit(1.0),
                    0.3 * F.col("tot_tokens") * F.col("wv")
                    / (F.col("w_total") * F.col("c_tokens")),
                ),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000
    ) / 1000000.0
    accepted = (
        toks.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(u < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled_raw"),
            F.sum("t").alias("tokens_sampled_raw"),
        )
    )
    return rates.join(accepted, "source", "left").select(
        "source",
        "n_docs",
        "c_tokens",
        "weight",
        "rate",
        F.coalesce(F.col("n_sampled_raw"), F.lit(0)).cast("long").alias("n_sampled"),
        F.coalesce(F.col("tokens_sampled_raw"), F.lit(0)).cast("long").alias("tokens_sampled"),
    )


_JACCARD_EXACT_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_DUCK_TOKS}) AS t FROM documents
      WHERE doc_id < 500
    ), nz AS (SELECT * FROM toks WHERE len(t) > 0),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.t, b.t))::BIGINT AS nint,
             (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))::BIGINT AS nuni
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(nint::DOUBLE / nuni, 6) AS jaccard
    FROM pairs WHERE 10 * nint >= 9 * nuni
"""

@register(
    "jaccard_exact_join",
    _JACCARD_EXACT_ORACLE,
    "EXACT Jaccard>=0.9 self-join via prefix filtering (AllPairs/PPJoin): "
    "rarest-first token prefixes generate candidates, integer-only prefix "
    "length and cross-multiplied threshold keep the filter LOSSLESS — the "
    "oracle brute-forces all pairs and the hash gate verifies the pruned "
    "plan returns the identical set.  Input capped at doc_id < 500: this "
    "synthetic corpus is prefix filtering's worst case (a ~200-token "
    "shared vocabulary makes every prefix common and most pairs genuinely "
    ">=0.9 similar — 965k qualifying pairs at sf0.1), so the demo is "
    "bounded; real Zipfian corpora are where the prefix prunes",
)
def jaccard_exact_join(spark, sf_dir):
    from .ops.dedup import jaccard_prefix_join

    docs = _load_wide(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return jaccard_prefix_join(docs, threshold_num=9, threshold_den=10)


_SUBSTRING_DEDUP_ORACLE = """
    WITH d AS (
      SELECT doc_id, text, (length(text) - 39)::BIGINT AS n_windows
      FROM documents WHERE length(text) >= 40
    ), pos AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text) - 39)) AS i FROM d
    ), spans AS (
      SELECT doc_id, md5(substring(text, i, 40)) AS h FROM pos
    ), dups AS (
      SELECT h FROM spans GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), per_doc AS (
      SELECT doc_id, count(*)::BIGINT AS n_dup FROM spans
      WHERE h IN (SELECT h FROM dups) GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_windows,
           coalesce(p.n_dup, 0)::BIGINT AS n_dup_windows,
           round(coalesce(p.n_dup, 0)::DOUBLE / d.n_windows, 6) AS dup_window_frac
    FROM d LEFT JOIN per_doc p USING (doc_id)
"""

@register(
    "substring_dedup_docs",
    _SUBSTRING_DEDUP_ORACLE,
    "exact-substring duplication stats (arXiv:2107.06499 signal): every "
    "40-char window hashed, windows whose text recurs in another doc "
    "counted per doc — window-hash + one hash-keyed shuffle standing in "
    "for the paper's suffix array; stride is the scale knob",
)
def substring_dedup_docs(spark, sf_dir):
    from .ops.dedup import duplicated_span_stats

    docs = _load_wide(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, k=40, stride=1)


@register(
    "docs_hash_sample",
    """
    SELECT source, count(*) AS n_sampled,
           cast(sum(n_chars) AS bigint) AS chars_sampled
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 10
    GROUP BY source
    """,
    "deterministic 10% hash sampling (md5(doc_id) mod 100): reproducible "
    "across engines/runs/partitionings, unlike rand()-based sampling; the "
    "standard way to carve stable training-data subsets",
)
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.filter(bucket < 10)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


@register(
    "fingerprint_docs",
    """
    SELECT doc_id,
           list_min(list_transform(
             range(1, greatest(length(coalesce(text, '')) - 7, 1) + 1),
             i -> md5(substr(coalesce(text, ''), i, 8)))) AS fp
    FROM documents
    """,
    "rolling-hash document fingerprint: min md5 over char 8-grams",
)
def fingerprint_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text"), 8).alias("fp"))


_STOP_SQL = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

@register(
    "text_stats_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents
    ), raw AS (
      SELECT doc_id,
             length(coalesce(text, '')) AS n_chars,
             len(t) AS n_tokens,
             len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]')) AS n_alpha,
             len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS n_digit,
             len(regexp_extract_all(coalesce(text, ''), '[^\\sA-Za-z0-9]')) AS n_punct,
             len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS n_stop
      FROM toks
    ), ratios AS (
      SELECT doc_id, n_chars, n_tokens,
             CASE WHEN n_chars > 0 THEN n_alpha::DOUBLE / n_chars ELSE 0 END AS alpha_r,
             CASE WHEN n_chars > 0 THEN n_digit::DOUBLE / n_chars ELSE 0 END AS digit_r,
             CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0 END AS punct_r,
             CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0 END AS stop_r
      FROM raw
    )
    SELECT doc_id, n_chars, n_tokens,
           round(alpha_r, 6) AS alpha_ratio,
           round(digit_r, 6) AS digit_ratio,
           round(punct_r, 6) AS punct_ratio,
           round(stop_r, 6) AS stopword_ratio,
           round(greatest(0.0, least(1.0,
             (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.25 ELSE 0.0 END)
             + alpha_r * 0.35
             + least(stop_r * 2.0, 1.0) * 0.25
             + 0.15
             - (digit_r + punct_r) * 0.5)) + 1e-9, 6) AS quality
    FROM ratios
    """,
    "text quality scoring: char/word stats + composite quality in [0,1]",
)
def text_stats_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    s = text_stats(F.col("text"))
    return docs.select(
        "doc_id",
        s["n_chars"].alias("n_chars"),
        s["n_tokens"].alias("n_tokens"),
        F.round(s["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(s["digit_ratio"], 6).alias("digit_ratio"),
        F.round(s["punct_ratio"], 6).alias("punct_ratio"),
        F.round(s["stopword_ratio"], 6).alias("stopword_ratio"),
        # +1e-9 boundary nudge: the multi-term quality expression can differ
        # between engines by ~1 ulp (FMA/op order); dyadic n_chars values park
        # exact results ON the .xxxxxx5 boundary, so displace it first
        F.round(quality_score(F.col("text")) + F.lit(1e-9), 6).alias("quality"),
    )


def _lang_score_sql(code: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[code])
    return f"len(list_filter(lt, x -> x IN ({words})))"


@register(
    "language_id_docs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') END AS lt
      FROM documents
    ), scores AS (
      SELECT doc_id,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scores
    """,
    "stopword-vote language identification heuristic",
)
def language_id_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


def _lang_ngram_score_sql(code: str) -> str:
    from .ops.text import LANG_TRIGRAMS

    grams = ", ".join(f"'{g}'" for g in LANG_TRIGRAMS[code])
    return f"len(list_intersect(tg, [{grams}]))"


@register(
    "language_id_ngram_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t
            FROM documents)
    ), scores AS (
      SELECT doc_id,
             {_lang_ngram_score_sql('de')} AS s_de,
             {_lang_ngram_score_sql('en')} AS s_en,
             {_lang_ngram_score_sql('es')} AS s_es,
             {_lang_ngram_score_sql('fr')} AS s_fr
      FROM g
    )
    SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scores
    """,
    "character-trigram language identification (Cavnar–Trenkle-style "
    "profile intersection reduced to fixed tiny profiles): the n-gram "
    "companion to the stopword-vote heuristic — catches inflected text "
    "where exact stopword tokens don't appear",
)
def language_id_ngram_docs(spark, sf_dir):
    from .ops.text import char_trigrams, language_id_ngram_from_trigrams

    docs = _load_wide(spark, sf_dir, "documents")
    # trigram array staged once: the four profile intersections then read an
    # attribute instead of re-deriving (and re-lowering) the gram array
    staged = docs.select("doc_id", char_trigrams(F.col("text")).alias("__tg"))
    return staged.select(
        "doc_id",
        language_id_ngram_from_trigrams(F.col("__tg")).alias("lang_pred"),
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), terms AS (
      SELECT doc_id, lower(unnest(t)) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, cast(count(*) AS bigint) AS tf
      FROM terms GROUP BY doc_id, term
    ), idf AS (
      SELECT term,
             ln((SELECT count(*) FROM documents)::DOUBLE
                / count(DISTINCT doc_id)) AS idf
      FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * idf.idf, 6) AS score
      FROM tf JOIN idf USING (term)
    ), ranked AS (
      SELECT doc_id, term, tf, score,
             cast(row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
             ) AS bigint) AS rk
      FROM scored
    )
    SELECT doc_id, term, tf, score, rk FROM ranked WHERE rk <= 3
    """,
    "TF-IDF top-3 terms per document: explode -> (doc, term) counts -> "
    "document frequency join -> ln(N/df) weighting -> per-doc top-k window. "
    "Two keyed shuffles (term stats, per-doc rank); the tiny corpus-size "
    "aggregate broadcasts.  The classic keyword-extraction / relevance "
    "primitive over a training corpus",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("raw_term")
    ).select("doc_id", F.lower(F.col("raw_term")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("term", F.log(F.col("n_docs") / F.col("df")).alias("idf"))
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", "tf", F.round(F.col("tf") * F.col("idf"), 6).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "score", "rk")
    )


@register(
    "training_manifest",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents
    ), raw AS (
      SELECT doc_id,
             length(coalesce(text, '')) AS n_chars,
             len(t) AS n_tokens,
             len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]')) AS n_alpha
      FROM toks
    ), j AS (
      SELECT d.doc_id, d.lang, d.source,
             cast(r.n_tokens AS bigint) AS n_tokens,
             CASE WHEN r.n_chars > 0
                  THEN r.n_alpha::DOUBLE / r.n_chars ELSE 0.0 END AS ar,
             e.label,
             sqrt(list_dot_product(e.embedding::DOUBLE[],
                                   e.embedding::DOUBLE[])) AS nv
      FROM documents d
      JOIN raw r USING (doc_id)
      JOIN embeddings e ON d.doc_id = e.vec_id AND e.embedding IS NOT NULL
    )
    SELECT doc_id, lang, source, n_tokens,
           round(ar, 6) AS alpha_ratio,
           round(nv, 6) AS vec_norm,
           label
    FROM j
    WHERE n_tokens >= 3 AND ar >= 0.5
    """,
    "training-sample manifest assembly: quality-gated join of the text side "
    "(token/alpha stats) with the vector side (embedding norm, label) — the "
    "select-and-stitch step before writing training shards.  At scale both "
    "sides are fact tables: equi-join on the shared id, no broadcast "
    "assumption; gates are single-division ratios so the filter boundary is "
    "engine-exact",
)
def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.similarity import norm as vec_norm
    from .ops.text import text_stats

    docs = _load_wide(spark, sf_dir, "documents")
    emb = _load_wide(spark, sf_dir, "embeddings")
    s = text_stats(F.col("text"))
    gated = docs.select(
        "doc_id", "lang", "source",
        s["n_tokens"].alias("n_tokens"),
        s["alpha_ratio"].alias("ar"),
    ).filter((F.col("n_tokens") >= 3) & (F.col("ar") >= 0.5))
    vecs = emb.filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id"),
        vec_norm(F.col("embedding").cast("array<double>")).alias("nv"),
        "label",
    )
    return gated.join(vecs, gated.doc_id == vecs.vec_id).select(
        "doc_id", "lang", "source", "n_tokens",
        F.round(F.col("ar"), 6).alias("alpha_ratio"),
        F.round(F.col("nv"), 6).alias("vec_norm"),
        "label",
    )


@register(
    "token_counts_docs",
    f"""
    WITH toks AS (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents)
    SELECT doc_id,
           len(t)::BIGINT AS ws_tokens,
           len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]{{1,4}}|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens
    FROM toks
    """,
    "token counting: whitespace + BPE-ish regex chunking",
)
def token_counts_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "array_funcs_docs",
    f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
    SELECT doc_id,
           cast(len(t) AS bigint) AS n_tokens,
           cast(len(list_filter(t, w -> length(w) > 4)) AS bigint) AS n_long,
           round(coalesce(list_sum(list_transform(t, w -> length(w))), 0)::DOUBLE
                 / greatest(len(t), 1), 6) AS avg_len,
           len(list_filter(t, w -> w = 'the')) > 0 AS has_the
    FROM toks
    """,
    "higher-order array functions: filter/transform/aggregate/exists over "
    "token arrays, all JVM-side lambdas (no Python)",
)
def array_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    return staged.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.filter("t", lambda w: F.length(w) > 4)).cast("long").alias("n_long"),
        F.round(
            F.aggregate("t", F.lit(0).cast("long"), lambda a, w: a + F.length(w))
            .cast("double")
            / F.greatest(F.size("t"), F.lit(1)),
            6,
        ).alias("avg_len"),
        F.exists("t", lambda w: w == "the").alias("has_the"),
    )


# ===========================================================================
# embeddings: similarity search
# ===========================================================================

_ANN_ORACLE = """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
    c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings
         WHERE embedding IS NOT NULL),
    s AS (
      SELECT qid AS query_id, nid AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                  THEN round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
                  ELSE 0.0 END AS score
      FROM q, c WHERE nid <> qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_brute_force",
    _ANN_ORACLE,
    "exact cosine top-5 per query vector (broadcast queries, scan corpus)",
)
def ann_brute_force(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(emb, queries, k=5)


def _planes_sql(num_planes: int = 4, dim: int = 64) -> str:
    cases = []
    for p in range(num_planes):
        coeffs = ", ".join(repr(c) for c in _plane_coeffs(p, dim))
        cases.append(
            f"(CASE WHEN list_dot_product(v, [{coeffs}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        )
    return " || ".join(cases)


_ANN_LSH_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), bucketed AS (
      SELECT vec_id, v, {_planes_sql(4, 64)} AS bucket FROM e
    ), q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bucketed WHERE vec_id < 8),
    s AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)) > 0
                  THEN round(list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN bucketed c ON q.bucket = c.bucket AND c.vec_id <> q.qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_lsh",
    _ANN_LSH_ORACLE,
    "LSH-bucketed approximate top-5: sign-random-projection buckets, "
    "bucket-local candidate join (the 100 TB path)",
)
def ann_lsh(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_topk(emb, queries, k=5, num_planes=4, dim=64)


_NEARDUP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), b AS (
      SELECT vec_id, v, {_planes_sql(4, 64)} AS bucket FROM e
    ), pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)) > 0
                  THEN round(list_dot_product(a.v, c.v)
                       / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
                  ELSE 0.0 END AS score
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, score FROM pairs WHERE score >= 0.35
"""

@register(
    "embedding_neardup",
    _NEARDUP_ORACLE,
    "embedding-cosine near-duplicate pairs, LSH-bucket-restricted self-join "
    "(n^2 -> sum of per-bucket squares at scale)",
)
def embedding_neardup(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return cosine_neardup_pairs(emb, threshold=0.35, num_planes=4, dim=64)


_ANN_IVF_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), corpus_cell AS (
      SELECT vec_id AS neighbor_id, v AS cv, cid AS cell FROM ranked WHERE rnk = 1
    ), query_cells AS (
      SELECT vec_id AS query_id, v AS qv, cid AS cell
      FROM ranked WHERE vec_id < 8 AND rnk <= 2
    ), s AS (
      SELECT query_id, neighbor_id,
             CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                  THEN round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
                  ELSE 0.0 END AS score
      FROM query_cells q JOIN corpus_cell c USING (cell)
      WHERE neighbor_id <> query_id
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

_KMEANS_STEP_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), member AS (
      SELECT vec_id, v, cid AS cell FROM ranked WHERE rnk = 1
    ), counts AS (
      SELECT cell, cast(count(*) AS bigint) AS n_members FROM member GROUP BY cell
    ), dims AS (
      SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM member
    ), means AS (
      SELECT cell, cast(dim AS bigint) AS dim, round(avg(x), 6) AS mean_x
      FROM dims GROUP BY cell, dim
    )
    SELECT m.cell, m.dim, m.mean_x, c.n_members
    FROM means m JOIN counts c USING (cell)
"""

@register(
    "kmeans_step_embeddings",
    _KMEANS_STEP_ORACLE,
    "one distributed k-means (Lloyd) iteration: map-side nearest-centroid "
    "assignment (the IVF quantizer's training step) + dim-wise centroid "
    "recompute via posexplode + grouped avg — one shuffle keyed by "
    "(cell, dim), long-form output so the oracle compares scalars",
)
def kmeans_step_embeddings(spark, sf_dir):
    from .ops.similarity import kmeans_step

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return kmeans_step(emb, n_centroids=16)


@register(
    "ann_ivf",
    _ANN_IVF_ORACLE,
    "IVF-flat approximate top-5: 16-cell coarse quantizer shipped as "
    "literals (map-side assignment, no shuffle), nprobe=2 cell-local search",
)
def ann_ivf(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=2)


_PQ_ANN_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cb AS (
      SELECT vec_id AS j, v FROM e WHERE vec_id < 16
    ), subs AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ), cd AS (
      SELECT e.vec_id, subs.s, cb.j,
        round(list_dot_product(list_slice(e.v, subs.s*8+1, subs.s*8+8), list_slice(e.v, subs.s*8+1, subs.s*8+8))
            + list_dot_product(list_slice(cb.v, subs.s*8+1, subs.s*8+8), list_slice(cb.v, subs.s*8+1, subs.s*8+8))
            - 2*list_dot_product(list_slice(e.v, subs.s*8+1, subs.s*8+8), list_slice(cb.v, subs.s*8+1, subs.s*8+8)), 9) AS d
      FROM e, subs, cb
    ), codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn FROM cd
      ) t WHERE rn = 1
    ), code_list AS (
      SELECT vec_id, list(code ORDER BY s) AS cs FROM codes GROUP BY vec_id
    ), qlut1 AS (
      SELECT vec_id AS query_id, s, list(d ORDER BY j) AS lut_s
      FROM cd WHERE vec_id < 8 GROUP BY vec_id, s
    ), qlut AS (
      SELECT query_id, list(lut_s ORDER BY s) AS lut FROM qlut1 GROUP BY query_id
    ), adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, 9), i -> q.lut[i][c.cs[i] + 1])), 6) AS adist
      FROM qlut q, code_list c WHERE c.vec_id <> q.query_id
    ), r AS (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, adist, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_pq_adc",
    _PQ_ANN_ORACLE,
    "product-quantization ANN (8 subspaces x 16 codewords, asymmetric "
    "distance): corpus reduced to 8-byte codes, query LUT broadcast — the "
    "memory-compressed scan path for 100 TB embedding corpora",
)
def ann_pq_adc(spark, sf_dir):
    from .ops.similarity import pq_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return pq_topk(emb, queries, k=5, m=8, ksub=16)


def _ann_recall_oracle():
    """Compose the recall oracle from the four method oracles (each a full
    WITH..SELECT — DuckDB accepts CTEs inside subqueries)."""
    branches = []
    for method, osql in (
        ("ivf", _ANN_IVF_ORACLE),
        ("lsh", _ANN_LSH_ORACLE),
        ("pq", _PQ_ANN_ORACLE),
    ):
        branches.append(f"""
      SELECT '{method}' AS method, b.query_id,
             count(m.neighbor_id)::DOUBLE / 5 AS recall
      FROM brute b LEFT JOIN ({osql}) m
        ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
      GROUP BY b.query_id""")
    per = "\n      UNION ALL\n".join(branches)
    return f"""
    WITH brute AS (SELECT query_id, neighbor_id FROM ({_ANN_ORACLE}) tb),
    per AS ({per}
    )
    SELECT method, round(avg(recall), 6) AS avg_recall,
           round(min(recall), 6) AS min_recall,
           CAST(count(*) AS BIGINT) AS n_queries
    FROM per GROUP BY method
"""


@register(
    "ann_recall",
    _ann_recall_oracle(),
    "recall@5 of every approximate ANN method (LSH, IVF, PQ-ADC) against "
    "the exact brute-force top-5, per method avg/min over the query batch "
    "— the measure-don't-guess gauge for tuning nprobe/planes/codebooks; "
    "all four methods are deterministic so recall itself is oracle-exact. "
    "NB the synthetic corpus is ~uniform random vectors — the WORST case "
    "for sign-LSH and PQ (no cluster structure, near-tied scores): IVF "
    "still reaches ~0.9 here, LSH/PQ honestly report the floor",
)
def ann_recall(spark, sf_dir):
    from .ops.similarity import pq_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    brute = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    methods = {
        "ivf": ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=2),
        "lsh": lsh_topk(emb, queries, k=5, num_planes=4, dim=64),
        "pq": pq_topk(emb, queries, k=5, m=8, ksub=16),
    }
    parts = []
    for method, df in methods.items():
        m = df.select(
            F.col("query_id").alias("m_qid"),
            F.col("neighbor_id").alias("m_nid"),
            F.lit(1).alias("__hit"),
        )
        per = (
            brute.join(
                m,
                (F.col("query_id") == F.col("m_qid"))
                & (F.col("neighbor_id") == F.col("m_nid")),
                "left",
            )
            .groupBy("query_id")
            .agg((F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / 5.0).alias("recall"))
            .select(F.lit(method).alias("method"), "query_id", "recall")
        )
        parts.append(per)
    per_all = parts[0]
    for p in parts[1:]:
        per_all = per_all.unionByName(p)
    return per_all.groupBy("method").agg(
        F.round(F.avg("recall"), 6).alias("avg_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
    )


_SEMDEDUP_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), member AS (
      SELECT vec_id, v, cid AS cell FROM ranked WHERE rnk = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM member a JOIN member b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) > 0
                 THEN round(list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                 ELSE 0.0 END >= 0.4
    )
    SELECT m.vec_id, m.cell, (d.vec_id IS NULL) AS kept
    FROM member m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""

@register(
    "semdedup_embeddings",
    _SEMDEDUP_ORACLE,
    "SemDeDup (arXiv:2303.09540) semantic dedup: 16-cell coarse quantizer, "
    "cluster-local triangular cosine prune at 0.4 — pair space is "
    "sum-of-per-cell-squares, never n^2",
)
def semdedup_embeddings(spark, sf_dir):
    from .ops.similarity import semdedup

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return semdedup(emb, n_centroids=16, threshold=0.4)


# ===========================================================================
# as-of / interval joins (operators Spark lacks natively; ops/asof.py)
# ===========================================================================


@register(
    "asof_join_error_purchase",
    """
    SELECT err.event_id,
           err.user_id,
           date_trunc('second', err.ts) AS error_ts,
           p.event_id AS purchase_id,
           date_trunc('second', p.ts) AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') err
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON err.user_id = p.user_id AND p.ts <= err.ts
    """,
    "as-of join: for each error event, the user's most recent purchase at or "
    "before it (union-tag + last-ignorenulls window; DuckDB ASOF JOIN oracle)",
)
def asof_join_error_purchase(spark, sf_dir):
    from .ops.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    joined = asof_join(
        errors, purchases, key="user_id", left_ts="ts", right_ts="p_ts",
        right_cols=["purchase_id", "p_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("error_ts"),
        "purchase_id",
        F.date_trunc("second", F.col("p_ts")).alias("purchase_ts"),
    )


@register(
    "interval_join_events",
    """
    SELECT a.user_id,
           a.event_id AS id_a,
           b.event_id AS id_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT) <= 300
    """,
    "interval (range) join: event pairs within 5 min per user, time-bucketed "
    "equi-join under the hood (bounded fan-out at scale)",
)
def interval_join_events(spark, sf_dir):
    from .ops.asof import interval_join

    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    pairs = interval_join(
        events, events, key="user_id", left_ts="ts", right_ts="ts",
        bound_seconds=300,
    )
    return (
        pairs.filter(F.col("event_id") < F.col("event_id_r"))
        .select("user_id", F.col("event_id").alias("id_a"), F.col("event_id_r").alias("id_b"))
    )


# ===========================================================================
# rows-only entries (non-SQL-expressible: fixture-driven rule engine,
# multimodal Pandas-UDF plumbing) — driver records a weaker rows-only check
# ===========================================================================


@register(
    "sysmon_rules_alerts",
    None,
    "the 25 reference detection rules over generated sysmon fixtures "
    "(single-pass engine); fixture table is not part of the driver's views, "
    "so no SQL oracle — covered by the per-rule DuckDB oracle in tests/",
)
def sysmon_rules_alerts(spark, sf_dir):
    from .fixtures import generate_sysmon_rows
    from .rules.builtin import active_rules
    from .rules.engine import apply_rules_single_pass
    from .schemas import SYSMON_EVENT_SCHEMA

    rows = generate_sysmon_rows(2000, seed=42)
    events = spark.createDataFrame(
        [
            (
                r["computer_name"], r["event_id"], r["host"],
                tuple(r["event_data"].values()) if r["event_data"] else None,
                r["uuid"], r["timestamp"],
            )
            for r in rows
        ],
        SYSMON_EVENT_SCHEMA,
    )
    alerts = apply_rules_single_pass(events, active_rules())
    return alerts.select(
        F.col("rule.name").alias("rule_name"),
        F.col("event.origin_ids")[0].alias("uuid"),
        F.col("rule.severity").alias("severity"),
    )


@register(
    "sysmon_rules_correlated",
    None,
    "Sigma-v2-style temporal CORRELATION (the meta-rule surface the "
    "reference lacks entirely): entity matches 'Direct Syscall of "
    "NtOpenProcess' then 'CMSTP Execution Process Access' within 30 min "
    "— filtered alert streams, time-bucketed equi-join (never a "
    "cartesian), streaming twin is a watermarked stream-stream join "
    "(batch==stream pinned in tests/test_correlate.py along with a "
    "DuckDB differential oracle over the fixture; fixture table is not "
    "in the driver's views, so rows-only here)",
)
def sysmon_rules_correlated(spark, sf_dir):
    from .fixtures import write_sysmon_parquet
    from .rules.builtin import active_rules
    from .rules.correlate import correlate_alerts

    path = write_sysmon_parquet("/tmp/dagger_corr_sysmon_2000.parquet")
    events = spark.read.parquet(path)
    rules = sorted(active_rules(), key=lambda r: r.name)
    ra = next(r for r in rules if r.name == "Direct Syscall of NtOpenProcess")
    rb = next(r for r in rules if r.name == "CMSTP Execution Process Access")
    return correlate_alerts(events, ra, rb, window_s=1800)


def _media_fixture(spark, key: str, n_rows: int, build_df):
    """Materialize a deterministic media fixture ONCE per machine as
    parquet and read it back.  The media queries must time decode work
    against STORED blobs — the production shape: media arrives as binary
    columns in parquet files, not driver-side synthesis — and BENCH_r06's
    media numbers overstated query cost ~4x precisely because per-run
    fixture synthesis (encode_png/encode_avi loops + createDataFrame)
    was folded into every timed run.  Idempotent: an existing fixture is
    reused only when its row count matches (a stale or foreign file at
    the well-known path is rewritten, same discipline as
    write_zipf_docs_parquet); the write is atomic via directory rename."""
    import os
    import shutil

    path = f"/tmp/dagger_media_{key}_v1.parquet"
    ok = False
    if os.path.isdir(path):
        try:
            ok = spark.read.parquet(path).count() == n_rows
        except Exception:
            ok = False
    if not ok:
        tmp = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_df().coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return spark.read.parquet(path)


@register(
    "multimodal_meta",
    None,
    "multimodal binary columns: fake image blobs -> mapInPandas header "
    "parse (decode stub) -> metadata filter; Pandas-UDF plumbing is real",
)
def multimodal_meta(spark, sf_dir):
    from .ops.multimodal import extract_image_meta, fake_media_df

    media = _media_fixture(
        spark, "image64", 64, lambda: fake_media_df(spark, 64)
    )
    meta = extract_image_meta(media)
    return meta.filter(F.col("valid")).select("media_id", "width", "height", "channels")


@register(
    "multimodal_features",
    None,
    "multimodal feature extraction: byte-histogram embedding per blob via "
    "mapInPandas (the stage a real pipeline backs with CLIP/audio models)",
)
def multimodal_features(spark, sf_dir):
    from .ops.multimodal import extract_features, fake_media_df

    media = _media_fixture(
        spark, "image64", 64, lambda: fake_media_df(spark, 64)
    )
    feats = extract_features(media, bins=16)
    return feats.filter(F.col("valid")).select(
        "media_id", F.round(F.element_at("features", 1), 6).alias("f0"),
        F.size("features").alias("dim"),
    )


@register(
    "multimodal_pixels",
    None,  # a pixel decoder has no SQL twin; rows-only (deterministic crc)
    "REAL pixel decode with zero installed codecs: deterministic PNGs "
    "(encode_png, stdlib zlib+struct) stream through mapInPandas and "
    "decode_image_pixels inflates + defilters them back to raw pixel "
    "buffers on the workers — Pillow used instead when present, identical "
    "schema.  Output pins width/height/channels and a crc32 of the pixel "
    "bytes so the decode is value-checked, not just shape-checked",
)
def multimodal_pixels(spark, sf_dir):
    from .ops.multimodal import MEDIA_SCHEMA, decode_image_pixels, encode_png

    def build():
        rows = []
        for i in range(32):
            w, h = 8 + i % 5, 6 + i % 3
            px = bytes((i * 37 + j) % 256 for j in range(w * h * 3))
            blob = encode_png(w, h, 3, px, filter_type=i % 5)
            rows.append((i, "image/png", bytearray(blob), ("png", len(blob))))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    df = _media_fixture(spark, "png32", 32, build)
    return decode_image_pixels(df).select(
        "media_id", "width", "height", "channels",
        F.crc32(F.col("pixels")).alias("pixel_crc"), "valid",
    )


@register(
    "multimodal_audio",
    None,  # an audio decoder has no SQL twin; rows-only (deterministic crc)
    "REAL audio decode with zero installed audio libraries: deterministic "
    "PCM16 WAV blobs (all-integer triangle-wave synthesis, one corrupted "
    "per 16) stream through mapInPandas where the stdlib RIFF parser "
    "(ops/audio.py) decodes samples on the workers and emits gate "
    "features — duration, RMS, peak, zero-crossing count — plus a crc32 "
    "of the raw sample bytes so the decode is value-checked; truncated "
    "blobs keep their row with valid=false.  The audio twin of "
    "multimodal_pixels: blobs never leave the executors, only fixed-width "
    "feature rows shuffle",
)
def multimodal_audio(spark, sf_dir):
    from .ops.audio import extract_audio_features, fake_audio_df

    audio = _media_fixture(
        spark, "audio48", 48, lambda: fake_audio_df(spark, 48)
    )
    return extract_audio_features(audio)


@register(
    "multimodal_frames",
    None,  # container parsing has no SQL twin; rows-only (crc value-check)
    "REAL video-container frame sampling with zero installed libraries: "
    "deterministic AVI blobs (stdlib RIFF writer, one truncated per 16) "
    "parse on the workers — chunk walk, avih header, declared-vs-actual "
    "frame-count integrity — and every 4th frame emits a row with its "
    "payload crc32.  The honest boundary is documented: frame PAYLOAD "
    "decode needs a codec library, so payloads stay opaque; the sampled "
    "rows are exactly what decode_image_pixels consumes next.  At scale "
    "only 1/N of payload bytes survive the scan",
)
def multimodal_frames(spark, sf_dir):
    from .ops.video import fake_video_df, sample_video_frames

    video = _media_fixture(
        spark, "avi32", 32, lambda: fake_video_df(spark, 32)
    )
    return sample_video_frames(video, every_n=4)


@register(
    "multimodal_video_pixels",
    None,  # two-codec composition; rows-only (pixel crc value-check)
    "the FULL multimodal chain as one DAG: AVI containers whose frames "
    "are real PNGs stream through sample_video_frames (stdlib RIFF "
    "parse, every 2nd frame) into decode_image_pixels (stdlib PNG "
    "inflate+defilter) — container -> frame -> pixels, all real compute "
    "with zero installed libraries, pixel crc32 value-checking the whole "
    "chain.  The production shape: video fans out to sampled frames "
    "which feed the image tower; each stage is the already-tested "
    "operator, composed",
)
def multimodal_video_pixels(spark, sf_dir):
    from .ops.multimodal import MEDIA_SCHEMA, decode_image_pixels, encode_png
    from .ops.video import encode_avi, sample_video_frames

    def build():
        rows = []
        for i in range(12):
            w, h = 6 + i % 3, 4 + i % 2
            frames = [
                encode_png(
                    w, h, 3,
                    bytes(
                        (i * 37 + f * 11 + j) % 256
                        for j in range(w * h * 3)
                    ),
                    filter_type=(i + f) % 5,
                )
                for f in range(4 + i % 3)
            ]
            blob = encode_avi(frames, w, h, fps=10)
            rows.append((i, "video/avi", bytearray(blob), ("avi", len(blob))))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    media = _media_fixture(spark, "avipng12", 12, build)
    sampled = sample_video_frames(media, every_n=2, payloads=True).filter(
        F.col("valid")
    )
    frames_media = sampled.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image/png").alias("media_type"),
        F.col("frame_data").alias("content"),
        F.struct(
            F.lit("frame").alias("source"),
            F.col("frame_bytes").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    px = decode_image_pixels(frames_media)
    return px.select(
        "media_id", "width", "height", "channels",
        F.crc32(F.col("pixels")).alias("pixel_crc"), "valid",
    )


@register(
    "skew_resistant_agg",
    """
    SELECT event_type,
           round(sum(value), 4) AS total_value,
           count(*) AS n_events,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    """,
    "salted two-phase aggregation (ops/skew.py): results are salt-invariant, "
    "so the oracle is the plain GROUP BY it must equal",
)
def skew_resistant_agg(spark, sf_dir):
    from .ops.skew import two_phase_agg

    ev = load_table(spark, sf_dir, "events")
    out = two_phase_agg(
        ev, ["event_type"],
        # n_events counts ROWS ("*"), not non-null values — count(value)
        # silently diverges from the count(*) oracle once NULLs appear
        # (caught by the fuzzed NULL-value events)
        {"total_value": ("value", "sum"), "n_events": ("*", "count"),
         "min_value": ("value", "min"), "max_value": ("value", "max")},
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.round("total_value", 4).alias("total_value"),
        F.col("n_events"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


# ===========================================================================
# Training-data hygiene (ops/quality.py): Gopher gates, repetition, PII,
# chunking, benchmark decontamination
# ===========================================================================

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

@register(
    "gopher_quality_docs",
    f"""
    WITH base AS (
      SELECT doc_id, coalesce(text, '') AS txt, {_DUCK_TOKS} AS t,
             list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                        x -> trim(x)), x -> x <> '') AS ls
      FROM documents
    ), raw AS (
      SELECT doc_id,
             len(t) AS n_words,
             coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS sum_len,
             len(regexp_extract_all(txt, '#'))
               + len(regexp_extract_all(txt, '\\.\\.\\.'))
               + len(regexp_extract_all(txt, '…')) AS n_symbols,
             len(ls) AS n_lines,
             len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*')
                                      OR starts_with(x, '•'))) AS n_bullet,
             len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS n_ellipsis,
             len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
             len(list_filter(t, x -> lower(x) IN ({_GOPHER_STOP_SQL}))) AS n_stop_hits
      FROM base
    ), ratios AS (
      SELECT doc_id, n_words, n_lines, n_stop_hits,
             CASE WHEN n_words > 0 THEN sum_len::DOUBLE / n_words ELSE 0 END AS mean_len,
             CASE WHEN n_words > 0 THEN n_symbols::DOUBLE / n_words ELSE 0 END AS symbol_r,
             CASE WHEN n_lines > 0 THEN n_bullet::DOUBLE / n_lines ELSE 0 END AS bullet_r,
             CASE WHEN n_lines > 0 THEN n_ellipsis::DOUBLE / n_lines ELSE 0 END AS ellipsis_r,
             CASE WHEN n_words > 0 THEN n_alpha_words::DOUBLE / n_words ELSE 0 END AS alpha_r
      FROM raw
    )
    SELECT doc_id, n_words, n_lines, n_stop_hits,
           round(mean_len + 1e-9, 6) AS mean_word_len,
           round(symbol_r + 1e-9, 6) AS symbol_word_ratio,
           round(bullet_r + 1e-9, 6) AS bullet_line_ratio,
           round(ellipsis_r + 1e-9, 6) AS ellipsis_line_ratio,
           round(alpha_r + 1e-9, 6) AS alpha_word_ratio,
           (n_words BETWEEN 50 AND 100000
            AND mean_len BETWEEN 3.0 AND 10.0
            AND symbol_r <= 0.1 AND bullet_r <= 0.9 AND ellipsis_r <= 0.3
            AND alpha_r >= 0.8 AND n_stop_hits >= 2) AS passes
    FROM ratios
    """,
    "Gopher appendix-A quality gates (Rae et al. 2021): word/line stats, "
    "symbol/bullet/ellipsis ratios, stopword presence, composite pass flag",
)
def gopher_quality_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    s = gopher_stats(F.col("text"))
    # flags evaluate the UNROUNDED ratios (same expression both engines);
    # rounded copies are for the hash compare only (+1e-9 parks dyadic
    # boundary values off the .xxxxxx5 tie, same convention as text_stats)
    return docs.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["n_lines"].alias("n_lines"),
        s["n_stop_hits"].alias("n_stop_hits"),
        F.round(s["mean_word_len"] + F.lit(1e-9), 6).alias("mean_word_len"),
        F.round(s["symbol_word_ratio"] + F.lit(1e-9), 6).alias("symbol_word_ratio"),
        F.round(s["bullet_line_ratio"] + F.lit(1e-9), 6).alias("bullet_line_ratio"),
        F.round(s["ellipsis_line_ratio"] + F.lit(1e-9), 6).alias("ellipsis_line_ratio"),
        F.round(s["alpha_word_ratio"] + F.lit(1e-9), 6).alias("alpha_word_ratio"),
        gopher_pass(s).alias("passes"),
    )


@register(
    "repetition_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, len(t) AS n_words,
             CASE WHEN len(t) >= 2
                  THEN [array_to_string(list_slice(t, i, i + 1), ' ')
                        FOR i IN range(1, len(t))]
                  ELSE []::VARCHAR[] END AS g2,
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(list_slice(t, i, i + 2), ' ')
                        FOR i IN range(1, len(t) - 1)]
                  ELSE []::VARCHAR[] END AS g3
      FROM toks
    )
    SELECT doc_id, n_words,
           round(CASE WHEN len(g2) > 0
                      THEN (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
                      ELSE 0 END + 1e-9, 6) AS dup_frac_2gram,
           round(CASE WHEN len(g3) > 0
                      THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3)
                      ELSE 0 END + 1e-9, 6) AS dup_frac_3gram
    FROM grams
    """,
    "C4/Gopher intra-doc repetition: fraction of duplicate 2-/3-gram "
    "occurrences; linear in doc length (no pairwise work)",
)
def repetition_docs(spark, sf_dir):
    from .ops.quality import repetition_stats_from_tokens

    docs = _load_wide(spark, sf_dir, "documents")
    # tokenize ONCE into a real column: word_ngrams slices its input inside
    # a transform lambda, and outer non-attribute expressions are
    # re-evaluated per element — inline tokens(text) here costs O(n_tokens)
    # regex splits per row (25 s -> ~2 s at sf0.1)
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    )
    r = repetition_stats_from_tokens(F.col("__toks"))
    return staged.select(
        "doc_id",
        F.size(F.col("__toks")).cast("long").alias("n_words"),
        F.round(r["dup_frac_2gram"] + F.lit(1e-9), 6).alias("dup_frac_2gram"),
        F.round(r["dup_frac_3gram"] + F.lit(1e-9), 6).alias("dup_frac_3gram"),
    )


def _pii_aug_spark():
    """Deterministic PII augmentation: the synthetic corpus carries no PII,
    so the catalog query plants doc_id-derived emails/IPs/phones on a subset
    — the cross-engine hash then pins Java-regex vs RE2 parity on real
    matches, not on a table of zeros.  The SQL twin mirrors this exactly."""
    d = F.col("doc_id")
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when((d % 3) == 0,
               F.concat(F.lit(" reach user"), d.cast("string"),
                        F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when((d % 5) == 0,
               F.concat(F.lit(" from host 10."), (d % 200).cast("string"),
                        F.lit(".0.7 logged"))).otherwise(F.lit("")),
        F.when((d % 7) == 0,
               F.concat(F.lit(" call +1415555"),
                        ((d % 9000) + 1000).cast("string"))).otherwise(F.lit("")),
    )


_PII_AUG_SQL = (
    "coalesce(text, '')"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' from host 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.7 logged' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call +1415555' || CAST(doc_id % 9000 + 1000 AS VARCHAR)"
    " ELSE '' END"
)

_PII_PAT = dict(PII_PATTERNS)

@register(
    "pii_scan_docs",
    f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS txt FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(txt, '{_PII_PAT["email"]}')) AS n_email,
           len(regexp_extract_all(txt, '{_PII_PAT["ipv4"]}')) AS n_ipv4,
           len(regexp_extract_all(txt, '{_PII_PAT["phone"]}')) AS n_phone,
           (len(regexp_extract_all(txt, '{_PII_PAT["email"]}'))
            + len(regexp_extract_all(txt, '{_PII_PAT["ipv4"]}'))
            + len(regexp_extract_all(txt, '{_PII_PAT["phone"]}'))) > 0 AS has_pii,
           md5(regexp_replace(regexp_replace(regexp_replace(txt,
               '{_PII_PAT["email"]}', '<EMAIL>', 'g'),
               '{_PII_PAT["ipv4"]}', '<IPV4>', 'g'),
               '{_PII_PAT["phone"]}', '<PHONE>', 'g')) AS redacted_hash
    FROM aug
    """,
    "PII scan + redaction over doc_id-salted text: per-kind match counts "
    "and the md5 of the globally-redacted text (regex parity across engines)",
)
def pii_scan_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    aug = _pii_aug_spark()
    c = pii_counts(aug)
    return docs.select(
        "doc_id",
        c["email"].alias("n_email"),
        c["ipv4"].alias("n_ipv4"),
        c["phone"].alias("n_phone"),
        ((c["email"] + c["ipv4"] + c["phone"]) > 0).alias("has_pii"),
        F.md5(redact_pii(aug)).alias("redacted_hash"),
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 16, 12

@register(
    "chunk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_CHUNK_STRIDE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, ((s - 1) // {_CHUNK_STRIDE}) + 1 AS chunk_idx,
             s AS chunk_start, list_slice(t, s, s + {_CHUNK_SIZE} - 1) AS c
      FROM starts
    )
    SELECT doc_id, chunk_idx, chunk_start,
           len(c) AS n_chunk_tokens,
           md5(array_to_string(c, ' ')) AS chunk_hash
    FROM chunks
    WHERE len(c) > 0
    """,
    f"RAG-style token-window chunking: size {_CHUNK_SIZE}, stride "
    f"{_CHUNK_STRIDE} (overlapping); explode-only, no shuffle",
)
def chunk_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_CHUNK_STRIDE))
    ex = df.select("doc_id", "t", F.posexplode(starts).alias("pos", "s"))
    chunk = F.slice(F.col("t"), F.col("s"), _CHUNK_SIZE)
    return (
        ex.select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("chunk_idx"),
            F.col("s").cast("long").alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .filter(F.col("n_chunk_tokens") > 0)
    )


_DECON_K, _DECON_MOD = 5, 17

@register(
    "decontam_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {_DECON_K}
                  THEN list_distinct([md5(array_to_string(
                           list_slice(t, i, i + {_DECON_K} - 1), ' '))
                       FOR i IN range(1, len(t) - {_DECON_K} + 2)])
                  ELSE []::VARCHAR[] END AS gs
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ), bench AS (
      SELECT DISTINCT g FROM ex WHERE doc_id % {_DECON_MOD} = 0
    ), train AS (
      SELECT doc_id, g FROM ex WHERE doc_id % {_DECON_MOD} <> 0
    ), hits AS (
      SELECT train.doc_id, count(*) AS n_overlap
      FROM train JOIN bench USING (g) GROUP BY train.doc_id
    ), sizes AS (
      SELECT doc_id, len(gs) AS n_grams FROM grams
    )
    SELECT hits.doc_id, n_overlap, n_grams,
           round(n_overlap::DOUBLE / n_grams + 1e-9, 6) AS contamination
    FROM hits JOIN sizes ON hits.doc_id = sizes.doc_id
    """,
    f"benchmark decontamination: {_DECON_K}-gram shingle overlap of the "
    f"corpus against a broadcast eval set (doc_id % {_DECON_MOD} = 0); "
    "the contaminated docs and their overlap counts",
)
def decontam_docs(spark, sf_dir):
    """Eval-set n-gram decontamination (the GPT-3/Gopher procedure): shingle
    both sides, hash, and report corpus docs sharing any shingle with the
    benchmark.  Scale shape: the benchmark shingle set is tiny relative to
    the corpus, so it is BROADCAST — the corpus side never shuffles; the
    only shuffle is the per-doc overlap count (one hash aggregate)."""
    docs = _load_wide(spark, sf_dir, "documents")
    # staged token column: see repetition_docs — word_ngrams over an inline
    # tokens(text) re-runs the split per n-gram inside the transform lambda
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    grams = F.array_distinct(
        F.transform(word_ngrams(F.col("__toks"), _DECON_K), lambda g: F.md5(g)))
    ex = staged.select("doc_id", F.explode(grams).alias("g"))
    bench = ex.filter((F.col("doc_id") % _DECON_MOD) == 0).select("g").distinct()
    train = ex.filter((F.col("doc_id") % _DECON_MOD) != 0)
    # both sides are per-doc-distinct, so plain count == distinct count
    hits = (train.join(F.broadcast(bench), "g")
                 .groupBy("doc_id").agg(F.count("g").alias("n_overlap")))
    sizes = staged.select("doc_id", F.size(grams).alias("n_grams"))
    return hits.join(sizes, "doc_id").select(
        "doc_id", "n_overlap",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round(F.col("n_overlap") / F.col("n_grams") + F.lit(1e-9), 6)
         .alias("contamination"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: the engine's identity query — multi-rule detection
    fan-in over the events table."""
    return events_rules_engine(spark, sf_dir)


_CDD_SIZE = 20  # chunk-dedup: non-overlapping 20-token chunks


@register(
    "chunk_dedup_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_CDD_SIZE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, s,
             md5(array_to_string(list_slice(t, s, s + {_CDD_SIZE} - 1), ' ')) AS h,
             len(list_slice(t, s, s + {_CDD_SIZE} - 1)) AS n
      FROM starts WHERE len(list_slice(t, s, s + {_CDD_SIZE} - 1)) > 0
    ), ranked AS (
      SELECT doc_id, s, n,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS occ
      FROM chunks
    )
    SELECT doc_id,
           cast(count(*) AS bigint)                          AS n_chunks,
           cast(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS bigint)
                                                             AS n_kept,
           cast(sum(CASE WHEN occ = 1 THEN n ELSE 0 END) AS bigint)
                                                             AS kept_tokens,
           round(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)                              AS kept_frac
    FROM ranked GROUP BY doc_id
    """,
    "CCNet/Lee-et-al-style chunk-level exact dedup (this corpus has no "
    "newlines, so 'paragraph' = non-overlapping 20-token chunk): hash "
    "every chunk, keep only each hash's GLOBAL first occurrence "
    "(deterministic (doc_id, start) order), report per-doc survival.  "
    "Scale shape: explode + one hash-keyed window + one per-doc rollup — "
    "the dedup decision never materializes text, only 16-byte hashes",
)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_CDD_SIZE))
    chunk = F.slice(F.col("t"), F.col("s"), _CDD_SIZE)
    ex = (
        df.select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id", "s",
            F.md5(F.array_join(chunk, " ")).alias("h"),
            F.size(chunk).alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    occ = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "s"))
    ranked = ex.withColumn("occ", occ)
    kept = F.when(F.col("occ") == 1, 1).otherwise(0)
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("occ") == 1, F.col("n")).otherwise(0))
         .cast("long").alias("kept_tokens"),
        F.round(F.sum(kept).cast("double") / F.count(F.lit(1)), 6)
         .alias("kept_frac"),
    )


_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-doc BM25 score (k1/b constants above) for the fixed
    ``_BM25_TERMS`` query — the shared scoring stage of bm25_topk_docs
    (top-20 cut) and hybrid_rrf_docs (corpus-wide rank): tf via a filter
    lambda over the token array, df/avgdl as 1-row broadcast aggregates;
    only matching (doc, term, tf) triples reach the scoring aggregate."""
    lens = (
        docs.select("doc_id", tokens(F.col("text")).alias("t"))
        .withColumn("dl", F.size("t"))
        .filter(F.col("dl") > 0)
    )
    stats = lens.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n")
    )
    q = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    tf = lens.crossJoin(F.broadcast(q)).select(
        "doc_id", "dl", "term",
        F.size(F.filter("t", lambda x: x == F.col("term"))).alias("f"),
    )
    dfreq = tf.groupBy("term").agg(
        F.sum(F.when(F.col("f") > 0, 1).otherwise(0)).alias("nd")
    )
    idf = F.log(
        (F.col("n") - F.col("nd") + 0.5) / (F.col("nd") + 0.5) + 1.0
    )
    contrib = idf * (F.col("f") * (_BM25_K1 + 1.0)) / (
        F.col("f")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.filter(F.col("f") > 0)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )


@register(
    "bm25_topk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n FROM lens
    ), q AS (SELECT unnest(['spark', 'hash', 'window']) AS term),
    tf AS (
      SELECT l.doc_id, l.dl, q.term,
             len(list_filter(l.t, x -> x = q.term)) AS f
      FROM lens l CROSS JOIN q
    ), df AS (
      SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS nd
      FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             sum(
               ln((s.n - df.nd + 0.5) / (df.nd + 0.5) + 1.0)
               * (tf.f * ({_BM25_K1} + 1.0))
               / (tf.f + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * tf.dl / s.avgdl))
             ) AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats s
      WHERE tf.f > 0
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    "BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed term set: tf via "
    "a filter lambda over the token array, df/avgdl as 1-row broadcast "
    "aggregates — the corpus is scanned once and never shuffled on "
    "content; only (doc, term, tf) triples for MATCHING docs reach the "
    "scoring aggregation.  Deterministic top-20 with doc_id tiebreak",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return (
        _bm25_scores(spark, docs)
        .withColumnRenamed("score", "bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@register(
    "dedup_canonical_docs",
    _DUCK_MINHASH_CTE.replace("WITH toks", "WITH RECURSIVE toks") + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), clusters AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster,
             length(coalesce(d.text, '')) AS nlen
      FROM documents d
      LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
        ON d.doc_id = m.a
    ), ranked AS (
      SELECT doc_id, cluster, nlen,
             row_number() OVER (
               PARTITION BY cluster ORDER BY nlen DESC, doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY cluster) AS csize
      FROM clusters
    )
    SELECT cast(doc_id AS bigint) AS doc_id,
           cast(cluster AS bigint) AS cluster,
           cast(csize AS bigint) AS cluster_size,
           (rk = 1) AS keep
    FROM ranked
    """,
    "dedup END-TO-END: near-dup clusters (LSH graph -> connected "
    "components) -> one CANONICAL survivor per cluster (longest text, "
    "doc_id tiebreak — the keep-best policy of production dedup, vs "
    "keep-arbitrary) -> per-doc keep/drop verdict with cluster size.  "
    "The canonical choice is one window over the cluster assignment; "
    "oracle replays the whole chain via recursive-CTE closure",
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .ops.dedup import dedup_clusters

    docs = _load_wide(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    # both sides are corpus-sized (one row per doc) so broadcast is wrong at
    # scale; shuffle-hash keeps the doc_id-keyed join sort-free
    sized = clusters.join(
        docs.select(
            "doc_id", F.length(F.coalesce(F.col("text"), F.lit(""))).alias("nlen")
        ).hint("shuffle_hash"),
        "doc_id",
    )
    w = Window.partitionBy("cluster").orderBy(F.col("nlen").desc(), "doc_id")
    return sized.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.count(F.lit(1)).over(Window.partitionBy("cluster"))
         .cast("long").alias("cluster_size"),
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "weighted_sample_docs",
    """
    WITH w AS (
      SELECT doc_id, source, n_chars,
             ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % 1000000) + 1) / 1000000.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, cast(n_chars AS bigint) AS n_chars,
           round(pow(u, 1.0 / n_chars), 6) AS es_key
    FROM w
    -- rank by the ROUNDED key: JVM Math.pow and libm pow may differ by
    -- 1 ulp, and an unrounded ORDER BY would let that flip the rank-50
    -- cutoff between engines (same discipline as pq_topk's in-plan norms)
    ORDER BY round(pow(u, 1.0 / n_chars), 6) DESC, doc_id
    LIMIT 50
    """,
    "weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "key = u^(1/w) with w = char count and u a DETERMINISTIC md5-derived "
    "uniform, top-k by key — the distributed one-pass weighted reservoir "
    "(any executor can compute keys locally; only the top-k heap "
    "merges).  Deterministic u makes the sample reproducible across "
    "engines/runs/partitionings, same policy as docs_hash_sample",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 1000000
            + 1
        )
        / 1000000.0
    )
    key = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    return (
        docs.select(
            "doc_id", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
    )


@register(
    "heavy_hitters_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), exact AS (
      SELECT tok, count(*) AS freq FROM toks GROUP BY tok
      ORDER BY freq DESC, tok LIMIT 20
    ), sample_counts AS (
      SELECT tok, count(*) AS sfreq FROM toks
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
      GROUP BY tok
    ), cand AS (
      SELECT tok FROM sample_counts ORDER BY sfreq DESC, tok LIMIT 40
    )
    SELECT e.tok, cast(e.freq AS bigint) AS freq,
           (c.tok IS NOT NULL) AS found_by_sample
    FROM exact e LEFT JOIN cand c ON e.tok = c.tok
    ORDER BY e.freq DESC, e.tok
    """,
    "heavy hitters with the two-pass scale pattern instrumented: pass 1 "
    "counts a 20% hash-sample and keeps 2k candidates (at 100 TB this is "
    "the only full-vocabulary aggregation, over 1/5 the data); pass 2 is "
    "the exact top-20 with a flag showing the sample pass found it — on "
    "any heavy-tailed corpus the flag is all-true, making the "
    "sample-then-verify shortcut's safety measurable, not assumed",
)
def heavy_hitters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    exact = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok").limit(20)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    cand = (
        toks.filter(bucket < 20)
        .groupBy("tok").agg(F.count(F.lit(1)).alias("sfreq"))
        .orderBy(F.col("sfreq").desc(), "tok").limit(40)
        .select("tok", F.lit(True).alias("__hit"))
    )
    return (
        exact.join(F.broadcast(cand), "tok", "left")
        .select(
            "tok", F.col("freq").cast("long").alias("freq"),
            F.coalesce(F.col("__hit"), F.lit(False)).alias("found_by_sample"),
        )
        .orderBy(F.col("freq").desc(), "tok")
    )


@register(
    "token_entropy_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
    ), withn AS (
      SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM tf
    )
    SELECT doc_id,
           cast(min(n) AS bigint) AS n_tokens,
           cast(count(*) AS bigint) AS n_types,
           round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)) + 0.0, 6)
             AS entropy,
           round(count(*)::DOUBLE / min(n), 6) AS ttr
    FROM withn GROUP BY doc_id
    """,
    "per-document token-distribution entropy (-sum p ln p) + type-token "
    "ratio: the information-density quality signal (low entropy = "
    "repetitive/templated text, the same family as the Gopher repetition "
    "gates but distribution-level).  One (doc, token) aggregate, then a "
    "doc-keyed window + rollup — the window rides the same hash "
    "partitioning as the aggregate, so one real shuffle",
)
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    withn = tf.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    p = F.col("c").cast("double") / F.col("n")
    return withn.groupBy("doc_id").agg(
        F.min("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        # + 0.0 canonicalizes IEEE negative zero: a single-type doc is
        # -(1*ln 1) = -0.0 under one engine's fold and +0.0 under the
        # other's; -0.0 + 0.0 = +0.0 in both (fuzz-corpus catch)
        F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("entropy"),
        F.round(F.count(F.lit(1)).cast("double") / F.min("n"), 6).alias("ttr"),
    )


_PACK_L, _PACK_SHARDS = 2048, 8  # block length in CHARS (no token column)


@register(
    "pack_sequences_docs",
    f"""
    WITH d AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard, n_chars
      FROM documents WHERE n_chars > 0
    ), cum AS (
      SELECT doc_id, shard, n_chars,
             sum(n_chars) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum_end
      FROM d
    ), placed AS (
      SELECT shard, doc_id, n_chars,
             (cum_end - n_chars) // {_PACK_L} AS seq_first,
             (cum_end - 1) // {_PACK_L} AS seq_last
      FROM cum
    )
    SELECT shard, cast(seq_first AS bigint) AS seq_id,
           cast(count(*) AS bigint) AS n_docs_starting,
           cast(sum(n_chars) AS bigint) AS chars_started,
           cast(sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END)
                AS bigint) AS n_docs_spilling
    FROM placed
    GROUP BY shard, seq_first
    ORDER BY shard, seq_id
    """,
    f"training-sequence packing (concat-and-chop, GPT style): docs "
    f"concatenate in doc_id order and chop into {_PACK_L}-char blocks "
    f"(chars stand in for tokens; the table has no token count); "
    f"each doc's start/end block comes from a running-sum window.  "
    f"Packing is PER-SHARD (doc_id % {_PACK_SHARDS}) because a single "
    f"global running sum is inherently sequential — shards pack "
    f"independently and in parallel at any scale, the standard "
    f"data-parallel packing layout.  Output: per block, docs starting "
    f"in it, their token mass, and how many spill into the next block",
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    d = docs.select(
        "doc_id", (F.col("doc_id") % _PACK_SHARDS).alias("shard"), "n_chars"
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.withColumn("cum_end", F.sum("n_chars").over(w)).select(
        "shard", "doc_id", "n_chars",
        F.floor((F.col("cum_end") - F.col("n_chars")) / _PACK_L).alias("seq_first"),
        F.floor((F.col("cum_end") - 1) / _PACK_L).alias("seq_last"),
    )
    return (
        placed.groupBy("shard", "seq_first")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_starting"),
            F.sum("n_chars").cast("long").alias("chars_started"),
            F.sum(
                F.when(F.col("seq_last") > F.col("seq_first"), 1).otherwise(0)
            ).cast("long").alias("n_docs_spilling"),
        )
        .select(
            "shard", F.col("seq_first").cast("long").alias("seq_id"),
            "n_docs_starting", "chars_started", "n_docs_spilling",
        )
        .orderBy("shard", "seq_id")
    )


@register(
    "incremental_dedup_docs",
    _duck_lsh_cte(3, 8, 2) + """
    , nb AS (SELECT * FROM buckets WHERE doc_id % 10 = 0),
    ob AS (SELECT * FROM buckets WHERE doc_id % 10 <> 0),
    cand AS (
      SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
      FROM nb JOIN ob ON nb.b = ob.b AND nb.bucket = ob.bucket
    ), ver AS (
      SELECT c.new_id, c.old_id,
             round(len(list_intersect(a.hs, b.hs))::DOUBLE
                   / (len(a.hs) + len(b.hs)
                      - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
      FROM cand c
      JOIN hsh a ON c.new_id = a.doc_id
      JOIN hsh b ON c.old_id = b.doc_id
    ), best AS (
      SELECT new_id, old_id, jaccard,
             row_number() OVER (
               PARTITION BY new_id ORDER BY jaccard DESC, old_id
             ) AS rk
      FROM ver WHERE jaccard >= 0.2
    )
    SELECT d.doc_id AS id,
           (b.new_id IS NOT NULL) AS is_dup,
           b.old_id AS match_id,
           b.jaccard
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.new_id
    WHERE d.doc_id % 10 = 0
    """,
    "incremental ingest dedup — an INCOMING batch (doc_id % 10 = 0, ~10%) "
    "checked against the EXISTING corpus without any corpus self-join: "
    "the batch's LSH bucket table broadcasts, the corpus bucket stream "
    "filters map-side with zero corpus shuffle, and only colliding "
    "(new, old) candidates reach the Jaccard verify; per new doc the best "
    "match (highest jaccard, old-id tiebreak) or a clean is_dup=false.  "
    "The production shape self-join dedup cannot express: daily ingest "
    "cost scales with the batch, not the corpus",
)
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import incremental_dedup

    sigs = _dedup_stage(spark, sf_dir)
    new_sigs = sigs.filter((F.col("id") % 10) == 0)
    corpus_sigs = sigs.filter((F.col("id") % 10) != 0)
    return incremental_dedup(
        new_sigs, corpus_sigs, threshold=0.2, bands=8, num_hashes=16
    )


_ZIPF_DOCS_PATH = "/tmp/dagger_zipf_docs_v1.parquet"  # seed-pinned fixture


@register(
    "jaccard_zipf_join",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM read_parquet('{_ZIPF_DOCS_PATH}')
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.t, b.t)) AS nint,
             len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS nuni
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(nint::DOUBLE / nuni, 6) AS jaccard
    FROM p WHERE 10 * nint >= 9 * nuni
    """,
    "exact Jaccard self-join with the prefix filter PRUNING on-camera: a "
    "seed-pinned Zipfian corpus (1200 docs, log-uniform vocab, 40 planted "
    ">=0.9 copies — the realistic head/tail shape, unlike the driver "
    "documents table whose ~200-token shared vocab makes the qualifying "
    "output itself quadratic) runs UNCAPPED; the oracle brute-forces all "
    "~719k pairs so the hash gate proves the pruned plan loses nothing. "
    "Candidate count vs n(n-1)/2 is asserted in tests/test_zipf_jaccard.py "
    "(~0.1%: rarest-first prefixes almost never collide across unrelated "
    "docs)",
)
def jaccard_zipf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .fixtures import write_zipf_docs_parquet
    from .ops.dedup import jaccard_prefix_join

    write_zipf_docs_parquet(_ZIPF_DOCS_PATH)
    docs = spark.read.parquet(_ZIPF_DOCS_PATH)
    return jaccard_prefix_join(docs)


def _pipeline_verdict_oracle() -> str:
    """Compose the verdict oracle from the three component oracles (each a
    full WITH..SELECT — DuckDB accepts CTEs, including RECURSIVE ones,
    inside subqueries; same technique as the ann_recall oracle)."""
    q = QUERIES["gopher_quality_docs"].oracle
    c = QUERIES["dedup_canonical_docs"].oracle
    d = QUERIES["decontam_docs"].oracle
    return f"""
    SELECT b.doc_id,
           coalesce(q.passes, FALSE) AS passes_quality,
           coalesce(c.keep, FALSE) AS is_canonical,
           coalesce(d.contamination >= 0.05, FALSE) AS is_contaminated,
           (b.doc_id % {_DECON_MOD} = 0) AS is_benchmark,
           (coalesce(q.passes, FALSE) AND coalesce(c.keep, FALSE)
            AND NOT coalesce(d.contamination >= 0.05, FALSE)
            AND b.doc_id % {_DECON_MOD} <> 0) AS keep
    FROM documents b
    LEFT JOIN ({q}) q ON b.doc_id = q.doc_id
    LEFT JOIN ({c}) c ON b.doc_id = c.doc_id
    LEFT JOIN ({d}) d ON b.doc_id = d.doc_id
    """


def pipeline_verdict_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _load_wide(spark, sf_dir, "documents").select("doc_id")
    q = QUERIES["gopher_quality_docs"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes")
    )
    c = QUERIES["dedup_canonical_docs"].fn(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("__can")
    )
    d = QUERIES["decontam_docs"].fn(spark, sf_dir).select(
        "doc_id", "contamination"
    )
    passes = F.coalesce(F.col("passes"), F.lit(False))
    canonical = F.coalesce(F.col("__can"), F.lit(False))
    contaminated = F.coalesce(
        F.col("contamination") >= 0.05, F.lit(False)
    )
    bench = (F.col("doc_id") % _DECON_MOD) == 0
    return (
        # every side is corpus-sized AND stats-less (the quality/decontam
        # sides now descend from a repartition, the canonical side from
        # checkpointed CC labels — both hide scan statistics), so Spark
        # would default each join to sort-merge; shuffle-hash needs no
        # sort and broadcast would be wrong at the design point
        base.join(q.hint("shuffle_hash"), "doc_id", "left")
        .join(c.hint("shuffle_hash"), "doc_id", "left")
        .join(d.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            passes.alias("passes_quality"),
            canonical.alias("is_canonical"),
            contaminated.alias("is_contaminated"),
            bench.alias("is_benchmark"),
            (passes & canonical & ~contaminated & ~bench).alias("keep"),
        )
    )


QUERIES["pipeline_verdict_docs"] = CatalogQuery(
    pipeline_verdict_docs,
    _pipeline_verdict_oracle(),
    "the WHOLE cleaning pipeline as one DAG — every document's final "
    "keep/drop verdict with its reasons: Gopher quality gates AND "
    "near-dup canonical survivorship (LSH -> connected components -> "
    "keep-longest) AND n-gram benchmark decontamination (>= 5% "
    "contaminated shingles drops), benchmark split excluded.  One Spark "
    "job, one scan per signal family; the oracle composes the three "
    "component oracles as subquery CTEs so the hash gate verifies the "
    "END-TO-END decision, not just the parts",
)


def _rp_proj_sql(out_dim: int = 16, dim: int = 64) -> str:
    from .ops.similarity import rp_signs

    comps = []
    for j in range(out_dim):
        signs = ", ".join(repr(s) for s in rp_signs(j, dim))
        comps.append(f"list_dot_product(v, [{signs}]::DOUBLE[])")
    return "[" + ", ".join(comps) + "]"


@register(
    "ann_rp",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ), p AS (
      SELECT vec_id, {_rp_proj_sql(16, 64)} AS pv FROM e
    ), q AS (SELECT vec_id AS qid, pv AS qv FROM p WHERE vec_id < 8),
    s AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(c.pv, c.pv)) > 0
                  THEN round(list_dot_product(q.qv, c.pv)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.pv, c.pv))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN p c ON c.vec_id <> q.qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
    """,
    "ANN via Johnson–Lindenstrauss random projection (Achlioptas ±1 sign "
    "matrix, md5-derived so both engines replay it): 64 -> 16 dims, then "
    "exact cosine top-5 over the short vectors — 4x less per-comparison "
    "compute and 4x fewer at-rest vector bytes.  The 5th rung of the ANN "
    "ladder (brute/LSH/IVF/PQ/RP): where PQ compresses via codebooks and "
    "scans with LUTs, RP keeps plain float arithmetic on a sketch column "
    "projected ONCE at write time.  Exact duplicates stay rank-1 at score "
    "1.0 (identical inputs project identically)",
)
def ann_rp(spark, sf_dir):
    from .ops.similarity import rp_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return rp_topk(emb, queries, k=5, out_dim=16, dim=64)


@register(
    "bpe_pair_counts_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), words AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(
               range(1, greatest(length(w) - 1, 0) + 1),
               i -> substr(w, i, 2))) AS pair,
             c
      FROM words
    )
    SELECT pair, sum(c)::BIGINT AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
    """,
    "BPE tokenizer-training pair statistics (the Sennrich et al. merge-"
    "selection inner loop, first iteration): corpus -> word-frequency "
    "table FIRST (one shuffle, map-side combine — exactly how real BPE "
    "training scales: distinct words are millions where corpus tokens are "
    "trillions), then adjacent symbol pairs explode off the SMALL word "
    "table weighted by word count; deterministic top-50 merge candidates.  "
    "The op a pipeline runs before training a tokenizer on its own corpus",
)
def bpe_pair_counts_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grams = F.when(
        F.length(F.col("w")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(F.col("w")) - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = words.select(F.col("c"), F.explode(grams).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


_WS = "[ \\t\\n\\r\\f]"  # explicit class: Python/Java \\s is Unicode, RE2 ASCII


@register(
    "html_strip_docs",
    f"""
    WITH h AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || doc_id || '</title>'
             || '<style>p{{margin:0}}</style></head><body>'
             || '<script type="text/javascript">var t = "' || doc_id
             || '";</script><h1>Doc ' || doc_id || '</h1><p>'
             || coalesce(text, '') || '</p><em>fin</em></body></html>'
               AS html,
             coalesce(text, '') AS src
      FROM documents
    ), s AS (
      SELECT doc_id, src, html,
             regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
             trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               html,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '{_WS}+', ' ', 'g')) AS clean_text
      FROM h
    )
    SELECT doc_id, title,
           length(clean_text) AS n_chars_clean,
           clean_text = trim(regexp_replace(
             'Doc ' || doc_id || ' Doc ' || doc_id || ' ' || src || ' fin',
             '{_WS}+', ' ', 'g')) AS clean_ok,
           clean_text
    FROM s
    """,
    "HTML -> text extraction, the stage every web-scale corpus passes "
    "first: documents wrapped in a deterministic page (title, style, an "
    "inline script) are stripped back — script/style blocks REMOVED "
    "bodily (the boilerplate trap naive tag-stripping misses), remaining "
    "tags to spaces, whitespace collapsed with an explicit [ tnrf] class "
    "(Java regex \\\\s is Unicode, RE2's is ASCII — the sentences_docs "
    "lesson), title extracted separately.  clean_ok proves lossless "
    "recovery of the source text per row; pure regexp column expressions, "
    "zero shuffles",
)
def html_strip_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    src = F.coalesce(F.col("text"), F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "), did, F.lit("</title>"),
        F.lit("<style>p{margin:0}</style></head><body>"),
        F.lit('<script type="text/javascript">var t = "'), did,
        F.lit('";</script><h1>Doc '), did, F.lit("</h1><p>"),
        src, F.lit("</p><em>fin</em></body></html>"),
    )
    staged = docs.select("doc_id", src.alias("__src"), html.alias("__html"))
    ws = "[ \\t\\n\\r\\f]"
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("__html"),
                        r"(?s)<script[^>]*>.*?</script>", " "),
                    r"(?s)<style[^>]*>.*?</style>", " "),
                r"<[^>]+>", " "),
            ws + "+", " ")
    )
    expected = F.trim(
        F.regexp_replace(
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"),
                F.lit(" Doc "), F.col("doc_id").cast("string"),
                F.lit(" "), F.col("__src"), F.lit(" fin"),
            ),
            ws + "+", " ")
    )
    s2 = staged.select(
        "doc_id",
        F.regexp_extract(F.col("__html"), "<title>([^<]*)</title>", 1)
        .alias("title"),
        clean.alias("clean_text"),
        expected.alias("__expected"),
    )
    return s2.select(
        "doc_id",
        "title",
        F.length("clean_text").cast("long").alias("n_chars_clean"),
        (F.col("clean_text") == F.col("__expected")).alias("clean_ok"),
        "clean_text",
    )


_PHRASE = ("table", "hash")


@register(
    "phrase_search_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), idx AS (
      SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos
      FROM toks
    ),
    p0 AS (SELECT doc_id, pos AS start FROM idx WHERE term = '{_PHRASE[0]}'),
    p1 AS (SELECT doc_id, pos - 1 AS start FROM idx WHERE term = '{_PHRASE[1]}')
    SELECT p0.doc_id, count(*) AS n_matches, min(p0.start) AS first_pos
    FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id AND p0.start = p1.start
    GROUP BY p0.doc_id
    """,
    "positional phrase search over an inverted index — the retrieval "
    "shape BM25 can't express: tokens posexplode to (term, doc, pos) "
    "postings, each phrase word's postings FILTER FIRST (tiny lists; at "
    "100 TB the index is partitioned by term and only the phrase's "
    "postings are read), then co-positional equi-join on (doc, start "
    "offset) finds exact adjacency; per-doc match count + first position "
    "(1-based).  Postings joins hinted shuffle-hash — both sides are "
    "same-scale filtered streams, sort-merge would pay an unneeded sort",
)
def phrase_search_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    idx = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    )
    m = None
    for i, w in enumerate(_PHRASE):
        p = idx.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        m = p if m is None else m.join(p.hint("shuffle_hash"), ["doc_id", "start"])
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.min("start") + 1).cast("long").alias("first_pos"),
    )


@register(
    "corpus_diff_docs",
    """
    WITH a AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 <> 0
    ), b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 13 <> 0
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h IS DISTINCT FROM b.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           a.h AS old_hash, b.h AS new_hash
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
    "corpus snapshot diff — the daily data-versioning pass: two snapshots "
    "(old drops doc_id%11=0, new drops %13=0 and edits %7=0) reduce to "
    "(id, content-hash) and full-outer-join into added/removed/changed/"
    "unchanged verdicts.  Only 16-byte hashes join, never content; at "
    "100 TB both snapshots bucket by doc_id so the diff is co-located "
    "map-side — the hint keeps same-scale sides off sort-merge",
)
def corpus_diff_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    # presence comes from explicit flags, NOT hash nullness: md5(NULL text)
    # is NULL for a PRESENT doc, which would misread as added/removed —
    # and the changed-comparison is null-safe for the same reason
    # (fuzz-corpus catch)
    a = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.md5(F.col("text")).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    b = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    j = a.join(b.hint("shuffle_hash"), "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), "changed")
        .otherwise("unchanged")
        .alias("status"),
        "old_hash",
        "new_hash",
    )


_shared_sql(
    "dq_checks_orders",
    """
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS violations,
           (SELECT count(*) FROM orders) AS population
    UNION ALL
    SELECT 'orders_key_unique',
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_qty_range',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 50),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders_price_nonneg',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice < 0),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.1),
           (SELECT count(*) FROM lineitem)
    """,
    "Deequ-style declarative data-quality suite over the relational "
    "tables — the ingest gate every warehouse runs: referential "
    "integrity (anti-join existence checks Catalyst turns into "
    "broadcast/hash anti joins), key uniqueness, NULL and range "
    "constraints, each reported as (check, violations, population) so "
    "downstream alerting thresholds on the ratio.  Shared SQL text runs "
    "verbatim in both engines; each subquery is one aggregate over one "
    "scan, and at 100 TB the checks batch into a single pass per table "
    "with conditional aggregation",
)


_shared_sql(
    "scd2_customer_priority",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority AS p,
             date_trunc('second', o_orderdate) AS d, o_orderkey AS k,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ), changes AS (
      SELECT o_custkey, p, d, k FROM ordered
      WHERE prev IS NULL OR p <> prev
    )
    SELECT o_custkey, p AS priority, d AS valid_from,
           lead(d) OVER (
             PARTITION BY o_custkey ORDER BY d, k
           ) AS valid_to,
           (lead(d) OVER (
             PARTITION BY o_custkey ORDER BY d, k
           ) IS NULL) AS is_current
    FROM changes
    """,
    "CDC -> SCD Type-2 compaction, the warehouse-history staple: each "
    "customer's order-priority CHANGE points (lag() drops consecutive "
    "repeats) become versioned rows with [valid_from, valid_to) ranges "
    "via lead(), open-ended current row flagged.  Both windows ride ONE "
    "hash partitioning on the entity key — one shuffle total at any "
    "scale; deterministic (date, orderkey) tiebreak.  Shared SQL text "
    "runs verbatim in both engines",
)


def _gapfill_sql(grid_expr: str) -> str:
    """One query text, one dialect hole: the dense-grid explode is
    ``explode(sequence(...))`` in Spark, ``unnest(generate_series(...))``
    in DuckDB; everything else is shared verbatim."""
    return f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(avg(value), 6) AS v
      FROM events WHERE user_id % 20 = 0
      GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly
      GROUP BY user_id
    ), grid AS (
      SELECT user_id, {grid_expr} AS h FROM bounds
    ), joined AS (
      SELECT g.user_id, g.h, hr.v,
             count(hr.v) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING
             ) AS grp
      FROM grid g LEFT JOIN hourly hr
        ON g.user_id = hr.user_id AND g.h = hr.h
    )
    SELECT user_id, h AS hour, (v IS NULL) AS filled,
           max(v) OVER (PARTITION BY user_id, grp) AS value_ff
    FROM joined
    """


_shared_sql(
    "events_gapfill",
    _gapfill_sql("explode(sequence(h0, h1, INTERVAL 1 HOUR))"),
    "time-series gap-fill + forward-fill, the resampling op Spark has no "
    "native verb for: per-user hourly averages land on a DENSE hour grid "
    "(sequence explode between each user's own bounds) and gaps carry "
    "the last observation forward.  The fill uses the "
    "count-over-preceding trick — count(v) over preceding rows is "
    "constant within each observation's fill-run, so max(v) per (user, "
    "run) IS the forward fill — which runs identically in both engines "
    "(last_value IGNORE NULLS is the intent, but engines disagree on "
    "IGNORE NULLS in window frames; the trick sidesteps it).  Agg, "
    "fill-run window, and run-max all ride user-keyed partitionings; "
    "user_id % 20 keeps the demo grid bounded",
    oracle_sql=_gapfill_sql("unnest(generate_series(h0, h1, INTERVAL 1 HOUR))"),
)


def _debounce_sql(epoch_expr: str) -> str:
    """One text, one dialect hole: seconds-since-epoch is
    ``unix_timestamp(ts)`` in Spark, ``epoch(ts)`` in DuckDB."""
    e = epoch_expr
    return f"""
    WITH err AS (
      SELECT user_id, date_trunc('second', ts) AS ts
      FROM events WHERE event_type = 'error'
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR {e.format(c="ts")} - {e.format(c="lag(ts) OVER w")}
                       > 1800
                  THEN 1 ELSE 0 END AS re_armed
      FROM err
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             sum(re_armed) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS episode
      FROM flagged
    )
    SELECT user_id, CAST(episode AS BIGINT) AS episode,
           min(ts) AS alert_ts,
           count(*) - 1 AS n_suppressed,
           CAST({e.format(c="max(ts)")} - {e.format(c="min(ts)")}
                AS BIGINT) AS episode_span_s
    FROM sessions GROUP BY user_id, episode
    """


@register(
    "events_alert_debounce",
    _debounce_sql("epoch({c})"),
    "alert debouncing, the SIEM noise-control staple: per (user, error) "
    "stream, emit the FIRST alert of each burst and suppress followers "
    "until a quiet gap of 30 min re-arms — the gap-session semantics "
    "(quiet period extends while events keep coming), expressed as the "
    "classic lag-flag + running-sum sessionization with first/count per "
    "episode.  All three windows ride ONE user-keyed partitioning "
    "(single shuffle); the fixed-window-from-emission variant (chained "
    "throttle) is inherently stateful and lives in the timeframe engine's "
    "episode suppression (rules/timeframe.py).  Reports suppressed count "
    "and episode span so the noise reduction is itself measured",
)
def events_alert_debounce(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_debounce_sql("unix_timestamp({c})"))


@register(
    "events_pattern_match",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(s) AS n_events,
           len(regexp_extract_all(s, 'vc+p')) AS n_patterns,
           len(regexp_extract_all(s, 'vc+p')) > 0 AS matched
    FROM seq
    """,
    "MATCH_RECOGNIZE-style event-sequence pattern matching (the SQL-2016 "
    "feature Spark lacks): per-user event types collapse — ordered by "
    "(ts, event_id), initials only — into one string per user, and the "
    "row-pattern 'view, one-or-more clicks, purchase' becomes the regex "
    "vc+p counted non-overlapping.  One user-keyed shuffle; the sequence "
    "string is bounded by the user's event count, and at 100 TB the "
    "same shape runs windowed (pattern within session) rather than "
    "whole-history.  Initials are distinct across the 5 event types, so "
    "the encoding is lossless here; a general encoder maps types to "
    "single codepoints first",
)
def events_pattern_match(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"), F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("s")
    )
    n = F.coalesce(F.regexp_count(F.col("s"), F.lit("vc+p")), F.lit(0))
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        n.cast("long").alias("n_patterns"),
        (n > 0).alias("matched"),
    )


def _pattern_sessions_sql(agg: str, count_matches: str) -> str:
    """One text, two dialect holes: ordered string aggregation is
    ``string_agg(c, '') WITHIN GROUP (ORDER BY ...)`` in Spark 4 but
    ``string_agg(c, '' ORDER BY ...)`` in DuckDB, and list length is
    ``size`` vs ``len``."""
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS i,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, i,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, event_id, ts, i,
             cast(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    ), seq AS (
      SELECT user_id, session_id,
             {agg} AS s,
             date_trunc('second', min(ts)) AS session_start
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, session_start,
           cast(length(s) AS BIGINT) AS n_events,
           cast({count_matches} AS BIGINT) AS n_patterns
    FROM seq
    WHERE {count_matches} > 0
    """


@register(
    "events_pattern_match_sessions",
    _pattern_sessions_sql(
        "string_agg(i, '' ORDER BY ts, event_id)",
        "len(regexp_extract_all(s, 'vc*p'))",
    ),
    "the 100 TB form of events_pattern_match, previously only documented "
    "in its docstring: the row-pattern 'view, then clicks, then "
    "purchase' (vc*p: the session variant relaxes clicks to zero-or-"
    "more — gap sessions in this corpus are minutes long, so the "
    "conversion often skips the click) matched WITHIN each 30-min gap "
    "session instead of over a "
    "user's whole history, so the per-group sequence string is bounded by "
    "session length (minutes of activity) rather than corpus lifetime — "
    "the difference between O(session) and O(years-of-events) state per "
    "key.  Reuses events_sessionization's gaps-and-islands session ids "
    "(lag + running sum, ONE user-keyed shuffle shared by both windows "
    "and the final group), then string_agg WITHIN GROUP orders initials "
    "per session and the regex counts non-overlapping matches.  Emits "
    "only matched sessions — the alert shape",
)
def events_pattern_match_sessions(spark, sf_dir):
    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(_pattern_sessions_sql(
        "string_agg(i, '') WITHIN GROUP (ORDER BY ts, event_id)",
        "size(regexp_extract_all(s, 'vc*p', 0))",
    ))


def _hierarchy_sql(intdiv: str) -> str:
    """One text, one dialect hole: integer division is ``DIV`` in Spark
    SQL, ``//`` in DuckDB."""
    return f"""
    WITH RECURSIVE chain(custkey, anc, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      WHERE c_custkey BETWEEN 1 AND 500
      UNION ALL
      SELECT custkey, anc {intdiv} 2, depth + 1 FROM chain WHERE anc > 1
    )
    SELECT ch.custkey,
           max(ch.depth) AS depth,
           count(*) AS chain_len,
           round(sum(a.c_acctbal), 2) AS chain_balance
    FROM chain ch JOIN customer a ON a.c_custkey = ch.anc
    GROUP BY ch.custkey
    """


@register(
    "customer_hierarchy",
    _hierarchy_sql("//"),
    "hierarchical rollup via RECURSIVE CTE — the Spark 4 SQL surface "
    "(org charts, category trees, BOM explosions) exercised end-to-end: "
    "each customer walks a synthetic binary-tree ancestor chain "
    "(parent = custkey div 2) accumulating depth and the SUM of account "
    "balances along the chain, the classic hierarchical aggregate.  The "
    "recursion is DAG-bounded (ancestors strictly decrease), which "
    "matters: Spark supports only UNION ALL recursion, so cyclic-graph "
    "closures stay with the iterative connected-components operator — "
    "the boundary between the two is documented here on purpose.  One "
    "dialect hole (DIV vs //); both engines run the same text otherwise",
)
def customer_hierarchy(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_hierarchy_sql("DIV"))


_shared_sql(
    "events_winsorized_stats",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), b AS (
      SELECT event_type,
             percentile_cont(0.0625) WITHIN GROUP (ORDER BY vm) AS lo,
             percentile_cont(0.9375) WITHIN GROUP (ORDER BY vm) AS hi
      FROM v GROUP BY event_type
    ), bi AS (
      -- the bounds interpolate integer micro-units at dyadic 1/16
      -- fractions, so lo*16 and hi*16 are EXACT integers — everything
      -- downstream is integer arithmetic and the means are each ONE
      -- double division (a float avg() sums in engine-specific order and
      -- diverged by 1 ulp on a 6-decimal fuzz corpus)
      SELECT event_type,
             CAST(round(lo * 16) AS BIGINT) AS lo16,
             CAST(round(hi * 16) AS BIGINT) AS hi16
      FROM b
    )
    SELECT e.event_type,
           count(*) AS n,
           round(CAST(sum(e.vm) AS BIGINT) / (count(*) * 1e6) + 1e-9, 6)
             AS raw_mean,
           round(CAST(sum(least(greatest(e.vm * 16, b.lo16), b.hi16))
                      AS BIGINT) / (count(*) * 16e6) + 1e-9, 6)
             AS winsorized_mean,
           round(b.lo16 / 16e6 + 1e-9, 6) AS p_lo,
           round(b.hi16 / 16e6 + 1e-9, 6) AS p_hi
    FROM v e JOIN bi b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.lo16, b.hi16
    """,
    "winsorized robust statistics per group — the outlier-resistant "
    "aggregate metrics pipelines report next to raw means: exact "
    "percentile bounds over integer micro-units (DYADIC fractions 1/16 "
    "and 15/16, the percentile_prices rule — the interpolation "
    "x + (y-x)*k/16 over integers is exactly representable, so bound*16 "
    "is an exact integer), values clipped into [lo, hi] via "
    "least/greatest in 16ths-of-micro units, then each mean is one "
    "integer sum + one double division — order-free where a float avg() "
    "diverges by summation order.  Two passes over the group (bounds agg "
    "+ clipped agg), both riding the same group-key partitioning; the "
    "bounds side is group-cardinality-sized and broadcasts at scale",
)


@register(
    "classifier_calibration_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg,
             lang
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t, lang
            FROM documents)
    ), s AS (
      SELECT doc_id, lang,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit
      FROM g, (SELECT {{weights}} AS w)
    ), q AS (
      SELECT lang, count(*) AS n,
             round(percentile_cont(0.375)
                   WITHIN GROUP (ORDER BY logit), 6) AS thr_625
      FROM s GROUP BY lang
    )
    SELECT q.lang, q.n, q.thr_625,
           round(sum(CASE WHEN s.logit >= q.thr_625 THEN 1 ELSE 0 END)
                 / q.n::DOUBLE + 1e-9, 6) AS actual_keep_rate
    FROM s JOIN q ON s.lang = q.lang
    GROUP BY q.lang, q.n, q.thr_625
    """.format(weights="[" + ", ".join(
        str(w) for w in __import__(
            "dagger_spark.ops.text", fromlist=["classifier_weights"]
        ).classifier_weights()) + "]"),
    "classifier CALIBRATION, the step between training and gating: the "
    "per-language keep threshold is DERIVED from the logit distribution "
    "(the 37.5% quantile keeps the top 62.5% — dyadic fraction per the "
    "percentile_prices interpolation rule) instead of hand-picked, and "
    "the actually-achieved keep rate at that threshold is emitted beside "
    "it (interpolated thresholds between integer logits need not attain "
    "the nominal rate exactly — the gap is data, not error).  Completes "
    "the model-filter family: train (weights) -> calibrate (threshold) "
    "-> gate (policy table).  Quantiles per group ride one lang-keyed "
    "partitioning; the threshold table is lang-cardinality-sized and "
    "broadcasts at scale",
)
def classifier_calibration_docs(spark, sf_dir):
    from .ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", char_trigrams(F.col("text")).alias("__tg")
    )
    s = staged.select(
        "doc_id", "lang",
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit"),
    )
    q = s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile_cont(0.375) WITHIN GROUP (ORDER BY logit)"), 6)
        .alias("thr_625"),
    )
    j = s.join(F.broadcast(q), "lang")
    return j.groupBy("lang", "n", "thr_625").agg(
        F.round(
            F.sum(F.when(F.col("logit") >= F.col("thr_625"), 1).otherwise(0))
            / F.col("n").cast("double")
            + F.lit(1e-9),
            6,
        ).alias("actual_keep_rate")
    ).select("lang", "n", "thr_625", "actual_keep_rate")


#: per-language classifier-logit thresholds (milli-units) — policy AS DATA
_LANG_POLICY = (("en", 0), ("de", -50), ("es", -50), ("fr", -100))
_LANG_POLICY_DEFAULT = 50


@register(
    "quality_policy_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg,
             lang
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t, lang
            FROM documents)
    ), s AS (
      SELECT doc_id, lang,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit_milli
      FROM g, (SELECT {{weights}} AS w)
    ), pol AS (
      SELECT * FROM (VALUES {{policy_rows}}) v(lang, thr)
    )
    SELECT s.doc_id, s.lang, s.logit_milli,
           CAST(coalesce(p.thr, {_LANG_POLICY_DEFAULT}) AS BIGINT)
             AS threshold,
           s.logit_milli >= coalesce(p.thr, {_LANG_POLICY_DEFAULT}) AS keep
    FROM s LEFT JOIN pol p ON s.lang = p.lang
    """.format(
        weights="[" + ", ".join(
            str(w) for w in __import__(
                "dagger_spark.ops.text", fromlist=["classifier_weights"]
            ).classifier_weights()
        ) + "]",
        policy_rows=", ".join(f"('{l}', {t})" for l, t in _LANG_POLICY),
    ),
    "policy-table gating, the config-as-data pattern: per-LANGUAGE "
    "classifier-logit thresholds live in a tiny policy table (broadcast "
    "joined; unknown languages fall back to a stricter default) instead "
    "of being baked into code — retuning a language's bar is a data "
    "change, no redeploy.  Composes the oracle-verified hashing-trick "
    "classifier; thresholds are integer milli-units so the gate decision "
    "is parity-exact.  NULL lang takes the default path in both engines "
    "(LEFT JOIN miss -> coalesce)",
)
def quality_policy_docs(spark, sf_dir):
    from .ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", char_trigrams(F.col("text")).alias("__tg")
    )
    scored = staged.select(
        "doc_id", "lang",
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit_milli"),
    )
    policy = spark.createDataFrame(
        list(_LANG_POLICY), "lang string, thr long"
    )
    j = scored.join(F.broadcast(policy), "lang", "left")
    thr = F.coalesce(F.col("thr"), F.lit(_LANG_POLICY_DEFAULT))
    return j.select(
        "doc_id", "lang", "logit_milli",
        thr.cast("long").alias("threshold"),
        (F.col("logit_milli") >= thr).alias("keep"),
    )


@register(
    "events_hll_intersect",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events
              WHERE user_id IS NOT NULL),
    cnt AS (SELECT event_type, count(*) AS c FROM tu GROUP BY event_type),
    px AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS ci
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(ca.c AS BIGINT) AS exact_a,
           CAST(cb.c AS BIGINT) AS exact_b,
           CAST(ca.c + cb.c - px.ci AS BIGINT) AS exact_union,
           CAST(px.ci AS BIGINT) AS exact_intersect,
           TRUE AS intersect_within_band
    FROM px
    JOIN cnt ca ON ca.event_type = px.type_a
    JOIN cnt cb ON cb.event_type = px.type_b
    """,
    "HLL set-INTERSECTION estimation via inclusion-exclusion (est_a + "
    "est_b - est_union over mergeable sketches) for every event-type "
    "pair — the audience-overlap question sketches answer without "
    "rescanning raw data at 100 TB.  Same BOUNDED-oracle shape as "
    "events_hll_rollup: Spark computes approx AND exact, emits exact "
    "plus a within-band flag (10% of the union: differencing amplifies "
    "sketch error ~3x over a single estimate at lgConfigK=12's ~1.6% "
    "rsd, so the loose band is the honest one), the oracle pins exact "
    "counts and TRUE — a broken union/estimate flips the flag",
)
def events_hll_intersect(spark, sf_dir):
    # NULL user_ids excluded EXPLICITLY on both sides: sketches and
    # count_distinct skip NULLs while a DISTINCT projection keeps the NULL
    # row — the fuzz corpus caught the one-off (mirrored in the oracle)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk"),
        F.count_distinct("user_id").cast("long").alias("exact"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"),
        F.col("exact").alias("exact_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"),
        F.col("exact").alias("exact_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate(F.col("sk_a"))
    est_b = F.hll_sketch_estimate(F.col("sk_b"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b")))
    est_i = est_a + est_b - est_u
    tu = ev.select("event_type", "user_id").distinct()
    inter = (
        tu.alias("x")
        .join(
            tu.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    j = pairs.join(inter, ["type_a", "type_b"])
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_intersect")
    )
    return j.select(
        "type_a", "type_b", "exact_a", "exact_b",
        exact_union.cast("long").alias("exact_union"),
        "exact_intersect",
        (
            F.abs(est_i - F.col("exact_intersect"))
            <= 0.10 * exact_union.cast("double")
        ).alias("intersect_within_band"),
    )


@register(
    "contrastive_triplets",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS anchor_id, v AS qv FROM e WHERE vec_id < 32
    ), s AS (
      SELECT q.anchor_id, e.vec_id AS cand_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score,
             md5(q.anchor_id::VARCHAR || ':' || e.vec_id::VARCHAR) AS h
      FROM q JOIN e ON e.vec_id <> q.anchor_id
    ), rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY score DESC, cand_id) AS rk
      FROM s
    ), pos AS (
      SELECT anchor_id, cand_id AS pos_id, score AS pos_score
      FROM rk WHERE rk = 1
    ), neg AS (
      SELECT anchor_id, cand_id AS neg_id, score AS neg_score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY anchor_id ORDER BY h, cand_id) AS nk
        FROM rk WHERE rk > 1
      ) WHERE nk = 1
    )
    SELECT anchor_id, pos_id, pos_score, neg_id, neg_score,
           round(pos_score - neg_score, 6) AS margin
    FROM pos JOIN neg USING (anchor_id)
    """,
    "contrastive training-triplet mining for embedding models: per "
    "anchor, the POSITIVE is its exact cosine top-1 and the NEGATIVE a "
    "deterministic hash-random corpus row (min md5(anchor:cand), "
    "positive and self excluded) — the (anchor, positive, "
    "random-negative) batch shape contrastive losses train on, with the "
    "margin reported so near-tie anchors are visible in the data.  ONE "
    "scored pass serves both roles (queries broadcast, corpus scanned "
    "once, two windows over the same anchor-keyed partitioning); swap "
    "bucketed ANN in for the positive when exact top-1 is too expensive "
    "at scale",
)
def contrastive_triplets(spark, sf_dir):
    from .ops.similarity import contrastive_triplets as _ct

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return _ct(emb, emb.filter(F.col("vec_id") < 32))


def _pagerank_oracle(iters: int = 10) -> str:
    """The SAME integer iteration unrolled as chained CTEs (standard SQL
    forbids aggregation in a recursive member, and unrolling mirrors the
    Spark loop literally anyway)."""
    parts = [_DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), deg AS (
      SELECT src, count(*) AS deg FROM sym GROUP BY src
    ), e AS (
      SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src)
    ), r0 AS (
      SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS r FROM documents
    )"""]
    for k in range(1, iters + 1):
        parts.append(f""", r{k} AS (
      SELECT n.doc_id AS id,
             CAST(150000 + (85 * coalesce(sum(pr.r // e.deg), 0)) // 100
                  AS BIGINT) AS r
      FROM documents n
      LEFT JOIN e ON e.dst = n.doc_id
      LEFT JOIN r{k - 1} pr ON pr.id = e.src
      GROUP BY n.doc_id
    )""")
    parts.append(f"""
    SELECT r{iters}.id AS doc_id,
           coalesce(deg.deg, 0)::BIGINT AS degree,
           r{iters}.r AS rank_micro
    FROM r{iters} LEFT JOIN deg ON deg.src = r{iters}.id
    """)
    return "".join(parts)


@register(
    "pagerank_docs",
    _pagerank_oracle(10),
    "integer-scaled PageRank over the document SIMILARITY graph (the LSH "
    "candidate pairs the dedup family already computes, symmetrized) — "
    "the centrality-as-quality-weight signal CommonCrawl-scale pipelines "
    "apply before sampling.  Ten damped Pregel rounds, each ONE src-keyed "
    "join + ONE dst-keyed aggregate (two shuffles/round at any scale), "
    "lineage truncated per round like connected_components, stats-less "
    "joins hinted shuffle-hash.  Ranks are micro-unit INTEGERS (r div "
    "deg contributions, (85*sum) div 100 damping): every sum is "
    "order-free, so the oracle — the same ten iterations unrolled as "
    "chained CTEs — matches hash-exactly; floor division sheds mass, so "
    "this is a deterministic centrality score, not a distribution",
)
def pagerank_docs(spark, sf_dir):
    from .ops.dedup import minhash_candidate_pairs
    from .ops.graph import pagerank_int

    docs = _load_wide(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    sym = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        cand.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    # stride 5 = two localCheckpoint jobs for the 10 rounds (after r5/r10)
    # vs stride 3's four; measured at sf0.1/local[32]: 5.4-5.6 s vs
    # 5.9-9.0 s.  The plan runs ≤5 iterations deep — fine for this
    # two-shuffle round shape; graphs that pressure executor memory
    # should drop back toward 1 (see pagerank_int's docstring).
    return pagerank_int(
        nodes, sym, iters=10, checkpoint_every=5
    ).withColumnRenamed("id", "doc_id")


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           round((count(*) - count({c})) / count(*)::DOUBLE + 1e-9, 6)
             AS null_frac,
           count(DISTINCT {c}) AS n_distinct,
           min({c})::VARCHAR AS min_value,
           max({c})::VARCHAR AS max_value
    FROM documents"""


@register(
    "profile_documents",
    " UNION ALL ".join(
        _profile_col_sql(c)
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    ),
    "one-pass table profiling, the ingest-time data-quality pass: per "
    "column — null count/fraction, EXACT distinct count, min/max "
    "aggregated on the native type then cast to string.  All columns "
    "profile in ONE aggregation job (the countDistinct set rewrites to a "
    "single expand+aggregate: one shuffle total), per-column rows explode "
    "from the single result row driver-side.  At 100 TB swap exact "
    "distinct for approx_count_distinct (see events_approx_distinct); "
    "exact is kept here so the oracle can verify it",
)
def profile_documents(spark, sf_dir):
    from .ops.quality import profile_table

    docs = _load_wide(spark, sf_dir, "documents")
    return profile_table(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _classifier_weights_sql() -> str:
    from .ops.text import classifier_weights

    return "[" + ", ".join(str(w) for w in classifier_weights()) + "]"


@register(
    "quality_classifier_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t
            FROM documents)
    ), s AS (
      SELECT doc_id, len(tg) AS n_feats,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit_milli
      FROM g, (SELECT {_classifier_weights_sql()} AS w)
    )
    SELECT doc_id, n_feats, logit_milli,
           round(1.0 / (1.0 + exp(-(logit_milli / 1000.0))) + 1e-9, 6) AS score,
           logit_milli > 0 AS keep
    FROM s
    """,
    "model-based quality filter in the fastText / hashing-trick serving "
    "shape: distinct char trigrams -> md5 hash bucket (dim 1024) -> "
    "weight-vector lookup -> logit fold -> sigmoid score + keep decision.  "
    "The weight vector is a plan-time Literal (a trained model's weights "
    "broadcast into codegen), buckets are md5-derived so both engines "
    "embed the identical array, and the weights are INTEGER milli-units so "
    "the per-doc logit is an order-free integer sum (a float fold would "
    "depend on element order and break cross-engine parity).  Zero "
    "shuffles: the entire classifier is one narrow projection — the 100 TB "
    "shape for cheap model-based filtering before any expensive stage",
)
def quality_classifier_docs(spark, sf_dir):
    from .ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", char_trigrams(F.col("text")).alias("__tg")
    )
    scored = staged.select(
        "doc_id",
        F.size(F.col("__tg")).cast("long").alias("n_feats"),
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit_milli"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "logit_milli",
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("logit_milli") / F.lit(1000.0))))
            + F.lit(1e-9),
            6,
        ).alias("score"),
        (F.col("logit_milli") > 0).alias("keep"),
    )


@register(
    "unigram_logprob_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ), vocab AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), stats AS (
      SELECT sum(c) AS n_total, count(*) AS n_vocab FROM vocab
    ), lp AS (
      SELECT tok,
             CAST(round(ln((c + 1.0) / (n_total + n_vocab)) * 1e6)
                  AS BIGINT) AS lp_micro
      FROM vocab, stats
    ), per_doc AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             sum(l.lp_micro)::BIGINT AS sum_lp_micro
      FROM tok t JOIN lp l ON t.tok = l.tok
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, sum_lp_micro,
           round(sum_lp_micro / (n_tokens * 1e6) + 1e-9, 6) AS avg_logprob,
           round(exp(-round(sum_lp_micro / (n_tokens * 1e6) + 1e-9, 6))
                 + 1e-9, 4) AS perplexity
    FROM per_doc
    """,
    "unigram-LM document scoring, the CCNet-style perplexity quality "
    "signal: pass 1 aggregates corpus token counts (ONE shuffle on token, "
    "map-side combine), pass 2 broadcasts the add-one-smoothed log-prob "
    "table and folds per-document average log-prob + perplexity.  "
    "Per-token log-probs are rounded to integer micro-nats BEFORE the "
    "per-doc sum so the aggregation is order-free (float sums across "
    "partitions are not), and perplexity exponentiates the already-rounded "
    "average so both engines exp the same clean double.  Zero-token "
    "documents drop out (no tokens to score).  Scale note: this corpus's "
    "vocab broadcasts; at open-vocab 100 TB the per-doc join shuffles on "
    "token instead — same plan minus the hint, and the Zipf head still "
    "map-side-combines",
)
def unigram_logprob_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("n_vocab")
    )
    lp = vocab.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.round(
            F.log((F.col("c") + F.lit(1.0))
                  / (F.col("n_total") + F.col("n_vocab"))) * 1e6,
            0,
        ).cast("long").alias("lp_micro"),
    )
    per_doc = (
        tok.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
    )
    avg = F.round(
        F.col("sum_lp_micro") / (F.col("n_tokens") * F.lit(1e6))
        + F.lit(1e-9),
        6,
    )
    return per_doc.select(
        "doc_id", "n_tokens", "sum_lp_micro", avg.alias("avg_logprob")
    ).withColumn(
        "perplexity",
        F.round(F.exp(-F.col("avg_logprob")) + F.lit(1e-9), 4),
    )


@register(
    "winnowing_docs",
    """
    WITH h AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(t) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT
             ) AS hs
      FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
    ), w AS (
      SELECT doc_id, len(hs) AS n_grams,
             list_sort(list_distinct(list_transform(
               range(1, greatest(len(hs) - 15, 1) + 1),
               i -> list_min(list_slice(hs, i, i + 15))))) AS fps
      FROM h
    )
    SELECT doc_id, n_grams,
           len(fps) AS n_fingerprints,
           round(len(fps)::DOUBLE / greatest(n_grams - 15, 1) + 1e-9, 6)
             AS density,
           array_to_string(fps, '|') AS fingerprints
    FROM w
    """,
    "Schleimer winnowing (the MOSS fingerprint): 8-char-gram 60-bit "
    "hashes, window-16 minima, distinct sorted fingerprint set per "
    "document — every 16-gram span contributes a fingerprint, so any two "
    "documents sharing a >=23-char substring share one.  Pure per-row "
    "array expressions (hash array staged as an attribute so the window "
    "transform doesn't re-hash per window), zero shuffles; expected "
    "density 2/(w+1) ~ 0.118 is emitted as a checked value.  The upgrade "
    "over doc_fingerprint's single global-min: position-local minima "
    "survive partial edits, the property substring-level near-dup "
    "detection actually needs",
)
def winnowing_docs(spark, sf_dir):
    from .ops.text import char_kgram_hashes, winnow_fingerprints
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", char_kgram_hashes(F.col("text"), 8).alias("__hs")
    )
    w2 = staged.select(
        "doc_id",
        F.size(F.col("__hs")).cast("long").alias("n_grams"),
        winnow_fingerprints(F.col("__hs"), 16).alias("__fps"),
    )
    return w2.select(
        "doc_id",
        "n_grams",
        F.size(F.col("__fps")).cast("long").alias("n_fingerprints"),
        F.round(
            F.size(F.col("__fps"))
            / F.greatest(F.col("n_grams") - 15, F.lit(1))
            + F.lit(1e-9),
            6,
        ).alias("density"),
        F.concat_ws("|", F.col("__fps").cast("array<string>"))
        .alias("fingerprints"),
    )


# ===========================================================================
# Round-3 continuation wave: tokenizer apply, doc surgery, CDC chunking,
# warehouse MERGE, unpivot, bigram LM
# ===========================================================================

# BPE merge table — a frozen MODEL ARTIFACT (learned offline from the
# sf0.01 word-frequency table with deterministic ties: max count, then
# lexicographic), shipped as data exactly the way production tokenizers
# ship merges.txt.  Applying merge k everywhere before merge k+1, each
# left-to-right non-overlapping, IS the BPE apply algorithm — and that is
# literally the semantics of chained string replace() in both engines.
_BPE_MERGES = [
    ("e r", "er"), ("i n", "in"), ("o w", "ow"), ("o r", "or"),
    ("s t", "st"), ("m er", "mer"), ("a t", "at"), ("l u", "lu"),
    ("a r", "ar"), ("p ar", "par"), ("j o", "jo"), ("jo in", "join"),
]


def _bpe_duck_expr(col: str) -> str:
    # chars spaced: DuckDB regexp_replace needs the 'g' flag (default is
    # first-match-only; Spark's replaces all) — one of the two dialect
    # holes, the other being \\1 vs $1 backreferences.
    e = f"trim(regexp_replace({col}, '(.)', '\\1 ', 'g'))"
    for a, b in _BPE_MERGES:
        e = f"replace({e}, '{a}', '{b}')"
    return e


@register(
    "bpe_encode_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), vocab AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    ), enc AS (
      SELECT w, len(string_split({_bpe_duck_expr('w')}, ' ')) AS np
      FROM vocab
    )
    SELECT t.doc_id,
           count(*)::BIGINT            AS n_words,
           sum(e.np)::BIGINT           AS n_pieces,
           round(sum(e.np)::DOUBLE / count(*) + 1e-9, 6) AS pieces_per_word
    FROM tok t JOIN enc e ON t.w = e.w
    GROUP BY t.doc_id
    """,
    "BPE tokenizer APPLY at corpus scale (the serving half of the "
    "bpe_pair_counts training step): encode the DISTINCT-WORD table — the "
    "real tokenizer-serving shape, vocabulary-sized work not corpus-sized "
    "— by spacing characters and folding the frozen merge list through "
    "chained replace().  Equivalence caveat (found by "
    "test_wave_properties): replace() equals the classic symbol-list BPE "
    "scan only when no producible symbol extends a merge operand across a "
    "token boundary — 'j o' after 'o w' would glue j to half of 'ow'.  "
    "The shipped table is proven exact on every corpus word "
    "(test_engine_merge_table_exact_on_corpus_vocabulary); on unsafe "
    "inputs both engines still agree (both run replace()), so the gate "
    "verifies the same documented discretization.  Piece counts "
    "broadcast-join back onto the token stream for per-doc totals; zero "
    "UDFs, the merge fold is one codegen'd expression.  Scale: vocab "
    "table is Zipf-bounded (MBs at 100 TB), corpus pass is a broadcast "
    "join + one doc-keyed aggregate",
)
def bpe_encode_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    vocab = tok.groupBy("w").agg(F.count("*").alias("c"))
    enc = F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
    for a, b in _BPE_MERGES:
        enc = F.replace(enc, F.lit(a), F.lit(b))
    pieces = vocab.select(
        "w", F.size(F.split(enc, " ")).alias("np")
    )
    return (
        tok.join(F.broadcast(pieces), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("np").cast("long").alias("n_pieces"),
            F.round(
                F.sum("np").cast("double") / F.count("*") + F.lit(1e-9), 6
            ).alias("pieces_per_word"),
        )
    )


_SCRUB_SIZE, _SCRUB_MAXFREQ = 10, 2  # remove chunks occurring > 2 times


@register(
    "line_scrub_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_SCRUB_SIZE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, s,
             array_to_string(list_slice(t, s, s + {_SCRUB_SIZE} - 1), ' ') AS txt
      FROM starts WHERE len(list_slice(t, s, s + {_SCRUB_SIZE} - 1)) > 0
    ), freqd AS (
      SELECT doc_id, s, txt,
             count(*) OVER (PARTITION BY md5(txt)) AS freq
      FROM chunks
    ), per_doc AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_chunks,
             sum(CASE WHEN freq > {_SCRUB_MAXFREQ} THEN 1 ELSE 0 END)::BIGINT
               AS n_removed,
             coalesce(string_agg(txt, ' ' ORDER BY s)
                        FILTER (WHERE freq <= {_SCRUB_MAXFREQ}), '')
               AS scrubbed
      FROM freqd GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_removed,
           CASE WHEN trim(scrubbed) = '' THEN 0
                ELSE len(string_split(trim(scrubbed), ' ')) END::BIGINT
             AS scrubbed_tokens,
           md5(scrubbed) AS scrub_hash
    FROM per_doc
    """,
    "RefinedWeb/MassiveText-style line-level scrub — DOCUMENT SURGERY, "
    "not gating: every 10-token chunk whose exact text occurs more than "
    "twice corpus-wide (boilerplate) is cut OUT of the document and the "
    "survivor text reconstructed in original order; the gate hashes the "
    "reconstructed text itself, so ordering bugs cannot hide.  (This "
    "corpus has no newlines, so 'line' = fixed token chunk — same surgery "
    "mechanics.)  One md5-keyed frequency window + one doc-keyed ordered "
    "rebuild; only hashes shuffle for the dedup decision.  Complements "
    "chunk_dedup_docs (which KEEPS first occurrences and reports stats)",
)
def line_scrub_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_SCRUB_SIZE))
    chunk = F.slice(F.col("t"), F.col("s"), _SCRUB_SIZE)
    ex = (
        df.select("doc_id", "t", F.explode(starts).alias("s"))
        .select("doc_id", "s", F.array_join(chunk, " ").alias("txt"),
                F.size(chunk).alias("n"))
        .filter(F.col("n") > 0)
    )
    freq = F.count("*").over(Window.partitionBy(F.md5("txt")))
    fd = ex.withColumn("freq", freq)
    kept = F.col("freq") <= _SCRUB_MAXFREQ
    per_doc = fd.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("s"), F.col("txt")))
                    )
                ),
                lambda x: x["txt"],
            ),
            " ",
        ).alias("scrubbed"),
    )
    return per_doc.select(
        "doc_id", "n_chunks", "n_removed",
        F.when(F.trim(F.col("scrubbed")) == "", F.lit(0))
         .otherwise(F.size(F.split(F.trim(F.col("scrubbed")), " ")))
         .cast("long").alias("scrubbed_tokens"),
        F.md5("scrubbed").alias("scrub_hash"),
    )


_CDC_MOD = 8  # expected chunk length ~8 words


@register(
    "cdc_chunk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks
    ), tokp AS (
      SELECT doc_id, p, t[p] AS w,
             CASE WHEN ('0x' || substr(md5(t[p]), 1, 8))::BIGINT
                       % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ), cids AS (
      SELECT doc_id, p, w,
             sum(b) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS UNBOUNDED PRECEDING) - b AS cid
      FROM tokp
    ), chunks AS (
      SELECT doc_id, cid, count(*)::BIGINT AS n,
             md5(string_agg(w, ' ' ORDER BY p)) AS h
      FROM cids GROUP BY doc_id, cid
    ), freqd AS (
      SELECT doc_id, cid, n,
             count(*) OVER (PARTITION BY h) AS freq
      FROM chunks
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_chunks,
           round(avg(n) + 1e-9, 6) AS avg_chunk,
           max(n)::BIGINT AS max_chunk,
           sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
    FROM freqd GROUP BY doc_id
    """,
    "Content-defined chunking (the FastCDC/rsync shape): a word ends a "
    "chunk when its content hash ≡ 0 (mod 8), so boundaries move WITH the "
    "content — an insertion reshapes only its local chunk and every later "
    "chunk keeps its identity, which is why storage dedup uses CDC instead "
    "of fixed offsets.  chunk_id = running boundary count (boundary word "
    "closes its own chunk); duplicate detection on md5 of the ordered "
    "chunk text.  One doc-keyed window + one (doc,chunk) aggregate + one "
    "hash-keyed frequency window — all hash-sized shuffles at 100 TB",
)
def cdc_chunk_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    tokp = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text")))
                    .alias("p0", "w"))
        .select(
            "doc_id", (F.col("p0") + 1).alias("p"), "w",
            F.when(
                F.conv(F.substring(F.md5("w"), 1, 8), 16, 10)
                 .cast("long") % _CDC_MOD == 0, 1
            ).otherwise(0).alias("b"),
        )
    )
    wdoc = (Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0))
    cids = tokp.withColumn("cid", F.sum("b").over(wdoc) - F.col("b"))
    chunks = cids.groupBy("doc_id", "cid").agg(
        F.count("*").cast("long").alias("n"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            )
        ).alias("h"),
    )
    freqd = chunks.withColumn(
        "freq", F.count("*").over(Window.partitionBy("h"))
    )
    return freqd.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.round(F.avg("n") + F.lit(1e-9), 6).alias("avg_chunk"),
        F.max("n").cast("long").alias("max_chunk"),
        F.sum(F.when(F.col("freq") > 1, 1).otherwise(0)).cast("long")
         .alias("n_dup_chunks"),
    )


_shared_sql(
    "merge_upsert_orders",
    """
    WITH src AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) + 1000 AS new_cents
      FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey + 100000000 AS k, 'I' AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) AS new_cents
      FROM orders WHERE o_orderkey % 13 = 0
    ), tgt AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), merged AS (
      -- SHUFFLE_HASH: full-outer cannot broadcast, and Spark defaults the
      -- stats-equal sides to sort-merge; the hint rides in a comment DuckDB
      -- ignores, keeping ONE shared text.  At 100 TB both sides bucket by k.
      SELECT /*+ SHUFFLE_HASH(s) */
             coalesce(s.k, t.k) AS k,
             CASE WHEN s.k IS NULL                  THEN 'keep'
                  WHEN s.op = 'D' AND t.k IS NOT NULL THEN 'delete'
                  WHEN t.k IS NULL                  THEN 'insert'
                  ELSE 'update' END AS action,
             CASE WHEN s.k IS NULL THEN t.cents ELSE s.new_cents END AS cents
      FROM tgt t FULL OUTER JOIN src s ON s.k = t.k
    )
    SELECT action,
           count(*)                         AS n,
           CAST(sum(cents) AS BIGINT)       AS total_cents,
           round(sum(cents) / CAST(100 AS DOUBLE), 2) AS total_price
    FROM merged
    GROUP BY action
    """,
    "MERGE INTO (upsert) emulated engine-agnostically — the Delta/Iceberg "
    "verb OSS Spark lacks — as ONE full-outer join between target and a "
    "deterministic CDC batch (updates %7, deletes %11 [delete wins on "
    "overlap], inserts on fresh keys %13), with WHEN MATCHED / NOT "
    "MATCHED arms as a CASE over the two join sides; per-action row and "
    "value totals make every arm's effect visible to the hash gate.  "
    "Money math is EXACT INTEGER CENTS end-to-end: round(price*100) to "
    "BIGINT once at the edge, integer sums are order-free — the float "
    "variant (round(x*1.1, 2) per row) diverged between engines on "
    "halfway rounding at sf0.01, caught by this gate.  "
    "Scale: at 100 TB both sides bucket by key for a co-located merge, "
    "or the CDC batch broadcasts when small — same plan either way",
)


@register(
    "unpivot_lineitem_metrics",
    """
    WITH m AS (
      SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric,
           count(*)            AS n,
           round(sum(v), 2)    AS total,
           round(avg(v), 6)    AS mean,
           round(min(v), 6)    AS vmin,
           round(max(v), 6)    AS vmax
    FROM m GROUP BY metric
    """,
    "UNPIVOT (wide -> long reshaping): Spark runs the NATIVE "
    "DataFrame.unpivot operator (one Expand node, single scan — not four "
    "self-unions re-reading the table), the oracle is the semantically "
    "equivalent UNION ALL; the differential proves the melt reshape "
    "itself.  At scale the Expand multiplies rows 4x in the map stage "
    "with one shuffle for the tiny per-metric aggregate",
)
def unpivot_lineitem_metrics(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    m = li.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "v",
    )
    return m.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("v"), 2).alias("total"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.min("v"), 6).alias("vmin"),
        F.round(F.max("v"), 6).alias("vmax"),
    )


@register(
    "bigram_logprob_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), uni AS (
      SELECT w, count(*) AS c1 FROM tok GROUP BY w
    ), vstats AS (
      SELECT count(*) AS v FROM uni
    ), bg AS (
      SELECT doc_id, t[p] AS w1, t[p + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p FROM toks)
    ), bgc AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), lp AS (
      SELECT b.w1, b.w2,
             CAST(round(ln((b.c2 + 1.0) / (u.c1 + s.v)) * 1e6) AS BIGINT)
               AS lp_micro
      FROM bgc b JOIN uni u ON b.w1 = u.w, vstats s
    ), per_doc AS (
      SELECT g.doc_id, count(*) AS n_bigrams,
             sum(l.lp_micro)::BIGINT AS sum_lp_micro
      FROM bg g JOIN lp l ON g.w1 = l.w1 AND g.w2 = l.w2
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_bigrams, sum_lp_micro,
           round(sum_lp_micro / (n_bigrams * 1e6) + 1e-9, 6) AS avg_logprob,
           round(exp(-round(sum_lp_micro / (n_bigrams * 1e6) + 1e-9, 6))
                 + 1e-9, 4) AS perplexity
    FROM per_doc
    """,
    "Bigram-LM document scoring — the KenLM-direction upgrade of "
    "unigram_logprob_docs: corpus bigram counts with add-one smoothing "
    "over P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V), per-bigram log-probs rounded "
    "to integer micro-nats BEFORE summation (order-free parity, same rule "
    "as unigram), per-doc average and perplexity.  Docs with < 2 tokens "
    "drop (no bigrams).  Two count aggregates + one doc rollup; the "
    "bigram LM table is Zipf-bounded and broadcasts here — at open-vocab "
    "100 TB the score join shuffles on (w1,w2) instead, same plan minus "
    "the hint",
)
def bigram_logprob_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    tok = staged.select("doc_id", F.explode("t").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c1"))
    vstats = uni.agg(F.count("*").alias("v"))
    # sequence(1, n) DESCENDS when n < 1 in Spark (range() in DuckDB is
    # simply empty) — guard short docs explicitly.
    pair_idx = F.when(
        F.size("t") < 2, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size("t") - 1))
    bg = staged.select(
        "doc_id", "t", F.explode(pair_idx).alias("p")
    ).select(
        "doc_id",
        F.element_at("t", F.col("p")).alias("w1"),
        F.element_at("t", F.col("p") + 1).alias("w2"),
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    lp = (
        bgc.join(F.broadcast(uni), bgc["w1"] == uni["w"]).drop("w")
        .crossJoin(F.broadcast(vstats))
        .select(
            "w1", "w2",
            F.round(
                F.log((F.col("c2") + F.lit(1.0))
                      / (F.col("c1") + F.col("v"))) * 1e6, 0
            ).cast("long").alias("lp_micro"),
        )
    )
    per_doc = (
        bg.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
    )
    avg = F.round(
        F.col("sum_lp_micro") / (F.col("n_bigrams") * F.lit(1e6))
        + F.lit(1e-9), 6,
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "sum_lp_micro", avg.alias("avg_logprob")
    ).withColumn(
        "perplexity", F.round(F.exp(-F.col("avg_logprob")) + F.lit(1e-9), 4)
    )


_RATE_ANOMALY_SQL = """
    WITH daily AS (
      SELECT user_id,
             CAST(hour(ts) AS BIGINT)   AS hr,
             date_trunc('day', ts)      AS day,
             count(*)                   AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id, CAST(hour(ts) AS BIGINT), date_trunc('day', ts)
    ), z AS (
      SELECT user_id, hr, c,
             count(*)   OVER w AS n_days,
             sum(c)     OVER w AS s1,
             sum(c * c) OVER w AS s2,
             max(c)     OVER w AS max_count
      FROM daily
      WINDOW w AS (PARTITION BY user_id, hr)
    )
    SELECT user_id,
           hr,
           CAST(max(n_days) AS BIGINT)    AS n_days,
           CAST(max(s1) AS BIGINT)        AS s1,
           CAST(max(s2) AS BIGINT)        AS s2,
           CAST(max(max_count) AS BIGINT) AS max_count,
           CAST(sum(CASE WHEN n_days * c - s1 > 0
                          AND (n_days * c - s1) * (n_days * c - s1)
                              > 9 * (n_days * s2 - s1 * s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_days
    FROM z
    GROUP BY user_id, hr
"""

_shared_sql(
    "events_rate_anomaly",
    _RATE_ANOMALY_SQL,
    "UEBA rate baselining — the SIEM behavioral layer above per-event "
    "rules: per (user, hour-of-day), daily event counts form the baseline "
    "and a day is anomalous when count > mean + 3*stddev.  The 3-sigma "
    "test is EXACT INTEGER arithmetic — c > S1/n + 3*sqrt((n*S2-S1^2))/n "
    "cross-multiplied to (n*c-S1)^2 > 9*(n*S2-S1^2) with a sign guard — "
    "so no float ever enters the decision and both engines agree bit-wise "
    "(sqrt/stddev would not).  Baseline moments ride ONE (user,hr)-keyed "
    "window over the tiny daily-count table (NULL users group as their "
    "own entity, no null-safe join needed — windows partition NULLs "
    "together in both engines).  Scale: the daily rollup is the only "
    "corpus-sized pass; baselines are users x 24 rows",
)


_shared_sql(
    "events_partial_merge",
    """
    WITH clean AS (
      SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day,
             CAST(round(value * 1e6) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), day_partial AS (
      SELECT wk, day, count(*) AS n, sum(v) AS s, min(v) AS lo, max(v) AS hi
      FROM clean GROUP BY wk, day
    ), merged AS (
      SELECT wk, CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
             min(lo) AS lo, max(hi) AS hi
      FROM day_partial GROUP BY wk
    ), direct AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
             min(v) AS lo, max(v) AS hi
      FROM clean GROUP BY wk
    )
    SELECT m.wk AS wk, m.n AS n, m.s AS sum_micro,
           m.lo AS vmin_micro, m.hi AS vmax_micro,
           (m.n = d.n AND m.s = d.s AND m.lo = d.lo AND m.hi = d.hi)
             AS partials_equal
    FROM merged m JOIN direct d ON m.wk = d.wk
    """,
    "Incremental-view-maintenance proof: weekly aggregates computed two "
    "ways — MERGED from persisted day-level partials (sum of n/s, min of "
    "lo, max of hi: the algebraic-aggregate merge a materialized rollup "
    "performs on refresh, never rescanning raw data) and DIRECT from raw "
    "rows — with the equality emitted as a column the oracle pins TRUE.  "
    "Values in integer micro-units so both paths and both engines sum "
    "order-free.  This is the exact-aggregate twin of the HLL/CMS "
    "mergeable-sketch rows: at 100 TB the day partials are the stored "
    "artifact and week/month/quarter all fold from them",
)


@register(
    "events_decayed_score",
    """
    WITH clean AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(round(value * 1e6) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), horizon AS (
      SELECT max(day) AS maxday FROM clean
    ), aged AS (
      SELECT user_id, v,
             least(CAST(date_diff('day', day, maxday) AS BIGINT) // 7, 62)
               AS k
      FROM clean, horizon
    )
    SELECT user_id,
           count(*)                    AS n_events,
           CAST(sum(v) AS BIGINT)      AS raw_micro,
           CAST(sum(v >> CAST(k AS INTEGER)) AS BIGINT) AS decayed_micro,
           round(sum(v >> CAST(k AS INTEGER)) / greatest(sum(v), 1)
                 + 1e-9, 6)            AS retention
    FROM aged GROUP BY user_id
    """,
    "Time-decayed engagement score (the feature-store 'decayed counter'): "
    "each event's value decays by half per 7 days of age at the corpus "
    "horizon — and the decay is an INTEGER RIGHT-SHIFT of micro-units "
    "(v >> floor(age/7d), capped at 62), a discretized exponential that "
    "keeps the whole aggregation order-free integer math; the float form "
    "(v * exp(-lambda*age)) cannot hash-match across engines because "
    "windowed float summation associates differently.  One corpus pass + "
    "a 1-row broadcast horizon; per-user sums shuffle once.  Weekly "
    "half-life steps are the tradeoff for exactness — documented, and at "
    "100 TB the shift table costs nothing",
)
def events_decayed_score(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clean = ev.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    horizon = clean.agg(F.max("day").alias("maxday"))
    aged = clean.crossJoin(F.broadcast(horizon)).select(
        "user_id", "v",
        F.least(
            (F.datediff("maxday", "day").cast("long") / F.lit(7))
            .cast("long"),
            F.lit(62),
        ).alias("k"),
    )
    # F.shiftright takes a literal bit count only — the per-row shift needs
    # the SQL form
    dec = F.expr("shiftright(v, CAST(k AS INT))")
    return aged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("long").alias("raw_micro"),
        F.sum(dec).cast("long").alias("decayed_micro"),
        F.round(
            F.sum(dec) / F.greatest(F.sum("v"), F.lit(1)) + F.lit(1e-9), 6
        ).alias("retention"),
    )


@register(
    "editdist_neardup_docs",
    _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), pre AS (
      SELECT doc_id, substr(coalesce(text, ''), 1, 80) AS pfx FROM documents
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS lev,
           round(1.0 - levenshtein(pa.pfx, pb.pfx)
                 / CAST(greatest(length(pa.pfx), length(pb.pfx), 1) AS DOUBLE)
                 + 1e-9, 6) AS sim
    FROM cand c
    JOIN pre pa ON c.id_a = pa.doc_id
    JOIN pre pb ON c.id_b = pb.doc_id
    """,
    "Edit-distance verification of LSH candidates — the character-level "
    "near-dup check (OCR noise, small in-place edits) that set-based "
    "Jaccard misses: Levenshtein over 80-char prefixes (bounding the "
    "O(len^2) DP per pair), normalized to a similarity.  Rides the shared "
    "persisted MinHash signature stage, so the quadratic work only ever "
    "touches LSH-bucketed candidates — never all pairs; text joins are "
    "shuffle-hash on doc_id (stats-less candidate frame).  At 100 TB the "
    "prefix cap is the knob: verify cost is pairs x cap^2, independent of "
    "document length",
)
def editdist_neardup_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    pre = docs.select(
        "doc_id",
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80)
         .alias("pfx"),
    )
    pa = pre.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"))
    pb = pre.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"))
    j = (
        pairs.join(pa.hint("shuffle_hash"), "id_a")
        .join(pb.hint("shuffle_hash"), "id_b")
    )
    lev = F.levenshtein("pa", "pb")
    return j.select(
        "id_a", "id_b",
        lev.cast("long").alias("lev"),
        F.round(
            F.lit(1.0)
            - lev / F.greatest(F.length("pa"), F.length("pb"), F.lit(1))
                     .cast("double")
            + F.lit(1e-9), 6,
        ).alias("sim"),
    )


@register(
    "triangle_count_docs",
    _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM cand e1
      JOIN cand e2 ON e1.id_b = e2.id_a
      JOIN cand e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ), nodes AS (
      SELECT a AS d FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT d AS doc_id, count(*) AS n_triangles
    FROM nodes GROUP BY d
    """,
    "Triangle counting on the LSH near-dup graph — the clustering- "
    "coefficient signal that separates tight duplicate cliques from "
    "chains of borderline matches (a clique's members close triangles; "
    "transitive false-positive chains do not).  Spark side runs the "
    "DEGREE-ORIENTED wedge algorithm: each undirected edge points from "
    "its (degree, id)-smaller endpoint, wedges form only at each "
    "triangle's minimum vertex, and one join against oriented edges "
    "closes them — every triangle found exactly once, and hub vertices "
    "generate O(sqrt(m)) wedges instead of O(d^2), the bound that makes "
    "the algorithm survive skewed similarity graphs at 100 TB.  The "
    "oracle brute-forces the a<b<c three-way join: identical triangle "
    "set, so the hash gate proves the oriented algorithm lossless",
)
def triangle_count_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    ).select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    sym = pairs.union(pairs.select(F.col("y").alias("x"),
                                   F.col("x").alias("y")))
    deg = sym.groupBy("x").agg(F.count("*").alias("dx"))
    # orient: (u, v) with (deg, id) of u strictly smaller
    e = (
        pairs.join(deg.hint("shuffle_hash"), "x")
        .join(
            deg.select(F.col("x").alias("y"), F.col("dx").alias("dy"))
               .hint("shuffle_hash"),
            "y",
        )
        .select(
            F.when((F.col("dx") < F.col("dy"))
                   | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))),
                   F.struct(F.col("x").alias("u"), F.col("dx").alias("du"),
                            F.col("y").alias("v"), F.col("dy").alias("dv")))
             .otherwise(
                   F.struct(F.col("y").alias("u"), F.col("dy").alias("du"),
                            F.col("x").alias("v"), F.col("dx").alias("dv")))
             .alias("o")
        )
        .select("o.u", "o.du", "o.v", "o.dv")
    )
    # the oriented edge list feeds THREE joins (two wedge sides + the
    # closing probe); without materialization each branch re-executes the
    # whole LSH bucket self-join lineage — measured 24.9 -> 3.9 s at
    # sf0.1.  Same checkpoint idiom as connected_components: real
    # checkpoint when the session has a dir, executor-local otherwise.
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    e = e.checkpoint(eager=True) if has_dir else e.localCheckpoint(eager=True)
    e1 = e.select(F.col("u"), F.col("v").alias("v1"),
                  F.col("dv").alias("d1"))
    e2 = e.select(F.col("u"), F.col("v").alias("v2"),
                  F.col("dv").alias("d2"))
    wedges = (
        e1.join(e2.hint("shuffle_hash"), "u")
        .filter(
            (F.col("d1") < F.col("d2"))
            | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
        )
    )
    closing = e.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["v1", "v2"])
    nodes = (
        tri.select(F.col("u").alias("d"))
        .union(tri.select(F.col("v1").alias("d")))
        .union(tri.select(F.col("v2").alias("d")))
    )
    return nodes.groupBy(F.col("d").alias("doc_id")).agg(
        F.count("*").alias("n_triangles")
    )


_shared_sql(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), trans AS (
      SELECT cur, nxt, count(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
      SELECT cur, sum(n) AS tn FROM trans GROUP BY cur
    )
    SELECT t.cur, t.nxt,
           CAST(t.n AS BIGINT) AS n,
           round(t.n / CAST(o.tn AS DOUBLE) + 1e-9, 6) AS p
    FROM trans t JOIN tot o ON t.cur = o.cur
    """,
    "First-order Markov transition matrix over per-user event sequences — "
    "the path-analysis primitive behind next-action prediction and "
    "anomalous-sequence detection: lead() within each user's (ts, "
    "event_id)-ordered stream (the unique tiebreak keeps both engines' "
    "orderings identical), transition counts, and row-normalized "
    "probabilities.  One user-keyed window + two tiny aggregates; the "
    "matrix is |event_types|^2 regardless of corpus size",
)


_CONV_LAG_SPARK = """
    WITH fv AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id
    ), conv AS (
      SELECT e.user_id,
             unix_timestamp(min(e.ts)) - unix_timestamp(f.first_view) AS lag_s
      FROM events e JOIN fv f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f.first_view
      GROUP BY e.user_id, f.first_view
    )
    SELECT count(*)                                        AS n_converted,
           CAST(min(lag_s) AS BIGINT)                      AS min_lag_s,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY lag_s), 6)
             AS median_lag_s,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY lag_s), 6)
             AS p75_lag_s,
           CAST(max(lag_s) AS BIGINT)                      AS max_lag_s
    FROM conv
"""


def _conv_lag_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_CONV_LAG_SPARK)


QUERIES["events_conversion_lag"] = CatalogQuery(
    _conv_lag_fn,
    _CONV_LAG_SPARK.replace(
        "unix_timestamp(min(e.ts)) - unix_timestamp(f.first_view)",
        "date_diff('second', f.first_view, min(e.ts))",
    ),
    "Conversion-lag funnel timing: per user, first 'view' then the first "
    "'purchase' at-or-after it; the lag distribution reported at exact "
    "dyadic percentiles (0.5, 0.75 — the percentile_prices "
    "representability rule) over INTEGER seconds.  One text modulo the "
    "epoch-difference dialect hole (unix_timestamp subtraction vs "
    "date_diff('second'), both = floor-second difference).  Two "
    "user-keyed aggregates + one join; the converted-user table is "
    "users-sized",
)


@register(
    "k_anonymity_docs",
    """
    WITH g AS (
      SELECT lang, source, count(*) AS n FROM documents
      GROUP BY lang, source
    ), tot AS (SELECT sum(n) AS t FROM g)
    SELECT g.lang, g.source,
           CAST(g.n AS BIGINT)                          AS n,
           (g.n < 5)                                    AS k_violation,
           round(g.n / CAST(o.t AS DOUBLE) + 1e-9, 6)   AS share
    FROM g g, tot o
    """,
    "k-anonymity audit over the quasi-identifier (lang, source) — the "
    "governance gate run before releasing corpus metadata: any "
    "equivalence class smaller than k=5 is a re-identification risk and "
    "flags k_violation (NULL attribute values form their own class, as "
    "GROUP BY does in both engines).  One aggregate; class table is "
    "cardinality-sized, the 1-row total broadcasts",
)
def k_anonymity_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("t"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang", "source",
        F.col("n").cast("long").alias("n"),
        (F.col("n") < 5).alias("k_violation"),
        F.round(F.col("n") / F.col("t").cast("double") + F.lit(1e-9), 6)
         .alias("share"),
    )


@register(
    "containment_pairs_docs",
    _duck_lsh_cte(3, 8, 2) + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.hs, b.hs)) AS inter,
             len(a.hs) AS na, len(b.hs) AS nb
      FROM cand c
      JOIN hsh a ON c.id_a = a.doc_id
      JOIN hsh b ON c.id_b = b.doc_id
    )
    SELECT id_a, id_b,
           round(inter / CAST(greatest(na, 1) AS DOUBLE) + 1e-9, 6)
             AS contain_a_in_b,
           round(inter / CAST(greatest(nb, 1) AS DOUBLE) + 1e-9, 6)
             AS contain_b_in_a,
           (inter >= CAST(0.8 * least(na, nb) AS BIGINT)
            AND least(na, nb) > 0) AS is_contained
    FROM scored
    WHERE inter > 0
    """,
    "Broder CONTAINMENT scoring of LSH candidates — the asymmetric "
    "near-dup measure Jaccard hides: a short doc quoted wholesale inside "
    "a long one has tiny Jaccard (union is huge) but containment "
    "|A∩B|/|A| ~ 1, which is how quotation/boilerplate-inclusion dedup "
    "decides to keep the superset and drop the subset.  Same shared "
    "signature stage and integer-array intersect as the Jaccard verify — "
    "only the denominator changes — and the is_contained gate "
    "cross-multiplies to integer arithmetic so no float enters the "
    "decision.  Scale identical to jaccard_pairs_docs: bucketed "
    "candidates only, never all pairs",
)
def containment_pairs_docs(spark, sf_dir):
    from .ops.dedup import candidate_pairs_from_buckets, lsh_buckets

    docs = _load_wide(spark, sf_dir, "documents")
    sigs = _dedup_stage(spark, sf_dir)
    cands = candidate_pairs_from_buckets(lsh_buckets(sigs, 8, 2))
    a, b = sigs.alias("a"), sigs.alias("b")
    j = (
        cands.join(a, cands.id_a == F.col("a.id"))
        .join(b, cands.id_b == F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    na, nb = F.col("a.nsh"), F.col("b.nsh")
    return (
        j.select(
            "id_a", "id_b", inter.alias("inter"),
            na.alias("na"), nb.alias("nb"),
        )
        .filter(F.col("inter") > 0)
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter") / F.greatest(F.col("na"), F.lit(1))
                                   .cast("double") + F.lit(1e-9), 6
            ).alias("contain_a_in_b"),
            F.round(
                F.col("inter") / F.greatest(F.col("nb"), F.lit(1))
                                   .cast("double") + F.lit(1e-9), 6
            ).alias("contain_b_in_a"),
            (
                (F.col("inter")
                 >= (F.lit(0.8) * F.least("na", "nb")).cast("long"))
                & (F.least("na", "nb") > 0)
            ).alias("is_contained"),
        )
    )


@register(
    "trimmed_mean_pandas",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), ranked AS (
      SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
             count(*)     OVER (PARTITION BY event_type)             AS n
      FROM v
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(n) - 2 * (max(n) // 10) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                          THEN vm ELSE 0 END)
                 / CAST(max(n) - 2 * (max(n) // 10) AS DOUBLE) / 1e6
                 + 1e-9, 6) AS trimmed_mean
    FROM ranked GROUP BY event_type
    """,
    "10%-trimmed mean per group via a GROUPED_AGG Arrow pandas UDF — the "
    "one Pandas-UDF flavor the catalog lacked (scalar, grouped-map, "
    "mapInPandas, stateful, and UDTF are covered elsewhere): the whole "
    "per-group series arrives as ONE Arrow batch, numpy sorts and trims "
    "floor(n/10) from each tail, and the sum stays exact int64 until a "
    "single final division — so the Python path hash-matches the "
    "oracle's rank-filtered SQL exactly (ties trim identically because "
    "equal values are interchangeable).  Scale: grouped-agg UDFs need "
    "each group in one executor's memory — right for group counts like "
    "event types, wrong for unbounded groups; the SQL twin in the oracle "
    "IS the unbounded-safe formulation, documented as the 100 TB path",
)
def trimmed_mean_pandas(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_sum_micro(v: pd.Series) -> float:
        a = v.sort_values().to_numpy()
        k = len(a) // 10
        kept = a[k: len(a) - k] if k else a
        # python-int sum: exact at any length (int64 would be too, here)
        return float(sum(int(x) for x in kept))

    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a pandas agg too
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    g = v.groupBy("event_type").agg(
        n_rows(F.col("vm")).alias("n"),
        trimmed_sum_micro(F.col("vm")).alias("ts_micro"),
    )
    n_kept = (F.col("n") - 2 * F.floor(F.col("n") / 10)).cast("long")
    return g.select(
        "event_type", "n", n_kept.alias("n_kept"),
        F.round(
            F.col("ts_micro") / n_kept.cast("double") / F.lit(1e6)
            + F.lit(1e-9), 6,
        ).alias("trimmed_mean"),
    )


@register(
    "zipf_slope_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), vocab AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), ranked AS (
      -- MILLI-units, not micro: the OLS moment sum(x*x) is ~(28e3)^2 = 8e8
      -- per row, safe in int64 to ~10^10 vocabulary terms; micro-units
      -- (~28e6 -> 8e14/row) overflow int64 near 1e4 terms, where ANSI
      -- Spark errors while DuckDB silently widens to HUGEINT — the same
      -- unit reduction events_seasonal_decompose documents
      SELECT CAST(round(ln(row_number() OVER (ORDER BY c DESC, tok)) * 1e3)
                  AS BIGINT) AS x,
             CAST(round(ln(c) * 1e3) AS BIGINT) AS y
      FROM vocab
    ), sums AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ranked
    )
    -- final cross-products in DOUBLE, not BIGINT: sx*sx and n*sxx pass
    -- int64 near 2.7e5 vocabulary terms (sx ~ 1e3*(n ln n - n) ~ 3.1e9 ->
    -- sx^2 ~ 9.7e18 > 2^63-1), a realistic corpus size where ANSI Spark /
    -- DuckDB overflow-error.  The int64 SUMS are exactly double-
    -- representable far past that scale and IEEE multiply/subtract/divide
    -- are engine-deterministic, so parity survives the widening.
    SELECT CAST(n AS BIGINT) AS n_vocab,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 + 1e-9, 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE) / n
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx / n) / 1e3 + 1e-9, 6) AS ln_intercept
    FROM sums
    """,
    "Zipf-slope corpus diagnostic: OLS fit of ln(freq) on ln(rank) over "
    "the vocabulary — natural text sits near slope -1, and a corpus that "
    "doesn't is synthetic, truncated, or template-spammed (this one fits "
    "~-0.3: flat shared vocab, honestly reported).  Parity design: each "
    "ln() is rounded to integer MILLI-units first (milli, not micro: the "
    "x*x moments must stay inside int64 out to ~1e10 vocabulary terms — "
    "micro-units overflow near 1e4, where ANSI Spark errors but DuckDB "
    "silently widens to HUGEINT), all OLS moments are then exact integer "
    "sums (order-free), and the slope is one double division at the end "
    "— the naive float Σln accumulation cannot hash-match across "
    "engines.  Rank ties break on the word itself, so both engines rank "
    "identically.  One token aggregate + one range-partitioned global "
    "rank over the vocabulary (ops/rank.global_row_number — the vocab is "
    "sublinear in corpus size but still 10^6-10^8 terms at 100 TB, too "
    "big for a single-partition WindowExec)",
)
def zipf_slope_docs(spark, sf_dir):
    from .ops.rank import global_row_number

    docs = _load_wide(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c"))
    )
    # milli-units (see oracle comment): keeps sum(x*x) inside int64 at any
    # realistic vocabulary size under ANSI mode
    ranked = global_row_number(
        vocab, [F.col("c").desc(), F.col("tok")], "_rn",
        part_key=-F.col("c"),
    ).select(
        F.round(F.log(F.col("_rn").cast("double")) * 1e3).cast("long")
         .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e3).cast("long")
         .alias("y"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # cross-products in DOUBLE (mirrors the oracle comment above): sx*sx
    # overflows int64 near 2.7e5 vocab terms; the int64 sums themselves are
    # exactly double-representable far beyond that, and IEEE arithmetic is
    # engine-deterministic, so widening keeps parity AND removes the
    # ANSI-overflow ceiling
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_vocab"),
        F.round(slope + F.lit(1e-9), 6).alias("zipf_slope"),
        F.round(
            (F.col("sy").cast("double") / F.col("n")
             - slope * F.col("sx") / F.col("n")) / F.lit(1e3)
            + F.lit(1e-9), 6,
        ).alias("ln_intercept"),
    )


@register(
    "multimodal_phash",
    None,  # decode is Pandas-UDF-backed; rows-only (values pinned by tests)
    "Perceptual near-duplicate IMAGES — the bridge from the multimodal "
    "family to the dedup family, as one composed DAG: deterministic PNGs "
    "(8 of them re-encoded with small pixel perturbations = planted "
    "near-dups) stream through the stdlib decode (decode_image_pixels) "
    "into phash_from_pixels (64-bit integer average-hash: 8x8 nearest "
    "sample grid, integer luma, mean threshold by cross-multiplication — "
    "no float anywhere) and the pairs come from phash_neardup's banded "
    "Hamming self-join (8 bit-bands; pigeonhole guarantees any pair "
    "within distance 6 shares a band, so candidates are lossless; "
    "bit_count(xor) verifies).  Exactly the simhash recipe applied to "
    "pixels.  Scale: only 64-bit hashes shuffle; decode stays on the "
    "executors",
)
def multimodal_phash(spark, sf_dir):
    from .ops.multimodal import (
        MEDIA_SCHEMA, decode_image_pixels, encode_png, phash_from_pixels,
        phash_neardup,
    )

    import hashlib

    def build():
        rows = []
        for i in range(24):
            w = h = 16
            # md5-expanded content: genuinely independent images (a linear
            # (i*a + j*b) % m ramp has the SAME slope for every i and its
            # phashes collide at Hamming ~1 — caught in dev)
            base = b"".join(
                hashlib.md5(f"{i}:{k}".encode()).digest()
                for k in range(w * h * 3 // 16)
            )
            rows.append((i, "image/png", bytearray(encode_png(w, h, 3, base)),
                         ("png", 0)))
            if i < 8:  # planted near-dup: push 3 SAMPLED pixels across the
                # mean (grid points of the 8x8 phash sample lattice, sx=2*gx,
                # sy=2*gy at 16x16) so the pair lands at Hamming 1-4, not 0 —
                # exercising the verify arm, not just band equality
                pert = bytearray(base)
                for gy, gx in ((1, 1), (3, 5), (6, 2)):
                    o = (2 * gy * w + 2 * gx) * 3
                    for ch in range(3):
                        pert[o + ch] = (pert[o + ch] + 120) % 256
                rows.append((100 + i, "image/png",
                             bytearray(encode_png(w, h, 3, bytes(pert))),
                             ("png", 0)))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    media = _media_fixture(spark, "phash32", 32, build)
    hashes = phash_from_pixels(decode_image_pixels(media))
    return phash_neardup(hashes, max_dist=6, bands=8)


_LSH_GAUGE_CAP = 500      # brute-force truth is the gauge's cost — cap it
_LSH_GAUGE_THRESH = 0.5
_LSH_GAUGE_CONFIGS = [(2, 8), (4, 4), (8, 2)]  # (bands, rows_per_band)


@register(
    "lsh_recall_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
      WHERE doc_id < {_LSH_GAUGE_CAP}
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM toks
    ), hsh AS (
      SELECT doc_id,
             list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
      FROM sh
    ), sig AS (
      SELECT doc_id, [{_duck_minhash_mins(16)}] AS g FROM hsh
    ), truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.hs, b.hs))::DOUBLE
            / greatest(len(a.hs) + len(b.hs)
                       - len(list_intersect(a.hs, b.hs)), 1)
            >= {_LSH_GAUGE_THRESH}
    ), cfg AS (
      SELECT * FROM (VALUES {", ".join(f"({nb}, {rpb})" for nb, rpb in _LSH_GAUGE_CONFIGS)})
        AS t(nb, rpb)
    ), buckets AS (
      SELECT s.doc_id, c.nb, c.rpb, u.b,
             md5(array_to_string(
               list_slice(s.g, u.b * c.rpb + 1, u.b * c.rpb + c.rpb), '|'))
               AS bucket
      FROM sig s, cfg c, (SELECT unnest(range(0, 8)) AS b) u
      WHERE u.b < c.nb
    ), cand AS (
      SELECT DISTINCT l.nb, l.rpb, l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.nb = r.nb AND l.b = r.b AND l.bucket = r.bucket
       AND l.doc_id < r.doc_id
    ), per AS (
      SELECT c.nb, c.rpb,
             count(*) AS n_candidates,
             sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      FROM cand c
      LEFT JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b
      GROUP BY c.nb, c.rpb
    ), tc AS (SELECT count(*) AS n_truth FROM truth)
    SELECT CAST(p.nb AS BIGINT)            AS bands,
           CAST(p.rpb AS BIGINT)           AS rows_per_band,
           CAST(p.n_candidates AS BIGINT)  AS n_candidates,
           CAST(tc.n_truth AS BIGINT)      AS n_truth,
           CAST(p.n_hits AS BIGINT)        AS n_hits,
           round(p.n_hits / CAST(greatest(tc.n_truth, 1) AS DOUBLE)
                 + 1e-9, 6)                AS recall
    FROM per p, tc
    """,
    "LSH band-configuration tuning gauge — the dedup twin of ann_recall: "
    "three band layouts (2x8 / 4x4 / 8x2) sliced from the SAME 16-hash "
    "signatures, each scored for candidate count and recall against "
    "brute-force exact shingle-Jaccard >= 0.5 truth (capped to doc_id < "
    "500: the truth is quadratic BY DEFINITION — that cost is the whole "
    "reason LSH exists, and the gauge pays it once on a slice to pick "
    "the config the full corpus then runs bucketed).  More rows per "
    "band -> fewer, more precise candidates; more bands -> higher "
    "recall, more candidates — the measured curve IS the tuning "
    "decision.  All three configs ride one signature stage",
)
def lsh_recall_docs(spark, sf_dir):
    from .ops.dedup import candidate_pairs_from_buckets, lsh_buckets

    sigs = _dedup_stage(spark, sf_dir).filter(
        F.col("id") < _LSH_GAUGE_CAP
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    union = F.greatest(
        F.col("a.nsh") + F.col("b.nsh") - inter, F.lit(1)
    )
    truth = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(inter.cast("double") / union >= _LSH_GAUGE_THRESH)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cands = None
    for nb, rpb in _LSH_GAUGE_CONFIGS:
        c = candidate_pairs_from_buckets(lsh_buckets(sigs, nb, rpb)).select(
            F.lit(nb).alias("bands"), F.lit(rpb).alias("rows_per_band"),
            "id_a", "id_b",
        )
        cands = c if cands is None else cands.unionAll(c)
    hit = truth.withColumn("hit", F.lit(1))
    per = (
        cands.join(F.broadcast(hit), ["id_a", "id_b"], "left")
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    tc = truth.agg(F.count("*").alias("n_truth"))
    return per.crossJoin(F.broadcast(tc)).select(
        F.col("bands").cast("long").alias("bands"),
        F.col("rows_per_band").cast("long").alias("rows_per_band"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(
            F.col("n_hits")
            / F.greatest(F.col("n_truth"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("recall"),
    )


_KCORE_K, _KCORE_ROUNDS = 2, 12


def _kcore_oracle() -> str:
    """Unrolled simultaneous-peel rounds (the PageRank-oracle precedent:
    standard SQL forbids aggregation in a recursive member, so a bounded
    loop unrolls literally)."""
    cte = _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), e0 AS (
      SELECT id_a AS x, id_b AS y FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    )"""
    # each e{i} is referenced three times per round (degree agg + both
    # semi-join sides); without MATERIALIZED DuckDB inlines the chain and
    # the expansion grows 3^rounds — "Too many open files" on the base
    # parquet was the symptom
    for i in range(_KCORE_ROUNDS):
        cte += f"""
    , d{i} AS (SELECT x, count(*) AS c FROM e{i} GROUP BY x)
    , k{i} AS (SELECT x FROM d{i} WHERE c >= {_KCORE_K})
    , e{i + 1} AS MATERIALIZED (
      SELECT e.x, e.y FROM e{i} e
      JOIN k{i} a ON e.x = a.x JOIN k{i} b ON e.y = b.x
    )"""
    n = _KCORE_ROUNDS
    return cte + f"""
    SELECT d.x AS doc_id,
           CAST(d.c AS BIGINT) AS core_degree,
           ((SELECT count(*) FROM e{n}) = (SELECT count(*) FROM e{n - 1}))
             AS converged
    FROM (SELECT x, count(*) AS c FROM e{n} GROUP BY x) d
    """


@register(
    "kcore_docs",
    _kcore_oracle(),
    f"2-core decomposition of the LSH near-dup graph — the noise filter "
    f"above connected components: a chain of borderline pairwise matches "
    f"is one 'cluster' to CC but has NO 2-core, while a genuine duplicate "
    f"clique survives peeling; membership separates them.  Simultaneous "
    f"peeling (drop every degree<{_KCORE_K} vertex each round) is "
    f"order-free, so both engines run the identical BOUNDED "
    f"{_KCORE_ROUNDS}-round loop — Spark as a DataFrame loop with "
    f"per-round checkpoint lineage truncation, the oracle unrolled as "
    f"chained CTEs (PageRank precedent) — and a 'converged' column "
    f"compares the last two rounds' edge counts so an instance needing "
    f"more rounds FLAGS itself instead of silently truncating.  Each "
    f"round is one degree aggregate + one semi-join pair, vertex-keyed at "
    f"any scale",
)
def kcore_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    e = pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    e = e.unionAll(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

    def _chk(df):
        return (df.checkpoint(eager=True) if has_dir
                else df.localCheckpoint(eager=True))

    e = _chk(e)
    prev_edges = None
    for _ in range(_KCORE_ROUNDS):
        prev_edges = e
        deg = e.groupBy("x").agg(F.count("*").alias("c"))
        keep = deg.filter(F.col("c") >= _KCORE_K).select("x")
        e = _chk(
            e.join(keep.hint("shuffle_hash"), "x")
            .join(
                keep.select(F.col("x").alias("y")).hint("shuffle_hash"),
                "y",
            )
            .select("x", "y")
        )
    converged = e.count() == prev_edges.count()
    return (
        e.groupBy("x")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(
            F.col("x").alias("doc_id"), "core_degree",
            F.lit(converged).alias("converged"),
        )
    )


_shared_sql(
    "events_assoc_rules",
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ), tot AS (
      SELECT count(DISTINCT user_id) AS n_users FROM ue
    ), item AS (
      SELECT event_type, count(*) AS n FROM ue GROUP BY event_type
    ), pair AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS n_both
      FROM ue a JOIN ue b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.lhs, p.rhs,
           CAST(p.n_both AS BIGINT) AS n_both,
           round(p.n_both / CAST(t.n_users AS DOUBLE) + 1e-9, 6)
             AS support,
           round(p.n_both / CAST(la.n AS DOUBLE) + 1e-9, 6)
             AS confidence,
           round((p.n_both * t.n_users)
                 / CAST(la.n * rb.n AS DOUBLE) + 1e-9, 6) AS lift
    FROM pair p
    JOIN item la ON p.lhs = la.event_type
    JOIN item rb ON p.rhs = rb.event_type
    CROSS JOIN tot t
    """,
    "Association rules over per-user behavior (market-basket on event "
    "types): support / confidence / lift for every directed type pair, "
    "all ratios derived from exact integer counts in one final "
    "projection (lift cross-multiplied before the single division).  "
    "The distinct (user, type) reduction is the only corpus-sized pass; "
    "pair counting self-joins the user-keyed distinct table and the "
    "item/total tables broadcast.  Lift > 1 = behavioral affinity, the "
    "recommender/cross-sell primitive",
)


_CUSUM_H_NUM, _CUSUM_H_DEN = 1, 2  # alarm threshold h = mean/2


@register(
    "events_cusum_shift",
    f"""
    WITH v AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), ref AS (
      -- exact integer FLOOR division: DuckDB's // truncates toward zero
      -- (-7 // 2 = -3) while the detector's k is defined as floor(mean)
      -- (-7/2 -> -4).  (s - pmod(s, c)) is exactly divisible by c, so the
      -- truncating // on the adjusted numerator IS floor division — no
      -- doubles involved, exact at any corpus size.
      SELECT (CAST(sum(vm) AS BIGINT)
              - ((CAST(sum(vm) AS BIGINT) % count(*)) + count(*)) % count(*))
             // count(*) AS k_micro
      FROM v
    ), p AS (
      SELECT event_type, ts, event_id,
             sum(vm - k_micro) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS prefix
      FROM v, ref
    ), p2 AS (
      -- nested window functions are illegal in both engines: the running
      -- min over the prefix column needs its own stage
      SELECT event_type, ts, prefix,
             min(prefix) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_min
      FROM p
    ), s AS (
      SELECT event_type, ts,
             prefix - least(run_min, 0) AS cusum,
             (SELECT (k_micro * {_CUSUM_H_NUM}
                      - ((k_micro * {_CUSUM_H_NUM} % {_CUSUM_H_DEN})
                         + {_CUSUM_H_DEN}) % {_CUSUM_H_DEN})
                     // {_CUSUM_H_DEN} FROM ref)
               AS h
      FROM p2
    )
    SELECT event_type,
           count(*)                                   AS n_events,
           CAST(max(cusum) AS BIGINT)                 AS cusum_max,
           CAST(sum(CASE WHEN cusum > h THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_alarms,
           date_trunc('second', min(CASE WHEN cusum > h THEN ts END))
                                                      AS first_alarm_ts
    FROM s GROUP BY event_type
    """,
    "CUSUM mean-shift detection per event type — the sequential "
    "change-point detector behind drift alarms: S_i = max(0, S_i-1 + "
    "(x_i - k)) rewritten as prefix_i - min(0, running_min(prefix)) so "
    "the RECURSION becomes two window functions over one ordered "
    "partition — and everything is INTEGER micro-units (reference k = "
    "integer-floor corpus mean, threshold h = k/2 in integer division), "
    "so the running extremes are exact in both engines where a float "
    "recursion could never hash-match.  Planted-shift test proves the "
    "alarm fires and localizes the change; uniform corpus yields its "
    "honest baseline alarm rate.  One corpus pass + one type-keyed "
    "window",
)
def events_cusum_shift(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    # exact integer FLOOR division (k = floor(mean)): (s - pmod(s, c)) is
    # exactly divisible by c, so truncating `div` on it IS floor — matches
    # the oracle's pmod-adjusted // form bit-for-bit, including negative
    # corpus means, with no double rounding at any corpus size
    ref = v.agg(
        F.expr(
            "(CAST(sum(vm) AS BIGINT)"
            " - pmod(CAST(sum(vm) AS BIGINT), count(*))) div count(*)"
        ).alias("k_micro")
    )
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    p = (
        v.crossJoin(F.broadcast(ref))
        .withColumn("prefix", F.sum(F.col("vm") - F.col("k_micro")).over(w))
        .withColumn("run_min", F.min("prefix").over(w))
        .withColumn(
            "h",
            F.expr(
                f"(k_micro * {_CUSUM_H_NUM}"
                f" - pmod(k_micro * {_CUSUM_H_NUM}, {_CUSUM_H_DEN}))"
                f" div {_CUSUM_H_DEN}"
            ),
        )
    )
    s = p.withColumn(
        "cusum", F.col("prefix") - F.least(F.col("run_min"), F.lit(0))
    )
    return s.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("cusum").cast("long").alias("cusum_max"),
        F.sum(F.when(F.col("cusum") > F.col("h"), 1).otherwise(0))
         .cast("long").alias("n_alarms"),
        F.date_trunc(
            "second",
            F.min(F.when(F.col("cusum") > F.col("h"), F.col("ts"))),
        ).alias("first_alarm_ts"),
    )


@register(
    "keywords_per_doc",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w
    ), n_docs AS (
      SELECT count(*) AS n FROM toks WHERE len(t) > 0
    ), df AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w
    ), idf AS (
      SELECT w, CAST(round(ln(n / CAST(df AS DOUBLE)) * 1e6) AS BIGINT)
               AS idf_micro
      FROM df, n_docs
    ), scored AS (
      SELECT t.doc_id, t.w, t.tf * i.idf_micro AS score_micro,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf * i.idf_micro DESC, t.w)
               AS rank
      FROM tf t JOIN idf i ON t.w = i.w
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS term,
           CAST(score_micro AS BIGINT) AS score_micro
    FROM scored WHERE rank <= 3
    """,
    "Per-document keyword extraction: top-3 terms by tf*idf where idf is "
    "rounded to integer micro-nats FIRST so the score is an exact "
    "integer product and the (score desc, term) ranking is bit-stable in "
    "both engines — float tf-idf ties break differently per engine and "
    "cannot gate.  The corpus-level tfidf_top_terms answers 'what is "
    "this corpus about'; this answers 'what is each DOC about' — the "
    "tagging/routing primitive.  One tf aggregate + broadcast idf + one "
    "doc-keyed window",
)
def keywords_per_doc(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    tok = staged.select("doc_id", F.explode("t").alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    n_docs = staged.filter(F.size("t") > 0).agg(F.count("*").alias("n"))
    df = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = df.crossJoin(F.broadcast(n_docs)).select(
        "w",
        F.round(F.log(F.col("n") / F.col("df").cast("double")) * 1e6)
         .cast("long").alias("idf_micro"),
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        "doc_id", "w",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    rank = F.row_number().over(
        Window.partitionBy("doc_id")
        .orderBy(F.col("score_micro").desc(), F.col("w"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("term"),
            F.col("score_micro").cast("long").alias("score_micro"),
        )
    )


_shared_sql(
    "events_seasonal_decompose",
    """
    WITH v AS (
      -- MILLI-units, not micro: the variance moments square vm and sum
      -- over the corpus; micro^2 sums overflow int64 (Spark ANSI errors,
      -- DuckDB silently widens to HUGEINT) — milli keeps n*sum(vm^2)
      -- comfortably inside both engines' exact integer range
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(round(value * 1e3) AS BIGINT) AS vm
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), season AS (
      SELECT event_type, hr, vm,
             count(*) OVER w AS sn,
             sum(vm)  OVER w AS ss
      FROM v
      WINDOW w AS (PARTITION BY event_type, hr)
    ), resid AS (
      SELECT event_type,
             vm,
             vm - CAST(floor(ss / CAST(sn AS DOUBLE)) AS BIGINT) AS r
      FROM season
    )
    SELECT event_type,
           count(*)                                        AS n,
           CAST(sum(vm) AS BIGINT)                         AS sum_milli,
           CAST(sum(r) AS BIGINT)                          AS resid_sum,
           round(1.0
                 - (count(*) * sum(r * r) - sum(r) * sum(r))
                   / CAST(greatest(count(*) * sum(vm * vm)
                                   - sum(vm) * sum(vm), 1) AS DOUBLE)
                 + 1e-9, 6)                                AS var_explained
    FROM resid GROUP BY event_type
    """,
    "Seasonal decomposition (the hour-of-day component): subtract each "
    "(type, hour)'s integer-floor mean and report the variance the "
    "seasonal profile explains — computed from exact integer moments "
    "(n*sum(r^2) - sum(r)^2 over n*sum(v^2) - sum(v)^2, one double "
    "division at the end), so the whole decomposition is order-free.  "
    "Hourly means ride one (type,hr) window; a synthetic uniform corpus "
    "honestly explains ~0.  The model-residual shape UEBA baselining "
    "(events_rate_anomaly) thresholdss on counts; this decomposes "
    "values",
)


_QNORM_K = 16  # map each source onto the pooled distribution at 16 ranks


@register(
    "quantile_normalize_docs",
    f"""
    WITH s AS (
      SELECT doc_id, source, n_chars FROM documents
      WHERE n_chars IS NOT NULL
    ), ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*)    OVER (PARTITION BY source)        AS ns
      FROM s
    ), pooled AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS pr
      FROM s
    ), np AS (SELECT count(*) AS n FROM s)
    SELECT k.doc_id, k.source, k.n_chars,
           CAST(k.r AS BIGINT) AS src_rank,
           p.n_chars AS normalized
    FROM ranked k
    JOIN np ON true
    JOIN pooled p
      ON p.pr = ((2 * k.r - 1) * np.n + k.ns) // (2 * k.ns)
    """,
    "Quantile normalization across sources — the batch-effect correction "
    "training mixtures need when one source's quality/length scores run "
    "systematically hot: each document's value is replaced by the POOLED "
    "distribution's value at the same relative rank.  The rank mapping "
    "is pure integer arithmetic (midpoint rule (2r-1)n_pool/(2n_src) "
    "rounded via integer +den/2 trick), so engine parity is exact — no "
    "interpolated quantiles anywhere.  Unique (value, doc_id) orderings "
    "make both row_number()s deterministic.  Scale: the pooled rank is "
    "GLOBAL, so it runs on ops/rank.global_row_number — the two-pass "
    "range-partitioned rank (sampled split points via repartitionByRange, "
    "rank within ranges, broadcast per-range offsets) — never a "
    "single-partition WindowExec; exact, so the oracle is unchanged",
)
def quantile_normalize_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    from .ops.rank import global_row_number

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    ).select("doc_id", "source", "n_chars")
    ranked = docs.select(
        "doc_id", "source", "n_chars",
        F.row_number().over(
            Window.partitionBy("source").orderBy("n_chars", "doc_id")
        ).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = global_row_number(docs, ["n_chars", "doc_id"], "pr").select(
        F.col("n_chars").alias("p_chars"), "pr"
    )
    np_ = docs.agg(F.count("*").alias("n"))
    j = ranked.crossJoin(F.broadcast(np_)).withColumn(
        "target",
        ((2 * F.col("r") - 1) * F.col("n") + F.col("ns"))
        / (2 * F.col("ns")),
    ).withColumn("target", F.floor(F.col("target")).cast("long"))
    return (
        j.join(pooled.hint("shuffle_hash"), j["target"] == pooled["pr"])
        .select(
            "doc_id", "source", "n_chars",
            F.col("r").cast("long").alias("src_rank"),
            F.col("p_chars").alias("normalized"),
        )
    )


def _rho_case_sql(col: str) -> str:
    """rho (HLL leading-zero rank) of a 32-bit hash as a CASE chain of
    integer comparisons — bit-exact in any engine, no log2 float whose
    rounding at exact powers of two could flip a bucket."""
    branches = "\n             ".join(
        f"WHEN {col} >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    )
    return f"(CASE {branches} ELSE 33 END)"


_HLL_M = 256  # 2^8 buckets


@register(
    "hll_scratch_events",
    f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS bucket,
             ('0x' || substr(md5(user_id::VARCHAR), 3, 8))::BIGINT AS hv
      FROM events WHERE user_id IS NOT NULL
    ), rho AS (
      SELECT bucket, max({_rho_case_sql('hv')}) AS r FROM h GROUP BY bucket
    ), s AS (
      -- EMPTY registers hold value 0 and contribute 2^0 = 1 each to the
      -- indicator sum (scaled: 2^33) — summing only hit buckets inflated
      -- the estimate 8.5x (1281 vs 150 true), caught by the honesty cols
      SELECT CAST(sum(CAST(2 AS BIGINT) ** (33 - r)) AS BIGINT)
             + (256 - count(*)) * 8589934592 AS ssum,
             count(*) AS nz
      FROM rho
    ), est AS (
      -- alpha*m^2*2^33 precomputed in one double literal: DuckDB types a
      -- 0.718365 * 256 * ... chain as DECIMAL and overflows its product
      SELECT ssum, nz,
             round(404403543289500.8 / ssum) AS raw_est,
             {_HLL_M} - nz AS v
      FROM s
    ), final AS (
      SELECT CAST(CASE WHEN raw_est < 2.5 * {_HLL_M} AND v > 0
                  THEN round({_HLL_M} * ln({_HLL_M} / CAST(v AS DOUBLE)))
                  ELSE raw_est END AS BIGINT) AS hll_estimate,
             CAST(ssum AS BIGINT) AS s_scaled,
             CAST(nz AS BIGINT) AS n_buckets_hit
      FROM est
    )
    SELECT f.hll_estimate, f.s_scaled, f.n_buckets_hit,
           t.true_distinct,
           round(abs(f.hll_estimate - t.true_distinct)
                 / CAST(greatest(t.true_distinct, 1) AS DOUBLE)
                 + 1e-9, 6) AS rel_error
    FROM final f,
         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
          FROM events WHERE user_id IS NOT NULL) t
    """,
    "HyperLogLog built FROM SCRATCH relationally — the sketch INTERNALS "
    "under an EXACT differential gate, which no library HLL can offer: "
    "because the hash is deterministic md5, bucket (first md5 byte), "
    "rank (leading-zero CASE chain — no log2() float whose rounding at "
    "exact powers of two could flip a bucket), the integer-scaled "
    "indicator sum Σ2^(33-ρ), the bias-corrected estimate AND the "
    "small-range linear-counting branch (exercised here: 150 users << "
    "2.5m) are all bit-identical across engines — the gate hash-matches "
    "the whole sketch, not a tolerance band (contrast "
    "events_hll_rollup's bounded oracle over Spark's opaque library "
    "sketch).  True count and relative error emitted for honesty.  One "
    "hash pass + a 256-row rollup; the rho table IS the mergeable "
    "partial a 100 TB store persists",
)
def hll_scratch_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    md5 = F.md5(F.col("user_id").cast("string"))
    h = ev.select(
        F.conv(F.substring(md5, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(md5, 3, 8), 16, 10).cast("long").alias("hv"),
    )
    rho_expr = "CASE " + " ".join(
        f"WHEN hv >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    ) + " ELSE 33 END"
    rho = h.groupBy("bucket").agg(
        F.max(F.expr(rho_expr)).alias("r")
    )
    s = rho.agg(
        F.sum(F.expr("CAST(pow(2, 33 - r) AS BIGINT)")).cast("long")
         .alias("__hit"),
        F.count("*").alias("nz"),
    ).select(
        # empty registers contribute 2^(33-0) each — see oracle comment
        (F.col("__hit")
         + (F.lit(_HLL_M) - F.col("nz")) * F.lit(8589934592).cast("long"))
        .cast("long").alias("ssum"),
        "nz",
    )
    est = s.select(
        "ssum", "nz",
        F.round(F.lit(404403543289500.8) / F.col("ssum")).alias("raw_est"),
        (F.lit(_HLL_M) - F.col("nz")).alias("v"),
    )
    final = est.select(
        F.when(
            (F.col("raw_est") < 2.5 * _HLL_M) & (F.col("v") > 0),
            F.round(
                F.lit(float(_HLL_M))
                * F.log(F.lit(float(_HLL_M)) / F.col("v").cast("double"))
            ),
        ).otherwise(F.col("raw_est")).cast("long").alias("hll_estimate"),
        F.col("ssum").cast("long").alias("s_scaled"),
        F.col("nz").cast("long").alias("n_buckets_hit"),
    )
    truth = ev.agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    return final.crossJoin(F.broadcast(truth)).select(
        "hll_estimate", "s_scaled", "n_buckets_hit", "true_distinct",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("true_distinct"))
            / F.greatest(F.col("true_distinct"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("rel_error"),
    )


@register(
    "compress_ratio_docs",
    None,  # zlib has no SQL twin; rows-only (values pinned by a local test)
    "Compression-ratio quality signal — the cheap repetition detector "
    "production filters use beside Gopher stats (boilerplate and spam "
    "compress far better than natural text): zlib level-6 deflate per "
    "document in an Arrow-batched pandas UDF, emitting raw/compressed "
    "lengths and the ratio.  The corpus-level twin of what "
    "repetition_docs measures structurally; a doc compressing below "
    "~0.3 is near-certainly templated.  Scale: pure map work, no "
    "shuffle; bytes stay on executors, only two ints and a ratio return",
)
def compress_ratio_docs(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress((t or "").encode("utf-8"), 6))
        )

    docs = _load_wide(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
         .alias("raw_len"),
        comp_len(F.col("text")).alias("comp_len"),
    )
    return out.select(
        "doc_id", "raw_len", "comp_len",
        F.round(
            F.col("comp_len")
            / F.greatest(F.col("raw_len"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("ratio"),
    )


_shared_sql(
    "events_theilsen_trend",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('day', ts)
    ), idx AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS d
      FROM daily
    ), slopes AS (
      SELECT a.event_type,
             CAST(round((b.c - a.c) * 1e6
                        / CAST(b.d - a.d AS DOUBLE)) AS BIGINT)
               AS slope_micro
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.d < b.d
    )
    SELECT event_type,
           count(*) AS n_pairs,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY slope_micro)
                 / 1e6 + 1e-9, 6) AS theilsen_slope,
           CAST(min(slope_micro) AS BIGINT) AS min_slope_micro,
           CAST(max(slope_micro) AS BIGINT) AS max_slope_micro
    FROM slopes GROUP BY event_type
    """,
    "Theil-Sen robust trend per event type — the median of all pairwise "
    "day-slopes, immune to the outlier days that wreck OLS: each slope "
    "is micro-rounded to an INTEGER before the median, whose "
    "interpolation sits at the exactly-representable 0.5 (the dyadic "
    "rule), so the whole estimator gates exactly.  Day pairs are "
    "days-squared per type (~400 here) — the classic bound; at longer "
    "horizons the repeated-median or sampled variant bounds it, same "
    "shape.  One daily rollup + one within-type pair join",
)


@register(
    "multimodal_phash_clusters",
    None,  # composed Pandas-UDF decode; rows-only (pinned by phash tests)
    "The image-dedup ENDGAME as one DAG: decode -> perceptual hash -> "
    "banded Hamming pairs -> connected components -> cluster sizes.  "
    "Composes multimodal_phash's planted fixture with the same "
    "large-star/small-star CC the text dedup family uses — proving the "
    "clustering layer is modality-agnostic: it consumes (id_a, id_b) "
    "pairs and never knows pixels produced them.  Output: one row per "
    "multi-image cluster with its size (the 8 planted pairs -> 8 "
    "clusters of 2)",
)
def multimodal_phash_clusters(spark, sf_dir):
    from .ops.dedup import connected_components

    pairs = multimodal_phash(spark, sf_dir)
    verts = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cc = connected_components(
        verts, pairs.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")),
    )
    return (
        cc.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .select(F.col("cluster").alias("cluster_id"), "cluster_size")
    )


_shared_sql(
    "window_rank_showcase",
    """
    WITH r AS (
      SELECT o_orderpriority,
             o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ntile(4) OVER w                          AS quartile,
             round(percent_rank() OVER w + 1e-9, 6)   AS pct_rank,
             round(cume_dist() OVER w + 1e-9, 6)      AS cume,
             dense_rank() OVER w                      AS drank
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY round(o_totalprice * 100), o_orderkey)
    )
    SELECT o_orderpriority,
           CAST(quartile AS BIGINT)       AS quartile,
           count(*)                       AS n,
           CAST(sum(cents) AS BIGINT)     AS cents_total,
           round(min(pct_rank), 6)        AS min_pct_rank,
           round(max(cume), 6)            AS max_cume,
           CAST(max(drank) AS BIGINT)     AS max_dense_rank
    FROM r GROUP BY o_orderpriority, quartile
    """,
    "The ranking-function family not exercised elsewhere — ntile, "
    "percent_rank, cume_dist, dense_rank over one named window — rolled "
    "to per-(priority, quartile) aggregates.  Rank-derived ratios are "
    "exact rationals ((rank-1)/(n-1), rank/n) so the doubles are "
    "deterministic; the (cents, orderkey) ordering is unique, making "
    "ntile's boundary assignment identical in both engines; money "
    "aggregated in integer cents.  One window + one rollup on the same "
    "partitioning",
)


_shared_sql(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY vm) AS m
      FROM v GROUP BY event_type
    ), dev AS (
      -- floor() BEFORE the BIGINT cast: percentile_cont interpolates, so m
      -- can be *.5, and a bare double->BIGINT cast diverges across engines
      -- (DuckDB rounds half away from zero, Spark truncates).  floor() is
      -- identical in both; the cast of an integral double is then exact.
      SELECT v.event_type, v.vm,
             CAST(abs(v.vm - CAST(floor(med.m) AS BIGINT)) AS BIGINT) AS ad,
             CAST(floor(med.m) AS BIGINT) AS m
      FROM v JOIN med ON v.event_type = med.event_type
    ), mad AS (
      SELECT event_type, m,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
      FROM dev GROUP BY event_type, m
    )
    -- BROADCAST: mad is group-cardinality-sized but percentile aggs leave
    -- it stats-less, defaulting this join to sort-merge (plan audit); the
    -- hint rides in a comment DuckDB ignores
    SELECT /*+ BROADCAST(a) */
           d.event_type,
           count(*)                         AS n,
           CAST(d.m AS BIGINT)              AS median_micro,
           CAST(floor(a.mad) AS BIGINT)     AS mad_micro,
           CAST(sum(CASE WHEN abs(d.vm - d.m) * 10000
                          > 3 * 14826 * CAST(floor(a.mad) AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type, d.m, a.mad
    """,
    "MAD (median absolute deviation) robust outlier flagging — the "
    "third member of the robust-stats family beside winsorized means "
    "and Theil-Sen: a point is an outlier when |x - median| > 3 * "
    "1.4826 * MAD, and the test is CROSS-MULTIPLIED to integers "
    "(|x-m| * 10000 > 3 * 14826 * MAD) so the sigma-equivalence "
    "constant never becomes a float in the decision.  Both medians sit "
    "at the dyadic 0.5; values in integer micro-units.  Note the "
    "deliberate subtlety: percentile_cont interpolates between two "
    "integers, so the median can be *.5 — and a bare double->BIGINT "
    "cast is ENGINE-DIVERGENT on halves (DuckDB rounds half away from "
    "zero, Spark truncates), so both m and MAD go through an explicit "
    "floor() first, which is identical everywhere.  Two group-keyed "
    "aggregates + one broadcast join back",
)


_shared_sql(
    "events_benford_check",
    """
    WITH digits AS (
      SELECT substr(CAST(CAST(round(value * 100) AS BIGINT) AS STRING),
                    1, 1) AS d
      FROM events
      WHERE value IS NOT NULL AND value >= 1
    ), obs AS (
      SELECT d, count(*) AS n FROM digits GROUP BY d
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
    expected AS (
      -- log10(1+1/d) in integer TEN-THOUSANDTHS: the chi-square numerator
      -- (n*1e4 - pe4*t)^2 is then an EXACT integer and the term is ONE
      -- double division — a float p*t recomputed under different engine
      -- type promotions diverged by 1 ulp at sf0.001 (0.063840 vs
      -- 0.063841), caught by the gate.  Exact up to ~1M rows (then the
      -- squared numerator would need the next unit down).
      SELECT * FROM (VALUES
        ('1', 3010), ('2', 1761), ('3', 1249),
        ('4', 969),  ('5', 792),  ('6', 669),
        ('7', 580),  ('8', 512),  ('9', 458)
      ) AS e(d, pe4)
    )
    SELECT e.d AS digit,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n,
           round(coalesce(o.n, 0) / CAST(t.t AS DOUBLE) + 1e-9, 6)
             AS observed_p,
           round(e.pe4 / 10000.0 + 1e-9, 6) AS benford_p,
           round((coalesce(o.n, 0) * 10000 - e.pe4 * t.t)
                 * (coalesce(o.n, 0) * 10000 - e.pe4 * t.t)
                 / (CAST(e.pe4 AS DOUBLE) * t.t * 10000) + 1e-9, 6)
             AS chi2_term
    FROM expected e
    LEFT JOIN obs o ON e.d = o.d
    CROSS JOIN tot t
    """,
    "Benford's-law first-digit audit — the classic fraud/fabrication "
    "screen for financial and count data: observed first-digit "
    "frequencies against log10(1+1/d) expectations with per-digit "
    "chi-square contributions (sum them and compare to the chi2(8) "
    "critical value; a uniform synthetic corpus fails Benford loudly, "
    "which is itself the honest result here).  The first digit comes "
    "from the INTEGER-CENTS string, not float formatting — engines "
    "render doubles differently but render BIGINTs identically — and "
    "values < 1 are excluded (their cents first-digit is not their "
    "value's first significant digit; documented boundary).  One "
    "digit aggregate; expectation table is 9 literal rows",
)


_ABC_ORACLE = """
    WITH rev AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cust, cents,
             sum(cents) OVER (ORDER BY cents DESC, cust
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(cents) OVER ()                          AS total_cents
      FROM rev
    ), classed AS (
      -- total_cents rides along as a column (it is constant across rows);
      -- round 5 removed a `classed CROSS JOIN (SELECT DISTINCT
      -- total_cents...)` here — Spark planned it as a BNLJ that broadcast
      -- the O(customers) classed side instead of the 1-row distinct,
      -- exactly the unbounded-broadcast shape the plan invariant forbids
      SELECT cust, cents, total_cents,
             CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                  WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           count(*)                     AS n_customers,
           CAST(sum(cents) AS BIGINT)   AS cents,
           round(sum(cents) / CAST(max(total_cents) AS DOUBLE) + 1e-9, 6)
             AS revenue_share
    FROM classed
    GROUP BY abc
    """


@register(
    "customer_abc_analysis",
    _ABC_ORACLE,
    "ABC / Pareto revenue classification — the inventory-and-account "
    "management classic: customers ranked by revenue, class A = the head "
    "covering 80% of cumulative revenue, B to 95%, C the tail.  Class "
    "boundaries are CROSS-MULTIPLIED integer comparisons "
    "(cum*100 <= total*80) on exact cent sums, so classification never "
    "touches a float; the (cents desc, cust) ordering is unique so the "
    "running sum is identical in both engines.  The global ordered "
    "cumulative sum (and the grand total riding beside it) runs on "
    "ops/rank.global_cumsum — two skew-free shuffles, no "
    "single-partition WindowExec — so the customer-cardinality pass "
    "survives 100x where the old `sum() OVER (ORDER BY ...)` funneled "
    "every customer through one partition",
)
def customer_abc_analysis(spark, sf_dir):
    from .ops.rank import global_cumsum

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = global_cumsum(
        rev, [F.col("cents").desc(), F.col("cust")], "cents",
        "cum_cents", part_key=-F.col("cents"), total_col="total_cents",
    )
    classed = ranked.withColumn(
        "abc",
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
        F.round(
            F.sum("cents") / F.max("total_cents").cast("double") + F.lit(1e-9),
            6,
        ).alias("revenue_share"),
    )


_shared_sql(
    "events_wau_stickiness",
    """
    WITH d AS (
      SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day,
             user_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), dau AS (
      SELECT wk, day, count(DISTINCT user_id) AS dau
      FROM d GROUP BY wk, day
    ), wau AS (
      SELECT wk, count(DISTINCT user_id) AS wau FROM d GROUP BY wk
    )
    SELECT w.wk AS wk,
           CAST(w.wau AS BIGINT)                        AS wau,
           CAST(count(*) AS BIGINT)                     AS n_days,
           CAST(sum(a.dau) AS BIGINT)                   AS dau_sum,
           round(sum(a.dau) / CAST(count(*) AS DOUBLE) + 1e-9, 6)
             AS avg_dau,
           round(sum(a.dau)
                 / CAST(count(*) * w.wau AS DOUBLE) + 1e-9, 6)
             AS stickiness
    FROM wau w JOIN dau a ON w.wk = a.wk
    GROUP BY w.wk, w.wau
    """,
    "DAU/WAU engagement and the stickiness ratio (avg daily actives over "
    "weekly actives — the product-analytics health metric): exact "
    "distinct counts per day and week, ratios derived from integer sums "
    "with single final divisions.  Two distinct aggregates on the same "
    "(week)-aligned partitioning; at 100 TB this is the query the "
    "persisted HLL partials (events_hll_rollup / events_partial_merge) "
    "answer without rescanning raw events — the exact form here IS the "
    "oracle for that approximation",
)


_RFM_ORACLE = """
    WITH base AS (
      SELECT o_custkey AS cust,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT cust, frequency, cents,
             ntile(4) OVER (ORDER BY last_order DESC, cust) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, cust)  AS f,
             ntile(4) OVER (ORDER BY cents DESC, cust)      AS m
      FROM base
    )
    SELECT r, f, m,
           count(*)                    AS n_customers,
           CAST(sum(cents) AS BIGINT)  AS cents,
           CAST(min(frequency) AS BIGINT) AS min_freq,
           CAST(max(frequency) AS BIGINT) AS max_freq
    FROM scored
    GROUP BY r, f, m
    """


@register(
    "customer_rfm_segments",
    _RFM_ORACLE,
    "RFM segmentation — the CRM workhorse: every customer quartile-scored "
    "on Recency (latest order first), Frequency, and Monetary value "
    "(exact cents), rolled to the 4x4x4 segment grid with per-segment "
    "counts and revenue.  Each ntile ordering carries the unique cust "
    "tiebreak, so quartile boundaries are engine-identical; money never "
    "leaves integer cents.  The three global quartilings chain "
    "ops/rank.global_ntile (range-partitioned rank + the exact "
    "first-rem-buckets-one-larger formula, differential-tested against "
    "SQL ntile) — no single-partition WindowExec; the fact-table pass "
    "is just the per-customer aggregate",
)
def customer_rfm_segments(spark, sf_dir):
    from .ops.rank import global_ntile

    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    # three tiles each computed from BASE and joined on cust (not chained:
    # chaining would make each boundary-sketch pass recompute its
    # predecessors), with ONE combined boundaries_for pass instead of
    # three per-tile sketch jobs over the orders aggregate
    from .ops.rank import boundaries_for

    part_keys = {
        # ntz has no numeric cast; ltz->double is monotone in the
        # timestamp, which is all bucketing needs
        "r": -F.col("last_order").cast("timestamp_ltz").cast("double"),
        "f": -F.col("frequency").cast("double"),
        "m": -F.col("cents").cast("double"),
    }
    bnds = boundaries_for(base, part_keys)

    def tile(col, name):
        return global_ntile(
            base.select("cust", col),
            [F.col(col).desc(), F.col("cust")],
            4, name, part_key=part_keys[name], boundaries=bnds[name],
        ).select("cust", name)

    scored = (
        base
        .join(tile("last_order", "r"), "cust")
        .join(tile("frequency", "f"), "cust")
        .join(tile("cents", "m"), "cust")
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
        F.min("frequency").cast("long").alias("min_freq"),
        F.max("frequency").cast("long").alias("max_freq"),
    )


_shared_sql(
    "part_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), n_orders AS (
      SELECT count(DISTINCT ok) AS n FROM items
    ), part_n AS (
      SELECT pk, count(*) AS n FROM items GROUP BY pk
    ), pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_both
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT p.p1, p.p2,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(a.n AS BIGINT)      AS n_p1,
           CAST(b.n AS BIGINT)      AS n_p2,
           round((p.n_both * o.n)
                 / CAST(a.n * b.n AS DOUBLE) + 1e-9, 6) AS lift
    FROM pairs p
    JOIN part_n a ON p.p1 = a.pk
    JOIN part_n b ON p.p2 = b.pk
    CROSS JOIN n_orders o
    WHERE p.n_both >= 3
    """,
    "Market-basket pairs on the REAL basket structure (parts co-purchased "
    "within an order) — the canonical affinity mine, complementing "
    "events_assoc_rules' behavioral variant: within-order self-join on "
    "the deduplicated (order, part) table, support floor n_both >= 3, "
    "lift cross-multiplied before its single division.  Scale: the "
    "self-join is order-keyed (baskets are small, the join fans out "
    "per-basket quadratically in basket SIZE, not order count) and the "
    "part-frequency side broadcasts — the exact shape A-Priori's first "
    "pass runs at any scale",
)


@register(
    "events_exact_quantiles",
    """
    WITH v AS (
      SELECT CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p75
    FROM v
    """,
    "EXACT global percentile_cont over the full corpus — the ground-truth "
    "complement to the approximate sketches (events_median_sketch's "
    "histogram, percentile_approx): ops/rank.global_quantiles_exact ranks "
    "every row with the two-pass range-partitioned rank, then one "
    "conditional grand aggregate picks the straddling positions and "
    "interpolates.  Values in integer micro-units and dyadic q make the "
    "interpolation exactly double-representable, so DuckDB "
    "percentile_cont parity is bit-exact — an EXACT distributed global "
    "quantile, hash-gated, with no single-partition sort anywhere (the "
    "shape a naive sort-then-index implementation gets wrong at scale)",
)
def events_exact_quantiles(spark, sf_dir):
    from .ops.rank import global_quantiles_exact

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 1e6).cast("long").alias("vm"),
            "event_id",
        )
    )
    qx = global_quantiles_exact(ev, "vm", "event_id", [0.25, 0.5, 0.75])
    return qx.select(
        "n",
        F.round(F.col("p25") / 1e6 + F.lit(1e-9), 6).alias("p25"),
        F.round(F.col("p50") / 1e6 + F.lit(1e-9), 6).alias("p50"),
        F.round(F.col("p75") / 1e6 + F.lit(1e-9), 6).alias("p75"),
    )


@register(
    "curriculum_stages_docs",
    f"""
    WITH t AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS n_toks FROM documents
    ), staged AS (
      SELECT doc_id, n_toks,
             ntile(4) OVER (ORDER BY n_toks, doc_id) AS stage
      FROM t
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_toks) AS BIGINT) AS min_toks,
           CAST(max(n_toks) AS BIGINT) AS max_toks,
           CAST(sum(n_toks) AS BIGINT) AS total_toks
    FROM staged GROUP BY stage
    """,
    "Curriculum staging — order the corpus easiest-first (token count "
    "ascending, the classic length-based curriculum proxy) and cut it "
    "into 4 equal training stages with per-stage token budgets: the "
    "corpus-ordering pass a curriculum-learning pipeline runs before "
    "writing stage manifests.  The global ordering runs on "
    "ops/rank.global_ntile (range-partitioned two-pass, no "
    "single-partition window), with the unique doc_id tiebreak making "
    "stage boundaries engine-identical; token counts share "
    "token_counts_docs' whitespace parity rules.  One rank pass + one "
    "4-group rollup",
)
def curriculum_stages_docs(spark, sf_dir):
    from .ops.rank import global_ntile

    docs = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_toks")
    )
    staged = global_ntile(docs, ["n_toks", "doc_id"], 4, "stage")
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_toks").cast("long").alias("min_toks"),
        F.max("n_toks").cast("long").alias("max_toks"),
        F.sum("n_toks").cast("long").alias("total_toks"),
    )


@register(
    "customer_frequency_ranks",
    """
    WITH base AS (
      SELECT o_custkey AS cust, count(*) AS freq
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT freq,
             rank()       OVER (ORDER BY freq DESC) AS rnk,
             dense_rank() OVER (ORDER BY freq DESC) AS drnk
      FROM base
    )
    SELECT freq, rnk, drnk, CAST(count(*) AS BIGINT) AS n_customers
    FROM ranked GROUP BY freq, rnk, drnk
    """,
    "Tie-aware global leaderboard: every customer ranked by order count "
    "with BOTH rank() (gaps after tie groups) and dense_rank() — order "
    "counts are heavily tied (a few dozen distinct values over all "
    "customers), so this pins ops/rank.global_rank's tie semantics "
    "end-to-end against the SQL window functions: tie groups never span "
    "range buckets (equal part keys share a bucket), making "
    "local-rank + prior-bucket row count (rank) / prior-bucket DISTINCT "
    "count (dense) exact.  Output rolled to one row per tie group",
)
def customer_frequency_ranks(spark, sf_dir):
    from .ops.rank import boundaries_for, global_rank

    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pk = -F.col("freq").cast("double")
    bnds = boundaries_for(base, {"k": pk})["k"]
    order = [F.col("freq").desc()]
    rk = global_rank(base, order, "rnk", part_key=pk, boundaries=bnds)
    dr = global_rank(
        base, order, "drnk", dense=True, part_key=pk, boundaries=bnds,
    )
    return (
        rk.select("cust", "freq", "rnk")
        .join(dr.select("cust", "drnk"), "cust")
        .groupBy("freq", "rnk", "drnk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


@register(
    "corpus_shuffle_shards",
    """
    WITH keyed AS (
      SELECT doc_id,
             md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ), ranked AS (
      SELECT doc_id, shuffle_key,
             CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                  AS BIGINT) AS pos,
             CAST(ntile(16) OVER (ORDER BY shuffle_key, doc_id) - 1
                  AS INT) AS shard
      FROM keyed
    )
    SELECT doc_id, shuffle_key, pos, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY pos)
                AS BIGINT) AS shard_pos
    FROM ranked
    """,
    "Deterministic global corpus shuffle + contiguous shard split "
    "(ops/rank.shuffled_shards): md5(seed:id) keys give a replayable "
    "permutation (identical hex in Spark and DuckDB, so the oracle "
    "replays the EXACT order), global position via the range-partitioned "
    "row_number (part key = leading 15 hex digits via conv — monotone in "
    "the key's byte order, and uniform, so buckets self-balance under any "
    "id skew), shard id from the exact ntile arithmetic and shard_pos "
    "from its closed-form inverse — one sketch pass + one bucketed window "
    "shuffle, no single-partition sort.  This is the 'shuffle the corpus, "
    "split into n training files' step every LLM pipeline ends with",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.rank import shuffled_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffled_shards(docs, "doc_id", seed=42, n_shards=16)


@register(
    "drift_psi_docs",
    """
    WITH tagged AS (
      SELECT CAST(floor(n_chars / 64) AS BIGINT) AS bin_chars,
             lang AS bin_lang,
             substring(md5('7:' || CAST(doc_id AS VARCHAR)), 32, 1) < '8'
               AS is_ref
      FROM documents
    ), nc AS (
      SELECT bin_chars,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rn,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cn
      FROM tagged GROUP BY 1
    ), nct AS (
      SELECT rn, cn, sum(rn) OVER () AS tr, sum(cn) OVER () AS tc,
             count(*) OVER () AS nb
      FROM nc
    ), lc AS (
      SELECT bin_lang,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rn,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cn
      FROM tagged GROUP BY 1
    ), lct AS (
      SELECT rn, cn, sum(rn) OVER () AS tr, sum(cn) OVER () AS tc,
             count(*) OVER () AS nb
      FROM lc
    ), scored AS (
      SELECT 'n_chars' AS feature, CAST(max(nb) AS BIGINT) AS n_bins,
             sum(((cn + 0.5) / (tc + 0.5 * nb)
                  - (rn + 0.5) / (tr + 0.5 * nb))
                 * ln(((cn + 0.5) / (tc + 0.5 * nb))
                      / ((rn + 0.5) / (tr + 0.5 * nb)))) AS raw_psi
      FROM nct
      UNION ALL
      SELECT 'lang', CAST(max(nb) AS BIGINT),
             sum(((cn + 0.5) / (tc + 0.5 * nb)
                  - (rn + 0.5) / (tr + 0.5 * nb))
                 * ln(((cn + 0.5) / (tc + 0.5 * nb))
                      / ((rn + 0.5) / (tr + 0.5 * nb))))
      FROM lct
    )
    SELECT feature, n_bins, round(raw_psi + 1e-9, 6) AS psi,
           CASE WHEN raw_psi < 0.1 THEN 'stable'
                WHEN raw_psi < 0.25 THEN 'moderate'
                ELSE 'shifted' END AS verdict
    FROM scored
    """,
    "Corpus drift between two snapshots (ops/quality.drift_psi): "
    "Population Stability Index over a binned doc-length feature and the "
    "lang categorical, snapshots split by an md5 hash bit (deterministic "
    "in both engines).  Laplace-smoothed p = (n+0.5)/(N+0.5*bins) keeps "
    "empty bins defined; conventional <0.1/<0.25 verdict thresholds.  "
    "Scale shape: ONE map-side-combining aggregate over the corpus per "
    "feature, then arithmetic over the <= n_bins frame — no joins, no "
    "data-sized windows.  The pre-mix QA gate for crawl snapshot drift",
)
def drift_psi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.quality import drift_psi

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        F.floor(F.col("n_chars") / 64).cast("long").alias("bin_chars"),
        F.col("lang").alias("bin_lang"),
        (
            F.substring(
                F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"))),
                32, 1,
            ) < "8"
        ).alias("is_ref"),
    )
    return drift_psi(tagged, "bin_chars", feature_name="n_chars").unionByName(
        drift_psi(tagged, "bin_lang", feature_name="lang")
    )


# --- threat-intel CIDR enrichment (longest-prefix match) -------------------
# The feed is engineered so the overlap semantics fire at every sf: user_ids
# 0..14 exist even at sf0.001, and ip = knuth_hash(user_id) is deterministic
# in both engines, so nested prefixes around hash(7) = 83.132.83.215 and
# hash(1) = 158.55.121.177 guarantee multi-length matches that only
# longest-prefix-wins resolves; hash(3) pins the /32 (shift-by-zero) edge.
_CIDR_FEED = [  # (dotted_cidr, label, severity)
    ("83.0.0.0/8", "cdn", 1),
    ("83.132.0.0/16", "scanner", 2),
    ("83.132.83.0/24", "tor-exit", 3),
    ("158.0.0.0/8", "cloud", 1),
    ("158.55.0.0/16", "botnet-c2", 4),
    ("0.0.0.0/8", "bogon", 2),
    ("8.0.0.0/8", "cloud", 1),
    ("218.166.109.19/32", "honeypot", 5),
]


def _cidr_parse(entry):
    net, _, ln = entry[0].partition("/")
    a, b, c, d = (int(x) for x in net.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d, int(ln)


def _cidr_feed_values_sql() -> str:
    rows = []
    for entry in _CIDR_FEED:
        p, ln = _cidr_parse(entry)
        div = 1 << (32 - ln)
        rows.append(f"({p // div}, {div}, {ln}, '{entry[1]}', {entry[2]})")
    return ",\n      ".join(rows)


@register(
    "events_cidr_enrich",
    f"""
    WITH feed(trunc, divisor, prefix_len, label, severity) AS (VALUES
      {_cidr_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.severity, f.prefix_len,
             row_number() OVER (
               PARTITION BY e.event_id ORDER BY f.prefix_len DESC
             ) AS rn
      FROM ev e LEFT JOIN feed f ON (e.ip // f.divisor) = f.trunc
    )
    SELECT label, severity, prefix_len AS matched_len,
           count(*)               AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, severity, prefix_len
    """,
    "Threat-intel enrichment via longest-prefix-match CIDR join "
    "(ops/enrich.cidr_lpm_join): every event IP (a Knuth multiplicative "
    "hash of user_id — deterministic in both engines) joined against a "
    "feed of overlapping networks, most specific prefix wins — "
    "IP-routing semantics, the real-feed generalization of the Sigma "
    "|cidr modifier's single-network text match "
    "(sigma/compiler.py:307; the reference surface has no feed join at "
    "all).  Spark: one LEFT broadcast hash join per distinct mask "
    "length (feed side truncated + deduped, payload as an atomic "
    "struct), label = length-descending coalesce — ZERO shuffles on the "
    "event side, no explode, no per-event window; the oracle's "
    "row_number-over-prefix_len formulation is the semantics spec.  "
    "Unmatched events surface as the NULL-label row, so coverage is "
    "audited in the same result",
)
def events_cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.enrich import cidr_lpm_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296))
        .alias("ip"),
    )
    feed = spark.createDataFrame(
        [(*_cidr_parse(e), e[1], e[2]) for e in _CIDR_FEED],
        "prefix_int long, prefix_len int, label string, severity int",
    )
    enriched = cidr_lpm_join(ev, feed, "ip", ["label", "severity"])
    return enriched.groupBy(
        "label", "severity", "matched_len"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- geo-IP / ASN range enrichment (narrowest-range-wins) ------------------
# Arbitrary (non-CIDR-aligned) inclusive ranges over the same deterministic
# knuth_hash(user_id) IP space as events_cidr_enrich, engineered so the
# overlap semantics fire at every sf (user_ids 0..14 exist at sf0.001):
#   hash(7)=1401181143  in rir-apnic ⊃ asn-transit ⊃ vpn-exit (3-deep nest,
#                        none CIDR-aligned — narrowest range must win)
#   hash(1)=2654435761  in geo-de AND geo-fr (EQUAL span 101 — the start
#                        tie-break decides)
#   hash(3)=3668339987  single-address sinkhole (span-1 /32 block edge)
#   hash(0)=0           bogon-low start-of-space edge
#   internet [0,2^32-1] catch-all — the /0 single-block edge; every event
#                        matches it, so it wins exactly when nothing
#                        narrower does (no NULL row in this query)
_RANGE_FEED = [  # (ip_start, ip_end, label, kind)
    (1400000000, 1500000000, "rir-apnic", "rir"),
    (1401181000, 1401182000, "asn-transit", "asn"),
    (1401181100, 1401181150, "vpn-exit", "vpn"),
    (2654435700, 2654435800, "geo-de", "geo"),
    (2654435711, 2654435811, "geo-fr", "geo"),
    (3668339987, 3668339987, "sinkhole", "sinkhole"),
    (0, 100000000, "bogon-low", "bogon"),
    (147000000, 148000000, "cdn-edge", "cdn"),
    (387276000, 387277000, "iot-botnet", "botnet"),
    (0, 4294967295, "internet", "default"),
]


def _range_feed_values_sql() -> str:
    return ",\n      ".join(
        f"({s}, {e}, '{lb}', '{k}')" for s, e, lb, k in _RANGE_FEED
    )


@register(
    "events_ip_range_enrich",
    f"""
    WITH feed(s, e, label, kind) AS (VALUES
      {_range_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.kind,
             f.e - f.s + 1 AS span,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY f.e - f.s + 1, f.s, f.label, f.kind
             ) AS rn
      FROM ev e LEFT JOIN feed f ON e.ip BETWEEN f.s AND f.e
    )
    SELECT label, kind, span AS matched_span,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, kind, span
    """,
    "Geo-IP/ASN-style enrichment via NARROWEST-RANGE-WINS interval join "
    "(ops/enrich.ip_range_join): event IPs against a feed of arbitrary — "
    "deliberately non-CIDR-aligned — overlapping [start,end] allocations; "
    "the smallest span wins, ties broken by start (geo-de vs geo-fr pins "
    "the tie).  Complements events_cidr_enrich: range-level specificity, "
    "not block-level — a narrow range must beat a wide range even where "
    "the wide range's covering block has the longer prefix.  Spark: each "
    "range decomposes feed-side into its <=62 maximal aligned CIDR blocks "
    "(Arrow pandas UDF), blocks group per length into per-bucket candidate "
    "lists, then one one-to-one LEFT broadcast join per distinct block "
    "length; the winner is picked per event by a codegen'd "
    "array_sort-by-(span,start,payload) expression — ZERO shuffles on the "
    "event side, no explode fan-out, no per-event window; the oracle's "
    "BETWEEN-join + row_number formulation is the semantics spec.  The "
    "[0,2^32-1] catch-all exercises the /0 single-block edge and makes "
    "every event resolve",
)
def events_ip_range_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.enrich import ip_range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296))
        .alias("ip"),
    )
    feed = spark.createDataFrame(
        _RANGE_FEED, "ip_start long, ip_end long, label string, kind string"
    )
    enriched = ip_range_join(ev, feed, "ip", ["label", "kind"])
    return enriched.groupBy("label", "kind", "matched_span").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- domain-suffix enrichment (deepest-zone-wins) --------------------------
# Deterministic domains derived from user_id residues so both engines build
# the identical corpus: h{u%7}.s{u%3}.example{u%5}.com.  The feed nests
# com ⊃ example3.com ⊃ s2.example3.com ⊃ h1.s2.example3.com (u ≡ 8 mod 105
# hits all four — u=8 exists at every sf, so the full depth chain fires at
# sf0.001); 'net' never matches (all domains are .com) and the 'com'
# catch-all makes every event resolve, exercising the depth-1 edge.
_DOMAIN_FEED = [  # (suffix, label, category)
    ("com", "tld-generic", "tld"),
    ("net", "tld-unused", "tld"),
    ("example3.com", "zone-three", "zone"),
    ("example1.com", "zone-one", "zone"),
    ("s2.example3.com", "sub-two", "subzone"),
    ("h1.s2.example3.com", "host-pin", "host"),
]


def _domain_feed_values_sql() -> str:
    return ",\n      ".join(
        f"('{s}', {s.count('.') + 1}, '{lb}', '{k}')"
        for s, lb, k in _DOMAIN_FEED
    )


@register(
    "events_domain_enrich",
    f"""
    WITH feed(suffix, n_labels, label, category) AS (VALUES
      {_domain_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             'h' || CAST(user_id % 7 AS VARCHAR)
             || '.s' || CAST(user_id % 3 AS VARCHAR)
             || '.example' || CAST(user_id % 5 AS VARCHAR)
             || '.com' AS domain
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.category, f.n_labels,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY f.n_labels DESC, f.suffix
             ) AS rn
      FROM ev e LEFT JOIN feed f
        ON e.domain = f.suffix OR e.domain LIKE '%.' || f.suffix
    )
    SELECT label, category, n_labels AS matched_labels,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, category, n_labels
    """,
    "DNS blocklist/zone-reputation enrichment via DEEPEST-ZONE-WINS "
    "suffix join (ops/enrich.domain_suffix_join) — the DNS sibling of "
    "events_cidr_enrich: a feed entry matches its exact domain and every "
    "subdomain at a dot boundary, overlapping zones resolve by label "
    "depth (com ⊂ example3.com ⊂ s2.example3.com ⊂ h1.s2.example3.com, "
    "the full nest firing at every sf).  Spark: one LEFT broadcast join "
    "per distinct feed depth, probe key = the domain's last-L-labels "
    "suffix (split/slice/array_join, codegen'd), atomic payload struct, "
    "depth-descending coalesce; feed slices built in one checkpointed "
    "pass with the deterministic min(struct) duplicate pick — ZERO "
    "event-side shuffles, no explode, no per-event window.  The "
    "oracle's LIKE-'%.suffix' + row_number-by-depth formulation is the "
    "semantics spec; 'net' pins the never-matching entry and the 'com' "
    "catch-all the depth-1 edge",
)
def events_domain_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.enrich import domain_suffix_join

    u = F.col("user_id")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.concat(
            F.lit("h"), (u % 7).cast("string"),
            F.lit(".s"), (u % 3).cast("string"),
            F.lit(".example"), (u % 5).cast("string"),
            F.lit(".com"),
        ).alias("domain"),
    )
    feed = spark.createDataFrame(
        _DOMAIN_FEED, "suffix string, label string, category string"
    )
    enriched = domain_suffix_join(ev, feed, "domain", ["label", "category"])
    return enriched.groupBy("label", "category", "matched_labels").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- mergeable HDR-histogram quantiles -------------------------------------


@register(
    "lineitem_hdr_quantiles",
    """
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    vb AS (
      SELECT grp, cents,
             CASE WHEN cents < 64 THEN 0
                  ELSE length(bin(cents)) - 6 END AS shift
      FROM v
    ),
    sk AS (
      SELECT grp, shift, (cents >> shift) AS m, count(*) AS cnt
      FROM vb GROUP BY grp, shift, m
    ),
    allsk AS (
      SELECT grp, shift, m, cnt FROM sk
      UNION ALL
      SELECT 'ALL' AS grp, shift, m, SUM(cnt) AS cnt
      FROM sk GROUP BY shift, m
    ),
    cum AS (
      SELECT grp,
             (m << shift) + (((CAST(1 AS BIGINT) << shift) - 1) >> 1) AS est,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY (m << shift)) AS c,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM allsk
    ),
    q(q_pct) AS (VALUES (50), (90), (99))
    SELECT c.grp, q.q_pct,
           CAST(min(c.n) AS BIGINT) AS n_rows,
           min(c.est)               AS est
    FROM cum c CROSS JOIN q
    WHERE c.c * 100 >= q.q_pct * c.n
    GROUP BY c.grp, q.q_pct
    """,
    "Per-returnflag p50/p90/p99 of extended price via the MERGEABLE "
    "HDR-histogram sketch (ops/sketch.py) — exponent + 32-sub-bucket "
    "integer binning (rel. error <= 1/32), bucketed with "
    "length(bin(v))-style pure integer arithmetic so the sketch is "
    "bit-identical in Spark and DuckDB (any float-log binning flips "
    "boundary buckets on 1-ulp libm differences).  The 'ALL' rows are "
    "produced by MERGING the per-flag sketches (counts just add — the "
    "property percentile_approx lacks) while the oracle computes 'ALL' "
    "directly over the raw rows: the hash-match IS the mergeability "
    "proof, oracle-checked.  One map-side-combining pass builds the "
    "sketch (localCheckpoint'd, <= groups x 64 x 32 rows); windows and "
    "rank extraction run over that bounded frame, never over the data — "
    "at 100 TB the only data-sized op is the initial aggregate",
)
def lineitem_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sketch import hdr_merge, hdr_quantiles, hdr_sketch

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    sk = hdr_sketch(li, "cents", ["grp"], sub_bits=5)
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    sk = (sk.checkpoint(eager=True) if has_dir
          else sk.localCheckpoint(eager=True))
    merged = hdr_merge(sk, []).select(
        F.lit("ALL").alias("grp"), "shift", "m", "cnt"
    )
    both = sk.unionByName(merged)
    return hdr_quantiles(both, ["grp"], [50, 90, 99])


@register(
    "events_hdr_weekly_rollup",
    """
    WITH v AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE value >= 0
    ),
    vb AS (
      SELECT wk, cents,
             CASE WHEN cents < 64 THEN 0
                  ELSE length(bin(cents)) - 6 END AS shift
      FROM v
    ),
    sk AS (
      SELECT wk, shift, (cents >> shift) AS m, count(*) AS cnt
      FROM vb GROUP BY wk, shift, m
    ),
    cum AS (
      SELECT wk,
             (m << shift) + (((CAST(1 AS BIGINT) << shift) - 1) >> 1) AS est,
             SUM(cnt) OVER (PARTITION BY wk ORDER BY (m << shift)) AS c,
             SUM(cnt) OVER (PARTITION BY wk) AS n
      FROM sk
    ),
    q(q_pct) AS (VALUES (50), (95))
    SELECT c.wk, q.q_pct,
           CAST(min(c.n) AS BIGINT) AS n_rows,
           min(c.est)               AS est
    FROM cum c CROSS JOIN q
    WHERE c.c * 100 >= q.q_pct * c.n
    GROUP BY c.wk, q.q_pct
    """,
    "Weekly p50/p95 of event value via HIERARCHICAL sketch rollup — the "
    "operational shape mergeability exists for: Spark builds DAILY HDR "
    "sketches (one map-side-combining pass over the events), then the "
    "week frames are a plain SUM-merge of the day frames (hdr_merge — "
    "no second pass over the data), while the oracle computes the "
    "weekly sketch DIRECTLY from the raw rows.  The hash-match proves "
    "the day→week merge is lossless at a second granularity beyond "
    "lineitem_hdr_quantiles' group→ALL roll-up.  At 100 TB this is the "
    "incremental-percentile pattern: persist tiny per-day frames, "
    "answer any week/month/quarter percentile by summing frames — the "
    "raw data is read once per day, ever",
)
def events_hdr_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sketch import hdr_merge, hdr_quantiles, hdr_sketch

    # the HDR binning is defined on NON-NEGATIVE integers (bit-length
    # bucketing has no two's-complement branch, deliberately — see
    # ops/sketch.py); the value metric's domain is declared explicitly
    # here so both engines agree on it (negative-mean fuzz corpora)
    daily = load_table(spark, sf_dir, "events").filter(
        F.col("value") >= 0
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    dsk = hdr_sketch(daily, "cents", ["day"], sub_bits=5)
    wsk = hdr_merge(
        dsk.withColumn(
            "wk", F.date_trunc("week", F.col("day"))
        ),
        ["wk"],
    )
    return hdr_quantiles(wsk, ["wk"], [50, 95])


@register(
    "events_attribution",
    """
    WITH t AS (
      SELECT event_id, ts, user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS) OVER w AS t_ts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER w
               AS t_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN t_ts >= ts - INTERVAL 7 DAY THEN t_type
                ELSE 'direct' END AS channel,
           count(*) AS n_purchases,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM t
    WHERE event_type = 'purchase'
    GROUP BY CASE WHEN t_ts >= ts - INTERVAL 7 DAY THEN t_type
                  ELSE 'direct' END
    """,
    "last-touch marketing attribution: each purchase's revenue goes to the "
    "most recent preceding view/click by the same user within a 7-day "
    "lookback, else 'direct'.  ONE user-keyed window (last ... IGNORE "
    "NULLS over the preceding frame) finds the touch without a "
    "self-join — at 100 TB this is a single hash shuffle on user_id with "
    "O(1) per-row state, where the naive events-x-events as-of self-join "
    "would shuffle the table twice.  Revenue in integer cents so the "
    "per-channel sums are order-free; both window columns null together, "
    "so the 7-day CASE needs no separate presence flag",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the batch leg of the streaming operator (one source of truth for the
    # window form; batch==stream pinned in tests/test_stateful.py)
    from .streaming.stateful import attribution_events

    per_purchase = attribution_events(load_table(spark, sf_dir, "events"))
    return per_purchase.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("value_cents").cast("long").alias("revenue_cents"),
    )


@register(
    "events_ohlc_bars",
    """
    WITH b AS (
      SELECT date_trunc('hour', ts) AS bar_hour, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT bar_hour, event_type,
           CAST(min(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           CAST(min(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b
    GROUP BY bar_hour, event_type
    """,
    "hourly OHLC bars per event type — the time-series downsampling every "
    "metrics store runs.  Spark computes open/close with min_by/max_by "
    "over a (ts, event_id) ORDER STRUCT in the SAME single "
    "hash-aggregate as high/low/count (one map-side-combining shuffle, "
    "no window, no sort), where the oracle needs two window passes — "
    "the argmin-in-aggregate form is the one that scales.  Integer "
    "cents; (ts, event_id) is a total order so open/close are unique",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.struct("ts", "event_id").alias("ord"),
    )
    return ev.groupBy("bar_hour", "event_type").agg(
        F.min_by("cents", F.col("ord")).cast("long").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", F.col("ord")).cast("long").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "events_value_histogram",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL
    ), ext AS (
      SELECT min(cents) AS mn, max(cents) AS mx FROM c
    ), binned AS (
      SELECT event_type, mn, mx,
             CASE WHEN mx > mn
                  THEN least(15, CAST(floor((cents - mn) * 16.0 / (mx - mn))
                                      AS BIGINT))
                  ELSE 0 END AS bin
      FROM c CROSS JOIN ext
    )
    SELECT event_type, CAST(bin AS INT) AS bin,
           CAST(mn + floor(bin * (mx - mn) / 16.0) AS BIGINT) AS lo_cents,
           count(*) AS n
    FROM binned
    GROUP BY event_type, bin, mn, mx
    """,
    "equi-width value histogram per event type: global [min, max] from "
    "ONE tiny aggregate broadcast back (a 1-row cross join, not a "
    "window), then bin = floor((v-min)*16/(max-min)) capped at 15 — a "
    "second map-side-combining aggregate.  Two passes total, both "
    "full-codegen; this is the profiling histogram a catalog computes "
    "per column at scale.  All arithmetic on integer cents; the double "
    "division is exact-floored because numerator and denominator are "
    "exactly-representable integers (< 2^52), so both engines bin "
    "identically",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL values are NOT observations: least(15, NULL) would otherwise
    # count them in the top bin (least skips null operands in BOTH
    # engines); profile_documents reports null fractions separately
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ext = ev.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    binned = ev.crossJoin(F.broadcast(ext)).withColumn(
        "bin",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(15).cast("long"),
                F.floor(
                    (F.col("cents") - F.col("mn")) * F.lit(16.0)
                    / (F.col("mx") - F.col("mn"))
                ),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return binned.groupBy("event_type", "bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        F.col("bin").cast("int").alias("bin"),
        (
            F.col("mn")
            + F.floor(F.col("bin") * (F.col("mx") - F.col("mn")) / F.lit(16.0))
        ).cast("long").alias("lo_cents"),
        "n",
    )


@register(
    "corpus_merkle_diff",
    """
    WITH a AS (
      SELECT doc_id % 64 AS bucket,
             count(*) AS old_n,
             CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                  AS BIGINT) AS old_xor
      FROM documents WHERE doc_id % 11 <> 0
      GROUP BY doc_id % 64
    ), b AS (
      SELECT doc_id % 64 AS bucket,
             count(*) AS new_n,
             CAST(bit_xor(('0x' || substr(md5(
                    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                         ELSE text END), 1, 15))::BIGINT)
                  AS BIGINT) AS new_xor
      FROM documents WHERE doc_id % 13 <> 0
      GROUP BY doc_id % 64
    )
    SELECT coalesce(a.bucket, b.bucket) AS bucket,
           coalesce(a.old_n, 0) AS old_n, coalesce(b.new_n, 0) AS new_n,
           coalesce(a.old_xor, 0) AS old_xor,
           coalesce(b.new_xor, 0) AS new_xor,
           coalesce(a.old_n, 0) <> coalesce(b.new_n, 0)
             OR coalesce(a.old_xor, 0) <> coalesce(b.new_xor, 0) AS dirty
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    """,
    "Merkle-bucketed snapshot reconciliation — corpus_diff_docs' scale "
    "path: instead of full-outer-joining every (id, hash) pair, each "
    "snapshot folds into 64 bucket digests (count + order-free bit_xor "
    "of 60-bit content hashes, one map-side-combining aggregate per "
    "side), and only buckets whose digests differ need a row-level "
    "rescan.  At 100 TB the compare touches 64 rows, not 10^11 ids; "
    "dirty buckets bound the expensive pass to changed data.  Same "
    "synthetic snapshots as corpus_diff_docs (old drops id%11=0, new "
    "drops %13=0 and edits %7=0), so the bucket verdicts are "
    "cross-checkable against its row-level statuses",
)
def corpus_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")

    def digest(side: DataFrame, n_col: str, x_col: str) -> DataFrame:
        h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast(
            "long"
        )
        return side.groupBy((F.col("doc_id") % 64).alias("bucket")).agg(
            F.count(F.lit(1)).alias(n_col),
            F.bit_xor(h).cast("long").alias(x_col),
        )

    old = digest(docs.filter(F.col("doc_id") % 11 != 0), "old_n", "old_xor")
    new = digest(
        docs.filter(F.col("doc_id") % 13 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        ),
        "new_n", "new_xor",
    )
    j = old.join(new.hint("shuffle_hash"), "bucket", "full_outer").select(
        "bucket",
        F.coalesce("old_n", F.lit(0)).alias("old_n"),
        F.coalesce("new_n", F.lit(0)).alias("new_n"),
        F.coalesce("old_xor", F.lit(0).cast("long")).alias("old_xor"),
        F.coalesce("new_xor", F.lit(0).cast("long")).alias("new_xor"),
    )
    return j.withColumn(
        "dirty",
        (F.col("old_n") != F.col("new_n"))
        | (F.col("old_xor") != F.col("new_xor")),
    )


@register(
    "cluster_split_docs",
    _DUCK_MINHASH_CTE.replace("WITH toks", "WITH RECURSIVE toks") + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), clu AS (
      SELECT d.doc_id,
             cast(least(d.doc_id, coalesce(m.mn, d.doc_id)) AS bigint)
               AS cluster
      FROM documents d
      LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
        ON d.doc_id = m.a
    )
    SELECT doc_id, cluster,
           CASE WHEN substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 1)
                     <= 'b' THEN 'train'
                WHEN substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split
    FROM clu
    """,
    "leakage-free train/val/test split: the split hash is taken over the "
    "near-dup CLUSTER id (connected components of the LSH pair graph), "
    "not the document id, so near-duplicates can never straddle the "
    "train/eval boundary — the contamination mode a doc-level hash split "
    "invites and eval decontamination then has to patch.  75/12.5/12.5 "
    "by the first hex char of md5('split:'||cluster) ('0'-'b' / 'c','d' "
    "/ 'e','f') — deterministic, engine-identical, and stable across "
    "corpus growth for unchanged clusters.  Cost beyond the CC pass the "
    "dedup family already runs: one hash projection, zero extra shuffles",
)
def cluster_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import dedup_clusters

    docs = _load_wide(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    c1 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("cluster").cast("string"))), 1, 1
    )
    return clusters.select(
        "doc_id", "cluster",
        F.when(c1 <= F.lit("b"), F.lit("train"))
        .when(c1.isin("c", "d"), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _label_prop_oracle(rounds: int = 4) -> str:
    """The same synchronous rounds unrolled as chained CTEs (aggregation is
    illegal in a recursive member; the unroll mirrors the Spark loop)."""
    parts = [_DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS node, id_b AS nbr FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), l0 AS (
      SELECT doc_id AS node, CAST(doc_id AS BIGINT) AS lbl FROM documents
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f""", v{k} AS (
      SELECT s.node, l.lbl, count(*) AS c
      FROM sym s JOIN l{k - 1} l ON s.nbr = l.node
      GROUP BY s.node, l.lbl
    ), w{k} AS (
      SELECT node, lbl,
             row_number() OVER (PARTITION BY node
                                ORDER BY c DESC, lbl ASC) AS rn
      FROM v{k}
    ), l{k} AS (
      SELECT p.node, coalesce(w.lbl, p.lbl) AS lbl
      FROM l{k - 1} p
      LEFT JOIN (SELECT node, lbl FROM w{k} WHERE rn = 1) w
        ON p.node = w.node
    )""")
    parts.append(f"""
    SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community
    FROM l{rounds}
    """)
    return "".join(parts)


@register(
    "label_prop_docs",
    _label_prop_oracle(4),
    "label-propagation community detection over the document similarity "
    "graph (ops/graph.label_propagation): four SYNCHRONOUS rounds where "
    "each node adopts its neighbors' majority label, ties to the "
    "smallest — deterministic by construction (fixed rounds + total tie "
    "order) where classic LPA randomizes, which is what lets the "
    "unrolled-CTE oracle hash-match.  Communities differ from connected "
    "components: a sparse bridge between two dense near-dup blobs does "
    "NOT merge them under local majority.  Per round: one nbr-keyed "
    "join + one (node,label) count + one max_by reduce — three bounded "
    "shuffles, one label per node of state, lineage truncated on a "
    "stride like pagerank_int",
)
def label_prop_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import minhash_candidate_pairs
    from .ops.graph import label_propagation

    docs = _load_wide(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    sym = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        cand.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    return label_propagation(nodes, sym, rounds=4).withColumnRenamed(
        "id", "doc_id"
    )


_shared_sql(
    "orders_pit_priority",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority AS p,
             date_trunc('second', o_orderdate) AS d, o_orderkey AS k,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ), changes AS (
      SELECT o_custkey, p, d, k FROM ordered
      WHERE prev IS NULL OR p <> prev
    ), scd AS (
      SELECT o_custkey, p AS priority, d AS valid_from,
             lead(d) OVER (
               PARTITION BY o_custkey ORDER BY d, k
             ) AS valid_to
      FROM changes
    ), pit AS (
      SELECT /*+ SHUFFLE_HASH(s) */
             o.o_custkey, o.o_orderpriority AS actual, s.priority AS pit_p
      FROM orders o JOIN scd s
        ON o.o_custkey = s.o_custkey
       AND date_trunc('second', o.o_orderdate) >= s.valid_from
       AND (s.valid_to IS NULL
            OR date_trunc('second', o.o_orderdate) < s.valid_to)
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN actual = pit_p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pit_correct
    FROM pit
    GROUP BY o_custkey
    """,
    "POINT-IN-TIME join against the SCD2 dimension scd2_customer_priority "
    "builds: each order joins the priority version whose [valid_from, "
    "valid_to) range covers its date — the as-of lookup every "
    "slowly-changing-dimension warehouse runs.  Ranges partition each "
    "customer's timeline (empty [d,d) versions from same-date changes "
    "match nothing), so every order matches EXACTLY one version; "
    "n_pit_correct < n_orders precisely where two same-date orders carry "
    "different priorities — date-granularity PIT cannot distinguish "
    "intra-date order, and the gate pins that honestly rather than "
    "papering over it.  Scale shape: the range condition rides the "
    "custkey EQUI-join (co-partitioned, SHUFFLE_HASH-hinted — a comment "
    "to DuckDB), never a range-only join",
)


@register(
    "events_ab_test",
    """
    WITH assign AS (
      SELECT user_id,
             substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
               AS in_a,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE converted END) AS BIGINT)
               AS cb
      FROM assign
    ), stats AS (
      SELECT na, nb, ca, cb,
             CASE WHEN na * nb * (ca + cb)
                       * ((na + nb) - (ca + cb)) = 0 THEN NULL
             ELSE ((ca * nb - cb * na) * (ca * nb - cb * na))
                  * CAST(na + nb AS DOUBLE)
                  / (CAST(na AS DOUBLE) * nb * (ca + cb)
                     * ((na + nb) - (ca + cb))) END AS z2_raw,
             CASE WHEN na + nb = 0 THEN NULL
                  ELSE ((na - nb) * (na - nb)) / CAST(na + nb AS DOUBLE)
                  END AS srm_raw
      FROM arms
    )
    SELECT na, nb, ca, cb,
           round(CASE WHEN na = 0 THEN NULL
                 ELSE ca / CAST(na AS DOUBLE) END, 6) AS rate_a,
           round(CASE WHEN nb = 0 THEN NULL
                 ELSE cb / CAST(nb AS DOUBLE) END, 6) AS rate_b,
           round(z2_raw, 6) AS z2,
           CASE WHEN z2_raw IS NULL THEN 'undefined'
                WHEN z2_raw > 3.841459 THEN 'significant'
                ELSE 'not_significant' END AS verdict,
           round(srm_raw, 6) AS srm_chi2,
           CASE WHEN srm_raw > 3.841459 THEN 'srm_suspect'
                ELSE 'srm_ok' END AS srm_verdict
    FROM stats
    """,
    "A/B experiment readout: users hash-split into arms (md5 first hex "
    "char — deterministic, engine-identical, the same assignment a "
    "feature-flag service derives), per-user conversion = any purchase, "
    "then the two-proportion pooled z² test and the sample-ratio-"
    "mismatch chi² guard (an SRM hit means the ASSIGNMENT is broken and "
    "the p-value is meaningless — the first thing a real experiment "
    "platform checks).  One user-keyed aggregate + one 4-integer frame; "
    "the test statistics are arithmetic over exact integer counts "
    "(identical expression text both engines), so determinism holds "
    "without micro-unit scaffolding.  z²>3.841459 == two-sided p<0.05 "
    "at 1 df",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        (
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))),
                1, 1,
            ) < F.lit("8")
        ).alias("in_a"),
        # 'power-buyer' conversion (>= 14 purchases, the per-user median):
        # any-purchase converts EVERY testdata user and the z-test
        # degenerates; this definition splits ~50/50 at every sf
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= 14, 1,
        ).otherwise(0).alias("converted"),
    )
    arms = assign.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("nb"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(F.col("converted")))
        .cast("long").alias("cb"),
    )
    na, nb, ca, cb = (F.col(c) for c in ("na", "nb", "ca", "cb"))
    diff = ca * nb - cb * na
    pooled = ca + cb
    # degenerate designs (an empty arm, zero or total conversion) have no
    # defined z²: NULL in both engines, never a division error (ANSI)
    defined = (na * nb * pooled * ((na + nb) - pooled)) != 0
    z2 = F.when(
        defined,
        (diff * diff) * (na + nb).cast("double")
        / (na.cast("double") * nb * pooled * ((na + nb) - pooled)),
    )
    srm = F.when(
        (na + nb) > 0, ((na - nb) * (na - nb)) / (na + nb).cast("double")
    )
    return arms.select(
        "na", "nb", "ca", "cb",
        F.round(F.when(na > 0, ca / na.cast("double")), 6).alias("rate_a"),
        F.round(F.when(nb > 0, cb / nb.cast("double")), 6).alias("rate_b"),
        F.round(z2, 6).alias("z2"),
        F.when(z2.isNull(), F.lit("undefined"))
        .when(z2 > F.lit(3.841459), F.lit("significant"))
        .otherwise(F.lit("not_significant")).alias("verdict"),
        F.round(srm, 6).alias("srm_chi2"),
        F.when(srm > F.lit(3.841459), F.lit("srm_suspect"))
        .otherwise(F.lit("srm_ok")).alias("srm_verdict"),
    )


_RRF_K = 60


@register(
    "hybrid_rrf_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {{_DUCK_TOKS}} AS t FROM documents
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n FROM lens
    ), q AS (SELECT unnest(['spark', 'hash', 'window']) AS term),
    tf AS (
      SELECT l.doc_id, l.dl, q.term,
             len(list_filter(l.t, x -> x = q.term)) AS f
      FROM lens l CROSS JOIN q
    ), dfq AS (
      SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS nd
      FROM tf GROUP BY term
    ), lex AS (
      SELECT tf.doc_id,
             round(sum(
               ln((s.n - dfq.nd + 0.5) / (dfq.nd + 0.5) + 1.0)
               * (tf.f * ({_BM25_K1} + 1.0))
               / (tf.f + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * tf.dl / s.avgdl))
             ), 6) AS score
      FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats s
      WHERE tf.f > 0
      GROUP BY tf.doc_id
    ), lex_r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM lex
    ), qv AS (
      SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0
    ), sem AS (
      SELECT e.vec_id AS doc_id,
             CASE WHEN sqrt(list_dot_product(qv.v, qv.v))
                       * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(qv.v, e.v)
                       / (sqrt(list_dot_product(qv.v, qv.v))
                          * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL) e
      CROSS JOIN qv
      WHERE e.vec_id <> 0
    ), sem_r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM sem
    ), fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(1000000 // ({_RRF_K} + l.r), 0)
               + coalesce(1000000 // ({_RRF_K} + s.r), 0) AS rrf_micro,
             l.r AS lex_rank, s.r AS sem_rank
      FROM lex_r l FULL OUTER JOIN sem_r s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
           lex_rank, sem_rank
    FROM fused
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 20
    """.replace("{_DUCK_TOKS}", _DUCK_TOKS),
    "HYBRID retrieval via reciprocal-rank fusion — the modern search "
    "stack's default: the BM25 lexical leg and an embedding-cosine "
    "semantic leg (query = doc 0's vector) are each ranked GLOBALLY "
    "with ops/rank.global_row_number (two-pass range-partitioned — a "
    "corpus-wide ordering with no single-partition window), then fused "
    "as sum of 1e6 div (60 + rank) — integer floor contributions, so "
    "the fusion is exact and order-free and the hash gate needs no "
    "epsilon.  Docs reached by only one leg keep that leg's "
    "contribution (full outer, SHUFFLE_HASH).  RRF's k=60 is the "
    "Cormack et al. constant; rank fusion needs no score calibration "
    "between legs, which is exactly why it is the production default",
)
def hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.rank import global_row_number

    docs = _load_wide(spark, sf_dir, "documents")
    lex = _bm25_scores(spark, docs)
    lex_r = global_row_number(
        lex, [F.col("score").desc(), F.col("doc_id")], "lex_rank",
        part_key=-F.col("score"),
    ).select("doc_id", "lex_rank")

    # semantic leg: cosine vs doc 0's embedding, corpus-wide
    from .ops.similarity import cosine_sim

    emb = (
        _load_wide(spark, sf_dir, "embeddings")
        # mirror the oracle's IS NOT NULL: a null-embedding doc must get
        # no semantic rank, not a rank at cosine 0.0
        .filter(F.col("embedding").isNotNull())
        .withColumn("v", F.col("embedding").cast("array<double>"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("score"),
        )
    )
    sem_r = global_row_number(
        sem, [F.col("score").desc(), F.col("doc_id")], "sem_rank",
        part_key=-F.col("score"),
    ).select("doc_id", "sem_rank")

    rrf = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + lex_rank)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + sem_rank)"), F.lit(0).cast("long")
    )
    return (
        lex_r.join(sem_r.hint("shuffle_hash"), "doc_id", "full_outer")
        .select(
            "doc_id", rrf.cast("long").alias("rrf_micro"),
            "lex_rank", "sem_rank",
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(20)
    )


@register(
    "embedding_norms_arrow",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CASE WHEN embedding IS NULL
                     OR len(list_filter(embedding, x -> x IS NULL)) > 0
                THEN NULL
                ELSE CAST(coalesce(list_sum(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)
                            * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                   AS BIGINT))), 0)
                     AS BIGINT) END AS sq_norm_micro
    FROM embeddings
    """,
    "micro-quantized squared L2 norms via mapInArrow "
    "(ops/arrow.sq_norms_arrow) — the Arrow-native UDF flavor: batches "
    "stay in Arrow on both edges, the kernel is one flattened numpy pass "
    "over zero-copy buffers (no per-cell pandas objects).  Elements "
    "quantize with the engine-shared floor(x*1e6+0.5) double expression "
    "and sum in int64, so the result is EXACT — this oracle hash-match "
    "plus the JVM-expression-twin equality in tests/test_arrow_ops.py "
    "pin the plumbing (schema contract, offsets, zero-length windows) "
    "that every future Arrow kernel rides on",
)
def embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.arrow import sq_norms_arrow

    return sq_norms_arrow(_load_wide(spark, sf_dir, "embeddings"))


@register(
    "events_sql_udf_rollup",
    """
    SELECT event_type,
           date_trunc('day', ts) AS day,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
    "daily revenue rollup through a SQL-DEFINED FUNCTION (Spark 4 CREATE "
    "FUNCTION ... RETURN): the shared cents() micro-unit convention as a "
    "named, reusable SQL UDF.  Catalyst INLINES the body into the plan — "
    "codegen'd expression, zero UDF-serve cost, no Python boundary "
    "(asserted in tests/test_sql_surface.py: no BatchEvalPython in the "
    "plan) — so teams get the abstraction of a function library at the "
    "price of a macro.  The oracle is the inlined expression, proving "
    "the UDF changes nothing semantically",
)
def events_sql_udf_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(v DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(v * 100 + 0.5) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('day', ts) AS day,
               count(*) AS n,
               CAST(sum(cents(value)) AS BIGINT) AS revenue_cents
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
        """
    )


@register(
    "orders_skyline",
    """
    WITH u AS (
      SELECT o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.o_orderkey, a.o_orderdate, a.price_cents
    FROM u a
    WHERE NOT EXISTS (
      SELECT 1 FROM u b
      WHERE b.price_cents <= a.price_cents
        AND b.o_orderdate >= a.o_orderdate
        AND (b.price_cents < a.price_cents
             OR b.o_orderdate > a.o_orderdate)
    )
    """,
    "Pareto frontier (skyline) of urgent orders — cheapest for how "
    "recent: no other urgent order is both <= price and >= date with one "
    "strict.  The oracle is the textbook NOT EXISTS all-pairs dominance "
    "self-join (quadratic, affordable for DuckDB at sf0.01); the Spark "
    "leg is ops/rank.skyline2d — per-x aggregate + exclusive two-pass "
    "range-bucketed global prefix max + join-back, no all-pairs join and "
    "no single-partition window, so the frontier of 10^9 orders costs "
    "two keyed shuffles.  Prices compare as exact cents (micro-unit "
    "convention), so dominance ties hash identically in both engines",
)
def orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.rank import skyline2d

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
    )
    return skyline2d(urgent, "price_cents", "o_orderdate")


# ===========================================================================
# Driver-window curation
# ===========================================================================
# The round-robin driver's differential-correctness gate checks exactly the
# FIRST 50 entries of __spark_entry__.queries() in registration order.  Code
# order above groups queries by family for readability, which left the whole
# LLM-data-pipeline family (dedup, ANN, text quality) outside the window for
# two rounds.  Rebuild QUERIES here so the first 50 names form a curated,
# family-balanced sample — TPC-H joins/aggs/windows, event analytics and the
# streaming rules engine, every dedup flavor, the ANN ladder, quality/text
# ops, and the as-of/interval joins — all of them oracle-paired.  The
# remaining queries keep their relative code order after position 50.
_DRIVER_WINDOW = [
    # TPC-H batch analytics (joins, aggs, windows, subqueries)
    "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
    "q9_profit_by_nation", "q18_large_orders", "top_customers_per_nation",
    "grouping_sets_orders", "correlated_subquery", "semi_join_high_value",
    "anti_join_no_orders", "window_funcs_showcase", "skew_salted_join",
    # event analytics + streaming-equivalent rules
    "events_multires_rollup", "events_hll_rollup", "events_burst_detection",
    "events_sessionization", "events_rules_engine", "events_cms_counts",
    "events_funnel", "events_cohort_retention", "events_zorder_layout",
    # deduplication family (simhash_neardup's slot now carries the
    # from-scratch HLL so the sketch family has a driver-verified row;
    # simhash_docs still covers the simhash signatures)
    "exact_dedup_docs", "minhash_pairs_docs", "dedup_clusters_docs",
    "jaccard_pairs_docs", "jaccard_exact_join", "substring_dedup_docs",
    "simhash_docs", "hll_scratch_events", "semdedup_embeddings",
    "embedding_neardup",
    # similarity search / embeddings
    "ann_brute_force", "ann_lsh", "ann_ivf", "ann_pq_adc", "ann_recall",
    "kmeans_step_embeddings",
    # text quality / decontamination / mixture — three continuation-wave
    # families enter the window: tokenizer APPLY (bpe_encode), warehouse
    # MERGE, and the graph family (triangle counting); the displaced
    # chunk_docs / language_id_ngram / token_counts remain green in the
    # full local gate
    "gopher_quality_docs", "repetition_docs", "pii_scan_docs",
    "mixture_sample_docs", "bloom_decontam_docs", "decontam_docs",
    "bpe_encode_docs", "text_stats_docs", "merge_upsert_orders",
    "tfidf_top_terms", "triangle_count_docs",
    # custom temporal joins
    "asof_join_error_purchase", "interval_join_events",
]

assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
_missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
assert not _missing, f"curated names not registered: {_missing}"
_window_set = set(_DRIVER_WINDOW)
QUERIES = {n: QUERIES[n] for n in _DRIVER_WINDOW} | {
    n: q for n, q in QUERIES.items() if n not in _window_set
}
