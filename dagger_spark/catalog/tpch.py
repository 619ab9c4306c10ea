"""TPC-H-flavored batch analytics (joins, aggs, windows, sets, subqueries).

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403

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
    # Spark side: ONE percentile buffer per group via the array form —
    # three separate percentile_cont(p) WITHIN GROUP calls each build
    # their own ObjectHashAggregate value buffer over every row (3x the
    # per-row aggregation work; guide §1.2 "per-task work").  Spark's
    # percentile(col, array(...)) shares one buffer and interpolates all
    # three quartiles from it; percentile_cont lowers to the identical
    # Percentile expression, so the values are bit-identical (oracle
    # hash-match re-proven at sf0.01/sf0.001).  Measured best-of-3 at
    # sf0.1: 3.119 s -> ~1.7 s.
    """
    SELECT l_returnflag,
           round(ps[0], 6) AS p25,
           round(ps[1], 6) AS p50,
           round(ps[2], 6) AS p75
    FROM (SELECT l_returnflag,
                 percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D)) AS ps
          FROM lineitem GROUP BY l_returnflag)
    """,
    "ordered-set aggregates: exact linear-interpolated quartiles per flag "
    "(dyadic fractions so both engines interpolate identically); Spark "
    "computes all three from ONE shared percentile buffer",
    oracle_sql="""
    SELECT l_returnflag,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
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
    from ..ops.skew import salted_join

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


