"""Crafted-fixture semantics tests for the round-6 continuation queries:
attribution, OHLC bars, equi-width histogram, Merkle snapshot diff,
leakage-free cluster split, and label-propagation communities.

The DuckDB hash gate (test_catalog.py's parametrized oracle test) proves
Spark == oracle on the testdata; these tests pin that both engines compute
the INTENDED semantics on inputs built to expose each decision point."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import Row

from dagger_spark.catalog import QUERIES

EV_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
             "value double, props string")

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_events(spark, tmp_path, rows, sub="ev"):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(d + "/events.parquet")
    return d


def test_events_attribution_semantics(spark, tmp_path):
    """Last-touch rules: most recent view/click wins; >7-day-old touches
    and touch-less purchases fall to 'direct'; the exactly-7-days
    boundary is INCLUSIVE (>=); later events never attribute backwards."""
    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, sec, val=10.0):
        return Row(event_id=i, ts=t0 + dt.timedelta(seconds=sec),
                   user_id=u, event_type=typ, value=val, props=None)

    day = 86400
    rows = [
        # u1: view then purchase 1h later -> 'view'
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 3600, 10.0),
        # u2: click 8 days before purchase -> stale -> 'direct'
        ev(3, 2, "click", 0), ev(4, 2, "purchase", 8 * day, 20.0),
        # u3: purchase with no prior events -> 'direct'
        ev(5, 3, "purchase", 0, 30.0),
        # u4: view then click then purchase -> LAST touch ('click') wins
        ev(6, 4, "view", 0), ev(7, 4, "click", 10),
        ev(8, 4, "purchase", 20, 40.0),
        # u5: touch exactly 7 days before purchase -> boundary INCLUSIVE
        ev(9, 5, "view", 0), ev(10, 5, "purchase", 7 * day, 50.0),
        # u6: view AFTER the purchase attributes nothing -> 'direct'
        ev(11, 6, "purchase", 0, 60.0), ev(12, 6, "view", 1),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r["channel"]: r for r in
           QUERIES["events_attribution"].fn(spark, d).collect()}
    assert out["view"]["n_purchases"] == 2      # u1 + u5 boundary
    assert out["view"]["revenue_cents"] == 1000 + 5000
    assert out["click"]["n_purchases"] == 1     # u4 last-touch
    assert out["click"]["revenue_cents"] == 4000
    assert out["direct"]["n_purchases"] == 3    # u2 stale, u3 none, u6 after
    assert out["direct"]["revenue_cents"] == 2000 + 3000 + 6000


def test_events_ohlc_bars_semantics(spark, tmp_path):
    """open/close come from the (ts, event_id) total order — including an
    equal-ts tie broken by event_id — high/low/sum are order-free."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def ev(i, typ, sec, val):
        return Row(event_id=i, ts=t0 + dt.timedelta(seconds=sec),
                   user_id=1, event_type=typ, value=val, props=None)

    rows = [
        # one in-hour bar, written out of order
        ev(3, "view", 20, 0.50), ev(1, "view", 0, 1.00),
        ev(4, "view", 30, 2.00), ev(2, "view", 10, 5.00),
        # equal-ts tie: event_id 5 < 6 so open=7.00, close=9.00
        ev(6, "click", 0, 9.00), ev(5, "click", 0, 7.00),
        # next hour opens a new bar
        ev(7, "view", 3600, 4.00),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {(r["bar_hour"], r["event_type"]): r for r in
           QUERIES["events_ohlc_bars"].fn(spark, d).collect()}
    bar = out[(t0, "view")]
    assert (bar["open_cents"], bar["high_cents"], bar["low_cents"],
            bar["close_cents"]) == (100, 500, 50, 200)
    assert bar["n_events"] == 4 and bar["sum_cents"] == 850
    tie = out[(t0, "click")]
    assert tie["open_cents"] == 700 and tie["close_cents"] == 900
    assert out[(t0 + dt.timedelta(hours=1), "view")]["open_cents"] == 400


def test_events_value_histogram_semantics(spark, tmp_path):
    """Bin edges: [min, max] split 16 ways, max value lands in bin 15 (the
    least() cap), lo_cents is the exact integer lower edge."""
    t0 = dt.datetime(2024, 1, 1)

    def ev(i, typ, val):
        return Row(event_id=i, ts=t0, user_id=1, event_type=typ,
                   value=val, props=None)

    # cents span [100, 1700]: width 1600, bin width 100 cents
    rows = [
        ev(1, "view", 1.00),    # bin 0
        ev(2, "view", 1.99),    # (199-100)*16/1600 = 0.99 -> bin 0
        ev(3, "view", 2.00),    # exactly 1.0 -> bin 1
        ev(4, "view", 9.00),    # bin 8
        ev(5, "click", 17.00),  # max -> capped to bin 15
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {(r["event_type"], r["bin"]): r for r in
           QUERIES["events_value_histogram"].fn(spark, d).collect()}
    assert out[("view", 0)]["n"] == 2
    assert out[("view", 0)]["lo_cents"] == 100
    assert out[("view", 1)]["n"] == 1
    assert out[("view", 1)]["lo_cents"] == 200
    assert out[("view", 8)]["lo_cents"] == 900
    assert out[("click", 15)]["n"] == 1
    assert out[("click", 15)]["lo_cents"] == 100 + 15 * 100


def test_merkle_diff_agrees_with_row_level_diff(spark, sf_dir):
    """The bucket digests must flag EXACTLY the buckets where the
    row-level diff sees a change: every added/removed/changed doc lives
    in a dirty bucket, and every dirty bucket contains at least one such
    doc (no false alarms from xor/count collisions on this corpus)."""
    row_diff = QUERIES["corpus_diff_docs"].fn(spark, sf_dir).collect()
    changed_buckets = {r["doc_id"] % 64 for r in row_diff
                       if r["status"] != "unchanged"}
    merkle = QUERIES["corpus_merkle_diff"].fn(spark, sf_dir).collect()
    dirty = {r["bucket"] for r in merkle if r["dirty"]}
    assert dirty == changed_buckets
    assert dirty  # the %7/%11/%13 pattern guarantees changes exist


def test_merkle_diff_localizes_a_single_change(spark, tmp_path):
    """With ids chosen so only doc 7 differs between snapshots (no id
    divisible by 11 or 13), exactly ONE bucket — id 7's — is dirty:
    the rescan the digests authorize touches 1/64th of the corpus."""
    ids = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12]
    rows = [Row(doc_id=i, text=f"document number {i} body text",
                lang="en", source="s", n_chars=20) for i in ids]
    d = str(tmp_path / "one")
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        d + "/documents.parquet")
    merkle = {r["bucket"]: r for r in
              QUERIES["corpus_merkle_diff"].fn(spark, d).collect()}
    assert {b for b, r in merkle.items() if r["dirty"]} == {7}
    clean = merkle[1]
    assert clean["old_n"] == clean["new_n"] == 1
    assert clean["old_xor"] == clean["new_xor"] != 0


def test_cluster_split_is_leakage_free(spark, tmp_path):
    """Near-duplicate docs (same cluster) always land in the SAME split,
    and the split is the documented function of the cluster id."""
    text_a = ("the quick brown fox jumps over the lazy dog again and again "
              "until the dog finally moves away from the gate")
    text_b = text_a + " tonight"          # near-dup of a
    text_c = ("completely different content about distributed query "
              "engines shuffling partitioned columnar data at scale")
    rows = [
        Row(doc_id=1, text=text_a, lang="en", source="s", n_chars=len(text_a)),
        Row(doc_id=2, text=text_b, lang="en", source="s", n_chars=len(text_b)),
        Row(doc_id=3, text=text_c, lang="en", source="s", n_chars=len(text_c)),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        d + "/documents.parquet")
    out = {r["doc_id"]: r for r in
           QUERIES["cluster_split_docs"].fn(spark, d).collect()}
    assert out[1]["cluster"] == out[2]["cluster"] == 1
    assert out[3]["cluster"] == 3
    # same cluster -> same split (the leakage-free property)
    assert out[1]["split"] == out[2]["split"]
    # split is md5('split:<cluster>') first hex char, 12/2/2 of 16
    for r in out.values():
        c = hashlib.md5(f"split:{r['cluster']}".encode()).hexdigest()[0]
        want = ("train" if c <= "b" else "val" if c in "cd" else "test")
        assert r["split"] == want


def test_label_propagation_keeps_bridged_communities_apart(spark):
    """Two triangles joined by ONE bridge edge: connected components would
    merge them; local-majority label propagation must not.  Exact labels
    pinned (deterministic: fixed rounds, min-label ties)."""
    from pyspark.sql import functions as F

    from dagger_spark.ops.graph import label_propagation

    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
        + [Row(src=b, dst=a) for a, b in pairs],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([Row(id=i) for i in range(1, 7)], "id long")
    out = {r["id"]: r["community"] for r in
           label_propagation(nodes, edges, rounds=4).collect()}
    assert out[1] == out[2] == out[3]
    assert out[4] == out[5] == out[6]
    assert out[1] != out[4]
    # isolated node keeps its own label
    nodes2 = nodes.union(spark.createDataFrame([Row(id=99)], "id long"))
    out2 = {r["id"]: r["community"] for r in
            label_propagation(nodes2, edges, rounds=2).collect()}
    assert out2[99] == 99


def _ab_arm(user_id):
    return hashlib.md5(f"ab1:{user_id}".encode()).hexdigest()[0] < "8"


def test_events_ab_test_semantics(spark, tmp_path):
    """Engineered arms: A users are power-buyers (>=14 purchases), B users
    are not -> the z-test must call it significant with balanced
    assignment; a second corpus with wildly unbalanced arms must trip
    the SRM guard regardless of conversions."""
    t0 = dt.datetime(2024, 1, 1)

    a_users = [u for u in range(1, 200) if _ab_arm(u)][:30]
    b_users = [u for u in range(1, 200) if not _ab_arm(u)][:30]
    rows, eid = [], 0

    def purchases(u, n):
        nonlocal eid
        for i in range(n):
            rows.append(Row(event_id=eid, ts=t0 + dt.timedelta(minutes=eid),
                            user_id=u, event_type="purchase", value=10.0,
                            props=None))
            eid += 1

    for u in a_users:
        purchases(u, 14)   # converted
    for u in b_users:
        purchases(u, 1)    # not converted
    d = _write_events(spark, tmp_path, rows, "ab1")
    r = QUERIES["events_ab_test"].fn(spark, d).head()
    assert (r["na"], r["nb"]) == (30, 30)
    assert (r["ca"], r["cb"]) == (30, 0)
    assert r["verdict"] == "significant"
    assert r["srm_verdict"] == "srm_ok"

    # unbalanced assignment: 30 vs 4 users -> chi2 = 26^2/34 ≈ 19.9 > 3.84
    rows2, self_eid = [], [0]
    d2_users = a_users[:30] + b_users[:4]
    for u in d2_users:
        rows2.append(Row(event_id=len(rows2), ts=t0, user_id=u,
                         event_type="view", value=1.0, props=None))
    d2 = _write_events(spark, tmp_path, rows2, "ab2")
    r2 = QUERIES["events_ab_test"].fn(spark, d2).head()
    assert r2["srm_verdict"] == "srm_suspect"
    assert r2["verdict"] == "undefined"  # zero conversions -> no z-test


def test_orders_pit_priority_same_date_caveat(spark, tmp_path):
    """PIT at date granularity: a customer whose priority changes WITHIN
    one date gets n_pit_correct = n_orders - 1 (the earlier same-date
    order reads the later version); a clean customer is fully correct."""
    import glob
    import os
    import shutil

    rows = [
        # cust 1: two dates, one priority each -> all PIT-correct
        (101, 1, "1-URGENT", dt.date(2024, 1, 1)),
        (102, 1, "1-URGENT", dt.date(2024, 1, 1)),
        (103, 1, "3-MEDIUM", dt.date(2024, 2, 1)),
        # cust 2: SAME date, different priorities -> one mismatch
        (201, 2, "1-URGENT", dt.date(2024, 1, 5)),
        (202, 2, "5-LOW", dt.date(2024, 1, 5)),
    ]
    # shared-SQL queries register every testdata view: clone the sf dir,
    # then swap in the crafted orders table
    d = str(tmp_path / "pit")
    os.makedirs(d)
    for f in glob.glob("/root/testdata/sf0.001/*.parquet"):
        shutil.copy(f, d)
    os.remove(d + "/orders.parquet")
    spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=c, o_orderpriority=p,
             o_orderdate=dt.datetime.combine(od, dt.time()))
         for k, c, p, od in rows],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderdate timestamp",
    ).write.parquet(d + "/orders.parquet")
    out = {r["o_custkey"]: r for r in
           QUERIES["orders_pit_priority"].fn(spark, d).collect()}
    assert out[1]["n_orders"] == 3 and out[1]["n_pit_correct"] == 3
    assert out[2]["n_orders"] == 2 and out[2]["n_pit_correct"] == 1


def test_hybrid_rrf_fusion_arithmetic(spark, sf_dir):
    """RRF fusion is the exact integer sum of the per-leg contributions,
    docs reached by one leg keep that leg only, and both legs'
    best-ranked docs appear in the fused top-20."""
    rows = QUERIES["hybrid_rrf_docs"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += 1_000_000 // (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            want += 1_000_000 // (60 + r["sem_rank"])
        assert r["rrf_micro"] == want and want > 0
    # ordering: non-increasing score, doc_id tiebreak
    scores = [(-r["rrf_micro"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)
    # both modalities contribute to the fused head
    assert any(r["lex_rank"] is not None for r in rows)
    assert any(r["sem_rank"] is not None for r in rows)


def test_events_value_histogram_ignores_null_values(spark, tmp_path):
    """NULL values are non-observations — without the filter they would
    land in bin 15 via least()'s null-skipping."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=1, ts=t0, user_id=1, event_type="view",
            value=1.00, props=None),
        Row(event_id=2, ts=t0, user_id=1, event_type="view",
            value=17.00, props=None),
        Row(event_id=3, ts=t0, user_id=1, event_type="view",
            value=None, props=None),
    ]
    d = _write_events(spark, tmp_path, rows, "histnull")
    out = QUERIES["events_value_histogram"].fn(spark, d).collect()
    assert sum(r["n"] for r in out) == 2  # the NULL row never counted
