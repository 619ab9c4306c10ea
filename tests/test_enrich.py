"""Longest-prefix-match CIDR enrichment (ops/enrich.cidr_lpm_join).

Semantics pinned here; the catalog twin (`events_cidr_enrich`) carries the
DuckDB differential over the driver events table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dagger_spark.ops.enrich import cidr_lpm_join  # noqa: E402


def _ip(dotted: str) -> int:
    a, b, c, d = (int(x) for x in dotted.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


FEED_SCHEMA = "prefix_int long, prefix_len int, label string, severity int"


def _events(spark, ips):
    return spark.createDataFrame(
        [(i, _ip(ip)) for i, ip in enumerate(ips)], "eid int, ip long"
    )


def test_most_specific_prefix_wins(spark):
    feed = spark.createDataFrame(
        [
            (_ip("10.0.0.0"), 8, "wide", 1),
            (_ip("10.1.0.0"), 16, "mid", 2),
            (_ip("10.1.2.0"), 24, "narrow", 3),
        ],
        FEED_SCHEMA,
    )
    ev = _events(spark, ["10.1.2.3", "10.1.9.9", "10.9.9.9", "11.0.0.1"])
    out = {
        r["eid"]: (r["label"], r["matched_len"])
        for r in cidr_lpm_join(ev, feed, "ip", ["label", "severity"]).collect()
    }
    assert out[0] == ("narrow", 24)   # matches /8, /16 AND /24 -> /24 wins
    assert out[1] == ("mid", 16)      # matches /8 and /16 -> /16 wins
    assert out[2] == ("wide", 8)
    assert out[3] == (None, None)     # unmatched: NULL payload, row kept


def test_matched_null_payload_field_does_not_fall_through(spark):
    # A /24 row whose severity is NULL must surface that NULL — not stitch
    # in the /8 row's severity (the atomic-struct guarantee).
    feed = spark.createDataFrame(
        [(_ip("10.0.0.0"), 8, "wide", 7), (_ip("10.1.2.0"), 24, "narrow", None)],
        FEED_SCHEMA,
    )
    row = cidr_lpm_join(
        _events(spark, ["10.1.2.3"]), feed, "ip", ["label", "severity"]
    ).collect()[0]
    assert row["label"] == "narrow" and row["severity"] is None
    assert row["matched_len"] == 24


def test_duplicate_feed_networks_do_not_duplicate_events(spark):
    feed = spark.createDataFrame(
        [
            (_ip("10.1.2.0"), 24, "a", 1),
            (_ip("10.1.2.255"), 24, "b", 2),  # same /24 after truncation
        ],
        FEED_SCHEMA,
    )
    out = cidr_lpm_join(
        _events(spark, ["10.1.2.3", "10.1.2.4"]), feed, "ip", ["label"]
    )
    rows = out.collect()
    assert len(rows) == 2  # exactly one row per event, not a fan-out
    # min(struct) pick: the lexicographically smallest payload wins —
    # deterministic, unlike a dropDuplicates arbitrary-row pick
    assert {r["label"] for r in rows} == {"a"}


def test_len_edges_zero_and_thirtytwo(spark):
    feed = spark.createDataFrame(
        [
            (0, 0, "default", 0),                    # /0 matches everything
            (_ip("83.132.83.215"), 32, "exact", 9),  # /32: shift-by-zero
        ],
        FEED_SCHEMA,
    )
    out = {
        r["eid"]: (r["label"], r["matched_len"])
        for r in cidr_lpm_join(
            _events(spark, ["83.132.83.215", "83.132.83.216"]),
            feed, "ip", ["label", "severity"],
        ).collect()
    }
    assert out[0] == ("exact", 32)
    assert out[1] == ("default", 0)


def test_empty_feed_keeps_rows_with_null_payload(spark):
    feed = spark.createDataFrame([], FEED_SCHEMA)
    out = cidr_lpm_join(_events(spark, ["1.2.3.4"]), feed, "ip", ["label"])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["label"] is None and rows[0]["matched_len"] is None


def test_plan_event_side_never_shuffles(spark):
    """Every join is a broadcast hash join; the only Exchanges are the
    feed-sized per-length dedups — the event lineage is one map stage."""
    feed = spark.createDataFrame(
        [
            (_ip("10.0.0.0"), 8, "wide", 1),
            (_ip("10.1.0.0"), 16, "mid", 2),
            (_ip("10.1.2.0"), 24, "narrow", 3),
        ],
        FEED_SCHEMA,
    )
    ev = _events(spark, ["10.1.2.3"] * 8)
    df = cidr_lpm_join(ev, feed, "ip", ["label", "severity"])
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert plan.count("BroadcastHashJoin") == 3  # one per distinct length
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every hash Exchange sits under a BroadcastExchange (feed dedup), never
    # on the event lineage: the event side of each join is exchange-free
    for frag in plan.split("BroadcastExchange")[:1]:
        # text before the first BroadcastExchange is the event-side spine
        assert "Exchange hashpartitioning" not in frag


def test_streaming_stateless(spark, tmp_path):
    """The op is stateless projections + broadcast joins — it runs as-is on
    a streaming DataFrame (no watermark, no state store)."""
    src = str(tmp_path / "src")
    ev = _events(spark, ["10.1.2.3", "11.0.0.1"])
    ev.write.parquet(src)
    feed = spark.createDataFrame(
        [(_ip("10.0.0.0"), 8, "wide", 1)], FEED_SCHEMA
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = cidr_lpm_join(stream, feed, "ip", ["label", "severity"])
    q = (
        out.writeStream.format("memory")
        .queryName("cidr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["eid"]: r["label"]
        for r in spark.sql("SELECT * FROM cidr_stream").collect()
    }
    batch = {
        r["eid"]: r["label"]
        for r in cidr_lpm_join(ev, feed, "ip", ["label", "severity"]).collect()
    }
    assert got == batch == {0: "wide", 1: None}


# --- ip_range_join: arbitrary [start, end] feeds (geo-IP style) ------------

from dagger_spark.ops.enrich import ip_range_join, range_to_blocks  # noqa: E402

RANGE_SCHEMA = "ip_start long, ip_end long, label string, kind string"


def test_range_to_blocks_partitions_exactly():
    # Property over awkward unaligned ranges: the blocks exactly partition
    # [start, end] — full cover, no overlap, every block aligned & in-range.
    cases = [(5, 21), (0, 0), (0, (1 << 32) - 1), (1, (1 << 32) - 2),
             (255, 256), (1401181100, 1401181150), (7, 7)]
    for s, e in cases:
        covered = []
        for t, l in range_to_blocks(s, e):
            size = 1 << (32 - l)
            base = t * size
            assert base % size == 0          # aligned
            assert s <= base and base + size - 1 <= e  # contained
            covered.append((base, base + size - 1))
        covered.sort()
        assert covered[0][0] == s and covered[-1][1] == e
        for (a, b), (c, d) in zip(covered, covered[1:]):
            assert c == b + 1                # gapless, no overlap
        assert len(covered) <= 62


def test_range_to_blocks_invalid():
    assert range_to_blocks(10, 5) == []
    assert range_to_blocks(-1, 5) == []
    assert range_to_blocks(0, 1 << 32) == []
    assert range_to_blocks(None, 5) == []


def test_narrowest_range_wins_over_unaligned_overlaps(spark):
    # A /25-sized block of the WIDE range must lose to the narrow range even
    # when the narrow range's covering block is a SHORTER prefix — the
    # tie-break is range span, not block length (contrast cidr_lpm_join).
    feed = spark.createDataFrame(
        [
            (1000, 3000, "wide", "rir"),
            (2040, 2060, "narrow", "vpn"),
        ],
        RANGE_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(0, 2050), (1, 1500), (2, 5000)], "eid int, ip long"
    )
    out = {
        r["eid"]: (r["label"], r["matched_span"])
        for r in ip_range_join(ev, feed, "ip", ["label", "kind"]).collect()
    }
    assert out[0] == ("narrow", 21)
    assert out[1] == ("wide", 2001)
    assert out[2] == (None, None)


def test_equal_span_tie_breaks_on_start(spark):
    feed = spark.createDataFrame(
        [(100, 200, "b-second", "geo"), (90, 190, "a-first", "geo")],
        RANGE_SCHEMA,
    )
    ev = spark.createDataFrame([(0, 150)], "eid int, ip long")
    row = ip_range_join(ev, feed, "ip", ["label", "kind"]).collect()[0]
    assert row["label"] == "a-first"  # same span 101, lower start wins


def test_single_address_and_full_space_ranges(spark):
    feed = spark.createDataFrame(
        [
            (0, (1 << 32) - 1, "default", "catchall"),  # one /0 block
            (42, 42, "pin", "sinkhole"),                # one /32 block
        ],
        RANGE_SCHEMA,
    )
    ev = spark.createDataFrame([(0, 42), (1, 43)], "eid int, ip long")
    out = {
        r["eid"]: (r["label"], r["matched_span"])
        for r in ip_range_join(ev, feed, "ip", ["label", "kind"]).collect()
    }
    assert out[0] == ("pin", 1)
    assert out[1] == ("default", 1 << 32)


def test_range_membership_is_exact_at_block_edges(spark):
    # [5, 21] decomposes into 5 blocks; membership must be exact at every
    # boundary — a block hit IS a range hit, no residual filter exists.
    feed = spark.createDataFrame([(5, 21, "in", "t")], RANGE_SCHEMA)
    ev = spark.createDataFrame(
        [(i, i) for i in range(30)], "eid int, ip long"
    )
    out = {
        r["eid"]: r["label"]
        for r in ip_range_join(ev, feed, "ip", ["label"]).collect()
    }
    for i in range(30):
        assert out[i] == ("in" if 5 <= i <= 21 else None)


def test_range_empty_feed(spark):
    feed = spark.createDataFrame([], RANGE_SCHEMA)
    rows = ip_range_join(
        spark.createDataFrame([(0, 7)], "eid int, ip long"),
        feed, "ip", ["label"],
    ).collect()
    assert len(rows) == 1
    assert rows[0]["label"] is None and rows[0]["matched_span"] is None


def test_range_plan_event_side_never_shuffles(spark):
    feed = spark.createDataFrame(
        [(1000, 3000, "wide", "rir"), (2040, 2060, "narrow", "vpn")],
        RANGE_SCHEMA,
    )
    ev = spark.createDataFrame([(i, 2050) for i in range(8)],
                               "eid int, ip long")
    df = ip_range_join(ev, feed, "ip", ["label", "kind"])
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the event-side spine (text before the first BroadcastExchange) is
    # exchange-free; the only hash Exchanges are the feed-side groupBys
    spine = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in spine


def test_range_streaming_stateless(spark, tmp_path):
    src = str(tmp_path / "rsrc")
    ev = spark.createDataFrame([(0, 2050), (1, 5000)], "eid int, ip long")
    ev.write.parquet(src)
    feed = spark.createDataFrame(
        [(1000, 3000, "wide", "rir")], RANGE_SCHEMA
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = ip_range_join(stream, feed, "ip", ["label", "kind"])
    q = (
        out.writeStream.format("memory")
        .queryName("range_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["eid"]: r["label"]
        for r in spark.sql("SELECT * FROM range_stream").collect()
    }
    assert got == {0: "wide", 1: None}


def test_range_to_blocks_quantized_partitions_exactly():
    # With a length step the blocks still exactly partition the range and
    # occupy only multiple-of-step lengths (the probe-join cap).
    cases = [(5, 21), (0, (1 << 32) - 1), (1, (1 << 32) - 2),
             (1400000000, 1500000000), (42, 42)]
    for s, e in cases:
        for step in (4, 8):
            blocks = range_to_blocks(s, e, length_step=step)
            covered = []
            for t, l in blocks:
                assert l % step == 0 or l == 32
                size = 1 << (32 - l)
                base = t * size
                assert base % size == 0
                assert s <= base and base + size - 1 <= e
                covered.append((base, base + size - 1))
            covered.sort()
            assert covered[0][0] == s and covered[-1][1] == e
            for (a, b), (c, d) in zip(covered, covered[1:]):
                assert c == b + 1
            assert len({l for _, l in blocks}) <= 1 + 32 // step


def test_streaming_feed_refresh_between_batches(spark, tmp_path):
    """The foreachBatch feed-refresh pattern ARCHITECTURE promises: the
    feed parquet is re-read per micro-batch, so an update between batches
    changes the enrichment without restarting the stream.  The feed is
    overwritten from INSIDE batch 0's handler, so the result is
    deterministic regardless of micro-batch timing; file order within the
    source is not guaranteed, so the assertion is that the two events got
    the two different feed versions."""
    src = tmp_path / "refresh_src"
    feed_path = str(tmp_path / "refresh_feed")
    src.mkdir()
    ev_schema = "eid int, ip long"
    spark.createDataFrame([(0, _ip("10.1.2.3"))], ev_schema).write.parquet(
        str(src / "f0")
    )
    spark.createDataFrame([(1, _ip("10.1.2.4"))], ev_schema).write.parquet(
        str(src / "f1")
    )

    def _write_feed(label):
        spark.createDataFrame(
            [(_ip("10.0.0.0"), 8, label, 1)], FEED_SCHEMA
        ).write.mode("overwrite").parquet(feed_path)

    _write_feed("v1")
    seen = []

    def _fb(batch, bid):
        feed = spark.read.parquet(feed_path)  # re-read EVERY batch
        out = cidr_lpm_join(batch, feed, "ip", ["label"])
        seen.extend((r["eid"], r["label"]) for r in out.collect())
        if len(seen) == 1:  # exactly one event processed so far: refresh
            _write_feed("v2")  # (empty warm-up batches must not trigger it)

    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = (
        stream.writeStream.foreachBatch(_fb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(seen) == 2
    assert {lbl for _, lbl in seen} == {"v1", "v2"}  # refresh took effect
    assert {eid for eid, _ in seen} == {0, 1}


# --- randomized differential: both ops vs a brute-force Python oracle ------

def _brute_lpm(ip, feed):
    """Reference longest-prefix-match: scan every network, keep longest."""
    best = None
    for prefix, ln, label, sev in feed:
        if ln == 0 or (ip >> (32 - ln)) == (prefix >> (32 - ln)):
            if best is None or ln > best[0]:
                best = (ln, label, sev)
    return best


def _brute_range(ip, feed):
    """Reference narrowest-range: scan every range, keep smallest span
    (ties: lowest start, then label — the op's struct order)."""
    best = None
    for s, e, label, kind in feed:
        if s <= ip <= e:
            key = (e - s + 1, s, label, kind)
            if best is None or key < best:
                best = key
    return best


def test_fuzz_lpm_matches_brute_force(spark):
    import random

    rng = random.Random(20260814)
    for trial in range(4):
        feed = []
        for _ in range(rng.randint(3, 12)):
            ln = rng.choice([0, 8, 12, 16, 20, 24, 28, 31, 32])
            base = rng.getrandbits(32)
            prefix = (base >> (32 - ln)) << (32 - ln) if ln else 0
            feed.append((prefix, ln, f"n{rng.randint(0, 4)}",
                         rng.randint(1, 5)))
        # half the probes land INSIDE random feed networks, half anywhere
        ips = []
        for _ in range(40):
            if feed and rng.random() < 0.5:
                p, ln, _, _ = rng.choice(feed)
                low = rng.getrandbits(32 - ln) if ln < 32 else 0
                ips.append(p | low)
            else:
                ips.append(rng.getrandbits(32))
        fdf = spark.createDataFrame(feed, FEED_SCHEMA)
        edf = spark.createDataFrame(
            list(enumerate(ips)), "eid int, ip long"
        )
        got = {
            r["eid"]: (r["matched_len"], r["label"])
            for r in cidr_lpm_join(
                edf, fdf, "ip", ["label", "severity"]
            ).collect()
        }
        for eid, ip in enumerate(ips):
            want = _brute_lpm(ip, feed)
            if want is None:
                assert got[eid] == (None, None), (trial, eid)
            else:
                # label ambiguity only when the feed repeats a (prefix,len)
                assert got[eid][0] == want[0], (trial, eid, ip)


def test_fuzz_range_matches_brute_force(spark):
    import random

    rng = random.Random(99)
    for trial in range(4):
        feed = []
        for _ in range(rng.randint(3, 10)):
            a = rng.getrandbits(32)
            b = min((1 << 32) - 1, a + rng.choice(
                [0, 1, 7, 100, 10**4, 10**7, 10**9]))
            feed.append((a, b, f"r{len(feed)}", f"k{rng.randint(0, 2)}"))
        ips = []
        for _ in range(40):
            if rng.random() < 0.6:
                s, e_, _, _ = rng.choice(feed)
                ips.append(rng.randint(s, e_))
            else:
                ips.append(rng.getrandbits(32))
        fdf = spark.createDataFrame(feed, RANGE_SCHEMA)
        edf = spark.createDataFrame(
            list(enumerate(ips)), "eid int, ip long"
        )
        got = {
            r["eid"]: (r["matched_span"], r["label"])
            for r in ip_range_join(
                edf, fdf, "ip", ["label", "kind"]
            ).collect()
        }
        for eid, ip in enumerate(ips):
            want = _brute_range(ip, feed)
            if want is None:
                assert got[eid] == (None, None), (trial, eid)
            else:
                assert got[eid] == (want[0], want[2]), (trial, eid, ip)


# --- domain_suffix_join: DNS blocklist feeds (deepest zone wins) -----------

from dagger_spark.ops.enrich import domain_suffix_join  # noqa: E402

DOM_SCHEMA = "suffix string, label string, category string"


def _doms(spark, domains):
    return spark.createDataFrame(
        list(enumerate(domains)), "eid int, domain string"
    )


def test_deepest_zone_wins(spark):
    feed = spark.createDataFrame(
        [
            ("com", "tld", "t"),
            ("example.com", "zone", "z"),
            ("ads.example.com", "ads", "a"),
        ],
        DOM_SCHEMA,
    )
    ev = _doms(spark, [
        "x.ads.example.com",   # matches all three -> deepest (3 labels)
        "ads.example.com",     # exact match of the deepest
        "www.example.com",     # zone
        "example.org",         # nothing
        "notexample.com",      # 'com' only — 'example.com' must NOT match
    ])
    out = {
        r["eid"]: (r["label"], r["matched_labels"])
        for r in domain_suffix_join(
            ev, feed, "domain", ["label", "category"]
        ).collect()
    }
    assert out[0] == ("ads", 3)
    assert out[1] == ("ads", 3)
    assert out[2] == ("zone", 2)
    assert out[3] == (None, None)
    assert out[4] == ("tld", 1)  # dot-boundary: no substring false positive


def test_domain_shallower_than_zone_depth(spark):
    # a 2-label domain must not match (or crash on) a 3-label feed entry
    feed = spark.createDataFrame(
        [("a.b.c", "deep", "d")], DOM_SCHEMA
    )
    rows = domain_suffix_join(
        _doms(spark, ["b.c"]), feed, "domain", ["label"]
    ).collect()
    assert rows[0]["label"] is None


def test_domain_duplicate_feed_rows_deterministic(spark):
    feed = spark.createDataFrame(
        [("example.com", "b", "x"), ("example.com", "a", "y")], DOM_SCHEMA
    )
    rows = domain_suffix_join(
        _doms(spark, ["w.example.com"]), feed, "domain", ["label", "category"]
    ).collect()
    assert len(rows) == 1
    assert rows[0]["label"] == "a"  # min(struct): deterministic pick


def test_domain_empty_feed(spark):
    feed = spark.createDataFrame([], DOM_SCHEMA)
    rows = domain_suffix_join(
        _doms(spark, ["a.com"]), feed, "domain", ["label"]
    ).collect()
    assert rows[0]["label"] is None and rows[0]["matched_labels"] is None


def test_domain_plan_event_side_never_shuffles(spark):
    feed = spark.createDataFrame(
        [("com", "tld", "t"), ("example.com", "zone", "z")], DOM_SCHEMA
    )
    df = domain_suffix_join(
        _doms(spark, ["a.example.com"] * 4), feed, "domain", ["label"]
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    spine = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in spine


def test_decompose_np_equivalent_to_reference():
    # the vectorized batch decomposition must emit exactly the reference
    # per-row block multiset, for every step, including invalid rows
    import random

    import numpy as np

    from dagger_spark.ops.enrich import decompose_ranges_np

    rng = random.Random(5)
    starts, ends = [], []
    for _ in range(300):
        a = rng.getrandbits(32)
        b = a + rng.choice([0, 1, 100, 10**4, 10**7, 10**9])
        starts.append(a)
        ends.append(min(b, (1 << 32) - 1))
    # edge + invalid rows interleaved
    starts += [0, 0, 5, 10, (1 << 32) - 1]
    ends += [(1 << 32) - 1, 0, 21, 5, (1 << 32) - 1]
    for step in (1, 4, 8):
        i, t, l = decompose_ranges_np(
            np.array(starts, dtype=np.int64),
            np.array(ends, dtype=np.int64),
            step,
        )
        got = {}
        for ri, ti, li in zip(i.tolist(), t.tolist(), l.tolist()):
            got.setdefault(ri, []).append((ti, li))
        for ri, (s, e) in enumerate(zip(starts, ends)):
            want = range_to_blocks(s, e, step)
            assert sorted(got.get(ri, [])) == sorted(want), (step, ri, s, e)


def test_int_typed_ip_column_matches_default_route(spark):
    """IntegerType event ips through the /0 catch-all level: Java's int
    >>> masks the shift mod 32, so shift-by-32 on an int column was a
    NO-OP — only ip == prefix matched the default route.  The probe (and
    feed build) now cast to long, where >>> 32 of any value < 2^32 is 0."""
    feed = spark.createDataFrame(
        [(0, 0, "default", 0), (_ip("10.1.2.0"), 24, "narrow", 3)],
        FEED_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(0, _ip("10.1.2.3")), (1, _ip("99.88.77.66"))], "eid int, ip int"
    )
    out = {
        r["eid"]: (r["label"], r["matched_len"])
        for r in cidr_lpm_join(ev, feed, "ip", ["label", "severity"]).collect()
    }
    assert out[0] == ("narrow", 24)
    assert out[1] == ("default", 0)  # was (None, None) with int >>> 32

    from dagger_spark.ops.enrich import ip_range_join

    rfeed = spark.createDataFrame(
        [(0, (1 << 32) - 1, "all", 1)],
        "ip_start long, ip_end long, label string, severity int",
    )
    got = {
        r["eid"]: r["label"]
        for r in ip_range_join(ev, rfeed, "ip", ["label"]).collect()
    }
    assert got == {0: "all", 1: "all"}


def test_probe_scratch_column_collision_is_loud(spark):
    """Event columns named __t / __m_* would be clobbered by the probe
    scaffold — rejected up front instead of silently corrupted."""
    import pytest

    feed = spark.createDataFrame([(0, 0, "d", 0)], FEED_SCHEMA)
    ev = spark.createDataFrame([(1, 2)], "ip long, __t long")
    with pytest.raises(ValueError, match="__t"):
        cidr_lpm_join(ev, feed, "ip", ["label"])


def test_cidr_stream_through_kafka_sim(spark, tmp_path):
    """The CIDR LPM join driven end-to-end over the WIRE source (the
    DataSource-V2 kafka simulator: wire schema, real per-partition
    offsets, multi-record micro-batches) — not just file streams: the
    streamed output must equal the batch leg over the same wire records.
    The join itself is stateless projections + broadcast probes (no
    watermark, no state), so the wire leg's added value is the production
    topology — Kafka -> JSON value parse -> integer probe -> sink — with
    offsets advancing across micro-batches."""
    import json

    from dagger_spark.sources.kafka_sim import register_kafka_sim

    register_kafka_sim(spark)
    feed = spark.createDataFrame(
        [
            (_ip("10.0.0.0"), 8, "wide", 1),
            (_ip("10.1.0.0"), 16, "narrow", 2),
            (_ip("10.1.2.0"), 24, "narrowest", 3),
        ],
        FEED_SCHEMA,
    )
    ips = ["10.1.2.3", "10.1.9.9", "10.200.0.1", "192.168.0.1", "10.1.2.255"]
    src = tmp_path / "ksim_cidr.jsonl"
    src.write_text(
        "\n".join(json.dumps({"eid": i, "ip": _ip(ip)})
                  for i, ip in enumerate(ips)) + "\n"
    )

    def enrich(wire):
        parsed = wire.select(
            F.from_json(
                F.col("value").cast("string"), "eid int, ip long"
            ).alias("j")
        ).select("j.eid", "j.ip")
        return cidr_lpm_join(parsed, feed, "ip", ["label", "severity"])

    stream = (
        spark.readStream.format("kafka_sim")
        .option("path", str(src)).option("batch_size", 2).load()
    )
    q = (
        enrich(stream)
        .writeStream.format("memory").queryName("ksim_cidr_out")
        .option("checkpointLocation", str(tmp_path / "ksim_cidr_ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {(r["eid"], r["label"], r["matched_len"]) for r in
               spark.sql("SELECT * FROM ksim_cidr_out").collect()}
        # the offset log really advanced: 5 records / batch_size 2 -> >= 3
        # micro-batches
        assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3
    finally:
        q.stop()
    batch = spark.read.format("kafka_sim").option("path", str(src)).load()
    want = {(r["eid"], r["label"], r["matched_len"]) for r in
            enrich(batch).collect()}
    assert got == want == {
        (0, "narrowest", 24), (1, "narrow", 16), (2, "wide", 8),
        (3, None, None), (4, "narrowest", 24),
    }
