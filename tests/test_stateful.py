"""Custom stateful streaming operator (applyInPandasWithState): cumulative
per-key totals must survive across micro-batches and equal the batch agg."""

import shutil

import pytest

from dagger_spark.sources.files import load_table
from dagger_spark.streaming.stateful import running_totals


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmp_path_factory):
    # split the events table into multiple files so the file stream replays
    # them as separate micro-batches (state must carry across batches)
    src = tmp_path_factory.mktemp("stateful") / "events_src"
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(str(src))
    return str(src)


def test_running_totals_stream_equals_batch(spark, events_src, tmp_path):
    batch_df = spark.read.parquet(events_src)
    expected = {
        r["key"]: (r["n_events"], round(r["total_value"], 6))
        for r in running_totals(batch_df, "event_type", "value").collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_src)
    )
    totals = running_totals(stream, "event_type", "value")
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # "update" mode emits one row per key per batch; the LAST emission per
        # key is the final cumulative state
        rows = spark.sql(
            """SELECT key, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn
                 FROM running_totals) WHERE rn = 1"""
        ).collect()
    finally:
        q.stop()

    got = {r["key"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    assert got == expected
    assert len(got) > 1


def test_running_totals_tws_matches_apply_in_pandas_and_batch(
    spark, events_src, tmp_path
):
    """The transformWithStateInPandas implementation must agree with both
    the batch aggregate and the applyInPandasWithState path (drop-in
    interchangeable).  Requires the RocksDB state store provider (the
    HDFS-backed default does not support transformWithState) AND the
    protobuf package (the TWS python state server's wire protocol) — the
    streaming leg SKIPS where protobuf is absent, the batch leg always
    runs."""
    from dagger_spark.streaming.stateful import running_totals_tws

    batch_df = spark.read.parquet(events_src)
    expected = {
        r["key"]: (r["n_events"], round(r["total_value"], 6))
        for r in running_totals(batch_df, "event_type", "value").collect()
    }
    # batch fallback: identical to running_totals batch path
    got_batch = {
        r["key"]: (r["n_events"], round(r["total_value"], 6))
        for r in running_totals_tws(batch_df, "event_type", "value").collect()
    }
    assert got_batch == expected

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithState streaming needs protobuf "
                    "(python state-server wire protocol); not in this env")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_src)
        )
        totals = running_totals_tws(stream, "event_type", "value")
        q = (
            totals.writeStream.format("memory")
            .queryName("running_totals_tws")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                """SELECT key, n_events, total_value FROM (
                     SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn
                     FROM running_totals_tws) WHERE rn = 1"""
            ).collect()
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)

    got = {r["key"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    assert got == expected


def test_cusum_stream_equals_batch_closed_form(spark, sf_dir, tmp_path):
    """The streaming CUSUM folds the literal recursion max(0, S+(v-k));
    the batch path evaluates the closed form prefix - min(0,
    running_min(prefix)).  Their agreement on an in-order replay is a
    machine-checked proof of the identity — and of the state carrying
    correctly across micro-batches.  Replay order: four ts-range slices,
    one file per trigger, mtimes forced increasing so the file source
    replays chronologically (CUSUM is order-sensitive, unlike
    running_totals)."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from dagger_spark.streaming.stateful import cusum_alarms

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    k_micro = 40_000_000   # ~mean value is ~40; fixed reference parameter
    h_micro = 20_000_000

    expected = {
        r["key"]: (r["n_events"], r["cusum_micro"], r["n_alarms"],
                   r["max_cusum"])
        for r in cusum_alarms(ev, k_micro, h_micro).collect()
    }

    # time-ordered slices: quartile boundaries on ts
    src = str(tmp_path / "slices")
    os.makedirs(src)
    bounds = sorted(r["ts"] for r in ev.select("ts").collect())
    cuts = [bounds[len(bounds) // 4], bounds[len(bounds) // 2],
            bounds[3 * len(bounds) // 4]]
    lo = None
    for i, hi in enumerate(cuts + [None]):
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") >= lo)
        if hi is not None:
            part = part.filter(F.col("ts") < hi)
        part.coalesce(1).write.parquet(f"{src}/slice={i}")
        lo = hi
    # one data file per slice dir; force strictly increasing mtimes so the
    # file source's oldest-first ordering equals chronological order
    files = sorted(glob.glob(f"{src}/slice=*/part-*.parquet"))
    assert len(files) == 4
    t0 = time.time() - 100
    for i, f in enumerate(files):
        os.utime(f, (t0 + 10 * i, t0 + 10 * i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/slice=*")
    )
    out = cusum_alarms(stream, k_micro, h_micro)
    q = (
        out.writeStream.format("memory").queryName("cusum_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            """SELECT key, n_events, cusum_micro, n_alarms, max_cusum FROM (
                 SELECT *, row_number() OVER (PARTITION BY key
                                              ORDER BY n_events DESC) rn
                 FROM cusum_stream) WHERE rn = 1"""
        ).collect()
    finally:
        q.stop()

    got = {r["key"]: (r["n_events"], r["cusum_micro"], r["n_alarms"],
                      r["max_cusum"]) for r in rows}
    assert got == expected
    assert len(got) >= 5


def test_attribution_stream_equals_batch_window(spark, sf_dir, tmp_path):
    """The streaming last-touch attributor carries (touch_ts, touch_type)
    state across micro-batches; the batch path computes the same
    per-purchase channels with an unbounded-preceding window.  Agreement
    on an in-order replay proves the O(1) state machine implements the
    window semantics — including touches and purchases split across
    micro-batch boundaries (4 chronological slices guarantee many)."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from dagger_spark.streaming.stateful import attribution_events

    ev = load_table(spark, sf_dir, "events")

    expected = sorted(
        (r["user_id"], r["event_id"], r["channel"], r["value_cents"])
        for r in attribution_events(ev).collect()
    )
    assert len(expected) > 100
    assert {c for _, _, c, _ in expected} >= {"view", "click", "direct"}

    src = str(tmp_path / "slices")
    os.makedirs(src)
    bounds = sorted(r["ts"] for r in ev.select("ts").collect())
    cuts = [bounds[len(bounds) // 4], bounds[len(bounds) // 2],
            bounds[3 * len(bounds) // 4]]
    lo = None
    for i, hi in enumerate(cuts + [None]):
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") >= lo)
        if hi is not None:
            part = part.filter(F.col("ts") < hi)
        part.coalesce(1).write.parquet(f"{src}/slice={i}")
        lo = hi
    files = sorted(glob.glob(f"{src}/slice=*/part-*.parquet"))
    assert len(files) == 4
    t0 = time.time() - 100
    for i, f in enumerate(files):
        os.utime(f, (t0 + 10 * i, t0 + 10 * i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/slice=*")
    )
    out = attribution_events(stream)
    q = (
        out.writeStream.format("memory").queryName("attrib_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, event_id, channel, value_cents "
            "FROM attrib_stream"
        ).collect()
    finally:
        q.stop()

    got = sorted(
        (r["user_id"], r["event_id"], r["channel"], r["value_cents"])
        for r in rows
    )
    assert got == expected


# ------------------------------------------------- heavy_hitters_sketch

def _hh_snapshot(rows):
    """Final summary from update-mode emissions: per shard, the rows
    carrying that shard's highest n_seen."""
    latest = {}
    for r in rows:
        latest.setdefault(r["shard"], []).append(r)
    out = {}
    for shard, rs in latest.items():
        top = max(r["n_seen"] for r in rs)
        for r in rs:
            if r["n_seen"] == top:
                out[(shard, r["item"])] = (r["est"], r["err"])
    return out


def test_heavy_hitters_stream_equals_batch(spark, sf_dir, tmp_path):
    """Space-Saving folds are order-dependent, so the replay must present
    rows in the same global (ts, id) order the batch leg sorts into:
    time-sliced files, one per micro-batch.  With that (documented)
    replay discipline, stream == batch byte-for-byte, eviction
    tie-breaks included."""
    import glob
    import os
    import time

    from dagger_spark.streaming.stateful import heavy_hitters_sketch

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    batch = {
        (r["shard"], r["item"]): (r["est"], r["err"])
        for r in heavy_hitters_sketch(
            ev, "user_id", capacity=8, n_shards=4
        ).collect()
    }

    src = tmp_path / "hh_src"
    os.makedirs(src)
    pdf = ev.toPandas().sort_values(["ts", "event_id"])
    cut = len(pdf) // 3
    for i, chunk in enumerate((pdf[:cut], pdf[cut:2 * cut], pdf[2 * cut:])):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    now = time.time() - 60
    for i, f in enumerate(sorted(glob.glob(str(src / "f*/part-*.parquet")))):
        os.utime(f, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = (
        heavy_hitters_sketch(stream, "user_id", capacity=8, n_shards=4)
        .writeStream.format("memory").queryName("hh")
        .option("checkpointLocation", str(tmp_path / "hh_ck"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _hh_snapshot(spark.sql("SELECT * FROM hh").collect())
    finally:
        q.stop()
    assert got == batch and len(batch) > 0


def test_heavy_hitters_space_saving_guarantees(spark, sf_dir):
    """The frequent-items contract, which holds for ANY fold order:
    est - err <= true <= est for tracked items; every item with true
    count > N_shard / capacity is tracked; <= capacity rows per shard."""
    from collections import Counter

    from pyspark.sql import functions as F

    from dagger_spark.streaming.stateful import heavy_hitters_sketch

    cap, shards = 8, 4
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    rows = heavy_hitters_sketch(
        ev, "user_id", capacity=cap, n_shards=shards
    ).collect()

    truth = Counter()
    shard_of, shard_n = {}, Counter()
    for r in ev.select(
        F.pmod(F.xxhash64("user_id"), F.lit(shards)).cast("int").alias("s"),
        F.col("user_id").cast("string").alias("i"),
    ).collect():
        truth[r["i"]] += 1
        shard_of[r["i"]] = r["s"]
        shard_n[r["s"]] += 1

    per_shard = Counter()
    tracked = set()
    for r in rows:
        per_shard[r["shard"]] += 1
        tracked.add(r["item"])
        t = truth[r["item"]]
        assert r["est"] - r["err"] <= t <= r["est"], r
    assert all(n <= cap for n in per_shard.values())
    missed = [
        i for i, t in truth.items()
        if t > shard_n[shard_of[i]] / cap and i not in tracked
    ]
    assert not missed, missed[:5]
    assert len(tracked) > 0


def test_kmv_distinct_stream_equals_batch(spark, events_src, tmp_path):
    """Streaming KMV: per event_type, the k smallest distinct user-id
    hashes fold across micro-batches into bounded state (k longs/key);
    the LAST emission per key must equal the batch sketch over the same
    rows EXACTLY — n_kept, kth_min and the estimate (KMV merge is
    order-insensitive and lossless, so replay order cannot matter).
    k=4 forces the ESTIMATOR arm (every event type has >4 distinct
    users), not just the exact-below-k arm."""
    from dagger_spark.streaming.stateful import kmv_distinct_stream

    batch_df = spark.read.parquet(events_src)
    expected = {
        r["key"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct_stream(
            batch_df, "event_type", "user_id", k=4
        ).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_src)
    )
    q = (
        kmv_distinct_stream(stream, "event_type", "user_id", k=4)
        .writeStream.format("memory").queryName("kmv_stream")
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode: n_kept is monotone per key, kth_min monotone
        # non-increasing — the final state is the max-n_kept / min-kth row
        rows = spark.sql(
            """SELECT key, n_kept, kth_min, est_distinct FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY key ORDER BY n_kept DESC, kth_min ASC) rn
                 FROM kmv_stream) WHERE rn = 1"""
        ).collect()
    finally:
        q.stop()
    got = {r["key"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
           for r in rows}
    assert got == expected
    assert len(got) > 1
    # the estimator arm really ran: at least one key at capacity
    assert any(v[0] == 4 for v in got.values())


def test_kmv_distinct_batch_branch_accepts_nested_value_col(spark):
    """The batch arm must resolve a NESTED value column (the bench's
    sysmon shape: event_data.TargetImage) — select() flattens the dotted
    path to its leaf name, so the arm aliases internally; regression pin
    for the round-8 fix."""
    from dagger_spark.streaming.stateful import kmv_distinct_stream

    df = spark.createDataFrame(
        [("H1", {"TargetImage": f"img{i % 3}"}) for i in range(9)],
        "computer_name string, event_data map<string,string>",
    )
    got = kmv_distinct_stream(
        df, "computer_name", "event_data.TargetImage", k=8
    ).collect()
    assert len(got) == 1
    r = got[0]
    # 3 distinct values, below k -> exact arm
    assert (r["key"], r["n_kept"], r["est_distinct"]) == ("H1", 3, 3.0)
