"""The statestore reader reconciles checkpointed streaming state against
batch truth — per-key aggregate state equals the batch aggregate, custom
applyInPandasWithState state equals the operator's emitted totals, and the
per-partition summary accounts for every key."""

import os

import pytest
from pyspark.sql import functions as F

from dagger_spark.sources.files import load_table
from dagger_spark.streaming.state_inspect import read_state, state_summary


@pytest.fixture(scope="module")
def agg_checkpoint(spark, sf_dir, tmp_path_factory):
    """Run a windowless per-type streaming aggregate over the events table
    to completion; return its checkpoint + the batch truth."""
    base = tmp_path_factory.mktemp("state_inspect")
    src = str(base / "src")
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ev.repartition(3).write.parquet(src)
    truth = {
        r["event_type"]: (r["n"], r["cents"])
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("cents"),
        ).collect()
    }
    ck = str(base / "ck")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .alias("cents"),
    )
    q = (
        agg.writeStream.format("memory").queryName("si_agg")
        .outputMode("update").option("checkpointLocation", ck).start()
    )
    q.processAllAvailable()
    q.stop()
    return ck, truth


def test_aggregate_state_equals_batch_truth(spark, agg_checkpoint):
    ck, truth = agg_checkpoint
    st = read_state(spark, ck)
    # the value struct carries Spark's internal aggregation-buffer field
    # names (count/sum), not the query aliases — read positionally
    val_cols = [c for c in st.columns if c.startswith("value_")]
    assert len(val_cols) == 2
    got = {
        r["key_event_type"]: (r[val_cols[0]], r[val_cols[1]])
        for r in st.collect()
    }
    assert got == truth


def test_state_summary_accounts_for_every_key(spark, agg_checkpoint):
    ck, truth = agg_checkpoint
    summary = state_summary(spark, ck).collect()
    assert sum(r["n_state_rows"] for r in summary) == len(truth)
    # partitions are a projection of the shuffle partitioning — ids valid
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert all(0 <= r["partition_id"] < n_parts for r in summary)


def test_custom_stateful_operator_state_is_readable(spark, sf_dir, tmp_path):
    """applyInPandasWithState state (running_totals' (n, total) per key)
    read back from the checkpoint equals what the operator itself
    emitted in its final micro-batch."""
    from dagger_spark.streaming.stateful import running_totals

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").cast("string").alias("event_type"), "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(2).write.parquet(src)
    ck = str(tmp_path / "ck")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = running_totals(stream, key_col="event_type", value_col="value")
    q = (
        out.writeStream.format("memory").queryName("si_custom")
        .outputMode("update").option("checkpointLocation", ck).start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = {
        r["key"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            """SELECT key, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY key
                                              ORDER BY n_events DESC) rn
                 FROM si_custom) WHERE rn = 1"""
        ).collect()
    }
    st = read_state(spark, ck)
    # applyInPandasWithState wraps the user tuple one level deeper than
    # built-in aggregates: value.<wrapper> = (n, total)
    val_cols = [c for c in st.columns if c.startswith("value_")]
    assert len(val_cols) == 1
    got = {
        r["key_event_type"]: (r[val_cols[0]][0],
                              round(r[val_cols[0]][1], 6))
        for r in st.collect()
    }
    assert got == emitted and len(got) == 5
