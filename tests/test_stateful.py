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
