"""Source-format breadth: the same query over the same rows must return the
same answer whether the table arrived as parquet, ORC, JSON-lines, or CSV.

The reference's only transport is Kafka JSON; a Spark-native engine gets
the rest of the format zoo for free — but only if the read options are
right.  CSV is the trap: documents carry embedded newlines, quotes, and
unicode, so the writer/reader must agree on quoting + multiLine or rows
silently split (that's why the assert is on full row content, not counts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.text import token_count
from dagger_spark.sources.files import load_table


def _fingerprint(df):
    """Order-independent content fingerprint of (doc_id, n_tokens, text)."""
    return sorted(
        (r["doc_id"], r["n_tok"], r["text"])
        for r in df.select(
            "doc_id", token_count(F.col("text")).alias("n_tok"), "text"
        ).collect()
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_orc_json_csv_roundtrips_match_parquet(spark, docs, tmp_path):
    expected = _fingerprint(docs)
    schema = docs.schema

    orc_p = str(tmp_path / "docs_orc")
    docs.write.orc(orc_p)
    assert _fingerprint(spark.read.schema(schema).orc(orc_p)) == expected

    json_p = str(tmp_path / "docs_json")
    docs.write.json(json_p)
    assert _fingerprint(spark.read.schema(schema).json(json_p)) == expected

    csv_p = str(tmp_path / "docs_csv")
    (
        docs.write.option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(csv_p)
    )
    got = _fingerprint(
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(csv_p)
    )
    assert got == expected


def test_xml_roundtrip_matches_parquet(spark, docs, tmp_path):
    """Spark 4's built-in XML source: same fingerprint as parquet.  XML has
    its own trap — attribute/element ambiguity and whitespace handling —
    so the assert is again on full row content.  Documents with empty/NULL
    text write as empty elements; the reader must map both back without
    inventing rows."""
    from pyspark.sql import types as T

    xml_p = str(tmp_path / "docs_xml")
    src = docs.select("doc_id", "text")
    (
        src.write.format("xml")
        .option("rootTag", "docs").option("rowTag", "doc")
        .save(xml_p)
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    back = (
        spark.read.format("xml").schema(schema)
        .option("rowTag", "doc")
        .load(xml_p)
    )
    want = sorted(
        (r["doc_id"], r["n_tok"], r["text"])
        for r in src.select(
            "doc_id", token_count(F.col("text")).alias("n_tok"), "text"
        ).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_tok"], r["text"])
        for r in back.select(
            "doc_id", token_count(F.col("text")).alias("n_tok"), "text"
        ).collect()
    )
    # XML cannot distinguish NULL from empty text; normalize both sides the
    # way token_count already does (both -> 0 tokens) and compare texts
    # through the same coalesce
    norm = lambda rows: [(i, n, t if t else "") for i, n, t in rows]
    assert norm(got) == norm(want)
