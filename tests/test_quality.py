"""Unit tests for ops/quality.py: Gopher gates, repetition, PII, chunking,
decontamination — crafted inputs with hand-computed expected values (the
cross-engine oracle parity is covered by test_catalog.py and the fuzz
suite; this file pins the SEMANTICS on cases the synthetic corpus lacks:
bullet/ellipsis lines, real PII strings, planted contamination)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dagger_spark.ops.quality import (
    GOPHER_BOUNDS, gopher_pass, gopher_stats, pii_counts, redact_pii,
    repetition_stats, word_ngrams,
)
from dagger_spark.ops.text import tokens

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], _SCHEMA)


def _one(df, cols):
    return df.select(*cols).collect()


# ---------------------------------------------------------------------------
# Gopher stats
# ---------------------------------------------------------------------------

def test_gopher_line_stats(spark):
    txt = "- item one\n* item two\nplain line\nends here...\n\n   \n"
    df = _docs(spark, [txt])
    s = gopher_stats(F.col("text"))
    row = df.select(
        s["n_lines"].alias("nl"),
        s["bullet_line_ratio"].alias("br"),
        s["ellipsis_line_ratio"].alias("er"),
    ).collect()[0]
    # 4 non-empty lines; 2 bullets; 1 ellipsis-ending
    assert row.nl == 4
    assert row.br == pytest.approx(0.5)
    assert row.er == pytest.approx(0.25)


def test_gopher_symbol_and_word_stats(spark):
    txt = "alpha beta### gamma... 42 …"
    df = _docs(spark, [txt])
    s = gopher_stats(F.col("text"))
    row = df.select(
        s["n_words"].alias("nw"),
        s["symbol_word_ratio"].alias("sr"),
        s["alpha_word_ratio"].alias("ar"),
        s["mean_word_len"].alias("ml"),
    ).collect()[0]
    # 5 tokens; symbols: 3 '#' + 1 '...' + 1 '…' = 5 -> ratio 1.0
    assert row.nw == 5
    assert row.sr == pytest.approx(1.0)
    # alpha-bearing tokens: alpha, beta###, gamma... -> 3/5
    assert row.ar == pytest.approx(0.6)
    # lengths 5, 7, 8, 2, 1 = 23 -> 4.6
    assert row.ml == pytest.approx(4.6)


def test_gopher_pass_flag(spark):
    good = " ".join(
        ["the", "be", "to", "of", "and"] + [f"word{i:02d}" for i in range(60)])
    too_short = "the and of tiny"
    no_stopwords = " ".join(f"word{i:02d}" for i in range(60))
    df = _docs(spark, [good, too_short, no_stopwords, None, ""])
    s = gopher_stats(F.col("text"))
    flags = [r.p for r in df.select(gopher_pass(s).alias("p")).collect()]
    assert flags == [True, False, False, False, False]
    assert GOPHER_BOUNDS["min_words"] == 50  # doc above is sized against this


def test_gopher_null_and_empty(spark):
    # note: tokens() trims SPACES only (both engines agree), so a doc of
    # "   \n" still tokenizes to empty-string tokens — whitespace-only here
    # means spaces; the \n-only case is covered by the fuzz parity suite
    df = _docs(spark, [None, "", "     "])
    s = gopher_stats(F.col("text"))
    rows = df.select(
        s["n_words"].alias("nw"), s["n_lines"].alias("nl"),
        s["mean_word_len"].alias("ml"), s["bullet_line_ratio"].alias("br"),
    ).collect()
    for r in rows:
        assert (r.nw, r.nl, r.ml, r.br) == (0, 0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Repetition
# ---------------------------------------------------------------------------

def test_repetition_fracs(spark):
    df = _docs(spark, ["a b a b a b", "all tokens here unique now", "a", None])
    r = repetition_stats(F.col("text"))
    rows = df.select(
        r["dup_frac_2gram"].alias("d2"), r["dup_frac_3gram"].alias("d3")
    ).collect()
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> 2 distinct of 5 -> 0.6
    #                trigrams [aba, bab, aba, bab] -> 2 of 4 -> 0.5
    assert rows[0].d2 == pytest.approx(0.6)
    assert rows[0].d3 == pytest.approx(0.5)
    assert rows[1].d2 == 0.0 and rows[1].d3 == 0.0
    assert rows[2].d2 == 0.0 and rows[2].d3 == 0.0  # too short for any gram
    assert rows[3].d2 == 0.0 and rows[3].d3 == 0.0  # NULL ≡ empty


def test_word_ngrams_short_docs_empty(spark):
    df = _docs(spark, ["one two", ""])
    out = df.select(word_ngrams(tokens(F.col("text")), 3).alias("g")).collect()
    assert out[0].g == [] and out[1].g == []


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_counts_and_redaction(spark):
    txt = ("mail a.b+tag@ex-ample.org or c@d.io, host 10.0.200.7 and "
           "192.168.1.1, call +12345678901 today")
    df = _docs(spark, [txt])
    c = pii_counts(F.col("text"))
    row = df.select(
        c["email"].alias("e"), c["ipv4"].alias("i"), c["phone"].alias("p"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()[0]
    assert (row.e, row.i, row.p) == (2, 2, 1)
    assert row.red == ("mail <EMAIL> or <EMAIL>, host <IPV4> and "
                       "<IPV4>, call <PHONE> today")


def test_pii_redaction_order_email_before_phone(spark):
    # the email local part contains '+digits' — redacting emails first must
    # prevent the phone pattern from eating the middle of the address
    txt = "user+12345678@example.com"
    df = _docs(spark, [txt])
    row = df.select(redact_pii(F.col("text")).alias("red"),
                    pii_counts(F.col("text"))["phone"].alias("p")).collect()[0]
    assert row.red == "<EMAIL>"


def test_pii_null_text(spark):
    df = _docs(spark, [None])
    c = pii_counts(F.col("text"))
    row = df.select(c["email"].alias("e"),
                    redact_pii(F.col("text")).alias("red")).collect()[0]
    assert row.e == 0 and row.red == ""


# ---------------------------------------------------------------------------
# Chunking + decontamination through the catalog entries (tmp corpus)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quality_dir(tmp_path_factory):
    """A crafted documents.parquet: a 35-token doc (3 chunks at 16/12), a
    5-token doc, an empty doc, and a planted bench/train duplicate pair
    (doc 0 is in the bench split doc_id%17==0; doc 3 copies 10 of its
    tokens -> shared 5-gram shingles)."""
    d = tmp_path_factory.mktemp("qualitydocs")
    bench_text = " ".join(f"tok{i:02d}" for i in range(20))
    texts = [
        bench_text,                                       # doc 0: bench split
        " ".join(f"w{i:02d}" for i in range(35)),         # doc 1: 3 chunks
        "just five little tokens here",                   # doc 2: 1 chunk
        "prefix " + " ".join(f"tok{i:02d}" for i in range(10)),  # doc 3: contaminated
        "",                                               # doc 4: no chunks
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_chunk_docs_windows(spark, quality_dir):
    from dagger_spark.catalog import QUERIES

    out = QUERIES["chunk_docs"].fn(spark, quality_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 35 tokens, size 16 stride 12 -> starts 1,13,25 with sizes 16,16,11
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.chunk_start, r.n_chunk_tokens) for r in d1] == [
        (1, 1, 16), (2, 13, 16), (3, 25, 11)]
    # 5 tokens -> one chunk of 5; empty doc -> no chunks at all
    assert [(r.chunk_idx, r.n_chunk_tokens) for r in by_doc[2]] == [(1, 5)]
    assert 4 not in by_doc
    # overlap invariant: consecutive chunks share size-stride = 4 tokens
    toks = " ".join(f"w{i:02d}" for i in range(35)).split()
    assert toks[12:28][:4] == toks[0:16][-4:]


def test_decontam_flags_planted_duplicate(spark, quality_dir):
    from dagger_spark.catalog import QUERIES

    rows = QUERIES["decontam_docs"].fn(spark, quality_dir).collect()
    got = {r.doc_id: r for r in rows}
    # doc 3 shares 5-gram shingles with bench doc 0: its 10 copied tokens
    # give 6 shingles, all present in doc 0's 16 -> n_overlap == 6
    assert set(got) == {3}
    assert got[3].n_overlap == 6
    # doc 3 has 7 shingles total (11 tokens) -> contamination 6/7
    assert got[3].n_grams == 7
    assert got[3].contamination == pytest.approx(6 / 7, abs=1e-6)


def test_profile_table_exact_counts(spark):
    from pyspark.sql import Row

    from dagger_spark.ops.quality import profile_table

    df = spark.createDataFrame(
        [Row(a=1, s="x"), Row(a=1, s=None), Row(a=None, s="y"),
         Row(a=30, s="x")],
        "a int, s string",
    )
    p = {r["col_name"]: r for r in profile_table(df, ["a", "s"]).collect()}
    assert p["a"]["n_rows"] == 4 and p["a"]["n_nulls"] == 1
    assert p["a"]["n_distinct"] == 2  # nulls excluded, dup counted once
    # min/max aggregate on the NATIVE type: 30 > 1 numerically even though
    # '1' > '30' would win a lexicographic string comparison after casting
    assert (p["a"]["min_value"], p["a"]["max_value"]) == ("1", "30")
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["a"]["null_frac"] == 0.25


def test_drift_psi_hand_computed(spark):
    import math

    from dagger_spark.ops.quality import drift_psi

    # ref: 10xA, 5xB; cur: 4xA, 8xB, 3xC  -> 3 bins incl. one ref-empty
    rows = (
        [("A", True)] * 10 + [("B", True)] * 5
        + [("A", False)] * 4 + [("B", False)] * 8 + [("C", False)] * 3
    )
    df = spark.createDataFrame(rows, "bin string, is_ref boolean")
    got = drift_psi(df, "bin", feature_name="f").collect()[0]
    nb = 3
    exp = 0.0
    for rn, cn in ((10, 4), (5, 8), (0, 3)):
        pr = (rn + 0.5) / (15 + 0.5 * nb)
        pc = (cn + 0.5) / (15 + 0.5 * nb)
        exp += (pc - pr) * math.log(pc / pr)
    assert got["feature"] == "f"
    assert got["n_bins"] == 3
    assert got["psi"] == round(exp + 1e-9, 6)
    assert got["verdict"] == ("stable" if exp < 0.1 else
                              "moderate" if exp < 0.25 else "shifted")


def test_drift_psi_identical_snapshots_stable(spark):
    from dagger_spark.ops.quality import drift_psi

    rows = [(str(i % 5), bool(flag)) for i in range(100) for flag in (0, 1)]
    df = spark.createDataFrame(rows, "bin string, is_ref boolean")
    got = drift_psi(df, "bin").collect()[0]
    assert got["psi"] == 0.0 or abs(got["psi"]) < 1e-6
    assert got["verdict"] == "stable"
