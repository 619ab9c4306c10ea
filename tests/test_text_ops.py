"""Crafted-case tests for the round-3 text operators: winnowing
fingerprints, the feature-hashing quality classifier, and unigram-LM
scoring.  Each pins the operator against an independent pure-Python
recomputation so the catalog oracle (DuckDB) is not the only witness."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dagger_spark.ops.text import (
    HASH_DIM,
    char_kgram_hashes,
    char_trigrams,
    classifier_weights,
    hashing_trick_logit,
    winnow_fingerprints,
)

K, W = 8, 16


def _py_kgram_hashes(text, k=K):
    text = text or ""
    n = len(text)
    out = []
    for i in range(max(n - (k - 1), 1)):
        g = text[i : i + k]
        out.append(int(hashlib.md5(g.encode()).hexdigest()[:15], 16))
    return out


def _py_winnow(hashes, w=W):
    nwin = max(len(hashes) - (w - 1), 1)
    return sorted({min(hashes[i : i + w]) for i in range(nwin)})


def _winnow_row(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    staged = df.select(char_kgram_hashes(F.col("text"), K).alias("hs"))
    return staged.select(
        winnow_fingerprints(F.col("hs"), W).alias("fps")
    ).head()["fps"]


def test_winnowing_matches_python_reference(spark):
    text = "the quick brown fox jumps over the lazy dog " * 5
    assert _winnow_row(spark, text) == _py_winnow(_py_kgram_hashes(text))


def test_winnowing_shared_substring_guarantee(spark):
    # the winnowing guarantee: two documents sharing any substring of
    # length >= k + w - 1 (= 23) chars share at least one fingerprint
    shared = "zq" * 12  # 24 chars, alien to both carriers
    a = "left context entirely unlike " + shared + " tail one"
    b = "completely different prefix text " + shared + " other end"
    fa, fb = set(_winnow_row(spark, a)), set(_winnow_row(spark, b))
    assert fa & fb
    # and two unrelated texts of the same shape share none
    c = "completely different prefix text " + "xv" * 12 + " other end"
    assert not fa & set(_winnow_row(spark, c))


def test_winnowing_short_text_single_window(spark):
    # shorter than one window: all gram hashes collapse to one global min
    text = "short text!"  # 11 chars -> 4 grams, < w
    fps = _winnow_row(spark, text)
    assert fps == [min(_py_kgram_hashes(text))]


def _py_logit(text, weights):
    t = (text or "").strip().lower()
    grams = []
    for i in range(max(len(t) - 2, 1)):
        g = t[i : i + 3]
        if g not in grams:
            grams.append(g)
    return sum(
        weights[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % HASH_DIM]
        for g in grams
    )


@pytest.mark.parametrize(
    "text",
    [
        "The quick brown fox jumps over the lazy dog.",
        "",
        None,
        "aaaaaaaaaaaaaaaaaaaaaaa",
    ],
)
def test_hashing_trick_logit_matches_python(spark, text):
    w = classifier_weights()
    df = spark.createDataFrame([Row(doc_id=1, text=text)], "doc_id int, text string")
    staged = df.select(char_trigrams(F.col("text")).alias("tg"))
    got = staged.select(hashing_trick_logit(F.col("tg"), w).alias("l")).head()["l"]
    assert got == _py_logit(text, w)


def test_classifier_weights_deterministic_and_bounded():
    w = classifier_weights()
    assert len(w) == HASH_DIM
    assert w == classifier_weights()
    assert all(-100 <= x <= 100 for x in w)
    assert any(x > 0 for x in w) and any(x < 0 for x in w)


def test_unigram_logprob_ranks_rare_tokens_lower(spark, tmp_path):
    # corpus: 9 docs of common filler + 1 doc carrying a hapax token.
    # the hapax doc must score a strictly lower avg log-prob (higher ppl).
    from dagger_spark.catalog import QUERIES

    rows = [Row(doc_id=i, text="common words repeat here", lang="en",
                source="s", n_chars=24) for i in range(9)]
    rows.append(Row(doc_id=9, text="common words xylophone here", lang="en",
                    source="s", n_chars=27))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in QUERIES["unigram_logprob_docs"].fn(spark, d).collect()
    }
    assert out[9]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[9]["perplexity"] > out[0]["perplexity"]
    # exact recomputation of the hapax doc: counts over the 10-doc corpus
    n_total, n_vocab = 40, 5  # common/words/here x10, repeat x9, xylophone x1
    def lp(c):
        return round(math.log((c + 1) / (n_total + n_vocab)) * 1e6)
    s = lp(10) + lp(10) + lp(1) + lp(10)
    assert out[9]["sum_lp_micro"] == s
    assert out[9]["n_tokens"] == 4


def test_html_strip_removes_script_bodies_and_recovers_text(spark, tmp_path, sf_dir):
    from dagger_spark.catalog import QUERIES

    out = QUERIES["html_strip_docs"].fn(spark, sf_dir).collect()
    assert out and all(r["clean_ok"] for r in out)
    assert all(r["title"] == f"Doc {r['doc_id']}" for r in out[:5])
    # the script BODY (not just its tags) must be gone
    assert all("var t =" not in r["clean_text"] for r in out[:20])
    # crafted: multi-line whitespace text collapses, not a parity hazard
    from pyspark.sql import Row

    d = str(tmp_path / "h")
    spark.createDataFrame(
        [Row(doc_id=1, text="a\n\n  b\tc ", lang="en", source="s", n_chars=9)]
    ).write.parquet(d + "/documents.parquet")
    r = QUERIES["html_strip_docs"].fn(spark, d).head()
    assert r["clean_text"] == "Doc 1 Doc 1 a b c fin" and r["clean_ok"]


def _mini_docs(spark, tmp_path, texts):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    ).write.parquet(d + "/documents.parquet")
    return d


def test_phrase_search_positions_and_overlap(spark, tmp_path):
    from dagger_spark.catalog import QUERIES

    d = _mini_docs(spark, tmp_path, [
        "table hash x table hash",   # starts 1 and 4
        "table table hash",          # adjacency only at start 2
        "hash table",                # reversed order: no match
        "table hash",                # exact
    ])
    out = {r["doc_id"]: r for r in
           QUERIES["phrase_search_docs"].fn(spark, d).collect()}
    assert out[0]["n_matches"] == 2 and out[0]["first_pos"] == 1
    assert out[1]["n_matches"] == 1 and out[1]["first_pos"] == 2
    assert 2 not in out  # reversed order must not match
    assert out[3]["n_matches"] == 1


def test_corpus_diff_statuses(spark, tmp_path):
    from dagger_spark.catalog import QUERIES

    d = _mini_docs(spark, tmp_path, [f"text {i}" for i in range(20)])
    out = {r["doc_id"]: r["status"] for r in
           QUERIES["corpus_diff_docs"].fn(spark, d).collect()}
    assert 0 not in out            # dropped from both snapshots
    assert out[11] == "added"      # missing from old only
    assert out[13] == "removed"    # missing from new only
    assert out[7] == "changed" and out[14] == "changed"
    assert out[1] == "unchanged" and out[12] == "unchanged"
