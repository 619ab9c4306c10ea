"""CorpusPipeline (the fluent composition API) must agree exactly with the
oracle-verified catalog components it composes — same params, same
answers — so the differential gate's guarantees transfer to the API."""

from pyspark.sql import functions as F

from dagger_spark.pipeline import CorpusPipeline
from dagger_spark.sources.files import load_table


def test_pipeline_verdict_matches_catalog_components(spark, sf_dir):
    from dagger_spark.catalog import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    v = (
        CorpusPipeline(docs)
        .quality_gates()
        .near_dedup()
        .decontaminate(bench)
        .verdict()
        .collect()
    )
    got = {r["doc_id"]: r for r in v}
    assert len(got) == docs.count()

    q = {r["doc_id"]: r["passes"]
         for r in QUERIES["gopher_quality_docs"].fn(spark, sf_dir).collect()}
    c = {r["doc_id"]: r["keep"]
         for r in QUERIES["dedup_canonical_docs"].fn(spark, sf_dir).collect()}
    d = {r["doc_id"]: r["contamination"]
         for r in QUERIES["decontam_docs"].fn(spark, sf_dir).collect()}
    for did, r in got.items():
        assert r["passes_quality"] == q.get(did, False), did
        assert r["is_canonical"] == c.get(did, False), did
        if did % 17 != 0:  # catalog decontam scores only the train split
            assert r["is_clean"] == (d.get(did, 0.0) < 0.05), did
        assert r["keep"] == (
            r["passes_quality"] and r["is_canonical"] and r["is_clean"]
        )


def test_pipeline_kept_returns_surviving_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    p = CorpusPipeline(docs).quality_gates().near_dedup()
    kept = p.kept()
    n_keep = p.verdict().filter(F.col("keep")).count()
    assert kept.count() == n_keep > 0
    assert set(kept.columns) == set(docs.columns)


def test_pipeline_classifier_gate_alone(spark, sf_dir):
    from dagger_spark.ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    docs = load_table(spark, sf_dir, "documents")
    v = CorpusPipeline(docs).classifier_gate().verdict()
    got = {r["doc_id"]: r["classifier_keep"] for r in v.collect()}
    want = {
        r["doc_id"]: r["l"] > 0
        for r in docs.select(
            "doc_id", char_trigrams(F.col("text")).alias("tg")
        ).select(
            "doc_id",
            hashing_trick_logit(F.col("tg"), classifier_weights()).alias("l"),
        ).collect()
    }
    assert got == want


def test_publish_writes_partitioned_and_manifests_exactly(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    p = CorpusPipeline(docs).quality_gates()
    out = str(tmp_path / "corpus_out")
    manifest = {tuple(r)[:1]: (r["n_docs"], r["content_checksum"])
                for r in p.publish(out).collect()}

    # partition directories exist per lang and prune at the storage layer
    langs = {d.split("=", 1)[1] for d in os.listdir(out)
             if d.startswith("lang=")}
    assert langs == {k[0] for k in manifest}

    # the manifest counts what was WRITTEN, which equals kept()
    kept = p.kept()
    want = {(r["lang"],): r["n"] for r in
            kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {k: v[0] for k, v in manifest.items()} == want

    # checksum is content-derived and order-free: recompute independently
    chk = {(r["lang"],): r["c"] for r in kept.groupBy("lang").agg(
        F.sum(F.crc32(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long").alias("c")).collect()}
    assert {k: v[1] for k, v in manifest.items()} == chk

    # re-publish is idempotent: identical manifest
    again = {tuple(r)[:1]: (r["n_docs"], r["content_checksum"])
             for r in p.publish(out).collect()}
    assert again == manifest
