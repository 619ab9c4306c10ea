"""Fuzzed-corpus differential testing for the document-family operators.

The driver's gate runs each catalog query against its DuckDB oracle on the
FIXED testdata; this suite re-runs the doc-family pairs on randomized
corpora salted with the edge cases that break tokenizers and hash pipelines
— empty text, whitespace-only, single tokens, unicode, exact duplicates,
near-duplicates, long repeats — so cross-engine parity is a property, not a
coincidence of one dataset.
"""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_catalog import normalize  # noqa: E402

from dagger_spark.catalog import QUERIES  # noqa: E402

DOC_QUERIES = [
    "exact_dedup_docs",
    "minhash_pairs_docs",
    "jaccard_pairs_docs",
    "simhash_docs",
    "simhash_neardup",
    "simhash_multiprobe",
    "dedup_clusters_docs",
    "language_id_docs",
    "language_id_ngram_docs",
    "token_counts_docs",
    "text_stats_docs",
    "fingerprint_docs",
    "docs_hash_sample",
    "docs_stratified_sample",
    "docs_pack_bins",
    "tfidf_top_terms",
    "training_manifest",
    "gopher_quality_docs",
    "repetition_docs",
    "pii_scan_docs",
    "chunk_docs",
    "decontam_docs",
    "substring_dedup_docs",
    "mixture_sample_docs",
    "normalize_docs",
    "bloom_decontam_docs",
    "sentences_docs",
    "jaccard_exact_join",
    # round-3 first wave
    "chunk_dedup_docs",
    "bm25_topk_docs",
    "dedup_canonical_docs",
    "weighted_sample_docs",
    "heavy_hitters_docs",
    "token_entropy_docs",
    "pack_sequences_docs",
    "incremental_dedup_docs",
    # round-3 second wave
    "quality_classifier_docs",
    "unigram_logprob_docs",
    "winnowing_docs",
    "html_strip_docs",
    "phrase_search_docs",
    "corpus_diff_docs",
    "profile_documents",
    "bpe_pair_counts_docs",
    "pagerank_docs",
    "quality_policy_docs",
    "classifier_calibration_docs",
    # round-3 continuation wave
    "bpe_encode_docs",
    "line_scrub_docs",
    "cdc_chunk_docs",
    "bigram_logprob_docs",
    "editdist_neardup_docs",
    "triangle_count_docs",
    "k_anonymity_docs",
    "containment_pairs_docs",
    "zipf_slope_docs",
    "lsh_recall_docs",
    "kcore_docs",
    "keywords_per_doc",
    "quantile_normalize_docs",
    # round 6: curriculum staging on the range-partitioned global ntile
    "curriculum_stages_docs",
    # round-6 continuation
    "cluster_split_docs",
    "label_prop_docs",
    "corpus_merkle_diff",
    # round 7 (documents/embeddings-only entries; l_diversity/t_closeness
    # are _shared_sql over ALL tables and need the full testdata dir)
    "dsir_weights_docs",
    "maxsim_retrieval_docs",
    "chi2_tokens_docs",
    "kmv_source_overlap_docs",
    # round 8
    "classifier_auc_docs",
    "pmi_collocations_docs",
    "source_kl_divergence_docs",
    "novelty_docs",
    "classifier_kappa_docs",
    "fertility_by_lang_docs",
    "source_dup_matrix_docs",
    # embeddings family on the fuzz corpus's 8-dim vectors: Matryoshka
    # prefixes past the true dim cap at length in BOTH engines (slice
    # semantics), so recalls collapse to 1.0 identically — the parity
    # still exercises slicing/ranking; IVF+SQ8 exercises the quantize/
    # re-assemble chain on random float32 values
    "matryoshka_recall_embeddings",
    "label_centroid_sim_embeddings",
    "hard_negatives_embeddings",
    "ann_ivf_sq8",
]

_WORDS = (
    "the quick brown fox jumps over lazy dog and a cat sat on mat with "
    "der die und das el la de que le les data spark duck engine stream"
).split()

_EDGE_TEXTS = [
    "",
    "   ",
    "one",
    "tab\tsep\ttokens",
    "line\nbreaks\nhere",
    "ünïcödé tökens ünïcödé tökens",
    "cafe\u0301 decomposed e\u0301 combining ü\u0308 marks",  # non-NFC input
    "punct!!! ??? ... ;;; :::",
    # astral-plane (non-BMP) codepoints: Java strings are UTF-16, so any
    # operator counting code UNITS instead of codepoints (length, substr,
    # '.' regex, char split) diverges from DuckDB's UTF-8 codepoints here
    "emoji 😀 pair 👍🏽 astral 𝕊𝕡𝕒𝕣𝕜 mixed a😀b done",
    "12345 67890 12345",
    ("repeat " * 40).strip(),
    # gopher line-stat branches: bullets, ellipsis line-ends, blank lines
    "- item one\n* item two\n• item three\nplain line",
    "trailing dots...\nand more…\n\n   \nfinal line",
    # organic PII for the scan/redact parity (on top of the doc_id salting)
    "mail bob.smith+x@ex-ample.org ip 192.168.0.1 call +12345678901 end",
]


def _random_corpus(seed: int, n: int = 60) -> pd.DataFrame:
    rng = random.Random(seed)
    texts = list(_EDGE_TEXTS)
    while len(texts) < n - 6:
        k = rng.randint(1, 30)
        texts.append(" ".join(rng.choice(_WORDS) for _ in range(k)))
    # exact duplicates and near-duplicates (one-token edits) of random docs
    for _ in range(3):
        texts.append(rng.choice(texts[9:]) if len(texts) > 9 else "dup")
    for _ in range(3):
        base = rng.choice([t for t in texts if t.strip()])
        toks = base.split()
        toks[rng.randrange(len(toks))] = rng.choice(_WORDS)
        texts.append(" ".join(toks))
    rng.shuffle(texts)
    texts.append(None)  # NULL text — tokenizers/hash pipelines must agree
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": [rng.choice(["en", "de", "es", "xx"]) for _ in texts],
            "source": [rng.choice(["web", "book", "code"]) for _ in texts],
            "n_chars": [len(t) if t is not None else None for t in texts],
        }
    )
    # NULL stratum keys: grouping/windows treat NULL as one key in both
    # engines — sampling/packing must agree on it
    df.loc[df.index[-1], "lang"] = None
    df.loc[df.index[-1], "source"] = None
    return df


@pytest.fixture(scope="module", params=[7, 1234])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzdocs{request.param}")
    pdf = _random_corpus(request.param)
    doc_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),  # pandas None-coercion would write DOUBLE
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=doc_schema, preserve_index=False),
        os.path.join(str(d), "documents.parquet"),
    )
    # a matching embeddings table (vec_id aligned to doc_id) for the
    # manifest-assembly join; includes a zero vector
    rng = random.Random(request.param + 1)
    emb = pd.DataFrame(
        {
            "vec_id": pdf["doc_id"],
            "embedding": [
                [0.0] * 8
                if i == 0
                else [round(rng.uniform(-1, 1), 6) for _ in range(8)]
                for i in range(len(pdf))
            ],
            "label": [rng.randint(0, 3) for _ in range(len(pdf))],
        }
    )
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(emb, schema=schema, preserve_index=False),
        os.path.join(str(d), "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_matches_oracle_on_fuzzed_corpus(spark, fuzz_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{fuzz_dir}/{t}.parquet')"
        )
    ddf = con.execute(q.oracle).fetchdf()
    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} spark vs {len(b)} duckdb rows"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: {int(neq.sum())}/{len(a)} rows differ\n"
            + str(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
        )
