"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
  * exact dedup is a single hash-aggregate (map-side partial combine);
  * MinHash/LSH turns the O(n^2) near-dup problem into a shuffle keyed by
    (band, bucket-hash) — candidate pairs only form inside buckets, which is
    the standard shingle->minhash->band->bucket-join pipeline;
  * all hashing is md5-based and deterministic so DuckDB can replay every
    step for the differential oracle (no JVM-private hash functions).

No UDFs — everything is higher-order built-ins (`transform`, `aggregate`,
`array_min`) over arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact (md5) text duplicate group.

    One hash-shuffle; the groupBy(md5) formulation (vs dropDuplicates) is
    deterministic and keeps the survivor choice explicit.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined), sorted for determinism."""
    toks = tokens(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_sort(F.array_distinct(grams))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for hash j, min over shingles of md5(j:shingle).

    md5-of-seeded-string stands in for the usual universal hash family —
    deterministic, uniform enough, and replayable in any engine with md5.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s)))
        ),
    )


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: array of (band_id, bucket_hash) structs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band))).alias("bucket"),
        ),
    )


def shingled_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 3
) -> DataFrame:
    """(id, sh) with STAGED projections: tokens, then shingles.  Each stage's
    output is referenced many times by the next, so Catalyst keeps the
    project boundaries (CollapseProject only inlines cheap or single-use
    expressions) — the text is split once per row, not once per shingle."""
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    n = F.size(F.col("__toks"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (shingle_k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, shingle_k)),
    )
    return toks.select("id", F.array_sort(F.array_distinct(grams)).alias("sh"))


def bucketed_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bucket) LSH bucket assignments, signature computed ONCE per
    document (staged projections; see shingled_docs)."""
    rows_per_band = num_hashes // bands
    sh = shingled_docs(df, text_col, id_col, shingle_k)
    sig = sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("__sig"))
    return (
        sig.select("id", F.explode(minhash_bands(F.col("__sig"), bands, rows_per_band)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via MinHash LSH.

    Shuffle keys are (band, bucket) — data-local, no cross join anywhere.
    A pair sharing multiple bands is emitted once (distinct).  The bucket
    table is persisted so the self-join reuses one signature computation
    instead of re-scanning and re-hashing per side — at scale this is the
    difference between one and two passes over the corpus.
    """
    bucketed = bucketed_minhash(df, text_col, id_col, shingle_k, num_hashes, bands).persist()
    left = bucketed.alias("l")
    right = bucketed.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """n-gram Jaccard near-dup: LSH candidates -> exact Jaccard verify.

    The verify join re-attaches shingle arrays to the candidate pair list
    (two broadcast-able joins against the docs projection), then filters by
    the true Jaccard similarity — the classic filter-and-verify shape.
    The shingle table is persisted: computed once, read by both join sides.
    """
    docs = shingled_docs(df, text_col, id_col, shingle_k).persist()
    cands = minhash_candidate_pairs(df, text_col, id_col, shingle_k, num_hashes, bands)
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        cands.join(a, cands.id_a == F.col("a.id"))
        .join(b, cands.id_b == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash bit string from a precomputed array of md5-hex token hashes:
    per bit position p (one hex nibble), sum +1/-1 votes of the nibble's
    high bit ('8'..'f' sort >= '8' in ASCII — engine-portable string
    compare); bit=1 iff sum>0."""
    bit_chars = F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda p: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(h.substr(p, F.lit(1)) >= "8", F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.concat_ws("", bit_chars)


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens (single-Column form).  Prefer
    ``simhash_df`` in pipelines: it stages the per-token md5 so each token is
    hashed once instead of once per bit position."""
    return simhash_from_hashes(F.transform(tokens(text), F.md5), bits)


def simhash_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """(id, sig): staged SimHash — tokenize, md5 each token ONCE, then fold
    the 32 bit positions over the precomputed hashes.  The hash array is
    referenced `bits` times, so Catalyst keeps the projection boundary and
    the md5 work is 1/bits of the naive inline form."""
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(F.col(text_col)), F.md5).alias("__hashes"),
    )
    return hashed.select("doc_id", simhash_from_hashes(F.col("__hashes"), bits).alias("sig"))


def hamming_distance(sig_a: Column, sig_b: Column, bits: int = 32) -> Column:
    """Hamming distance between two '0'/'1' signature strings."""
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda p: sig_a.substr(p, F.lit(1)) != sig_b.substr(p, F.lit(1)),
        )
    )
