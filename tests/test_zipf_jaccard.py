"""Prefix filtering on a corpus where it can actually prune: Zipfian vocab,
planted near-duplicates, NO input cap — exactness vs a brute-force oracle
plus an asserted candidate-count bound (the pruning claim itself)."""

import duckdb

from dagger_spark.fixtures import write_zipf_docs_parquet
from dagger_spark.ops.dedup import jaccard_prefix_candidates, jaccard_prefix_join


def test_zipf_prefix_join_exact_and_pruned(spark, tmp_path):
    p = str(tmp_path / "zipf.parquet")
    write_zipf_docs_parquet(p)
    docs = spark.read.parquet(p)
    n = docs.count()
    assert n == 1200

    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_prefix_join(docs).collect()
    }

    con = duckdb.connect()
    want = {
        (a, b, j)
        for a, b, j in con.execute(
            f"""
            WITH d AS (
              SELECT doc_id, string_split(text, ' ') AS t
              FROM read_parquet('{p}')
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.t, b.t)) AS nint,
                     len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS nuni
              FROM d a JOIN d b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, round(nint::DOUBLE / nuni, 6)
            FROM p WHERE 10 * nint >= 9 * nuni
            """
        ).fetchall()
    }
    # losslessness: pruned plan == brute force over all n(n-1)/2 pairs
    assert got == want
    assert len(got) == 40  # the planted copies, nothing else

    # the pruning bound — the prefix filter's reason to exist: candidates
    # are a vanishing fraction of the 719,400 possible pairs
    n_cand = jaccard_prefix_candidates(docs).count()
    all_pairs = n * (n - 1) // 2
    assert n_cand < 0.02 * all_pairs, (n_cand, all_pairs)
    # and the candidates still cover every qualifying pair (sanity overlap)
    assert n_cand >= 40
