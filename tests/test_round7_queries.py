"""Crafted-fixture semantics tests for the round-7 additions: l-diversity,
WOE binning, KMV distinct cardinality, and DSIR importance weights.

The DuckDB hash gate proves Spark == oracle on the testdata; these pin
that both engines compute the INTENDED semantics on inputs built to
expose each decision point."""

import math

from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows, sub="docs", link_rest=False):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        d + "/documents.parquet"
    )
    if link_rest:  # _shared_sql queries view EVERY table; borrow sf0.001
        import os

        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       f"{d}/{t}.parquet")
    return d


def test_l_diversity_flags_homogeneous_class(spark, tmp_path):
    """A class can pass k-anonymity (n >= 5) and still fail l-diversity
    when its sensitive attribute is near-constant — the exact gap the
    audit exists to close."""
    rows = (
        # class (en, 0): 6 members, ALL source 'web' -> k ok, l VIOLATION
        [(i, "t", "en", "web", 100) for i in range(6)]
        # class (en, 1): 6 members over 3 sources -> both pass
        + [(10 + i, "t", "en", ["web", "book", "wiki"][i % 3], 600)
           for i in range(6)]
        # class (fr, 0): 2 members, 2 sources -> k violation, l violation
        + [(20, "t", "fr", "web", 10), (21, "t", "fr", "book", 20)]
    )
    d = _write_docs(spark, tmp_path, rows, link_rest=True)
    got = {
        (r["lang"], r["size_bucket"]): (
            r["n"], r["l_distinct"], r["l_violation"], r["k_violation"]
        )
        for r in QUERIES["l_diversity_docs"].fn(spark, d).collect()
    }
    assert got == {
        ("en", 0): (6, 1, True, False),
        ("en", 1): (6, 3, False, False),
        ("fr", 0): (2, 2, True, True),
    }


def test_woe_binning_known_values(spark, tmp_path):
    """Two clean deciles of 10 orders each (prices strictly ordered so the
    ntile split is unambiguous): bin 1 all good, bin 2 all bad — WOE and
    IV computed by hand with the +0.5/+5 Laplace smoothing."""
    rows = [
        (i, 1, "O" if i < 10 else "F", 100.0 + i, None, None)
        for i in range(20)
    ]
    d = str(tmp_path / "woe")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(d + "/orders.parquet")
    got = {
        r["bin"]: (r["n"], r["n_bad"], r["woe"], r["iv_term"])
        for r in QUERIES["orders_woe_binning"].fn(spark, d).collect()
    }
    # 10 bins over 20 rows -> 2 rows per bin; bins 1-5 good, 6-10 bad
    bad_t, good_t = 10, 10
    for b, (n, n_bad, woe, iv) in got.items():
        assert n == 2
        want_bad = 2 if b > 5 else 0
        assert n_bad == want_bad
        br = (want_bad + 0.5) / (bad_t + 5.0)
        gr = (n - want_bad + 0.5) / (good_t + 5.0)
        assert abs(woe - math.log(br / gr)) < 1e-5, (b, woe)
        assert abs(iv - (br - gr) * math.log(br / gr)) < 1e-5, (b, iv)


def test_kmv_distinct_events_all_row_consistent(spark, tmp_path):
    """The __ALL__ row must equal a direct sketch over all users — here
    with < k distinct users everywhere, every row is EXACT, so the sketch
    doubles as a count-distinct and the ALL row counts the union (users
    appearing under several types dedup)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, i % 30, "click", 1.0, None) for i in range(300)
    ] + [
        (1000 + i, t0, i % 40, "view", 1.0, None) for i in range(400)
    ]
    d = str(tmp_path / "kmv")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(d + "/events.parquet")
    got = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in QUERIES["kmv_distinct_events"].fn(spark, d).collect()
    }
    assert got == {
        "click": (30, 30.0),
        "view": (40, 40.0),
        "__ALL__": (40, 40.0),  # users 0..39: click's 0..29 is a subset
    }


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """A document made of target-domain-only tokens must outscore one made
    of source-only tokens, with the mixed doc in between; weights sum
    per token INSTANCE (repeats count)."""
    rows = [
        (0, "alpha alpha beta", "en", "web", 16),   # target doc
        (1, "gamma delta", "fr", "web", 11),        # source-only doc
        (2, "alpha gamma", "fr", "web", 11),        # mixed
        (3, "alpha beta", "en", "web", 10),         # target doc
    ]
    d = _write_docs(spark, tmp_path, rows, sub="dsir")
    got = {r["doc_id"]: (r["n_tokens"], r["dsir_weight"])
           for r in QUERIES["dsir_weights_docs"].fn(spark, d).collect()}
    assert got[0][0] == 3 and got[1][0] == 2 and got[2][0] == 2
    # target-only docs score highest, source-only lowest
    assert got[0][1] > got[2][1] > got[1][1]
    assert got[3][1] > got[2][1]
    # hand-check doc 1: tokens gamma (ct=0, cs=2), delta (ct=0, cs=1);
    # T_t=5 (alpha x3, beta x2), T_s=9, V=4
    want = (
        (math.log(1 / 9.0) - math.log(3 / 13.0))
        + (math.log(1 / 9.0) - math.log(2 / 13.0))
    )
    assert abs(got[1][1] - want) < 1e-5


def test_maxsim_ranks_planted_doc_first(spark, tmp_path):
    """A planted document containing every query term's tokens
    co-occurring in one chunk must outrank docs with partial or no
    overlap; docs sharing no hashed dimension with any term score 0 via
    the absent-chunk clamp (never negative)."""
    rows = [
        (0, "hash join scan merge sort", "en", "web", 25),  # all terms
        (1, "hash join", "en", "web", 9),                   # one term
        (2, "table window group", "en", "web", 18),         # unrelated
    ]
    d = _write_docs(spark, tmp_path, rows, sub="maxsim")
    got = [(r["doc_id"], r["score"]) for r in
           QUERIES["maxsim_retrieval_docs"].fn(spark, d).collect()]
    scores = dict(got)
    assert got[0][0] == 0                      # full-overlap doc on top
    assert scores[0] > scores[1]
    assert scores[2] >= 0                      # clamp: never negative


def test_sq8_quantize_roundtrip_properties(spark):
    """Code range, constant-dimension exactness, and the uniform-grid
    error bound |v - recon| <= span/(2*255) + ulp slack."""
    from dagger_spark.ops.similarity import sq8_quantize

    rows = [(i, [float(i), 0.5, -1.0 + i * 0.13]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = sq8_quantize(emb).collect()
    spans = {0: 39.0, 1: 0.0, 2: 39 * 0.13}
    for r in q:
        assert 0 <= r["code"] <= 255
        if r["j"] == 1:          # constant dim: code 0, exact recon
            assert r["code"] == 0 and r["recon"] == r["v"]
        else:
            assert abs(r["v"] - r["recon"]) <= spans[r["j"]] / 510 + 1e-9


def test_t_closeness_flags_skewed_class(spark, tmp_path):
    """A class whose sensitive distribution diverges from the global one
    must flag even when it is big (k-anon ok) and diverse (l-div ok):
    global sources split ~50/50 'web'/'book'; the (en, 0) class is 5/6
    'web' -> t = |5/6 - global_web| /2 + ... > 0.3."""
    rows = (
        # class (en, 0): 6 docs, 5 web + 1 book — skewed but diverse
        [(i, "t", "en", "web" if i < 5 else "book", 100) for i in range(6)]
        # class (fr, 0): 6 docs mirroring the OPPOSITE skew
        + [(10 + i, "t", "fr", "book" if i < 5 else "web", 100)
           for i in range(6)]
    )
    d = _write_docs(spark, tmp_path, rows, sub="tclose", link_rest=True)
    got = {(r["lang"], r["size_bucket"]): (r["n"], r["t_distance"],
                                           r["t_violation"])
           for r in QUERIES["t_closeness_docs"].fn(spark, d).collect()}
    # global: web 6/12, book 6/12; each class: 5/6 vs 1/6
    # t = (|5/6-1/2| + |1/6-1/2|)/2 = (1/3 + 1/3)/2 = 1/3 > 0.3
    for key in (("en", 0), ("fr", 0)):
        n, t, viol = got[key]
        assert n == 6 and abs(t - 1 / 3) < 1e-5 and viol is True


def test_kmv_pairwise_overlap_exact_below_k(spark):
    """With vocabularies smaller than k the sketches hold the full sets,
    so every estimate is EXACT: jaccard, union and intersection equal
    the true set arithmetic."""
    from dagger_spark.ops.sketch import kmv_pairwise_overlap, kmv_sketch

    rows = (
        [("A", f"tok{i}") for i in range(40)]          # A = 0..39
        + [("B", f"tok{i}") for i in range(30, 70)]    # B = 30..69
        + [("C", f"other{i}") for i in range(10)]      # C disjoint
    )
    df = spark.createDataFrame(rows, "source string, tok string")
    sk = kmv_sketch(df, "tok", ["source"], k=128)
    got = {(r["source_a"], r["source_b"]):
           (r["x_common"], r["union_est"], r["inter_est"], r["jaccard_est"])
           for r in kmv_pairwise_overlap(sk, "source", k=128).collect()}
    x, u, i, j = got[("A", "B")]
    assert (x, u, i) == (10, 70.0, 10.0) and abs(j - 10 / 70) < 1e-5
    assert got[("A", "C")][0] == 0 and got[("A", "C")][2] == 0.0
    assert got[("B", "C")][1] == 50.0


def test_chi2_tokens_discriminative_token_wins(spark, tmp_path):
    """A token appearing in every target doc and no other must out-score
    a token spread evenly across both labels; the even token's chi2 is
    ~0 and the label-perfect token's equals N."""
    rows = (
        [(i, "target common" + (" even" if i < 5 else ""), "en", "web", 12)
         for i in range(10)]
        + [(10 + i, "offdomain common" + (" even" if i < 5 else ""),
            "fr", "web", 15) for i in range(10)]
    )
    d = _write_docs(spark, tmp_path, rows, sub="chi2")
    got = {r["tok"]: (r["n_target"], r["n_rest"], r["chi2"]) for r in
           QUERIES["chi2_tokens_docs"].fn(spark, d).collect()}
    # perfect separators: chi2 = N = 20
    assert got["target"] == (10, 0, 20.0)
    assert got["offdomain"] == (0, 10, 20.0)
    # perfectly even token: zero association
    assert got["even"] == (5, 5, 0.0)
    # a token in EVERY doc has (c+d)=0 — chi2 undefined, row filtered
    assert "common" not in got
