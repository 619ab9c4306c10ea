"""Crafted-fixture semantics tests for the round-8 additions: exact
ROC-AUC, PMI collocations, per-source KL divergence, Matryoshka prefix
recall, and label-centroid similarity.

The DuckDB hash gate proves Spark == oracle on the testdata; these pin
that both engines compute the INTENDED semantics — each test recomputes
the expected answer independently (brute-force Python/numpy) on inputs
built to expose the decision points (ties for AUC's average ranks, the
min-count cut for PMI, a prefix-vs-full rank flip for Matryoshka)."""

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _r6(x: float) -> float:
    """The catalog's rounding convention: +1e-9 then round(6) HALF_UP
    (python round() is half-even; Spark/DuckDB are not)."""
    return float(
        Decimal(repr(x + 1e-9)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _write_docs(spark, tmp_path, rows, sub="docs"):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        d + "/documents.parquet"
    )
    return d


def _write_embs(spark, tmp_path, rows, sub="embs"):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, EMB_SCHEMA).write.parquet(
        d + "/embeddings.parquet"
    )
    return d


def test_classifier_auc_matches_pairwise_bruteforce(spark, tmp_path):
    """AUC from the rank-sum identity must equal the O(P*N) pairwise
    definition — (#concordant + 0.5 * #tied) / (P*N) — including ties
    (identical texts across labels force tied logits, the average-rank
    branch)."""
    rows = [
        (i, t, lang, "web", len(t))
        for i, (t, lang) in enumerate(
            [
                ("the quick brown fox", "en"),
                ("the quick brown fox", "fr"),    # tied logit, other label
                ("hello world again", "en"),
                ("bonjour le monde", "fr"),
                ("completely different text", "en"),
                ("texte totalement autre", "fr"),
                ("short", "en"),
                ("short", "fr"),                  # second tie pair
                ("", "en"),                       # empty text: logit 0
                ("zz top", "fr"),
            ]
        )
    ]
    d = _write_docs(spark, tmp_path, rows)

    from dagger_spark.ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    scored = (
        spark.read.parquet(d + "/documents.parquet")
        .select(
            (F.col("lang") == "en").alias("en"),
            hashing_trick_logit(
                char_trigrams(F.col("text")), classifier_weights()
            ).alias("s"),
        )
        .collect()
    )
    pos = [r["s"] for r in scored if r["en"]]
    neg = [r["s"] for r in scored if not r["en"]]
    conc = sum(
        (1.0 if p > n else 0.5 if p == n else 0.0) for p in pos for n in neg
    )
    expected = conc / (len(pos) * len(neg))

    got = QUERIES["classifier_auc_docs"].fn(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == _r6(expected)


def test_pmi_collocations_values_and_min_count(spark, tmp_path):
    """Known token stream: 'new york' x6 and 'hot dog' x5 pass the
    min-count-5 cut with hand-computable PMI; 'san jose' x4 must be
    absent.  Filler unigrams push the totals so PMI isn't degenerate."""
    rows = []
    i = 0
    for t, n in (("new york", 6), ("hot dog", 5), ("san jose", 4)):
        for _ in range(n):
            rows.append((i, t, "en", "web", len(t)))
            i += 1
    for _ in range(10):  # single-token docs: unigrams, no bigrams
        rows.append((i, "filler", "en", "web", 6))
        i += 1
    d = _write_docs(spark, tmp_path, rows)
    got = {
        (r["w1"], r["w2"]): (r["c_ab"], r["pmi"])
        for r in QUERIES["pmi_collocations_docs"].fn(spark, d).collect()
    }
    nu = 2 * (6 + 5 + 4) + 10   # 40 tokens
    nb = 6 + 5 + 4              # 15 bigrams

    def pmi(c_ab, c_a, c_b):
        return _r6(math.log(c_ab * nu * nu / (nb * c_a * c_b)))

    assert got == {
        ("new", "york"): (6, pmi(6, 6, 6)),
        ("hot", "dog"): (5, pmi(5, 5, 5)),
    }


def test_source_kl_divergence_closed_form(spark, tmp_path):
    """Two sources with hand-computable distributions: source 'pure' is
    all token 'a'; source 'mix' is half 'a' half 'b'.  Corpus: a=6/8,
    b=2/8.  KL(pure) = ln(8/6); KL(mix) = 0.5 ln(.5/.75) + 0.5 ln(.5/.25)
    — and a source matching the corpus blend exactly would read 0."""
    rows = [
        (0, "a a a a", "en", "pure", 7),
        (1, "a a b b", "en", "mix", 7),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["kl_nats"])
        for r in QUERIES["source_kl_divergence_docs"].fn(spark, d).collect()
    }
    kl_pure = math.log((4 / 4) / (6 / 8))
    kl_mix = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert got == {
        "pure": (4, 1, _r6(kl_pure)),
        "mix": (4, 2, _r6(kl_mix)),
    }


def test_matryoshka_recall_prefix_rank_flip(spark, tmp_path):
    """Crafted 64-d vectors where the prefix-8 ordering disagrees with
    full-dim: neighbor 'late' carries all its similarity in dims 9-64 and
    neighbor 'early' only in dims 1-8.  Expected recalls recomputed by
    numpy brute force (slice, cosine, rank with the round-6 +
    neighbor_id tiebreak), so the test fails if either engine's slicing
    or ranking drifts."""
    import numpy as np

    def vec(front, back):
        v = [0.0] * 64
        for j, x in front:
            v[j] = x
        for j, x in back:
            v[j] = x
        return v

    rows = [(0, vec([(0, 1.0), (1, 1.0)], [(20, 1.0)]), 0)]  # the query
    rng = np.random.RandomState(7)
    # corpus ids start at 100: the catalog treats EVERY vec_id < 5 as a
    # query, and this test brute-forces query 0 only
    for i in range(1, 14):
        v = (rng.rand(64) * 0.2).tolist()
        if i <= 3:      # 'early': match dims 0-1 strongly
            v[0], v[1] = 2.0, 1.5
        elif i <= 6:    # 'late': match dim 20 (outside the 8/16 prefixes)
            v[20] = 3.0
        rows.append((100 + i, [float(x) for x in v], i % 3))
    d = _write_embs(spark, tmp_path, rows)

    vs = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}
    q = vs[0]

    def topk(dims):
        scored = []
        for nid, v in vs.items():
            if nid == 0:
                continue
            a, b = q[:dims], v[:dims]
            na, nb = math.sqrt(a @ a), math.sqrt(b @ b)
            s = _r6((a @ b) / (na * nb) - 1e-9) if na * nb > 0 else 0.0
            scored.append((-s, nid))
        return {nid for _, nid in sorted(scored)[:10]}

    full = topk(64)
    expected = {
        (0, dims): (len(topk(dims) & full), len(topk(dims) & full) / 10.0)
        for dims in (8, 16, 32, 64)
    }
    assert expected[(0, 8)][0] < 10  # the fixture really flips ranks
    got = {
        (r["query_id"], r["dims"]): (r["n_hits"], r["recall"])
        for r in QUERIES["matryoshka_recall_embeddings"].fn(spark, d).collect()
    }
    assert got == expected


def test_label_centroid_cosine_known_geometry(spark, tmp_path):
    """Three labels with hand-built centroids: label 0 along e0, label 1
    along e1 (orthogonal -> cosine 0), label 2 at 45 degrees between them
    (cosine ~0.7071 to both).  Per-label members average to the intended
    centroid exactly."""
    def unit(j, scale=1.0):
        v = [0.0] * 64
        v[j] = scale
        return v

    rows = [
        (0, unit(0, 1.0), 0), (1, unit(0, 3.0), 0),     # centroid 2*e0
        (2, unit(1, 2.0), 1), (3, unit(1, 2.0), 1),     # centroid 2*e1
        (4, [a + b for a, b in zip(unit(0, 2.0), unit(1, 2.0))], 2),
        (5, [a + b for a, b in zip(unit(0, 2.0), unit(1, 2.0))], 2),
    ]
    d = _write_embs(spark, tmp_path, rows)
    got = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in QUERIES["label_centroid_sim_embeddings"].fn(spark, d).collect()
    }
    assert got == {
        (0, 1): _r6(0.0),
        (0, 2): _r6(1 / math.sqrt(2)),
        (1, 2): _r6(1 / math.sqrt(2)),
    }


def test_novelty_first_occurrence_attribution(spark, tmp_path):
    """doc 0 introduces both its shingles (novelty 1.0); doc 1 repeats
    them verbatim (0.0); doc 2 shares one of two (0.5); doc 3 is too
    short for a 5-gram (NULL novelty, zero counts)."""
    rows = [
        (0, "a b c d e f", "en", "web", 11),
        (1, "a b c d e f", "en", "web", 11),
        (2, "a b c d e x", "en", "web", 11),
        (3, "a b", "en", "web", 3),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_repeated"], r["novelty"])
        for r in QUERIES["novelty_docs"].fn(spark, d).collect()
    }
    assert got == {
        0: (2, 0, _r6(1.0)),
        1: (2, 2, _r6(0.0)),
        2: (2, 1, _r6(0.5)),
        3: (0, 0, None),
    }


def test_classifier_kappa_matches_bruteforce(spark, tmp_path):
    """Kappa recomputed from the two raters' own catalog outputs via the
    O(n) python formula — the query must agree, including the
    chance-agreement correction."""
    rows = [
        (i, t, "en", "web", len(t))
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog " * 8,
                "word " * 60,
                "short text",
                "# # # # mostly symbols # # #" * 10,
                "the and of to in is was " * 12,
                "",
            ]
        )
    ]
    d = _write_docs(spark, tmp_path, rows)
    a = {
        r["doc_id"]: r["keep"]
        for r in QUERIES["quality_classifier_docs"].fn(spark, d).collect()
    }
    b = {
        r["doc_id"]: r["passes"]
        for r in QUERIES["gopher_quality_docs"].fn(spark, d).collect()
    }
    n = len(a)
    ay = sum(a.values())
    by = sum(b.values())
    agree = sum(1 for k in a if a[k] == b[k])
    pe = ay * by + (n - ay) * (n - by)
    expected = (n * agree - pe) / (n * n - pe)
    got = QUERIES["classifier_kappa_docs"].fn(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_docs"], r["classifier_yes"], r["gopher_yes"], r["n_agree"]) \
        == (n, ay, by, agree)
    assert r["kappa"] == _r6(expected)


def test_hard_negatives_cross_label_only(spark, tmp_path):
    """Brute-force differential: per query, the top-3 most-similar
    OTHER-label vectors — a same-label vector more similar than every
    cross-label one must NOT appear (that's the point of the miner)."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for i in range(12):
        v = (rng.rand(64) * 0.1).tolist()
        if i % 3 == 0:
            v[0] = 2.0       # label-0 cluster along e0
        else:
            v[1] = 2.0
        rows.append((i, [float(x) for x in v], 0 if i % 3 == 0 else 1))
    d = _write_embs(spark, tmp_path, rows)
    vs = {r[0]: (np.array(r[1], dtype=np.float64), r[2]) for r in rows}

    expected = {}
    for qid in range(8):
        qv, ql = vs[qid]
        scored = []
        for nid, (v, lbl) in vs.items():
            if nid == qid or lbl == ql:
                continue
            s = _r6(float(qv @ v) / (math.sqrt(qv @ qv) * math.sqrt(v @ v))
                    - 1e-9)
            scored.append((-s, nid, lbl, s))
        for rank, (_, nid, lbl, s) in enumerate(sorted(scored)[:3], 1):
            expected[(qid, rank)] = (nid, lbl, s)
    got = {
        (r["query_id"], r["rank"]):
            (r["neighbor_id"], r["neighbor_label"], r["score"])
        for r in QUERIES["hard_negatives_embeddings"].fn(spark, d).collect()
    }
    assert got == expected
    assert all(vs[n][1] != vs[q][1] for (q, _), (n, _, _) in got.items())


def test_source_dup_matrix_counts_and_rates(spark, tmp_path):
    """Identical texts across two sources: within-A pair (denominator
    n(n-1)/2) and two cross pairs (denominator n_a*n_b); the unrelated
    doc only widens source B's denominator."""
    txt = "alpha beta gamma delta epsilon"
    rows = [
        (0, txt, "en", "A", len(txt)),
        (1, txt, "en", "A", len(txt)),
        (2, txt, "en", "B", len(txt)),
        (3, "totally different words here now", "en", "B", 31),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        (r["source_a"], r["source_b"]):
            (r["n_pairs"], r["n_docs_a"], r["n_docs_b"], r["dup_ppm"])
        for r in QUERIES["source_dup_matrix_docs"].fn(spark, d).collect()
    }
    assert got == {
        ("A", "A"): (1, 2, 2, _r6(1_000_000.0)),
        ("A", "B"): (2, 2, 2, _r6(2 * 1_000_000.0 / 4)),
    }


def test_fertility_by_lang_known_counts(spark, tmp_path):
    """Hand-counted subword proxy: 'hello world' -> pieces he|llo wo|rld
    = 4 subtokens over 2 words (fertility 2.0); digits/punct split
    singly."""
    rows = [
        (0, "hello world", "en", "web", 11),
        (1, "ab1!", "fr", "web", 4),  # ab, 1, ! -> 3 subtokens, 1 word
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["lang"]: (r["n_docs"], r["n_words"], r["n_subtokens"],
                    r["fertility"], r["chars_per_subtoken"])
        for r in QUERIES["fertility_by_lang_docs"].fn(spark, d).collect()
    }
    assert got == {
        "en": (1, 2, 4, _r6(2.0), _r6(11 / 4)),
        "fr": (1, 1, 3, _r6(3.0), _r6(4 / 3)),
    }


def test_ann_ivf_sq8_exact_on_grid_fixture(spark, tmp_path):
    """Quantization invariance: when every per-dimension value already
    sits on the 256-level grid (integer values 0..255, with anchors
    forcing each dim's min=0/max=255), SQ8 reconstruction is the
    identity and IVF-over-SQ8 must equal plain IVF row-for-row — any
    drift in the quantize/reconstruct/re-assemble chain breaks this."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [
        (0, [0.0] * 64, 0),                       # anchor: dim min
        (1, [255.0] * 64, 0),                     # anchor: dim max
    ]
    for i in range(2, 24):
        rows.append(
            (i, [float(x) for x in rng.randint(0, 256, 64)], i % 3)
        )
    d = _write_embs(spark, tmp_path, rows)
    plain = {tuple(r) for r in QUERIES["ann_ivf"].fn(spark, d).collect()}
    sq8 = {tuple(r) for r in QUERIES["ann_ivf_sq8"].fn(spark, d).collect()}
    assert sq8 == plain and len(plain) > 0
