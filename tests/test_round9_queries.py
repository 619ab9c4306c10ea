"""Round-9 catalog additions: value checks against independent
reimplementations (numpy / pure Python), beyond the DuckDB oracle gate."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES

SF = "/root/testdata/sf0.01"


def test_mixture_temperature_properties(spark):
    rows = QUERIES["mixture_temperature_docs"].fn(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens: the largest source is downweighted, the
    # smallest upweighted
    head = max(rows, key=lambda r: r["token_share"])
    tail = min(rows, key=lambda r: r["token_share"])
    assert head["epochs_boost"] < 1.0 < tail["epochs_boost"]
    # alpha=0.7 formula replayed in python
    shares = {r["source"]: r["n_tokens"] for r in rows}
    total = sum(shares.values())
    z = sum((v / total) ** 0.7 for v in shares.values())
    for r in rows:
        w = (r["n_tokens"] / total) ** 0.7 / z
        assert abs(r["weight"] - w) < 1e-5


def test_embedding_outliers_against_numpy(spark):
    rows = QUERIES["embedding_outliers"].fn(spark, SF).collect()
    assert len(rows) == 10
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .collect()
    }
    mat = np.array(list(emb.values()))
    mu = mat.mean(axis=0)
    d = {k: float(np.sqrt(((v - mu) ** 2).sum())) for k, v in emb.items()}
    md = float(np.mean(list(d.values())))
    sd = float(np.std(list(d.values())))
    want = sorted(d, key=lambda k: (-(d[k] - md) / sd, k))[:10]
    assert [r["vec_id"] for r in rows] == want
    for r in rows:
        assert abs(r["centroid_dist"] - d[r["vec_id"]]) < 1e-4
        assert abs(r["z_score"] - (d[r["vec_id"]] - md) / sd) < 1e-4
    zs = [r["z_score"] for r in rows]
    assert zs == sorted(zs, reverse=True)


def test_blocking_quality_consistency(spark):
    r = QUERIES["lsh_blocking_quality_docs"].fn(spark, SF).collect()[0]
    assert r["n_hit"] <= r["n_true"] and r["n_hit"] <= r["n_candidates"]
    assert r["n_all_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2
    assert 0.0 < r["reduction_ratio"] < 1.0
    assert 0.0 <= r["pairs_completeness"] <= 1.0
    # candidate count == the production candidate stage's own count
    cand = QUERIES["minhash_pairs_docs"].fn(spark, SF)
    n_cand = cand.filter((F.col("id_a") < 500) & (F.col("id_b") < 500)).count()
    assert r["n_candidates"] == n_cand
    # the banding must actually block (sf0.01 has planted near-dups)
    assert r["n_true"] > 0 and r["n_hit"] > 0


def test_power_iteration_against_numpy(spark):
    rows = QUERIES["power_iteration_embeddings"].fn(spark, SF).collect()
    assert len(rows) == 10
    mat = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .where(F.col("embedding").isNotNull())
            .collect()
        ],
        dtype=np.float64,
    )
    xc = mat - mat.mean(axis=0)
    n = mat.shape[0]
    v0 = np.full(mat.shape[1], 0.125)
    w1 = xc.T @ (xc @ v0) / n
    v1 = w1 / np.linalg.norm(w1)
    w2 = xc.T @ (xc @ v1) / n
    v2 = w2 / np.linalg.norm(w2)
    lam = float(v1 @ w2)
    order = sorted(range(len(v2)), key=lambda j: (-abs(v2[j]), j))[:10]
    assert [r["j"] for r in rows] == order
    for r in rows:
        assert abs(r["loading"] - v2[r["j"]]) < 1e-4
        assert abs(r["eigenvalue"] - lam) < 1e-4
    # power iteration makes PROGRESS toward the true dominant eigenvector
    # (2 steps need not converge on a flat spectrum, but alignment must
    # strictly improve over v0) and the Rayleigh quotient is sandwiched
    cov = xc.T @ xc / n
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    align0 = abs(float((v0 / np.linalg.norm(v0)) @ top))
    assert abs(float(v2 @ top)) > align0
    assert 0 < lam <= evals[-1] * 1.001  # bounded by lambda_max


def test_mmr_against_python_greedy(spark):
    rows = QUERIES["mmr_rerank_embeddings"].fn(spark, SF).collect()
    assert len(rows) == 64  # 8 queries x 8 selections
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .collect()
    }

    def cos(a, b):
        d = np.linalg.norm(a) * np.linalg.norm(b)
        return round(float(a @ b / d), 6) if d > 0 else 0.0

    for qid in range(8):
        qv = emb[qid]
        rel = {
            nid: cos(qv, v) for nid, v in emb.items() if nid != qid
        }
        cand = sorted(rel, key=lambda n: (-rel[n], n))[:20]
        sel_ids: list = []
        selected = []
        for _ in range(8):
            pool = [c for c in cand if c not in sel_ids]
            if not sel_ids:
                pick = min(pool, key=lambda c: (-rel[c], c))
                score = 0.75 * rel[pick]
            else:
                def mmr(c):
                    pen = max(cos(emb[c], emb[s]) for s in sel_ids)
                    return 0.75 * rel[c] - 0.25 * pen
                pick = min(pool, key=lambda c: (-round(mmr(c), 9), c))
                score = mmr(pick)
            sel_ids.append(pick)
            selected.append((pick, round(score + 1e-9, 6)))
        got = [
            (r["neighbor_id"], r["mmr_score"])
            for r in sorted(rows, key=lambda r: r["mmr_rank"])
            if r["query_id"] == qid
        ]
        assert got == selected, f"query {qid}: {got} != {selected}"
    # diversification is real: rank-2+ picks differ from pure relevance
    # order for at least one query (otherwise lambda might as well be 1)
    pure = 0
    for qid in range(8):
        qv = emb[qid]
        rel = {n: cos(qv, v) for n, v in emb.items() if n != qid}
        top8 = sorted(rel, key=lambda n: (-rel[n], n))[:8]
        got = [
            r["neighbor_id"]
            for r in sorted(rows, key=lambda r: r["mmr_rank"])
            if r["query_id"] == qid
        ]
        pure += got == top8
    assert pure < 8


def test_key_skew_report_against_python(spark):
    from dagger_spark.sources.files import load_table

    r = QUERIES["key_skew_report_events"].fn(spark, SF).collect()[0]
    counts = {
        row["user_id"]: row["c"]
        for row in load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = len(counts)
    total = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    gini = (
        2.0 * sum((i + 1) * c for i, (_, c) in enumerate(ordered))
        / (n * total)
        - (n + 1) / n
    )
    assert r["n_keys"] == n and r["n_events"] == total
    assert r["max_key_events"] == max(counts.values())
    assert abs(r["top1_share"] - max(counts.values()) / total) < 1e-5
    assert abs(
        r["top10_share"] - sum(c for _, c in ordered[-10:]) / total
    ) < 1e-5
    assert abs(r["gini"] - gini) < 1e-5
    assert 0.0 <= r["gini"] < 1.0


def test_ann_ndcg_sanity(spark):
    rows = {
        r["method"]: r
        for r in QUERIES["ann_ndcg_embeddings"].fn(spark, SF).collect()
    }
    assert set(rows) == {"ann_brute_force", "ann_lsh", "ann_ivf", "ann_pq_adc"}
    # brute force IS the truth: perfect ordering and perfect top-1
    assert rows["ann_brute_force"]["ndcg_at_5"] == 1.0
    assert rows["ann_brute_force"]["mrr"] == 1.0
    for m, r in rows.items():
        assert 0.0 <= r["ndcg_at_5"] <= 1.0 and 0.0 <= r["mrr"] <= 1.0
    # approximate methods cannot beat the truth
    assert all(r["ndcg_at_5"] <= 1.0 + 1e-9 for r in rows.values())


def test_dedup_impact_consistency(spark):
    rows = QUERIES["dedup_impact_docs"].fn(spark, SF).collect()
    tot = QUERIES["mixture_temperature_docs"].fn(spark, SF).collect()
    tok = {r["source"]: r["n_tokens"] for r in tot}
    nd = {r["source"]: r["n_docs"] for r in tot}
    assert {r["source"] for r in rows} == set(tok)
    for r in rows:
        # same base accounting as the mixture gauge (same tokenizer)
        assert r["n_tokens"] == tok[r["source"]]
        assert r["n_docs"] == nd[r["source"]]
        assert 0 < r["exact_kept_docs"] <= r["n_docs"]
        assert 0 < r["near_kept_docs"] <= r["n_docs"]
        # near-dedup keeps a subset of what exact dedup keeps (exact dups
        # are near dups), so it cuts at least as much token mass
        assert r["near_kept_docs"] <= r["exact_kept_docs"]
        assert r["near_token_cut"] >= r["exact_token_cut"] - 1e-9
        assert 0.0 <= r["exact_token_cut"] < 1.0
    # the fixture plants NEAR-duplicates (every text is byte-unique, so
    # exact dedup cuts nothing — pinned): the near stage must cut tokens
    assert all(r["exact_token_cut"] == 0 for r in rows)
    assert any(r["near_token_cut"] > 0 for r in rows)


def test_conformal_coverage_against_python(spark):
    import math

    r = QUERIES["conformal_coverage_docs"].fn(spark, SF).collect()[0]
    cq = {
        x["doc_id"]: x["score"]
        for x in QUERIES["quality_classifier_docs"].fn(spark, SF).collect()
    }
    gq = {
        x["doc_id"]: x["passes"]
        for x in QUERIES["gopher_quality_docs"].fn(spark, SF).collect()
    }
    s = {
        d: (1.0 - cq[d]) if gq[d] else cq[d]
        for d in cq
        if d in gq
    }
    cal = sorted((s[d], d) for d in s if d % 2 == 0)
    n_cal = len(cal)
    k = math.ceil(0.9 * (n_cal + 1))
    qhat = cal[k - 1][0]
    test = {d: s[d] for d in s if d % 2 == 1}
    cov = sum(1 for v in test.values() if v <= qhat) / len(test)
    sets = [
        (1 if 1.0 - cq[d] <= qhat else 0) + (1 if cq[d] <= qhat else 0)
        for d in test
    ]
    assert r["n_cal"] == n_cal and r["n_test"] == len(test)
    assert abs(r["qhat"] - qhat) < 1e-5
    assert abs(r["coverage"] - cov) < 1e-5
    assert abs(r["avg_set_size"] - sum(sets) / len(sets)) < 1e-5
    # the conformal guarantee: coverage >= 1 - alpha up to finite-sample
    # noise (exchangeable split by construction — doc parity)
    assert r["coverage"] >= 0.9 - 3 / math.sqrt(r["n_test"])
    assert 1.0 <= r["avg_set_size"] <= 2.0
