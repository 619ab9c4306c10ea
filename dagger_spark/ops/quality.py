"""Training-data hygiene operators: Gopher-style quality gates, intra-doc
repetition, PII scan/redaction, token-window chunking, and benchmark
decontamination shingles.

Like ops/text.py these are pure built-in column expressions — no UDFs — so
they run inside whole-stage codegen, prune columns, and scale linearly with
corpus size.  Everything here has an exact ANSI-SQL twin runnable in DuckDB
(see catalog.py); determinism is part of the contract.

The reference (D0d3cah3dr0n/Dagger) has no data-quality surface at all —
its operator set is predicate filtering over events (rules/sigma/*.sql);
this module is part of the LLM-pipeline extension mandated by the build
brief, with semantics drawn from the published Gopher (Rae et al. 2021,
appendix A) and C4 (Raffel et al. 2020, §2.2) filtering rules.

Scale notes (100 TB design point):
  * every stat is a per-row expression: no shuffle, no state, map-side only;
  * chunking explodes rows by ~n_tokens/stride — output partitioning stays
    inherited from the scan, so downstream writers should repartition by a
    hash of (doc_id, chunk_idx) if chunk skew matters;
  * decontamination joins the corpus against the *benchmark* shingle set,
    which is tiny by construction (eval sets are MBs, corpora are TBs) —
    broadcast it; the corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import bind, tokens

#: Gopher appendix-A "must contain >=2 of" stopword set (Rae et al. 2021).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Gopher bounds: (min_words, max_words, min_mean_len, max_mean_len,
#: max_symbol_ratio, max_bullet_ratio, max_ellipsis_ratio, min_alpha_ratio)
GOPHER_BOUNDS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    max_bullet_line_ratio=0.9,
    max_ellipsis_line_ratio=0.3,
    min_alpha_word_ratio=0.8,
    min_stopword_hits=2,
)


def _nonempty_lines(text: Column) -> Column:
    """Trimmed, non-empty lines of the document (newline-split)."""
    raw = F.split(F.coalesce(text, F.lit("")), "\n")
    return F.filter(F.transform(raw, lambda l: F.trim(l)), lambda l: l != "")


def gopher_stats(text: Column) -> dict:
    """The Gopher quality-rule inputs as named Columns.  NULL text ≡ empty
    (zero words, zero lines) so downstream flags are deterministic."""
    txt = F.coalesce(text, F.lit(""))
    toks = tokens(text)
    n_words = F.size(toks).cast("long")

    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_word_len = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))

    # "symbols" per Gopher: hash marks and ellipses (both ASCII and …)
    n_symbols = (
        F.coalesce(F.regexp_count(txt, F.lit("#")), F.lit(0))
        + F.coalesce(F.regexp_count(txt, F.lit(r"\.\.\.")), F.lit(0))
        + F.coalesce(F.regexp_count(txt, F.lit("…")), F.lit(0))
    ).cast("long")
    symbol_word_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))

    lines = _nonempty_lines(text)
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(
        lines, lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•")))
    n_ellipsis = F.size(F.filter(
        lines, lambda l: l.endswith("...") | l.endswith("…")))
    bullet_line_ratio = F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))
    ellipsis_line_ratio = F.when(n_lines > 0, n_ellipsis / n_lines).otherwise(F.lit(0.0))

    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_word_ratio = F.when(n_words > 0, n_alpha_words / n_words).otherwise(F.lit(0.0))

    n_stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*GOPHER_STOPWORDS))).cast("long")

    return dict(
        n_words=n_words,
        mean_word_len=mean_word_len,
        symbol_word_ratio=symbol_word_ratio,
        n_lines=n_lines,
        bullet_line_ratio=bullet_line_ratio,
        ellipsis_line_ratio=ellipsis_line_ratio,
        alpha_word_ratio=alpha_word_ratio,
        n_stop_hits=n_stop_hits,
    )


def gopher_pass(stats: dict, b: dict = GOPHER_BOUNDS) -> Column:
    """Conjunction of the Gopher appendix-A gates over gopher_stats()."""
    return (
        (stats["n_words"] >= b["min_words"])
        & (stats["n_words"] <= b["max_words"])
        & (stats["mean_word_len"] >= b["min_mean_word_len"])
        & (stats["mean_word_len"] <= b["max_mean_word_len"])
        & (stats["symbol_word_ratio"] <= b["max_symbol_word_ratio"])
        & (stats["bullet_line_ratio"] <= b["max_bullet_line_ratio"])
        & (stats["ellipsis_line_ratio"] <= b["max_ellipsis_line_ratio"])
        & (stats["alpha_word_ratio"] >= b["min_alpha_word_ratio"])
        & (stats["n_stop_hits"] >= b["min_stopword_hits"])
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array; fewer than n tokens ->
    empty array (never NULL), so counts/set ops behave on short docs.
    ``toks`` is let-bound (see ``text.bind``) so even an inline
    ``tokens(text)`` argument is evaluated once, not once per n-gram."""
    return bind(
        toks,
        lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def repetition_stats(text: Column, ns: tuple = (2, 3)) -> dict:
    """C4/Gopher-style intra-document repetition: for each n in ns, the
    fraction of n-gram *occurrences* that are repeats of an earlier
    occurrence — 1 - distinct/total, 0.0 for docs too short to have any.
    Linear in doc length (no pairwise work), so safe on 100k-token docs.

    ``word_ngrams`` let-binds its input (see ``text.bind``), so this
    convenience form no longer pays per-element re-tokenization; prefer
    ``repetition_stats_from_tokens`` anyway when the token array is already
    staged — the 2-gram and 3-gram branches then share one tokenizer run
    via projection-level subexpression elimination."""
    return repetition_stats_from_tokens(tokens(text), ns)


def repetition_stats_from_tokens(toks: Column, ns: tuple = (2, 3)) -> dict:
    """``repetition_stats`` over a pre-staged token-array column (stage it
    with ``df.select(tokens(text).alias("t"))`` so the per-element slice in
    ``word_ngrams`` references a cheap attribute, not the tokenizer)."""
    out = {}
    for n in ns:
        grams = word_ngrams(toks, n)
        total = F.size(grams).cast("long")
        distinct = F.size(F.array_distinct(grams)).cast("long")
        out[f"dup_frac_{n}gram"] = (
            F.when(total > 0, (total - distinct) / total).otherwise(F.lit(0.0))
        )
    return out


#: PII patterns chosen to behave identically under Java regex (Spark) and
#: RE2 (DuckDB): no backrefs, no lookaround, non-capturing groups only.
#: Redaction order is load-bearing: emails first (their local part may
#: contain '+digits' that the phone pattern would otherwise eat).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"),
    ("phone", r"\+[0-9]{7,12}"),
)


def pii_counts(text: Column) -> dict:
    """Per-kind PII match counts (NULL text ≡ empty ≡ zero matches)."""
    txt = F.coalesce(text, F.lit(""))
    return {
        name: F.coalesce(F.regexp_count(txt, F.lit(pat)), F.lit(0)).cast("long")
        for name, pat in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a <KIND> tag, in PII_PATTERNS order.
    Spark's regexp_replace is global; the DuckDB twin needs the 'g' flag."""
    out = F.coalesce(text, F.lit(""))
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def profile_table(df, cols):
    """One-pass data-profiling: per column — null count/fraction, exact
    distinct count, min/max (cast to string AFTER aggregating on the native
    type, so numeric min is numeric, not lexicographic).  The ingest-time
    data-quality pass every pipeline runs before anything expensive.

    ONE aggregation job: the countDistinct set rewrites to a single
    expand+aggregate (one shuffle total for all columns); everything else
    map-side-combines in the same pass.  The per-column rows are exploded
    from the single result row driver-side — nothing wide ever shuffles.
    At 100 TB swap countDistinct for approx_count_distinct (the HLL path
    events_approx_distinct demonstrates) — exact distinct is kept here
    because the oracle can verify it."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.round(
                (F.col("__n") - F.col(f"__nn_{c}")) / F.col("__n")
                + F.lit(1e-9), 6,
            ).alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ])
    return row.select(F.explode(structs).alias("p")).select("p.*")


def drift_psi(tagged, bin_col, is_ref_col="is_ref", feature_name=None):
    """Population Stability Index between a reference and a current
    snapshot of one binned feature — the standard corpus-drift gauge a
    training pipeline runs between crawl snapshots before mixing them.

    ``tagged`` carries one row per document with ``bin_col`` (the
    discretized feature value, any orderable type) and a boolean
    ``is_ref_col`` splitting the two snapshots.  Returns ONE row:
    ``(feature, n_bins, psi, verdict)`` with the conventional thresholds
    (< 0.1 stable, < 0.25 moderate, else shifted).

    Definition (Laplace-smoothed so empty bins are defined):
    ``p = (n_bin + 0.5) / (n_total + 0.5 * n_bins)`` per side, then
    ``PSI = sum((p_cur - p_ref) * ln(p_cur / p_ref))``.

    Scale shape: ONE hash aggregate over the corpus (map-side partial
    combine; bin cardinality is bounded by the caller's discretization),
    then a global aggregate over the <= n_bins rows — no joins, no
    windows, nothing driver-side.  The smoothing terms depend on totals,
    so they are folded in with conditional aggregates over the tiny
    per-bin frame rather than a second pass over the data."""
    per_bin = tagged.groupBy(F.col(bin_col).alias("_dp_bin")).agg(
        F.sum(F.when(F.col(is_ref_col), 1).otherwise(0)).alias("_dp_rn"),
        F.sum(F.when(F.col(is_ref_col), 0).otherwise(1)).alias("_dp_cn"),
    )
    # totals ride a size-1 window over the <= n_bins frame (the pmod spec
    # keeps WindowExec quiet about a window that is tiny by construction,
    # same idiom as ops/rank._offsets)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(F.pmod(F.col("_dp_rn"), F.lit(1)))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    with_tot = per_bin.select(
        "_dp_rn",
        "_dp_cn",
        F.sum("_dp_rn").over(w).alias("_dp_tr"),
        F.sum("_dp_cn").over(w).alias("_dp_tc"),
        F.count(F.lit(1)).over(w).alias("_dp_nb"),
    )
    p_ref = (F.col("_dp_rn") + 0.5) / (F.col("_dp_tr") + 0.5 * F.col("_dp_nb"))
    p_cur = (F.col("_dp_cn") + 0.5) / (F.col("_dp_tc") + 0.5 * F.col("_dp_nb"))
    psi = F.sum((p_cur - p_ref) * F.log(p_cur / p_ref))
    out = with_tot.agg(
        F.max("_dp_nb").cast("long").alias("n_bins"),
        F.round(psi + F.lit(1e-9), 6).alias("psi"),
        F.when(psi < 0.1, "stable")
        .when(psi < 0.25, "moderate")
        .otherwise("shifted")
        .alias("verdict"),
    )
    if feature_name is not None:
        out = out.select(
            F.lit(feature_name).alias("feature"), "n_bins", "psi", "verdict"
        )
    return out
