"""Fluent corpus-cleaning pipeline: the user-facing composition API over
the operators the catalog exposes piecewise.

    from dagger_spark.pipeline import CorpusPipeline

    verdict = (
        CorpusPipeline(docs)                  # doc_id, text
        .quality_gates()                      # Gopher appendix-A bounds
        .classifier_gate()                    # hashing-trick model score
        .near_dedup()                         # LSH -> CC -> keep-longest
        .decontaminate(benchmark_docs)        # n-gram overlap vs eval set
        .verdict()                            # one row/doc: flags + keep
    )
    clean = CorpusPipeline(docs).near_dedup().kept()   # surviving docs

Design: per-row gates (quality, classifier) are pure column expressions
appended to the verdict projection — zero extra shuffles; relational gates
(canonical survivorship, contamination) come back as id-keyed frames
joined at ``verdict()`` with shuffle-hash hints (every side is
corpus-sized and stats-less — the repartition/checkpoint join-statistics
rule).  The semantics are EXACTLY the catalog components' (same params ->
same answers; pinned by test against the oracle-verified queries), so
everything the differential gate proves about the parts transfers to the
composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ops.dedup import dedup_clusters
from .ops.quality import gopher_pass, gopher_stats, word_ngrams
from .ops.text import (
    char_trigrams, classifier_weights, hashing_trick_logit, tokens,
)


class CorpusPipeline:
    def __init__(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ):
        self.docs = docs
        self.id = id_col
        self.text = text_col
        self._row_flags: list = []    # (name, Column) — per-row, no shuffle
        self._join_flags: list = []   # (name, DataFrame[id, flag], default)

    # ---------------------------------------------------------------- gates

    def quality_gates(self, name: str = "passes_quality") -> "CorpusPipeline":
        """Gopher appendix-A heuristic bounds (ops/quality.py) as one pure
        column expression."""
        self._row_flags.append(
            (name, gopher_pass(gopher_stats(F.col(self.text))))
        )
        return self

    def classifier_gate(
        self, name: str = "classifier_keep"
    ) -> "CorpusPipeline":
        """Hashing-trick text classifier (ops/text.py): keep iff the
        integer logit is positive.  The trigram array must be staged, so
        this flag is computed in verdict()'s projection off a staged
        column rather than inline."""
        self._row_flags.append((name, None))  # placeholder: staged in verdict
        return self

    def near_dedup(
        self,
        name: str = "is_canonical",
        shingle_k: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
    ) -> "CorpusPipeline":
        """LSH candidates -> connected components -> keep-longest survivor
        per cluster (doc-id tiebreak) — identical to dedup_canonical_docs."""
        clusters = dedup_clusters(
            self.docs, self.text, self.id, shingle_k, num_hashes, bands
        )
        sized = clusters.join(
            self.docs.select(
                self.id,
                F.length(F.coalesce(F.col(self.text), F.lit("")))
                .alias("__nlen"),
            ).hint("shuffle_hash"),
            self.id,
        )
        w = Window.partitionBy("cluster").orderBy(
            F.col("__nlen").desc(), self.id
        )
        flag = sized.select(
            self.id, (F.row_number().over(w) == 1).alias(name)
        )
        self._join_flags.append((name, flag, False))
        return self

    def decontaminate(
        self,
        benchmark: DataFrame,
        name: str = "is_clean",
        k: int = 5,
        max_frac: float = 0.05,
    ) -> "CorpusPipeline":
        """N-gram decontamination vs an eval set (the GPT-3/Gopher
        procedure): a doc is clean while < ``max_frac`` of its k-gram
        shingles appear in the benchmark.  The benchmark shingle set is
        broadcast — the corpus side never shuffles for the probe."""

        def grams(df, text_col):
            staged = df.select(
                F.col(self.id), tokens(F.col(text_col)).alias("__t")
            )
            g = F.array_distinct(
                F.transform(word_ngrams(F.col("__t"), k), lambda x: F.md5(x))
            )
            return staged.select(self.id, g.alias("__g"))

        bench = (
            grams(benchmark, self.text)
            .select(F.explode("__g").alias("g")).distinct()
        )
        corpus = grams(self.docs, self.text)
        ex = corpus.select(self.id, F.explode("__g").alias("g"))
        hits = (
            ex.join(F.broadcast(bench), "g")
            .groupBy(self.id).agg(F.count("g").alias("__n_overlap"))
        )
        sizes = corpus.select(self.id, F.size("__g").alias("__n_grams"))
        flag = sizes.join(hits.hint("shuffle_hash"), self.id, "left").select(
            self.id,
            (
                F.coalesce(F.col("__n_overlap"), F.lit(0))
                / F.greatest(F.col("__n_grams"), F.lit(1))
                < max_frac
            ).alias(name),
        )
        self._join_flags.append((name, flag, True))
        return self

    # -------------------------------------------------------------- results

    def verdict(self) -> DataFrame:
        """One row per document: every requested flag plus ``keep`` (the
        AND of all flags).  Per-row gates cost zero shuffles; each
        relational gate joins id-keyed with an explicit strategy."""
        staged = self.docs.select(
            self.id,
            self.text,  # row-flag expressions reference it by name
            char_trigrams(F.col(self.text)).alias("__tg"),
        )
        cols = [F.col(self.id)]
        flag_names = []
        for fname, col in self._row_flags:
            if col is None:  # classifier: logit off the staged trigrams
                col = hashing_trick_logit(
                    F.col("__tg"), classifier_weights()
                ) > 0
            cols.append(col.alias(fname))
            flag_names.append(fname)
        out = staged.select(*cols)
        for fname, frame, default in self._join_flags:
            out = out.join(frame.hint("shuffle_hash"), self.id, "left")
            out = out.withColumn(
                fname, F.coalesce(F.col(fname), F.lit(default))
            )
            flag_names.append(fname)
        keep = F.lit(True)
        for fname in flag_names:
            keep = keep & F.col(fname)
        return out.withColumn("keep", keep)

    def kept(self) -> DataFrame:
        """The surviving documents (original columns), for writing out."""
        v = self.verdict().filter(F.col("keep")).select(self.id)
        return self.docs.join(v.hint("shuffle_hash"), self.id, "left_semi")

    def publish(self, path: str, partition_by=("lang",)) -> DataFrame:
        """Write the surviving corpus partitioned for downstream pruning
        and return a per-partition MANIFEST computed from what was
        actually WRITTEN (read back from disk, not from the plan — a
        manifest derived from the unexecuted DataFrame could disagree
        with the files if the write half-failed).  Manifest columns: the
        partition keys, row count, and an order-free content checksum
        (sum of per-doc crc32(text) — integer, so partitioning and read
        order cannot change it); re-publishing identical data yields the
        identical manifest."""
        self.kept().write.partitionBy(*list(partition_by)).mode(
            "overwrite"
        ).parquet(path)
        written = self.docs.sparkSession.read.parquet(path)
        return written.groupBy(*list(partition_by)).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.crc32(F.coalesce(F.col(self.text), F.lit(""))))
            .cast("long").alias("content_checksum"),
        )

