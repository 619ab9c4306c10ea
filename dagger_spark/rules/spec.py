"""RuleSpec: a detection rule as data, plus the alert projection builder.

A rule is metadata + a predicate (IR, see ``dagger_spark.expr``).  The alert
shape replicates the reference's sink DDL superset (SURVEY.md §1.1-4, §2.8.5):
Flink builds the nested ROWs positionally (windows-process-access.sql:80-89)
and the sink DDL supplies field names; Spark structs are named, so we impose
the DDL names here once.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..expr import Pred, parse_predicate, to_column

#: per-SparkContext memo for RuleSpec.condition() Columns (see docstring)
_COND_MEMO: dict = {}

#: per-SparkContext memo for rules_metadata_df (see its docstring)
_META_MEMO: dict = {}


@dataclass(frozen=True)
class RuleSpec:
    """One detection rule (reference: one INSERT/UNION branch in rules/sigma/*.sql)."""

    name: str
    predicate_sql: str                      # restricted-SQL predicate text (data, not code)
    severity: int = 5
    author: str = ""
    description: str = ""
    references: tuple = ()
    tactic: tuple = ()
    technique: tuple = ()
    subtechnique: tuple = ()
    category: str = "sysmon"
    module: Optional[str] = None            # 'process_access' for the pa job, else None
    version: str = "1.0"
    source: str = "sysmon"
    enabled: bool = True
    case_insensitive: bool = False          # reference matches case-sensitively (§2.8.10)
    # M4 timeframe extension (Sigma `timeframe`; reference skips these rules,
    # sigma-transf/main.py:194-195 — we implement them):
    timeframe_seconds: Optional[int] = None
    timeframe_min_count: Optional[int] = None
    timeframe_group_by: tuple = ("host",)
    # Sliding stride for the timeframe window.  None/== timeframe_seconds =
    # tumbling (the round-2 behavior, kept as the default).  A divisor of
    # timeframe_seconds enables overlapping windows so a burst straddling a
    # tumbling boundary still alerts: any burst shorter than
    # (timeframe - slide) seconds is fully contained in SOME window.
    timeframe_slide_seconds: Optional[int] = None
    # Exact semantics: trigger on the event whose (min_count-1)-th
    # predecessor (per group key, (ts, uuid) order) lies within
    # timeframe_seconds — "N events within ANY T-second span", zero
    # discretization loss at O(min_count) state per key.  Mutually
    # exclusive with timeframe_slide_seconds.
    timeframe_exact: bool = False

    @property
    def predicate(self) -> Pred:
        return parse_predicate(self.predicate_sql)

    def condition(self) -> Column:
        """The predicate as a PySpark Column — MEMOIZED per (SparkContext,
        predicate text, case flag).  Column objects are immutable
        unresolved expression wrappers, safe to embed in any number of
        batch or streaming plans; rebuilding the 25-rule tree through
        py4j cost ~2-3 s of driver wall per engine call (round-14
        profiling: ~5.4k py4j round trips per apply_rules_single_pass
        build — guide §4, the Python boundary exists on the driver too).
        Keyed on the live JVM context so a restarted session (tests) can
        never see a Column from a dead gateway."""
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        ctx = id(sc._jsc) if sc is not None else None
        if _COND_MEMO.get("ctx") != ctx:
            _COND_MEMO.clear()
            _COND_MEMO["ctx"] = ctx
            _COND_MEMO["cols"] = {}
        cols = _COND_MEMO["cols"]
        key = (self.predicate_sql, self.case_insensitive)
        col = cols.get(key)
        if col is None:
            col = to_column(
                self.predicate, case_insensitive=self.case_insensitive
            )
            cols[key] = col
        return col

    def with_enabled(self, enabled: bool) -> "RuleSpec":
        return replace(self, enabled=enabled)


def _arr(values: Sequence[str]) -> Column:
    if not values:
        return F.array().cast(T.ArrayType(T.StringType()))
    return F.array(*[F.lit(v) for v in values])


def threat_struct(rule: RuleSpec) -> Column:
    return F.struct(
        _arr(rule.tactic).alias("tactic"),
        _arr(rule.technique).alias("technique"),
        _arr(rule.subtechnique).alias("subtechnique"),
    )


def rule_struct(rule: RuleSpec) -> Column:
    return F.struct(
        F.lit(rule.name).alias("name"),
        F.lit(rule.author).alias("author"),
        F.lit(rule.category).alias("category"),
        F.lit(rule.severity).cast("int").alias("severity"),
        F.lit(rule.description).alias("description"),
        _arr(rule.references).alias("reference"),
        F.lit(rule.version).alias("version"),
        F.lit(rule.source).alias("source"),
    )


def alert_projection(rule: RuleSpec, ts_col: str = "timestamp") -> list:
    """Columns for one stateless alert row (count=1, start=end=time=timestamp —
    windows-process-access.sql:80)."""
    ts = F.col(ts_col)
    return [
        F.col("computer_name"),
        F.col("host"),
        F.struct(
            F.lit("signal").alias("kind"),
            F.lit(rule.module).cast("string").alias("module"),
            F.array(F.col("uuid")).alias("origin_ids"),
            F.lit(1).cast("long").alias("count"),
            ts.alias("start"),
            ts.alias("end"),
            ts.alias("time"),
        ).alias("event"),
        threat_struct(rule).alias("threat"),
        rule_struct(rule).alias("rule"),
    ]


def rules_metadata_df(spark: SparkSession, rules: Sequence[RuleSpec]) -> DataFrame:
    """Rule metadata as a small dimension DataFrame keyed by rule_id (the
    index into ``rules``).  Broadcast-joined by the single-pass engine so the
    per-event hot path only materializes matching rule ids.

    MEMOIZED per (SparkContext, rule tuple) like RuleSpec.condition():
    RuleSpec is a frozen (hashable) dataclass and rule_id is the tuple
    index, so an identical rule list yields a byte-identical dimension —
    re-running createDataFrame per engine call only re-shipped the same
    25 rows through py4j."""
    sc = spark.sparkContext
    ctx = id(sc._jsc)
    if _META_MEMO.get("ctx") != ctx:
        _META_MEMO.clear()
        _META_MEMO["ctx"] = ctx
        _META_MEMO["dfs"] = {}
    dfs = _META_MEMO["dfs"]
    key = tuple(rules)
    cached = dfs.get(key)
    if cached is not None:
        return cached
    out = _rules_metadata_df_uncached(spark, rules)
    dfs[key] = out
    return out


def _rules_metadata_df_uncached(
    spark: SparkSession, rules: Sequence[RuleSpec]
) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("rule_id", T.IntegerType(), False),
            T.StructField("module", T.StringType(), True),
            T.StructField(
                "threat",
                T.StructType(
                    [
                        T.StructField("tactic", T.ArrayType(T.StringType())),
                        T.StructField("technique", T.ArrayType(T.StringType())),
                        T.StructField("subtechnique", T.ArrayType(T.StringType())),
                    ]
                ),
            ),
            T.StructField(
                "rule",
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("author", T.StringType()),
                        T.StructField("category", T.StringType()),
                        T.StructField("severity", T.IntegerType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("reference", T.ArrayType(T.StringType())),
                        T.StructField("version", T.StringType()),
                        T.StructField("source", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    rows = [
        (
            i,
            r.module,
            (list(r.tactic), list(r.technique), list(r.subtechnique)),
            (
                r.name,
                r.author,
                r.category,
                r.severity,
                r.description,
                list(r.references),
                r.version,
                r.source,
            ),
        )
        for i, r in enumerate(rules)
    ]
    return spark.createDataFrame(rows, schema)


def mitre_coverage(spark: SparkSession, rules: Sequence[RuleSpec]) -> DataFrame:
    """The ATT&CK coverage matrix a SOC publishes from its rule inventory:
    one row per (tactic, technique) with the rules covering it — enabled
    and disabled counted separately, so coverage that exists only on
    paper (disabled rules) is visible.  Tags are exploded from the same
    normalized metadata the alert enrichment uses; techniques carrying no
    tactic land under '(untagged)' rather than silently dropping."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [
            (
                r.name,
                bool(r.enabled),
                [t.strip() for t in r.tactic if t and t.strip()],
                [t.strip() for t in r.technique if t and t.strip()],
            )
            for r in rules
        ],
        "name string, enabled boolean, tactics array<string>, "
        "techniques array<string>",
    )
    md = base.select(
        "name", "enabled",
        F.explode_outer(
            F.when(F.size("techniques") > 0, F.col("techniques"))
             .otherwise(F.array(F.lit("(untagged)")))
        ).alias("technique"),
        "tactics",
    ).select(
        "name", "enabled", "technique",
        F.explode_outer(
            F.when(F.size("tactics") > 0, F.col("tactics"))
             .otherwise(F.array(F.lit("(untagged)")))
        ).alias("tactic"),
    )
    return (
        md.groupBy("tactic", "technique")
        .agg(
            F.sum(F.when(F.col("enabled"), 1).otherwise(0)).cast("long")
             .alias("n_enabled"),
            F.sum(F.when(~F.col("enabled"), 1).otherwise(0)).cast("long")
             .alias("n_disabled"),
            F.sort_array(F.collect_set("name")).alias("rules"),
        )
        .orderBy("tactic", "technique")
    )
