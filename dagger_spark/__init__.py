"""dagger_spark — a PySpark-native streaming SIEM rule engine + analytics toolkit.

A from-scratch re-expression of the capabilities of D0d3cah3dr0n/Dagger
(Sigma rules compiled to streaming SQL; see /root/reference) on idiomatic
PySpark: DataFrame/SQL for the logical plan, Structured Streaming for the
stream path, and Catalyst/Tungsten for optimization and execution.

Layout:
  expr        predicate IR (And/Or/Not/Leaf) -> Spark Column / ANSI SQL
  schemas     sysmon event + alert StructTypes (superset of both reference DDLs)
  session     SparkSession builder with scale-oriented defaults
  rules       RuleSpec registry, the 31 reference rules as data, rule engine
  sigma       Sigma YAML -> predicate IR compiler (port of the reference's
              sigma-transf/main.py semantics, bugs fixed by default)
  sources     batch/stream source wrappers (parquet/json/kafka/rate/file-stream)
  streaming   unioned alert streaming job + windowed timeframe rules
  ops         LLM-data-pipeline operators: dedup, similarity, text, graph,
              multimodal (image/audio/video), skew, as-of joins
  pipeline    CorpusPipeline, the fluent cleaning-composition API
  catalog     every operator as a named (query, DuckDB-oracle) pair —
              including the TPC-H-ish analytics used for bench/correctness
"""

__version__ = "0.1.0"
