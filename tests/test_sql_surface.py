"""Spark-4 SQL API surface: SQL-defined functions inline into codegen (no
Python boundary), and parameterized ``spark.sql`` keeps user values out of
the query text — the engine-level complement to the Sigma compiler's C8
injection-safe generation."""

from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from dagger_spark.sources.files import load_tables


def test_sql_udf_inlines_without_python_boundary(spark, sf_dir):
    df = QUERIES["events_sql_udf_rollup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert df.count() > 0


def test_sql_udf_composes_in_later_statements(spark, sf_dir):
    QUERIES["events_sql_udf_rollup"].fn(spark, sf_dir)  # defines cents()
    got = spark.sql("SELECT cents(1.239) AS c, cents(-0.005) AS d").head()
    assert got["c"] == 124
    assert got["d"] == 0  # floor(-0.5 + 0.5): half-up toward +inf


def test_parameterized_sql_is_injection_safe(spark, sf_dir):
    load_tables(spark, sf_dir)
    n_all = spark.sql("SELECT count(*) AS n FROM events").head()["n"]
    # the classic injection payload arrives as a VALUE, not as SQL text:
    # it matches zero event_type rows instead of widening the predicate
    evil = "x' OR '1'='1"
    n = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = :t",
        args={"t": evil},
    ).head()["n"]
    assert n == 0 and n_all > 0
    # positional/typed parameters round-trip values, not text
    assert spark.sql("SELECT :x + 1 AS y", args={"x": 41}).head()["y"] == 42


def test_identifier_clause_binds_table_names_safely(spark, sf_dir):
    load_tables(spark, sf_dir)
    n = spark.sql(
        "SELECT count(*) AS n FROM IDENTIFIER(:t)", args={"t": "events"}
    ).head()["n"]
    assert n == spark.table("events").count()
