"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle): sysmon_rules_alerts (the 25 reference rules
over generated fixtures — the fixture table is not among the driver's DuckDB
views; per-rule DuckDB parity is covered in tests/test_rules_engine.py) and
multimodal_meta (mapInPandas plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dagger_spark.catalog import QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's identity —
    multi-rule detection fan-in (filter + enrich + UNION ALL) over events."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
