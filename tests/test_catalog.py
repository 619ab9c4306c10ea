"""Catalog parity tests: every oracle-paired query must match DuckDB at
sf0.001 (the sf0.01 gate is run by the driver; tools/check_catalog.py runs
either locally)."""

import duckdb
import pandas as pd
import pytest

from dagger_spark.catalog import QUERIES

sys_tables = ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split()


@pytest.fixture(scope="module")
def duck_sf(sf_dir):
    con = duckdb.connect()
    for t in sys_tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


# ONE canonicalization shared with the dev harness: a fix to the rules
# (datetime format, float width, nullable ints) must reach both
from tools.check_catalog import normalize as _normalize  # noqa: E402


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_duckdb_oracle(spark, sf_dir, duck_sf, name):
    q = QUERIES[name]
    got = _normalize(q.fn(spark, sf_dir).toPandas())
    want = _normalize(duck_sf.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is None])
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
