import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dagger_spark.fixtures import write_sysmon_parquet
from dagger_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dagger_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sysmon_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fixtures") / "sysmon_events.parquet"
    return write_sysmon_parquet(str(p), n_rows=2000, seed=42)


@pytest.fixture(scope="session")
def sysmon_df(spark, sysmon_path):
    return spark.read.parquet(sysmon_path)


@pytest.fixture(scope="session")
def duck(sysmon_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW sysmon AS SELECT * FROM read_parquet('{sysmon_path}')")
    return con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
