"""Shared fixtures: one local SparkSession + a DuckDB oracle connection
with the driver's table views pre-registered (mirrors the driver's
harness described in ``__spark_entry__.py``)."""

from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ema_bigdata_spark.session import get_spark

    s = get_spark(app_name="ema-bigdata-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from ema_bigdata_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
