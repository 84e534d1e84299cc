"""Every SQL-oracled query in the registry hash-matches DuckDB at the
test scale factor — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from ema_bigdata_spark import registry

registry.load_all()

SQL_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import compare_query

    compare_query(spark, duck, sf_dir, name)


def test_every_query_registered_once():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
    assert registry.QUERIES, "no queries registered"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_check_window_is_exactly_driver_sized():
    """The driver records correctness rows for exactly the first 50
    registered queries; the explicit window must stay exactly that
    size (a shorter one wastes evidence slots, a longer one silently
    pushes entries past the cut-off)."""
    from ema_bigdata_spark import registry

    registry.load_all()
    assert len(registry._CHECK_WINDOW) == 50
    assert len(set(registry._CHECK_WINDOW)) == 50
    assert list(registry.QUERIES)[:50] == list(registry._CHECK_WINDOW)
