"""Cross-engine parity on ADVERSARIAL value domains (r6).

The driver checks correctness on benign testdata (events.value ∈
[0, 600], no negatives, well-separated modes).  These tests rerun the
events-only queries — including the newly-oracled parity EM and the
floor-division-sensitive q_kmeans — on synthetic tables that force the
paths testdata never hits: negative values (sign-sensitive division,
signed-zero rounds), wide magnitude ranges (exp clamp), a constant
column (variance floor, degenerate percentiles), and a 3-row table
(empty EM components, nf/nrm floors, fractional percentile
interpolation).  Same bit-faithful compare as the driver sim.
"""

from __future__ import annotations

import datetime

import pytest

from ema_bigdata_spark import registry

registry.load_all()

#: queries that read ONLY the events table
_EVENTS_QUERIES = (
    "q_mean",
    "q_variance_pop",
    "q_kmeans",
    "gmm_fit",
    "q_gmm_bic",
    # Welch t on click-vs-view (degenerate arms filter to zero rows on
    # the tiny fixture — both engines must agree on that too)
    "q_ab_ttest",
    # per-user z-scores / MAD outliers over adversarial magnitudes
    "q_value_outliers",
    "q_outlier_mad",
)


def _write_events(spark, path: str, values) -> None:
    """Write a full-schema events parquet from a value list (None →
    NULL value rows)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=i),
            i % 7,
            ("click", "view", "purchase")[i % 3],
            v,
            "{}",
        )
        for i, v in enumerate(values)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING",
    ).coalesce(2).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _compare(spark, sf_dir: str, names) -> None:
    import duckdb

    from tests.oracle import rowset

    duck = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob its part files for DuckDB
    duck.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    for name in names:
        sdf = registry.QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        ores = duck.execute(registry.ORACLES[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        assert len(srows) == len(orows), (name, len(srows), len(orows))
        sn, sset = rowset(sdf.columns, srows)
        on, oset = rowset(ocols, orows)
        assert sn == on, (name, sn, on)
        assert sset == oset, (
            name,
            [(a, b) for a, b in zip(sset, oset) if a != b][:3],
        )


@pytest.fixture(scope="module")
def adv_dirs(spark, tmp_path_factory):
    """Three adversarial events tables, written once."""
    import random

    root = tmp_path_factory.mktemp("adv")
    rng = random.Random(17)
    # mixed signs, wide magnitudes, nulls — 2-decimal fixed point to
    # honor the cents contract q_kmeans/q_mean assume
    neg_wide = [
        round(rng.uniform(-5000.0, 5000.0), 2) for _ in range(400)
    ] + [round(rng.uniform(-0.05, 0.05), 2) for _ in range(80)] + [
        None, None, -0.0, 0.0, -4999.99, 4999.99,
    ]
    constant = [42.0] * 200
    tiny = [-1.5, 0.0, 2.25]
    dirs = {}
    for tag, vals in (
        ("neg_wide", neg_wide), ("constant", constant), ("tiny", tiny)
    ):
        d = str(root / tag)
        _write_events(spark, d, vals)
        dirs[tag] = d
    return dirs


class TestAdversarialDomains:
    def test_neg_wide_domain(self, spark, adv_dirs):
        """Negative + wide-magnitude values: exercises the floor
        division on negative cluster sums (the r6 review bug), the
        signed-zero guards, and EM over a sign-spanning histogram."""
        _compare(spark, adv_dirs["neg_wide"], _EVENTS_QUERIES)

    def test_constant_domain(self, spark, adv_dirs):
        """A constant column: variance floor (1e-12), single-bin
        histogram, degenerate percentiles (vlo == vhi), identical
        components with argmax ties."""
        _compare(spark, adv_dirs["constant"], _EVENTS_QUERIES)

    def test_tiny_domain(self, spark, adv_dirs):
        """Three rows: fractional percentile interpolation, empty EM
        components at K=4 (nf/nrm floors), 1-2 member k-means
        clusters."""
        _compare(spark, adv_dirs["tiny"], _EVENTS_QUERIES)
