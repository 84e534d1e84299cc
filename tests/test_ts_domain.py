"""Eighth adversarial suite (r8): hostile event times.

A timestamp column can carry NULL and any year in [0001, 9999] —
and at 100 TB a corrupt producer WILL emit some.  The r8 hostile-ts
sweep (NULL / 0001-01-01 / 9999-12-31 rows in events.ts,
orders.o_orderdate, lineitem.l_shipdate) found 8 of 151 queries
diverging or dying, in three distinct classes:

1. **NULL-ts ordering divergence** — Spark windows sort NULLS FIRST,
   DuckDB NULLS LAST.  For ACCUMULATING windows (running sums,
   session numbering) the untimed row's position shifts every value
   after it → q_window_running / q_sessionize now exclude NULL-ts
   rows (declared: an event with no time has no position on a
   timeline).  Per-row window ops (q_window_lag) keep the row: its
   boundary outputs are NULL on both engines either way (pinned
   below).
2. **Window arithmetic escaping the representable range** — a
   year-0001 event made s_stream_sliding emit a year-0 window start
   (Python datetime cannot hold it: the DRIVER's collect() dies, not
   the query), year-9999 pushed tumbling window ends past 9999-12-31,
   and NULL event times crashed the stateful cores
   (StreamingQueryException).  The streaming seam (`stream_source`)
   now gates event time to the declared domain [1900-01-01,
   9000-01-01) — `tables.TS_DOMAIN_MIN_US/MAX_US`, mirrored in every
   streaming oracle via `sql_ts_domain()`.
3. **DuckDB round() ULP at extreme magnitude** — q_profile_table's
   epoch-µs column at year 9999 (2.534e17): DuckDB's
   multiply-round-divide `round(x, 6)` emits ...0000003 where Spark's
   BigDecimal round is exact; integer-valued profile columns now skip
   the (no-op) round on both engines.
"""

from __future__ import annotations

import datetime

import pytest

from ema_bigdata_spark import registry

registry.load_all()

_D = datetime.datetime

#: every query the sweep saw diverge or crash, plus stable controls
_TS_QUERIES = (
    "q_window_running", "q_sessionize", "q_profile_table",
    "s_stream_tumbling", "s_stream_sliding", "s_stream_session",
    "s_stream_anomaly", "s_stream_topk", "s_stream_dedup",
    "s_stream_join", "s_stream_static_join", "s_stream_upsert",
    # controls: per-row window ops that keep NULL-ts rows stably
    "q_window_lag", "q_compact_latest",
)


@pytest.fixture(scope="module")
def ts_dir(spark, tmp_path_factory) -> str:
    """sf0.001 with hostile timestamps: NULL / year-0001 / year-9999
    in events.ts, o_orderdate, and l_shipdate."""
    import glob
    import shutil

    from ema_bigdata_spark.sources.tables import TABLES

    root = tmp_path_factory.mktemp("ts_domain")
    src = "/root/testdata/sf0.001"
    hostile = {
        "events": ("ts", "event_id"),
        "orders": ("o_orderdate", "o_orderkey"),
        "lineitem": ("l_shipdate", None),
    }
    vals = [None, _D(1, 1, 1, 0, 0, 0), _D(9999, 12, 31, 23, 59, 59)]
    for t in TABLES:
        if t not in hostile:
            shutil.copy(f"{src}/{t}.parquet", f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(f"{src}/{t}.parquet")
        base = df.limit(1).collect()[0].asDict()
        tscol, idcol = hostile[t]
        rows = []
        for i, v in enumerate(vals):
            d = dict(base)
            if idcol:
                d[idcol] = 20_000_000 + i
            d[tscol] = v
            rows.append(tuple(d[f.name] for f in df.schema.fields))
        out = df.unionByName(spark.createDataFrame(rows, df.schema))
        tmp = f"{root}/_{t}"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")
        assert len(part) == 1
        shutil.move(part[0], f"{root}/{t}.parquet")
        shutil.rmtree(tmp)
    return str(root)


@pytest.fixture(scope="module")
def ts_duck(ts_dir):
    import duckdb

    from ema_bigdata_spark.sources.tables import TABLES

    duck = duckdb.connect()
    for table in TABLES:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{ts_dir}/{table}.parquet')"
        )
    return duck


class TestTsDomain:
    @pytest.mark.parametrize("name", _TS_QUERIES)
    def test_parity(self, spark, ts_duck, ts_dir, name):
        from tests.oracle import compare_query

        compare_query(spark, ts_duck, ts_dir, name)

    def test_streaming_gate_drops_out_of_domain_rows(self, spark, ts_dir):
        """All three hostile events (NULL / year-0001 / year-9999) are
        outside the streaming event-time domain and never reach the
        dedup state store; in-domain rows all arrive."""
        import duckdb

        out = registry.QUERIES["s_stream_dedup"](spark, ts_dir)
        n = out.count()
        exp = duckdb.sql(
            "SELECT count(DISTINCT (user_id, event_type)) FROM"
            f" read_parquet('{ts_dir}/events.parquet') WHERE ts IS NOT NULL"
        ).fetchone()[0]
        # the 0001/9999 rows duplicate an existing (user, type) pair
        # from the base row they were cloned from, so the distinct
        # count equals the NULL-excluding batch count
        assert n == exp

    def test_sessionize_excludes_untimed_events(self, spark, ts_dir):
        rows = registry.QUERIES["q_sessionize"](spark, ts_dir).collect()
        ids = {r.event_id for r in rows}
        assert 20_000_000 not in ids  # the NULL-ts event
        assert 20_000_001 in ids and 20_000_002 in ids  # timed extremes

    def test_window_lag_null_ts_boundary_is_stable(self, spark, ts_dir):
        """The per-row lag keeps the untimed row and emits NULL at the
        boundary — identical on both engines regardless of where each
        sorts the NULL (the declared reason q_window_lag is NOT
        gated)."""
        rows = {
            r.event_id: r.gap_us
            for r in registry.QUERIES["q_window_lag"](
                spark, ts_dir
            ).collect()
        }
        assert 20_000_000 in rows and rows[20_000_000] is None
