"""Cross-engine parity on ADVERSARIAL event-time fixtures (r7).

Fifth adversarial suite: the window/session/event-analytics family's
determinism rests on tie-break discipline ("every window ORDER BY ends
with a unique key" — windows.py module contract) and on exact
boundary semantics (session gap, as-of at-or-before, window edges).
The driver's testdata has essentially unique per-user timestamps, so
none of that is ever exercised officially.  This fixture forces it:

- five events of one user sharing ONE identical timestamp (rank, lag,
  running sums, sessionization, compact_latest must all agree via the
  event_id tie-break, never via input order);
- session gaps at EXACTLY the 30-minute threshold, one microsecond
  over, and one under (the contract is `gap > threshold` starts a new
  session — both engines must place the boundary identically);
- a purchase with its matching click AT the same instant (as-of
  "at-or-before" must include equality), a purchase with no prior
  click (NULL fill), and tied click timestamps (seq tie-break);
- NULL event_type / NULL value rows flowing through group keys,
  windows, and joins;
- duplicate values for rank/percentile ties; negative values;
- malformed / NULL / empty JSON in props (get_json_object returns
  NULL where unguarded DuckDB json_extract THROWS — found the
  q_json_extract oracle guard), plus valid JSON whose $.k is a
  string / fractional literal (forced the r8 integer-pattern cast
  guard — an unguarded CAST hard-errors on BOTH engines);
- events exactly on minute boundaries (tumbling-window edge rows).
"""

from __future__ import annotations

import datetime

import pytest

from ema_bigdata_spark import registry

registry.load_all()

_D = datetime.datetime
_T0 = _D(2024, 3, 1, 12, 0, 0)
_US = datetime.timedelta(microseconds=1)
_MIN = datetime.timedelta(minutes=1)

_SCHEMAS = {
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING"
    ),
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ,"
        " o_orderpriority STRING"
    ),
}

_EVENTS = [
    # user 1: FIVE events at one identical instant — pure tie-break
    (1, _T0, 1, "click", 10.0, '{"k": 20}'),
    (2, _T0, 1, "view", 10.0, '{"k": 7}'),
    (3, _T0, 1, "purchase", 20.0, None),
    (4, _T0, 1, "click", None, "not json"),
    (5, _T0, 1, None, 10.0, "{}"),
    # a later purchase so user 1's as-of has a real at-or-before match
    (6, _T0 + 2 * _MIN, 1, "purchase", 30.0, '{"k": 10}'),
    # valid JSON whose $.k is NOT an integer literal — the r8 cast
    # guard (non-numeric / fractional k → NULL on both engines instead
    # of a CAST hard-error; scalars._JSON_INT_PAT)
    (7, _T0 + 3 * _MIN, 1, "view", 1.0, '{"k": "abc"}'),
    (8, _T0 + 4 * _MIN, 1, "view", 2.0, '{"k": 20.5}'),
    # user 2: session-gap boundary battery (threshold 30 min, contract
    # is STRICTLY-greater starts a new session)
    (10, _T0, 2, "click", 1.0, "{}"),
    (11, _T0 + 30 * _MIN, 2, "click", 2.0, "{}"),          # == gap
    (12, _T0 + 60 * _MIN - _US, 2, "view", 3.0, "{}"),     # < gap
    (13, _T0 + 90 * _MIN + _US, 2, "view", 4.0, "{}"),     # > gap
    # user 3: single event, NULL value, purchase with NO prior click
    (20, _T0 + 5 * _MIN, 3, "purchase", None, "{}"),
    # user 4: minute-boundary rows + duplicated values (rank ties) +
    # a negative value
    (30, _D(2024, 3, 1, 13, 0, 0), 4, "click", 5.0, "{}"),
    (31, _D(2024, 3, 1, 13, 1, 0), 4, "click", 5.0, "{}"),
    (32, _D(2024, 3, 1, 13, 1, 0), 4, "view", -5.0, "{}"),
    (33, _D(2024, 3, 1, 13, 2, 0), 4, "purchase", 5.0, "{}"),
    # user 5: click AT the purchase instant (as-of includes equality),
    # plus two clicks tied on ts (seq=event_id breaks the tie)
    (40, _T0 + 10 * _MIN, 5, "click", 100.0, "{}"),
    (41, _T0 + 10 * _MIN, 5, "click", 200.0, "{}"),
    (42, _T0 + 10 * _MIN, 5, "purchase", 1.0, "{}"),
    (43, _T0 + 40 * _MIN, 5, "purchase", 2.0, "{}"),
]

# benign dims sized for the join specials (user_id ↔ c_custkey)
_CUSTOMER = [
    (1, "alice", 0, 10.0, "BUILDING"),
    (2, "bob", 1, 20.0, "AUTOMOBILE"),
    (4, "dana", 0, 5.0, "BUILDING"),
    (5, "eve", 2, 7.0, None),  # NULL segment becomes a group key
]
_ORDERS = [
    (100, 1, "O", 500.0, _T0 - 3 * _MIN, "1-URGENT"),
    (101, 2, "F", 700.0, _T0 + 20 * _MIN, "2-HIGH"),
]

#: queries whose input closure is events (+customer/orders for the
#: join specials); the streaming family shares these batch oracles and
#: has its own multi-batch harness
_QUERIES = (
    "q_window_rank", "q_window_running", "q_window_lag",
    "q_window_frames", "q_window_range_frame", "q_sessionize",
    "q_compact_latest", "q_cdc_merge",
    "q_retention", "q_funnel", "q_gapfill", "q_event_transitions",
    "q_events_hourly", "q_approx_quantiles",
    "q_skew_metrics", "q_json_extract",
    "q_join_range", "q_join_asof", "q_join_salted",
    "q_value_outliers", "q_outlier_mad", "q_winsorize",
    "q_profile_table", "q_zorder_layout",
)


@pytest.fixture(scope="module")
def adv_ev_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("adv_ev")
    for table, rows in (
        ("events", _EVENTS), ("customer", _CUSTOMER), ("orders", _ORDERS)
    ):
        spark.createDataFrame(rows, _SCHEMAS[table]).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{root}/{table}.parquet")
    return str(root)


@pytest.fixture(scope="module")
def adv_ev_duck(adv_ev_dir):
    import duckdb

    duck = duckdb.connect()
    for table in _SCHEMAS:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{adv_ev_dir}/{table}.parquet/*.parquet')"
        )
    return duck


class TestAdversarialEvents:
    @pytest.mark.parametrize("name", _QUERIES)
    def test_parity(self, spark, adv_ev_duck, adv_ev_dir, name):
        from tests.oracle import rowset

        sdf = registry.QUERIES[name](spark, adv_ev_dir)
        srows = [tuple(r) for r in sdf.collect()]
        ores = adv_ev_duck.execute(registry.ORACLES[name])
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
