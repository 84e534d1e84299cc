"""Sixth adversarial suite (r8, VERDICT r7 item 6): the nine
``s_stream_*`` queries' cross-batch behavior on DEGENERATE input.

The r7 adversarial sweep covers all 142 batch queries on hostile
fixtures; the streaming family had multi-batch evidence
(tools/streaming_evidence.py) but only on well-formed input.  This
suite drives the same streaming cores through the file-source
micro-batch harness with the inputs a real at-least-once pipeline
actually delivers:

- NULL grouping keys through the stateful sessionizer, streaming
  dedup, the upsert aggregation, and the stream-stream join (SQL
  semantics differ per operator: groupBy/dropDuplicates treat NULLs
  as one group; an equi-join drops them);
- duplicate storms — hundreds of copies of one key per batch, and
  upsert updates tied on ts (the event_id tie-break must pick the
  same winner the batch oracle would);
- EMPTY micro-batches between data batches (state must carry across
  the empty trigger, not close or reset);
- an out-of-order FLOOD entirely below the watermark (every row in
  the flood batch is older than the already-passed watermark: none
  may reopen a closed window).

All expectations are pinned exact values — the suite is a behavioral
contract, not a smoke test.  Fixture timestamps sit on the harness's
2023 base (epoch-0 rows never enter join/watermark state — measured
Spark 4.1.2 behavior documented in tools/streaming_evidence.py), and
batch order is forced with os.utime, never sleeps.
"""

from __future__ import annotations

import importlib.util
import os
import uuid

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "streaming_evidence",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "streaming_evidence.py",
    ),
)
SE = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(SE)

MIN = SE.MINUTE_US
BASE = SE.BASE_US


def _sink(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


class TestNullKeys:
    def test_session_null_user(self, spark, tmp_path):
        """A NULL user_id is ONE stateful group (SQL GROUP BY
        semantics): its events sessionize together and the open
        session merges across batches like any other key's."""
        from ema_bigdata_spark.streaming.stream_queries import session_stream

        stream = SE._two_batches(
            spark, f"{tmp_path}/s", "user_id BIGINT, ts_us BIGINT",
            [(None, 0 * MIN), (None, 10 * MIN), (7, 0 * MIN)],
            [(None, 20 * MIN)],
        )
        out = SE._drain(session_stream(stream), _sink("adv_sess"),
                        "update", spark)
        rows = sorted(
            ((r.user_id, r.start_us // MIN, r.end_us // MIN, r.n_events)
             for r in out.collect()), key=str,
        )
        # update-mode sink keeps each batch's emission: the NULL
        # session appears once per batch, extended the second time
        assert (None, 0, 10, 2) in rows and (None, 0, 20, 3) in rows
        assert (7, 0, 0, 1) in rows

    def test_dedup_null_key_suppressed_once(self, spark, tmp_path):
        """dropDuplicates treats NULL = NULL: the second (NULL, click)
        arrival — in a LATER batch — is suppressed by state."""
        stream = SE._two_batches(
            spark, f"{tmp_path}/d", "user_id BIGINT, event_type STRING",
            [(None, "click"), (1, "click")],
            [(None, "click"), (None, "view")],
        )
        out = SE._drain(
            stream.dropDuplicates(["user_id", "event_type"]),
            _sink("adv_dedup"), "append", spark,
        )
        rows = sorted(
            ((r.user_id, r.event_type) for r in out.collect()), key=str
        )
        assert rows == sorted(
            [(None, "click"), (None, "view"), (1, "click")], key=str
        )

    def test_join_null_keys_drop(self, spark, tmp_path):
        """Stream-stream equi-join on user_id: NULL keys match
        nothing (ANSI equality), even a NULL on both sides in the
        same band window."""
        from pyspark.sql import functions as F

        from ema_bigdata_spark.streaming.stream_queries import _WATERMARK

        schema = "user_id BIGINT, event_id BIGINT, ts_us BIGINT"
        SE._write_batches(
            spark, f"{tmp_path}/j", schema,
            [(None, 1, BASE), (5, 3, BASE)],
            [(None, 2, BASE + 2 * MIN), (5, 4, BASE + 2 * MIN)],
        )

        def side(alias):
            return (
                SE._read_batches(spark, f"{tmp_path}/j", schema).select(
                    "user_id", "event_id",
                    F.timestamp_micros("ts_us").alias("ts"),
                )
                .withWatermark("ts", _WATERMARK)
                .alias(alias)
            )

        joined = side("a").join(
            side("b"),
            F.expr(
                "a.user_id = b.user_id AND b.event_id > a.event_id"
                " AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE"
            ),
        ).select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
        )
        out = SE._drain(joined, _sink("adv_join"), "append", spark)
        rows = sorted((r.id_a, r.id_b) for r in out.collect())
        assert rows == [(3, 4)]  # the NULL-key pair never joins


class TestDuplicateStorms:
    def test_dedup_storm_emits_once(self, spark, tmp_path):
        """500 copies of one key in batch 1 + 300 more in batch 2:
        exactly ONE output row — within-batch and cross-batch
        suppression both engage."""
        stream = SE._two_batches(
            spark, f"{tmp_path}/storm", "user_id BIGINT, event_type STRING",
            [(1, "click")] * 500 + [(2, "view")],
            [(1, "click")] * 300,
        )
        out = SE._drain(
            stream.dropDuplicates(["user_id", "event_type"]),
            _sink("adv_storm"), "append", spark,
        )
        rows = sorted((r.user_id, r.event_type) for r in out.collect())
        assert rows == [(1, "click"), (2, "view")]

    def test_upsert_storm_tie_break(self, spark, tmp_path):
        """The upsert core under a duplicate storm with TIED
        timestamps across batches: 200 updates at the same ts_us —
        the (ts_us, event_id) struct order must pick the highest
        event_id, regardless of which batch carried it (the batch-2
        winner has a LOWER event_id than a batch-1 row for key B,
        proving order comes from the data, not arrival)."""
        from pyspark.sql import functions as F

        schema = ("user_id BIGINT, event_type STRING, ts_us BIGINT,"
                  " event_id BIGINT, value DOUBLE")
        b1 = [(1, "c", BASE, i, float(i)) for i in range(100)]
        b1 += [(2, "c", BASE, 900, 900.0)]
        b2 = [(1, "c", BASE, 100 + i, float(100 + i)) for i in range(100)]
        b2 += [(2, "c", BASE, 500, 500.0)]  # lower id than key 2's b1 row
        stream = SE._two_batches(
            spark, f"{tmp_path}/ups", schema, b1, b2
        )
        agg = stream.groupBy("user_id", "event_type").agg(
            F.expr("max_by(value, struct(ts_us, event_id))").alias(
                "last_value"
            ),
            F.max(F.struct("ts_us", "event_id")).alias("m"),
        )
        out = SE._drain(agg, _sink("adv_ups"), "complete", spark)
        rows = sorted(
            (r.user_id, r.last_value, r.m.event_id) for r in out.collect()
        )
        assert rows == [(1, 199.0, 199), (2, 900.0, 900)]


class TestEmptyBatches:
    def test_session_state_survives_empty_batch(self, spark, tmp_path):
        """An EMPTY micro-batch between two data batches: the open
        session must neither close nor reset — batch 3 extends the
        session batch 1 opened."""
        from ema_bigdata_spark.streaming.stream_queries import session_stream

        schema = "user_id BIGINT, ts_us BIGINT"
        SE._write_batches(
            spark, f"{tmp_path}/es", schema,
            [(1, 0 * MIN)],
            [],                      # empty micro-batch
            [(1, 10 * MIN)],
        )
        stream = SE._read_batches(spark, f"{tmp_path}/es", schema)
        out = SE._drain(session_stream(stream), _sink("adv_empty"),
                        "update", spark)
        rows = sorted(
            (r.start_us // MIN, r.end_us // MIN, r.n_events)
            for r in out.collect()
        )
        # emissions: (0,0,1) after b1, (0,0,1) again after the empty
        # batch is a no-op (no emission — no data for the key), then
        # (0,10,2) after b3.  The extended session PROVES state
        # survived the empty trigger.
        assert (0, 10, 2) in rows

    def test_windowed_agg_empty_batch_no_rows(self, spark, tmp_path):
        """Windowed count across an empty batch: counts unchanged, no
        phantom windows."""
        from pyspark.sql import functions as F

        schema = "user_id BIGINT, ts_us BIGINT"
        SE._write_batches(
            spark, f"{tmp_path}/ew", schema,
            [(1, BASE), (1, BASE + 10_000_000)],
            [],
            [(1, BASE + 30_000_000)],
        )
        stream = SE._read_batches(spark, f"{tmp_path}/ew", schema).select(
            F.timestamp_micros("ts_us").alias("ts")
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = SE._drain(agg, _sink("adv_ew"), "complete", spark)
        rows = [(r.n,) for r in out.collect()]
        assert rows == [(3,)]  # one minute window, all three rows


class TestLateFlood:
    def test_flood_below_watermark_all_dropped(self, spark, tmp_path):
        """Out-of-order FLOOD: after the watermark passes minute 60, a
        whole batch of 50 rows back at minute 0-5 arrives, then one
        on-time batch.  None of the flood rows may reopen the closed
        minute-0 window (Spark's late filter lags one batch — the
        measured 4.1.2 behavior — so the flood lands TWO batches
        after the watermark advanced)."""
        from pyspark.sql import functions as F

        schema = "user_id BIGINT, ts_us BIGINT"
        flood = [(1, BASE + (i % 5) * MIN) for i in range(50)]
        SE._write_batches(
            spark, f"{tmp_path}/fl", schema,
            [(1, BASE)],                       # minute-0 window: n=1
            [(1, BASE + 60 * MIN)],            # advances watermark
            [(1, BASE + 61 * MIN)],            # late filter catches up
            flood,                             # entirely below watermark
            [(1, BASE + 62 * MIN)],            # on-time tail
        )
        stream = SE._read_batches(spark, f"{tmp_path}/fl", schema).select(
            F.timestamp_micros("ts_us").alias("ts")
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = SE._drain(agg, _sink("adv_flood"), "update", spark)
        per_window = {}
        for r in out.collect():
            m = (r.w.start.timestamp() * 1_000_000 - BASE) // MIN
            per_window.setdefault(int(m), []).append(r.n)
        # minute-0 window was emitted once (n=1) and NEVER re-emitted
        # with flood rows; minutes 1-4 never appear at all
        assert per_window[0] == [1]
        assert all(m not in per_window for m in (1, 2, 3, 4))
        assert per_window[60] == [1] and per_window[62] == [1]


class TestAnomalyDomain:
    """r9 (ADVICE r8 medium): the anomaly core's accumulated Σvu² used
    to live in a BIGINT state field, so an IN-domain |value| ≥ ~3.04e7
    (vu² > 2^63) hard-errored the state write and killed the whole
    stream — the exact failure class the r8 gate claimed to remove.
    Now sx/sxx persist as DECIMAL(38,0), the oracle sums in HUGEINT,
    and the declared domain is |value| ≤ _ANOM_DOMAIN (1e9, shared
    with q_value_outliers).  These tests drive the core at the bound.
    """

    def test_huge_magnitudes_survive_state_store(self, spark, tmp_path):
        """Two batches at |value| = 1e9 (vu = 1e11, single vu² = 1e22 ≫
        2^63): state must round-trip exactly and the batch-2 outlier
        must be judged against all 10 batch-1 priors."""
        from ema_bigdata_spark.streaming.stream_queries import (
            _ANOM_MIN_N,
            anomaly_stream,
        )

        schema = (
            "user_id BIGINT, ts_us BIGINT, event_id BIGINT,"
            " value DOUBLE, vu BIGINT"
        )
        calm = [
            (1, i * MIN, i, 1e9 - 0.01 * (i % 2),
             100_000_000_000 - (i % 2))
            for i in range(_ANOM_MIN_N)
        ]
        stream = SE._two_batches(
            spark, f"{tmp_path}/an", schema,
            calm,
            # batch 2: one wild drop (5e8) then one calm follower
            [(1, 100 * MIN, 100, 5e8, 50_000_000_000),
             (1, 101 * MIN, 101, 1e9, 100_000_000_000)],
        )
        out = SE._drain(anomaly_stream(stream), _sink("adv_anom"),
                        "update", spark)
        rows = [(r.event_id, r.value, r.n_prior) for r in out.collect()]
        # only the wild event fires; n_prior proves the Σvu² ≈ 1e23
        # state survived the batch boundary bit-exactly
        assert rows == [(100, 5e8, _ANOM_MIN_N)], rows

    def test_registered_query_parity_at_bound(self, spark, tmp_path):
        """s_stream_anomaly ↔ its HUGEINT oracle on an events table
        whose values park AT ±1e9 (old code: stream death) and just
        above it (must be ignored identically on both engines)."""
        import datetime

        import duckdb

        from ema_bigdata_spark import registry
        from tests.oracle import compare_query

        registry.load_all()

        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for uid, vals in (
            (1, [1e9 - 0.01 * (i % 2) for i in range(12)] + [-5e8]),
            (2, [100.0 + i for i in range(12)] + [1000000000.01, 9.5]),
        ):
            for v in vals:
                rows.append((
                    eid, base + datetime.timedelta(minutes=eid), uid,
                    "view", v, "{}",
                ))
                eid += 1
        import glob as _glob
        import shutil

        d = str(tmp_path / "anomb")
        # stream_source path-glob-filters for the single FILE
        # events.parquet (the driver testdata layout), so unwrap the
        # part file out of the Spark output directory
        spark.createDataFrame(
            rows,
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
            " event_type STRING, value DOUBLE, props STRING",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/ev__d")
        (part,) = _glob.glob(f"{d}/ev__d/part-*.parquet")
        shutil.move(part, f"{d}/events.parquet")
        shutil.rmtree(f"{d}/ev__d")
        duck = duckdb.connect()
        duck.execute(
            f"CREATE VIEW events AS SELECT * FROM"
            f" read_parquet('{d}/events.parquet')"
        )
        try:
            compare_query(spark, duck, d, "s_stream_anomaly")
        finally:
            duck.close()
