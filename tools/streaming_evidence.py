#!/usr/bin/env python
"""Multi-batch streaming evidence (r7, VERDICT r6 item 7).

The registered ``s_stream_*`` queries are SQL-oracled through their
single-batch equivalence (one file = one micro-batch, declared design),
and their CROSS-batch semantics — state carried through the state
store, watermark eviction, first-arrival suppression — were pinned only
in pytest.  This script runs the multi-batch scenarios standalone and
writes a driver-visible artifact (``STREAMING_r8.json`` at the repo
root) so the at-scale streaming claim is in the committed ledger, not
just the test suite.

Each check feeds a file-source stream TWO parquet files with
``maxFilesPerTrigger=1`` (two micro-batches, deterministic order by
mtime) and asserts behavior that is IMPOSSIBLE without working
cross-batch state:

- ``session_xbatch``  — a session spanning the batch boundary keeps its
  batch-1 start/count and closes exactly once (applyInPandasWithState).
- ``anomaly_xbatch``  — a batch-2 outlier is judged against the (n, Σv,
  Σv²) priors accumulated in batch 1.
- ``dedup_xbatch``    — dropDuplicates suppresses a batch-2 re-arrival
  of a batch-1 key while passing a genuinely new key.
- ``join_xbatch``     — a stream-stream band-join pair whose sides
  arrive in DIFFERENT micro-batches emits exactly once (join state).
- ``tumbling_late_drop`` — a row arriving two batches after the
  watermark passed its window is dropped instead of reopening the
  window (three batches: Spark's late filter uses a one-batch-lagged
  watermark, measured in the check's comment).
- ``session_restart`` / ``anomaly_restart`` (r10, VERDICT r9 item
  6) — checkpoint RECOVERY for the two applyInPandasWithState cores:
  stop the query after batch 1, start a new query object on the same
  checkpoint, and assert the batch-2 output proves restored state
  with zero duplicated or lost emissions (append parquet sink, no
  dedup).

Usage: ``python tools/streaming_evidence.py [out.json]`` (default
``<repo>/STREAMING_r8.json``).  Exit code 0 iff all checks pass.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MINUTE_US = 60 * 1_000_000
#: watermarked fixtures must sit FAR from epoch: the initial global
#: watermark is epoch-0, and a stream-stream join drops/evicts rows at
#: or below the watermark — a fixture row with ts_us=0 silently never
#: enters join state (measured on Spark 4.1.2 while building this
#: harness; the windowed-aggregation checks are insensitive, but keep
#: all watermarked fixtures on the same realistic base)
BASE_US = 1_700_000_100 * 1_000_000  # 2023-11-14T22:15:00Z, minute-aligned


def _drain(df, sink: str, mode: str, spark):
    from ema_bigdata_spark.streaming.stream_queries import _state_partitions

    with _state_partitions(spark):
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink)


def _write_batches(spark, root: str, schema: str, *batches,
                   start: int = 1) -> None:
    """Write each batch as one parquet file with distinct mtimes (the
    file source orders micro-batches by mtime).  Order is FORCED with
    os.utime — strictly increasing, 10 s apart (r8, ADVICE): sleeping
    and hoping relies on filesystem mtime granularity and a steady
    clock; an explicit stamp can neither tie nor reorder.  ``start``
    offsets the batch directory index so the restart checks can land
    LATER batches into an existing root (each call's mtime base is
    time.time(), so later calls also stamp later)."""
    os.makedirs(root, exist_ok=True)
    base = time.time()
    for i, rows in enumerate(batches, start):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{root}/b{i}"
        )
        stamp = base + 10.0 * i
        for dirpath, _dirs, files in os.walk(f"{root}/b{i}"):
            for fn in files:
                os.utime(os.path.join(dirpath, fn), (stamp, stamp))


def _read_batches(spark, root: str, schema: str):
    """One-file-per-trigger readStream over a _write_batches dir.
    Call once per JOIN SIDE: separate calls are separate sources (the
    registered s_stream_join's shape — a single shared source would
    make the self-join's qualifiers collapse)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )


def _two_batches(spark, root: str, schema: str, b1, b2):
    _write_batches(spark, root, schema, b1, b2)
    return _read_batches(spark, root, schema)


def check_session_xbatch(spark, work: str) -> dict:
    from ema_bigdata_spark.streaming.stream_queries import (
        _SESSION_GAP_US,
        session_stream,
    )

    assert 100 * MINUTE_US > _SESSION_GAP_US
    stream = _two_batches(
        spark, f"{work}/session", "user_id BIGINT, ts_us BIGINT",
        [(1, 0 * MINUTE_US), (1, 10 * MINUTE_US)],
        [(1, 20 * MINUTE_US), (1, 120 * MINUTE_US)],
    )
    out = _drain(
        session_stream(stream), f"ev_sess_{uuid.uuid4().hex[:8]}",
        "update", spark,
    )
    rows = sorted(
        (r.start_us // MINUTE_US, r.end_us // MINUTE_US, r.n_events)
        for r in out.collect()
    )
    want = [(0, 10, 2), (0, 20, 3), (120, 120, 1)]
    return {"got": rows, "want": want, "pass": rows == want}


def check_anomaly_xbatch(spark, work: str) -> dict:
    from ema_bigdata_spark.streaming.stream_queries import (
        _ANOM_MIN_N,
        anomaly_stream,
    )

    schema = (
        "user_id BIGINT, ts_us BIGINT, event_id BIGINT,"
        " value DOUBLE, vu BIGINT"
    )
    calm = [
        (1, i * 1_000_000, i, 10.0, 1000 + (i % 2))
        for i in range(_ANOM_MIN_N)
    ]
    stream = _two_batches(
        spark, f"{work}/anomaly", schema,
        calm,
        [(1, 100_000_000, 100, 500.0, 50_000),
         (1, 101_000_000, 101, 10.0, 1000)],
    )
    out = _drain(
        anomaly_stream(stream), f"ev_anom_{uuid.uuid4().hex[:8]}",
        "update", spark,
    )
    rows = [(r.event_id, r.value, r.n_prior) for r in out.collect()]
    want = [(100, 500.0, _ANOM_MIN_N)]
    return {"got": rows, "want": want, "pass": rows == want}


def check_dedup_xbatch(spark, work: str) -> dict:
    stream = _two_batches(
        spark, f"{work}/dedup", "user_id BIGINT, event_type STRING",
        [(1, "click"), (2, "view")],
        [(1, "click"), (3, "purchase")],  # re-arrival + new key
    )
    out = _drain(
        stream.dropDuplicates(["user_id", "event_type"]),
        f"ev_dedup_{uuid.uuid4().hex[:8]}", "append", spark,
    )
    rows = sorted((r.user_id, r.event_type) for r in out.collect())
    want = [(1, "click"), (2, "view"), (3, "purchase")]
    return {"got": rows, "want": want, "pass": rows == want}


def check_join_xbatch(spark, work: str) -> dict:
    from pyspark.sql import functions as F

    from ema_bigdata_spark.streaming.stream_queries import _WATERMARK

    schema = "user_id BIGINT, event_id BIGINT, ts_us BIGINT"
    _write_batches(
        spark, f"{work}/join", schema,
        [(1, 1, BASE_US)],                 # left of the pair: batch 1
        [(1, 2, BASE_US + 2 * MINUTE_US)],  # its match: batch 2
    )

    def side(alias):
        return (
            _read_batches(spark, f"{work}/join", schema).select(
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
    out = _drain(
        joined, f"ev_join_{uuid.uuid4().hex[:8]}", "append", spark
    )
    rows = sorted((r.id_a, r.id_b) for r in out.collect())
    want = [(1, 2)]
    return {"got": rows, "want": want, "pass": rows == want}


def check_tumbling_late_drop(spark, work: str) -> dict:
    from pyspark.sql import functions as F

    schema = "user_id BIGINT, ts_us BIGINT"
    # batch 1 opens the minute-5 window and advances event time to
    # minute 60 (→ watermark 50); batch 2 is a spacer (measured Spark
    # 4.1.2 behavior: the late filter uses a ONE-BATCH-LAGGED
    # watermark — a late row lands if it arrives in the very next
    # batch, and is dropped from the second-next batch on); batch 3's
    # minute-5 row is 45 min late past a long-settled watermark and
    # MUST be dropped, while its fresh minute-62 row counts.
    _write_batches(
        spark, f"{work}/tumbling", schema,
        [(1, BASE_US + 5 * MINUTE_US), (1, BASE_US + 60 * MINUTE_US)],
        [(1, BASE_US + 61 * MINUTE_US)],
        [(2, BASE_US + 5 * MINUTE_US + 1), (1, BASE_US + 62 * MINUTE_US)],
    )
    agg = (
        _read_batches(spark, f"{work}/tumbling", schema)
        .select(F.timestamp_micros("ts_us").alias("ts"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    out = _drain(
        agg, f"ev_tumb_{uuid.uuid4().hex[:8]}", "update", spark
    )
    rows = sorted(
        ((int(r.w.start.timestamp()) - BASE_US // 1_000_000) // 60, r.n)
        for r in out.collect()
    )
    # update-mode sink keeps every emitted update: window 5 must appear
    # exactly once with n=1 (the late batch-3 row changed nothing)
    win5 = [n for m, n in rows if m == 5]
    ok = (win5 == [1] and (60, 1) in rows and (61, 1) in rows
          and (62, 1) in rows)
    return {"got": rows, "want_window5": [1], "pass": bool(ok)}


def _run_to_parquet(spark, df, checkpoint: str, out_dir: str) -> None:
    """Start-drain-stop a stateful stream into an append-only parquet
    sink via foreachBatch, against a FIXED checkpoint dir — the
    restart harness: calling this twice with the same checkpoint is a
    graceful stop + recovery.  The batch fn is a <locals> closure
    (r9 rule: module-level fns cloudpickle as import references and
    die under a neutral-sys.path driver)."""
    from pyspark.sql import functions as F

    from ema_bigdata_spark.streaming.stream_queries import (
        _state_partitions,
    )

    def write_batch(batch_df, epoch_id):
        batch_df.withColumn(
            "epoch", F.lit(int(epoch_id))
        ).write.mode("append").parquet(out_dir)

    with _state_partitions(spark):
        q = (
            df.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def check_session_restart(spark, work: str) -> dict:
    """r10 (VERDICT r9 item 6): checkpoint recovery for the session
    core.  Phase 1 processes batch 1 and STOPS the query; phase 2
    starts a NEW query object on the SAME checkpoint after batch 2
    lands.  A session spanning the stop/restart boundary must keep
    its phase-1 state — the batch-2 update reads (0, 20, 3), which is
    impossible if the applyInPandasWithState store was lost (a cold
    restart would emit (20, 20, 1)) — and the phase-1 update (0, 10,
    2) must appear EXACTLY once (a re-processed batch would duplicate
    it; the append sink keeps every emission, no dedup)."""
    from ema_bigdata_spark.streaming.stream_queries import (
        _SESSION_GAP_US,
        session_stream,
    )

    assert 100 * MINUTE_US > _SESSION_GAP_US
    root = f"{work}/session_restart"
    schema = "user_id BIGINT, ts_us BIGINT"
    ckpt, out_dir = f"{root}/ckpt", f"{root}/out"
    _write_batches(
        spark, f"{root}/in", schema,
        [(1, 0 * MINUTE_US), (1, 10 * MINUTE_US)],
    )
    _run_to_parquet(
        spark, session_stream(_read_batches(spark, f"{root}/in", schema)),
        ckpt, out_dir,
    )
    _write_batches(
        spark, f"{root}/in", schema,
        [(1, 20 * MINUTE_US), (1, 120 * MINUTE_US)],
        start=2,
    )
    _run_to_parquet(
        spark, session_stream(_read_batches(spark, f"{root}/in", schema)),
        ckpt, out_dir,
    )
    rows = sorted(
        (r.start_us // MINUTE_US, r.end_us // MINUTE_US, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = [(0, 10, 2), (0, 20, 3), (120, 120, 1)]
    return {"got": rows, "want": want, "pass": rows == want}


def check_anomaly_restart(spark, work: str) -> dict:
    """r10: checkpoint recovery for the anomaly core.  The calm
    priors (n, Σv, Σv² — DECIMAL(38,0) state) accumulate in phase 1;
    after the stop/restart boundary the phase-2 outlier must be
    judged against the RESTORED priors (n_prior = _ANOM_MIN_N) and
    alert exactly once.  A lost store reads n_prior = 0 → below the
    min-n gate → no alert; a re-processed batch would duplicate
    phase-1 emissions (phase 1 must emit nothing — calm rows)."""
    from ema_bigdata_spark.streaming.stream_queries import (
        _ANOM_MIN_N,
        anomaly_stream,
    )

    root = f"{work}/anomaly_restart"
    schema = (
        "user_id BIGINT, ts_us BIGINT, event_id BIGINT,"
        " value DOUBLE, vu BIGINT"
    )
    ckpt, out_dir = f"{root}/ckpt", f"{root}/out"
    calm = [
        (1, i * 1_000_000, i, 10.0, 1000 + (i % 2))
        for i in range(_ANOM_MIN_N)
    ]
    _write_batches(spark, f"{root}/in", schema, calm)
    _run_to_parquet(
        spark, anomaly_stream(_read_batches(spark, f"{root}/in", schema)),
        ckpt, out_dir,
    )
    _write_batches(
        spark, f"{root}/in", schema,
        [(1, 100_000_000, 100, 500.0, 50_000),
         (1, 101_000_000, 101, 10.0, 1000)],
        start=2,
    )
    _run_to_parquet(
        spark, anomaly_stream(_read_batches(spark, f"{root}/in", schema)),
        ckpt, out_dir,
    )
    rows = [
        (r.event_id, r.value, r.n_prior)
        for r in spark.read.parquet(out_dir).collect()
    ]
    want = [(100, 500.0, _ANOM_MIN_N)]
    return {"got": rows, "want": want, "pass": rows == want}


def check_session_multi_restart(spark, work: str) -> dict:
    """r11 (VERDICT r10 item 5): REPEATED checkpoint recovery — four
    phases = THREE stop/start cycles on ONE checkpoint, each phase a
    new query object.  State must survive every boundary: phase 2's
    merge (0,20,3) needs phase 1's open session; phase 4's merge
    (120,130,2) needs the (120,120,1) session opened in phase 3 —
    i.e. state written AFTER the second recovery must itself be
    recoverable.  Exact emission accounting (append sink, no dedup):
    (0,20,3) appears TWICE — once as phase 2's open-tail update, once
    when phase 3's event 120 closes it (the documented supersede
    semantics, session_stream docstring) — so a re-processed or lost
    batch shows up as a count mismatch, not just a value one."""
    from ema_bigdata_spark.streaming.stream_queries import (
        session_stream,
    )

    root = f"{work}/session_multi_restart"
    schema = "user_id BIGINT, ts_us BIGINT"
    ckpt, out_dir = f"{root}/ckpt", f"{root}/out"
    phases = [
        [(1, 0 * MINUTE_US), (1, 10 * MINUTE_US)],
        [(1, 20 * MINUTE_US)],
        [(1, 120 * MINUTE_US)],
        [(1, 130 * MINUTE_US)],
    ]
    for i, batch in enumerate(phases):
        _write_batches(spark, f"{root}/in", schema, batch, start=i + 1)
        _run_to_parquet(
            spark,
            session_stream(_read_batches(spark, f"{root}/in", schema)),
            ckpt, out_dir,
        )
    rows = sorted(
        (r.start_us // MINUTE_US, r.end_us // MINUTE_US, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = [(0, 10, 2), (0, 20, 3), (0, 20, 3),
            (120, 120, 1), (120, 130, 2)]
    return {"got": rows, "want": want, "n_restarts": 3,
            "pass": rows == want}


def check_anomaly_multi_restart(spark, work: str) -> dict:
    """r11: three stop/start cycles for the anomaly core's
    DECIMAL(38,0) priors.  Phase 1 seeds exactly ``_ANOM_MIN_N`` calm
    rows (no emission); phase 2 (after restart 1) alerts on a 500.0
    outlier with n_prior == _ANOM_MIN_N — restored state, since a
    cold store reads n < min-n and stays silent; phase 3 (restart 2)
    adds 8 calm rows, silent because the phase-2 outlier inflated the
    running variance (which proves the outlier itself entered the
    restored priors); phase 4 (restart 3) alerts on a 1000.0 outlier
    with n_prior == _ANOM_MIN_N + 10 — the exact count of every row
    from all three earlier phases, so ANY lost or duplicated batch
    across ANY boundary changes the recorded n_prior."""
    from ema_bigdata_spark.streaming.stream_queries import (
        _ANOM_MIN_N,
        anomaly_stream,
    )

    root = f"{work}/anomaly_multi_restart"
    schema = (
        "user_id BIGINT, ts_us BIGINT, event_id BIGINT,"
        " value DOUBLE, vu BIGINT"
    )
    ckpt, out_dir = f"{root}/ckpt", f"{root}/out"
    phases = [
        [(1, i * 1_000_000, i, 10.0, 1000 + (i % 2))
         for i in range(_ANOM_MIN_N)],
        [(1, 100_000_000, 100, 500.0, 50_000),
         (1, 101_000_000, 101, 10.0, 1000)],
        [(1, (110 + i) * 1_000_000, 110 + i, 10.0, 1000 + (i % 2))
         for i in range(8)],
        [(1, 200_000_000, 200, 1000.0, 100_000),
         (1, 201_000_000, 201, 10.0, 1000)],
    ]
    for i, batch in enumerate(phases):
        _write_batches(spark, f"{root}/in", schema, batch, start=i + 1)
        _run_to_parquet(
            spark,
            anomaly_stream(_read_batches(spark, f"{root}/in", schema)),
            ckpt, out_dir,
        )
    rows = sorted(
        (r.event_id, r.value, r.n_prior)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = [(100, 500.0, _ANOM_MIN_N), (200, 1000.0, _ANOM_MIN_N + 10)]
    return {"got": rows, "want": want, "n_restarts": 3,
            "pass": rows == want}


def check_anomaly_volume_restart(spark, work: str) -> dict:
    """r11: the multi-restart proof at VOLUME — 500 keys × 201 calm
    rows spread over three phases (= three stop/start cycles on one
    checkpoint), then a fourth phase with exactly one outlier per
    key.  Every key must alert exactly once with n_prior == 201, the
    exact count of its rows across all prior phases — so a state
    store that loses, duplicates, or cross-wires ANY key's state
    during ANY recovery shifts some key's n_prior or alert count.
    This is the exact-accounting complement to the rate soak (which
    checks liveness/state size under load but can't do per-key exact
    emission accounting on a nondeterministic source).

    Calm rows alternate vu=1000/1001 per key: the detector's
    integer-exact condition reads LHS=m² vs RHS=9m² for that
    sequence, so no calm row can alert regardless of count, while the
    vu=100000 probe exceeds it by ~6 orders (the same arithmetic the
    micro check hard-codes)."""
    from ema_bigdata_spark.streaming.stream_queries import (
        _ANOM_MIN_N,
        anomaly_stream,
    )

    n_keys, rows_per_phase = 500, 67
    root = f"{work}/anomaly_volume_restart"
    schema = (
        "user_id BIGINT, ts_us BIGINT, event_id BIGINT,"
        " value DOUBLE, vu BIGINT"
    )
    ckpt, out_dir = f"{root}/ckpt", f"{root}/out"
    assert 3 * rows_per_phase > _ANOM_MIN_N
    ts = 0
    phases = []
    for _ in range(3):
        batch = []
        for i in range(rows_per_phase):
            for k in range(n_keys):
                ts += 1
                batch.append(
                    (k, ts * 1_000, ts, 10.0, 1000 + (i % 2))
                )
        phases.append(batch)
    probe = []
    for k in range(n_keys):
        ts += 1
        probe.append((k, ts * 1_000, 10_000_000 + k, 1000.0, 100_000))
    phases.append(probe)
    for i, batch in enumerate(phases):
        _write_batches(spark, f"{root}/in", schema, batch, start=i + 1)
        _run_to_parquet(
            spark,
            anomaly_stream(_read_batches(spark, f"{root}/in", schema)),
            ckpt, out_dir,
        )
    rows = sorted(
        (r.user_id, r.event_id, r.value, r.n_prior)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = [(k, 10_000_000 + k, 1000.0, 3 * rows_per_phase)
            for k in range(n_keys)]
    return {
        "n_keys": n_keys,
        "rows_ingested": 3 * rows_per_phase * n_keys + n_keys,
        "n_restarts": 3,
        "n_alerts": len(rows),
        "mismatches": [
            {"got": g, "want": w}
            for g, w in zip(rows, want) if g != w
        ][:5] if rows != want else [],
        "pass": rows == want,
    }


def check_rate_soak(spark, work: str, seconds: int | None = None) -> dict:
    """r9 (VERDICT r8 item 7): a wall-clock soak of the two
    ``applyInPandasWithState`` cores on the RATE source — the one
    evidence class the micro-batch fixtures can't give: state size
    under sustained load, watermark movement, and zero query death
    over hundreds of batches.

    Both cores run CONCURRENTLY for ``seconds`` (default 300, env
    ``STREAM_SOAK_SECONDS``) at 2 000 rows/s over ``n_keys=500``
    distinct users, progress sampled every 5 s.  Pass criteria:

    - neither query raises (``exception() is None`` throughout);
    - peak state rows == key count for BOTH cores (state is per-key
      scalars by construction — a leak shows as rows ≫ keys);
    - the sessionizer ingests ≥ 50% of the nominal rate (generous:
      co-tenant load must not flake the check; the point is sustained
      progress, not throughput);
    - the watermark (attached to the rate timestamp, 30 s delay)
      advances monotonically and its final lag stays under 120 s.
    """
    import datetime as _dt
    import time

    from pyspark.sql import functions as F

    from ema_bigdata_spark.streaming.stream_queries import (
        _state_partitions,
        anomaly_stream,
        session_stream,
    )

    seconds = seconds or int(os.environ.get("STREAM_SOAK_SECONDS", "300"))
    n_keys, rps = 500, 2000

    def rate():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rps))
            .load()
            .withWatermark("timestamp", "30 seconds")
        )

    sess_in = rate().select(
        F.pmod(F.col("value"), F.lit(n_keys)).alias("user_id"),
        F.unix_micros("timestamp").alias("ts_us"),
    )
    anom_in = rate().select(
        F.pmod(F.col("value"), F.lit(n_keys)).alias("user_id"),
        F.unix_micros("timestamp").alias("ts_us"),
        F.col("value").alias("event_id"),
        (F.pmod(F.col("value"), F.lit(997)).cast("double") / 100.0
         ).alias("value"),
        F.pmod(F.col("value"), F.lit(997)).alias("vu"),
    )
    samples: dict[str, list] = {"session": [], "anomaly": []}
    #: batchId → numInputRows, accumulated from recentProgress each
    #: tick (lastProgress alone skips the batches between samples —
    #: the 45 s smoke read 18 k of 90 k rows that way)
    per_batch_in: dict[str, dict[int, int]] = {"session": {}, "anomaly": {}}
    errors: list[str] = []
    with _state_partitions(spark):
        queries = {
            "session": session_stream(sess_in)
            .writeStream.format("noop")
            .outputMode("update")
            .start(),
            "anomaly": anomaly_stream(anom_in)
            .writeStream.format("noop")
            .outputMode("update")
            .start(),
        }
        t_end = time.monotonic() + seconds
        try:
            while time.monotonic() < t_end:
                time.sleep(5)
                for name, q in queries.items():
                    if q.exception() is not None:
                        errors.append(f"{name}: {q.exception()!s:.300}")
                        t_end = 0
                        break
                    for rp in q.recentProgress:
                        if rp and rp.get("batchId") is not None:
                            per_batch_in[name][rp["batchId"]] = (
                                rp.get("numInputRows") or 0
                            )
                    p = q.lastProgress
                    if not p:
                        continue
                    state = (p.get("stateOperators") or [{}])[0]
                    wm = (p.get("eventTime") or {}).get("watermark")
                    samples[name].append({
                        "batch": p.get("batchId"),
                        "state_rows": state.get("numRowsTotal"),
                        "watermark": wm,
                    })
        finally:
            for q in queries.values():
                try:
                    q.stop()
                except Exception:
                    pass

    def peak(name):
        vals = [s["state_rows"] for s in samples[name]
                if s["state_rows"] is not None]
        return max(vals) if vals else 0

    def total_in(name):
        return sum(per_batch_in[name].values())

    def wm_series(name):
        out = []
        for s in samples[name]:
            if s["watermark"]:
                out.append(_dt.datetime.fromisoformat(
                    s["watermark"].replace("Z", "+00:00")
                ).timestamp())
        return out

    wms = wm_series("session")
    wm_monotone = all(a <= b for a, b in zip(wms, wms[1:]))
    wm_lag = (time.time() - wms[-1]) if wms else None
    result = {
        "seconds": seconds,
        "n_keys": n_keys,
        "rows_per_sec": rps,
        "errors": errors,
        "batches": {n: (samples[n][-1]["batch"] if samples[n] else 0)
                    for n in samples},
        "peak_state_rows": {n: peak(n) for n in samples},
        "total_input_rows": {n: total_in(n) for n in samples},
        "watermark_monotone": wm_monotone,
        "final_watermark_lag_sec": round(wm_lag, 1) if wm_lag else None,
    }
    result["pass"] = bool(
        not errors
        and result["peak_state_rows"]["session"] == n_keys
        and result["peak_state_rows"]["anomaly"] == n_keys
        and total_in("session") >= 0.5 * rps * seconds
        and wm_monotone
        and wm_lag is not None
        and wm_lag < 120
    )
    return result


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "STREAMING_r8.json"
    )
    import tempfile

    from ema_bigdata_spark.session import get_spark

    spark = get_spark(app_name="streaming-evidence")
    work = tempfile.mkdtemp(prefix="stream_evidence_")
    checks = {
        "session_xbatch": check_session_xbatch,
        "anomaly_xbatch": check_anomaly_xbatch,
        "dedup_xbatch": check_dedup_xbatch,
        "join_xbatch": check_join_xbatch,
        "tumbling_late_drop": check_tumbling_late_drop,
        "session_restart": check_session_restart,
        "anomaly_restart": check_anomaly_restart,
        "session_multi_restart": check_session_multi_restart,
        "anomaly_multi_restart": check_anomaly_multi_restart,
        "anomaly_volume_restart": check_anomaly_volume_restart,
    }
    if int(os.environ.get("STREAM_SOAK_SECONDS", "0")) > 0:
        checks["rate_soak"] = check_rate_soak
    results: dict[str, dict] = {}
    for name, fn in checks.items():
        try:
            results[name] = fn(spark, work)
        except Exception as ex:  # a crashed check is a failed check
            results[name] = {"pass": False, "error": str(ex)[:500]}
        print(f"{name:22s} {'OK' if results[name]['pass'] else 'FAIL'}")
    payload = {
        "harness": "tools/streaming_evidence.py",
        "batches_per_check": {
            # multi/volume_restart checks: 4 phases, 3 restarts
            name: (4 if name.endswith(("multi_restart", "volume_restart"))
                   else 3 if name == "tumbling_late_drop" else 2)
            for name in checks  # restart checks: 2 batches, 1 restart
        },
        "all_pass": all(r["pass"] for r in results.values()),
        "checks": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, default=str)
        f.write("\n")
    print(json.dumps({"all_pass": payload["all_pass"], "out": out_path}))
    spark.stop()
    sys.exit(0 if payload["all_pass"] else 1)


if __name__ == "__main__":
    main()
