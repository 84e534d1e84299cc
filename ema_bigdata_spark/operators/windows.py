"""Part B — window functions: ranking, running frames, offsets, and
gaps-and-islands sessionization (SURVEY.md §2.4).  Absent from the
reference (no key-based operators at all, SURVEY.md §2.1).

Parity rules applied here:
- every window ORDER BY ends with a unique key (deterministic ties);
- running sums use explicit ROWS frames (DuckDB defaults to RANGE);
- time deltas are integer microseconds via ``timestampdiff`` on
  TIMESTAMP_NTZ — engine-identical, timezone-free;
- running money sums accumulate exact scaled integers.

Scale: windows shuffle once on their partition key; per-user
partitions are small (bounded events per user), so state per key stays
in memory; AQE splits any skewed user.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ema_bigdata_spark.functions.parity import cents, sql_cents
from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table

#: 30-minute session gap in microseconds
SESSION_GAP_US = 30 * 60 * 1_000_000


# -- q_window_rank: top-2 orders per customer -----------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def q_window_rank(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 2)
    )


# -- q_window_running: per-user running sum with explicit ROWS frame ------


@query(
    "q_window_running",
    # WHERE ts IS NOT NULL (r8, found by the hostile-ts sweep): an
    # event with no event time has no position on an ordered timeline,
    # and the engines disagree on where to put it (Spark windows sort
    # NULLS FIRST, DuckDB NULLS LAST) — for an ACCUMULATING window
    # that position shifts every running value after it, so the row is
    # excluded outright.  Per-row window ops (q_window_lag) keep NULL
    # rows: their boundary outputs are NULL on both engines either way
    # (pinned by TestNullTs).  event_id IS NOT NULL (r9, hostile-nulls
    # sweep): same argument for the TIEBREAK key — a NULL id at a tied
    # ts shifts the running sum by the engines' opposite NULL
    # placement.
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum({sql_cents('value')})
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / CAST(100 AS DOUBLE) AS running_value
    FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
    """,
)
def q_window_running(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    ).select(
        "event_id",
        "user_id",
        (F.sum(cents("value")).over(w).cast("double") / F.lit(100.0)).alias(
            "running_value"
        ),
    )


# -- q_window_lag: inter-event gap per user -------------------------------


@query(
    "q_window_lag",
    # event_id IS NOT NULL (r9, hostile-nulls sweep): the (ts,
    # event_id) tiebreak is what makes the lag deterministic, and the
    # engines place a NULL tiebreak on opposite ends of a tie group
    # (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST) — an
    # identity-less event has no position in the total order.  NULL
    # ts rows still flow through: their boundary gaps are NULL on
    # both engines either way (pinned by TestNullTs).
    oracle="""
    SELECT event_id, user_id,
           CAST(date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS gap_us
    FROM events WHERE event_id IS NOT NULL
    """,
)
def q_window_lag(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id").isNotNull())
        .withColumn("_prev", F.lag("ts").over(w))
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("_prev").isNotNull(),
                F.expr("timestampdiff(MICROSECOND, _prev, ts)").cast("long"),
            ).alias("gap_us"),
        )
    )


# -- q_sessionize: gaps-and-islands with windows only (no UDF) ------------


@query(
    "q_sessionize",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL THEN 1
                  WHEN date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) > {SESSION_GAP_US} THEN 1
                  ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
    )
    """,
)
def q_sessionize(spark, sf_dir):
    # WHERE ts IS NOT NULL: same accumulating-window NULL-ordering
    # divergence as q_window_running (see its oracle comment) — an
    # untimed event would renumber every later session on one engine
    # only.  The gate lives in the QUERY, not the sessionize() library
    # core (a caller may sessionize frames with their own contracts).
    return sessionize(
        load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ).select("event_id", "user_id", "session_id")


def sessionize(
    df,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
    day_bucket: bool = False,
):
    """Assign 1-based ``session_id`` per ``user_col``: a new session
    starts when the gap since the previous event exceeds ``gap_us``.

    Classic two-window gaps-and-islands: flag session starts via lag,
    then a running sum of flags numbers the sessions.  Both windows
    share one partitioning → a single shuffle on ``user_col``; per-key
    state is one row of lookback, so any events volume streams through.

    ``day_bucket=True`` selects :func:`_sessionize_day_bucket` — the
    hot-key mitigation (identical output, sub-partitioned plan).  The
    default stays the single-window form: it is one shuffle and one
    sort, and the zipfian probes show it sublinear until one tenant
    owns a double-digit share of the corpus (the documented 0.56
    exponent floor at a 10%-hot key) — switch when key skew is the
    measured bottleneck, not before.
    """
    if day_bucket:
        return _sessionize_day_bucket(df, user_col, ts_col, id_col, gap_us)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w)
    is_new = (
        F.when(prev.isNull(), 1)
        .when(
            F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_us, 1
        )
        .otherwise(0)
    )
    return (
        df.withColumn("_prev", prev)
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun).cast("long"))
        .drop("_prev", "is_new")
    )


#: one day in microseconds — the sub-partition width of the day-bucket
#: sessionizer.  Any width > the session gap is CORRECT (the stitch
#: only needs every true predecessor to sit in the current or previous
#: bucket... in fact only in SOME earlier bucket, since buckets
#: partition time); a day keeps the per-(user, day) summary table
#: small while splitting a hot tenant's year into ~365 parallel tasks.
_DAY_US = 86_400_000_000


def _sessionize_day_bucket(df, user_col, ts_col, id_col, gap_us):
    """Hot-key sessionization: identical output to the global form,
    with the heavy windows sub-partitioned per (user, UTC day) and the
    cross-midnight sessions stitched on a tiny per-bucket summary.

    Why (r9, VERDICT r8 item 5): the global form's per-user window is
    a single task per key — a tenant owning 10% of a 100 TB corpus is
    a 10 TB sort on one core (the measured 0.56 scaling-exponent
    floor).  Here the event-level windows partition by (user, day), so
    the hottest key splits into per-day tasks, and only the per-bucket
    summary (one row per user-day: first/last ts, local start count)
    sees a per-user window — 5-6 orders of magnitude smaller.

    Stitching: within a bucket, local gaps-and-islands numbers
    sessions 1..starts_b (the bucket's first event is locally flagged
    new).  Globally, that first event's true predecessor is the LAST
    event of the user's PREVIOUS bucket — buckets partition the time
    axis, so bucket order IS event order across buckets — and the
    local flag is wrong exactly when that cross-bucket gap is within
    ``gap_us``: merge_b = 1 then, else 0.  With offset_b =
    Σ_{b'<b}(starts_b' − merge_b') (the number of global sessions
    closed before bucket b), every event maps to
    ``offset_b + local_idx − merge_b``.  All exact integer arithmetic;
    property-tested equal to the global form on random corpora whose
    sessions straddle midnight (tests/test_properties.py).

    Plan (verified on the executed plan, r9): the event-level windows
    partition by (user, day) — the hot key's serial task becomes
    per-day parallel tasks — the per-user stitch window runs over the
    tiny summary only, and the stitch joins back by BROADCAST (the
    summary is user-days-sized).  Honest cost note: the summary branch
    RECOMPUTES the flagged frame (scan + window twice — Spark plans no
    ReusedExchange across join branches without materialization, and
    checkpointing the corpus would defeat the point at scale), so this
    form does ~2× the fully-parallel work to remove the serial
    bottleneck; the measured 0.48 exponent (vs the global form's 0.80
    on the 100× zipfian fixture) already includes that cost, which is
    also why the global form stays the default below the skew
    threshold.
    """
    ep = (
        f"timestampdiff(MICROSECOND,"
        f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    # floor division in DOUBLE is exact here: |epoch µs| < 2^53 for
    # every ts inside the engine's event-time domain [1900, 9000)
    d = df.withColumn(
        "_day", F.expr(f"CAST(floor(({ep}) / {_DAY_US}) AS BIGINT)")
    )
    wl = Window.partitionBy(user_col, "_day").orderBy(ts_col, id_col)
    wrun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(wl)
    is_new = (
        F.when(prev.isNull(), 1)
        .when(
            F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_us, 1
        )
        .otherwise(0)
    )
    flagged = (
        d.withColumn("_prev", prev)
        .withColumn("_new", is_new)
        .withColumn("_lidx", F.sum("_new").over(wrun).cast("long"))
        .drop("_prev")
    )
    summ = flagged.groupBy(user_col, "_day").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.sum("_new").cast("long").alias("_starts"),
    )
    wu = Window.partitionBy(user_col).orderBy("_day")
    prev_last = F.lag("_last_ts").over(wu)
    merge = (
        F.when(prev_last.isNull(), 0)
        .when(
            F.expr("timestampdiff(MICROSECOND, _prev_last, _first_ts)")
            <= gap_us,
            1,
        )
        .otherwise(0)
    )
    stitched = (
        summ.withColumn("_prev_last", prev_last)
        .withColumn("_merge", merge)
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum(F.col("_starts") - F.col("_merge")).over(
                    wu.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select(user_col, "_day", "_merge", "_offset")
    )
    return (
        flagged.join(stitched, [user_col, "_day"])
        .withColumn(
            "session_id",
            (F.col("_offset") + F.col("_lidx") - F.col("_merge")).cast(
                "long"
            ),
        )
        .drop("_day", "_new", "_lidx", "_merge", "_offset")
    )


# -- q_window_frames: ranking-distribution functions ----------------------


@query(
    "q_window_frames",
    # sort keys IS NOT NULL (r9, hostile-nulls sweep): ntile /
    # percent_rank / cume_dist are POSITIONAL — a row whose sort key
    # or tiebreak is NULL lands on opposite ends of the partition
    # between engines (Spark ASC = NULLS FIRST, DuckDB NULLS LAST)
    # and shifts every rank after it; a row without its ranking keys
    # has no place in the distribution.
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS first_key
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_frames(spark, sf_dir):
    # percent_rank/cume_dist are exact small-integer ratios (identical
    # doubles on both engines); the unique o_orderkey tiebreak makes
    # ntile and first_value deterministic.
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull() & F.col("o_orderkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(wrows).alias("first_key"),
    )


# -- q_window_range_frame: time-based rolling aggregate -------------------


@query(
    "q_window_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum({sql_cents('value')})
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                              AND CURRENT ROW)
                AS DOUBLE) / CAST(100 AS DOUBLE) AS rolling_10m
    FROM events
    """,
)
def q_window_range_frame(spark, sf_dir):
    """Rolling 10-minute per-user sum via a RANGE frame — the
    value-based frame built-in windows provide (vs the ROWS frame of
    ``q_window_running``).  Spark's rangeBetween needs a numeric
    ordering key, so the NTZ timestamp orders as exact epoch-µs; ties
    (same ts) are IN the frame together on both engines."""
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr(us))
        .rangeBetween(-10 * 60 * 1_000_000, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.sum(cents("value")).over(w).cast("double") / F.lit(100.0)).alias(
            "rolling_10m"
        ),
    )


# -- q_compact_latest: keep-latest-per-key compaction (CDC/upsert) --------

#: the ONE compaction contract (key, recency order, unique tie-break)
#: shared by q_compact_latest and both sides of cdc_merge — Python
#: and SQL forms kept side by side so a tie-break change cannot drift
#: between the standalone query, the merge, and their oracles.
_COMPACT_SQL = """
    SELECT user_id, event_type, ts, value FROM (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM {src}
    ) WHERE rn = 1"""


def compact_latest(events):
    """Latest row per (user_id, event_type), ties broken by the unique
    event_id — the Python form of :data:`_COMPACT_SQL`."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


@query("q_compact_latest", oracle=_COMPACT_SQL.format(src="events"))
def q_compact_latest(spark, sf_dir):
    """Keep-latest-per-key compaction — the CDC/upsert merge every
    lakehouse table maintenance job runs: one ranking window keyed by
    the logical key, ordered by recency with a unique tie-break
    (event_id), keeping rank 1.

    One shuffle on the key; at 100 TB the same window runs per
    partition of a date-partitioned table, and AQE splits any hot key's
    sort.  (A groupBy(max_by) would also work but loses the full-row
    payload generality that makes this the standard compaction shape.)"""
    return compact_latest(load_table(spark, sf_dir, "events"))


# -- q_cdc_merge: MERGE INTO classification (SCD-1 upsert audit) ----------

#: snapshot/batch split instant for the merge demo (events span one
#: month, 2024-01: days 1-4 are the standing snapshot, the rest the
#: incoming batch — chosen so the registered query exercises insert,
#: update, AND unchanged on real data; the carry class needs a key
#: that goes silent, which this dense fixture doesn't have, so it is
#: pinned by the synthetic-fixture unit test instead).  Production
#: merges a daily batch into yesterday's snapshot through the
#: identical plan.
_MERGE_T = "2024-01-05"


def cdc_merge(snap_events, batch_events):
    """MERGE INTO classification over two event sets: compact each to
    latest-per-(user, type) (the q_compact_latest window), FULL OUTER
    join on the key, and label every output row ``insert`` (new key),
    ``update`` (value changed), ``unchanged`` (value identical —
    null-safe ``<=>``, so NULL = NULL counts as unchanged), or
    ``carry`` (key absent from the batch).  The op column is exactly
    what a production MERGE publishes as its commit metrics; the full
    row set is the post-merge table.

    final_value keys on BATCH-ROW PRESENCE (the non-null join key),
    never on value nullness: a batch row whose latest value is NULL
    legitimately overwrites the snapshot with NULL (an
    ``update``/``unchanged`` carrying NULL forward) — a
    ``coalesce(b.value, s.value)`` here would silently resurrect the
    old value (caught by the Hypothesis random-split test).

    Scale: both compactions shuffle once on the same key → AQE reuses
    the partitioning for the join; at 100 TB the snapshot is already
    compact (it IS the previous merge output) and only the batch pays
    a window."""
    s = compact_latest(snap_events).alias("s")
    b = compact_latest(batch_events).alias("b")
    j = s.join(
        b,
        (F.col("s.user_id") == F.col("b.user_id"))
        & (F.col("s.event_type") == F.col("b.event_type")),
        "full_outer",
    )
    return j.select(
        F.coalesce("s.user_id", "b.user_id").alias("user_id"),
        F.coalesce("s.event_type", "b.event_type").alias("event_type"),
        F.when(F.col("b.user_id").isNull(), F.col("s.value"))
        .otherwise(F.col("b.value"))
        .alias("final_value"),
        F.coalesce("b.ts", "s.ts").alias("final_ts"),
        F.when(F.col("s.user_id").isNull(), "insert")
        .when(F.col("b.user_id").isNull(), "carry")
        .when(F.col("b.value").eqNullSafe(F.col("s.value")), "unchanged")
        .otherwise("update")
        .alias("op"),
    )


@query(
    "q_cdc_merge",
    oracle=f"""
    WITH snap AS ({_COMPACT_SQL.format(
        src=f"(SELECT * FROM events WHERE ts < TIMESTAMP '{_MERGE_T}')"
    )}
    ),
    batch AS ({_COMPACT_SQL.format(
        src=f"(SELECT * FROM events WHERE ts >= TIMESTAMP '{_MERGE_T}')"
    )}
    )
    SELECT coalesce(s.user_id, b.user_id) AS user_id,
           coalesce(s.event_type, b.event_type) AS event_type,
           CASE WHEN b.user_id IS NULL THEN s.value
                ELSE b.value END AS final_value,
           coalesce(b.ts, s.ts) AS final_ts,
           CASE WHEN s.user_id IS NULL THEN 'insert'
                WHEN b.user_id IS NULL THEN 'carry'
                WHEN b.value IS NOT DISTINCT FROM s.value
                     THEN 'unchanged'
                ELSE 'update' END AS op
    FROM snap s FULL OUTER JOIN batch b
      ON s.user_id = b.user_id AND s.event_type = b.event_type
    """,
)
def q_cdc_merge(spark, sf_dir):
    """See :func:`cdc_merge` — the lakehouse SCD-1 MERGE audited on
    the events table split at `_MERGE_T`.  Each side goes through
    ``filter_ts_range`` on the RAW column (tables.py): the split
    predicate stays an integer/native comparison that reaches the
    parquet scan under BOTH physical timestamp types the loader
    supports, so at 100 TB the batch side reads only the fresh
    partitions.  Driver-mandated surface (SURVEY §2.4); no Main.scala
    counterpart."""
    from ema_bigdata_spark.sources.tables import filter_ts_range, load_raw

    return cdc_merge(
        filter_ts_range(
            load_raw(spark, sf_dir, "events"), "ts", hi=_MERGE_T
        ),
        filter_ts_range(
            load_raw(spark, sf_dir, "events"), "ts", lo=_MERGE_T
        ),
    )
