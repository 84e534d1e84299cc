"""Structured Streaming surface (SURVEY.md §2.4 stretch — the
reference is batch-only; the ``events`` table is the natural stream).

``s_stream_tumbling`` runs a real micro-batch streaming query:
file-source ``readStream`` over the events parquet → event-time
watermark → tumbling 1-minute window counts → in-memory sink, drained
with ``processAllAvailable``.  At scale the same plan runs unchanged on
a Kafka source with checkpointing; the watermark bounds state store
size (late rows beyond 10 min are dropped instead of growing state).

Watermarks require TIMESTAMP (LTZ), so event time is carried as the
*instant* ``timestamp_micros(ns div 1000)`` — instants and 1-minute
window boundaries are timezone-independent (all UTC offsets are whole
minutes) — and window starts are converted to TIMESTAMP_NTZ via pure
epoch-µs arithmetic only at the output edge.

The result is batch-equivalent here (single file → single micro-batch,
nothing is ever late), so it's SQL-oracled against the equivalent
GROUP BY — a stronger check than rows-only.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_raw

_WATERMARK = "10 minutes"
_WINDOW = "1 minute"

#: LTZ instant → NTZ wall clock (UTC), session-timezone-independent
_START_NTZ = (
    "timestampadd(MICROSECOND, unix_micros(w.start),"
    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
)


@query(
    "s_stream_tumbling",
    oracle="""
    SELECT date_trunc('minute', ts) AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY date_trunc('minute', ts)
    """,
)
def s_stream_tumbling(spark, sf_dir):
    # File streaming source needs an explicit schema; take it from a
    # batch read of the same file (ts arrives as raw nanos BIGINT).
    raw_schema = load_raw(spark, sf_dir, "events").schema
    to_instant = F.expr("timestamp_micros(ts div 1000)")
    # file source wants a directory: scan sf_dir with a glob filter
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", to_instant)
    )
    agg = (
        stream.withWatermark("ts", _WATERMARK)
        .groupBy(F.window("ts", _WINDOW).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    sink = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # exact distinct users per window from the batch side (stream keeps
    # counts) — demonstrates stream/batch unification on one API.
    exact_users = (
        load_raw(spark, sf_dir, "events")
        .withColumn("ts", to_instant)
        .groupBy(F.window("ts", _WINDOW).alias("w"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    stream_counts = spark.table(sink).select("w", "n_events")
    return stream_counts.join(exact_users, "w").select(
        F.expr(_START_NTZ).alias("window_start"),
        "n_events",
        "n_users",
    )
