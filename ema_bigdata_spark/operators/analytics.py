"""Event-analytics composites over ``events`` (driver mandate,
SURVEY.md §2.4): cohort retention and ordered funnels — the two
queries every product/events pipeline runs daily, here as declared,
DuckDB-oracled surface.

Scale notes per query in the docstrings; both are pure DataFrame
compositions (no UDFs, no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table


# -- q_retention: daily cohort retention ----------------------------------


@query(
    "q_retention",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (
      SELECT user_id, min(d) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, y.d) AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM days y JOIN cohort c ON y.user_id = c.user_id
    GROUP BY c.cohort_day, date_diff('day', c.cohort_day, y.d)
    """,
)
def q_retention(spark, sf_dir):
    """Classic cohort retention: users bucketed by first-active day,
    counted on every later active day (the D1/D7/D30 curve).

    Shape: distinct (user, day) — the only shuffle proportional to
    data — then the cohort day rides along as a per-user window MIN
    (no second scan, no join back to raw events), then a groupBy over
    ≤ days² tiny keys.  Each (user, day) row is unique, so the final
    count(*) IS distinct users.  At 100 TB the distinct is the cost;
    pre-aggregating daily activity into an incremental (user, day)
    table turns every later retention run into the tiny tail only."""
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    days = days.withColumn(
        "cohort_day", F.min("d").over(Window.partitionBy("user_id"))
    )
    return days.groupBy(
        "cohort_day",
        F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


# -- q_funnel: strictly-ordered conversion funnel -------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "q_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > v.t
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > c.t
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
    """,
)
def q_funnel(spark, sf_dir):
    """Strictly-ordered funnel view → click → purchase: a user counts
    at step N only with an event AFTER their step-N−1 completion time
    (first-touch semantics at every step).

    Single-pass shape (r3 rework): ONE scan (event_type IN the three
    steps, pushed to parquet) and ONE user_id exchange.  The stage
    times chain as per-user window minimums over the SAME partitioning
    — ``t_click = min ts of a click after t_view`` can see ``t_view``
    because it is a window column on the same row — then distinct +
    the final count ride the existing partitioning (no further
    exchange until the 1-row gather).  The previous stage-join chain
    re-scanned events per stage and re-evaluated earlier stages for
    their counts: 6 scans / 13 exchanges, vs 1 / 2 now — the
    difference between one pass and six at 100 TB."""
    from pyspark.sql import Window

    v, c, p = _FUNNEL_STEPS
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(list(_FUNNEL_STEPS)))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    step_ts = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == v, F.col("ts"))).over(w)
    )
    step_ts = step_ts.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == c) & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    step_ts = step_ts.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == p) & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = step_ts.select(
        "user_id", "t_view", "t_click", "t_purchase"
    ).distinct()
    return per_user.agg(
        F.count("t_view").cast("long").alias("n_view"),
        F.count("t_click").cast("long").alias("n_click"),
        F.count("t_purchase").cast("long").alias("n_purchase"),
    )
