"""Part B — dataset profiling / operability diagnostics (driver
mandate, SURVEY.md §2.4): the maintenance queries a 100 TB lakehouse
runs continuously.  Absent from the reference (its only "profiling"
is printing N, mean and variance to stdout — `Main.scala:46-47`).

- ``q_profile_table``: ANALYZE-style column profile (rows, nulls,
  exact distincts, min/max) for every numeric/temporal column of
  ``orders`` in ONE aggregation pass — the stats that feed CBO
  estimates and data-quality monitors.
- ``q_skew_metrics``: key-distribution diagnostics for
  ``events.user_id`` — the measurement that decides whether a join
  needs salting (see ``salted_join``) and with what factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table

#: the profiling family's declared value domains (r8 posture, r9
#: per-pipeline bounds — ADVICE r8): each query's row filter is its
#: own arithmetic's PROVEN headroom, not just the ×1e6 snap's cast
#: safety.  Rows outside — non-finite included, since NaN/±Inf
#: compare greater than any finite bound on both engines, and NULL
#: fails the predicate — are excluded like NULLs.  A plain row filter
#: keeps every downstream count/sum/percentile consistent (an
#: in-pipeline NULL snap would make count(*) disagree with the sums
#: that skip it).  Per pipeline (each literal appears in the shared
#: filter text `abs(value) <= B` on BOTH engines):
#:
#: - q_winsorize: 9.2e12 (linear BIGINT ops only — the ×1e6 snap's
#:   cast headroom IS the binding constraint);
#: - q_value_outliers: 1e9 — sxx0 = Σvu² must fit DECIMAL(38,0) /
#:   HUGEINT.  The old 9.2e12 gate let two same-user rows near the
#:   bound overflow the sum on BOTH engines (probed r9: Spark
#:   "Overflow in sum of decimals", DuckDB "Overflow in HUGEINT
#:   addition") — an in-domain crash.  At 1e9, vu² ≤ 1e30 leaves
#:   1e7-events-per-user headroom (the docstring's long-standing
#:   claim, now enforced by the gate);
#: - q_outlier_mad: 1e8 — the integer gate `6745·au > 35000·mad_u`
#:   runs in BIGINT; au ≤ 2·vu_max needs vu_max ≤ 1.3e14 for the
#:   35000· product (probed r9: ±9.2e12 in one event_type overflowed
#:   BIGINT on both engines).  At 1e8, 6745·au ≤ 1.35e18 and
#:   35000·mad_u ≤ 7e18, both inside int64.
#:
#: Boundary parity is pinned by tests/test_adversarial_domain.py
#: (TestProfilingDomain).

#: (profile column, Spark source expression, round?) — o_orderdate
#: profiles as exact epoch microseconds so min/max stay engine-exact
#: BIGINT-in-DOUBLE.  round(x, 6) applies ONLY to the float column:
#: it exists to stabilize fractional min/max, and at extreme integer
#: magnitudes it is no longer the identity on DuckDB (measured, r8
#: hostile-ts sweep: a year-9999 date → 253402214400000000 µs, where
#: DuckDB's multiply-round-divide round() emits ...0000003 while
#: Spark's BigDecimal round is exact) — integer-valued profile
#: columns go through the plain exact BIGINT→DOUBLE cast instead.
_PROFILE_COLS = [
    ("o_orderkey", "o_orderkey", False),
    ("o_custkey", "o_custkey", False),
    ("o_totalprice", "o_totalprice", True),
    (
        "o_orderdate_us",
        "CAST(timestampdiff(MICROSECOND,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate) AS BIGINT)",
        False,
    ),
]

_PROFILE_ORACLE_COLS = [
    ("o_orderkey", "o_orderkey", False),
    ("o_custkey", "o_custkey", False),
    ("o_totalprice", "o_totalprice", True),
    (
        "o_orderdate_us",
        "CAST(date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',"
        " o_orderdate) AS BIGINT)",
        False,
    ),
]


def _profile_oracle() -> str:
    parts = []
    for name, expr, rnd in _PROFILE_ORACLE_COLS:
        mn = f"CAST(min({expr}) AS DOUBLE)"
        mx = f"CAST(max({expr}) AS DOUBLE)"
        if rnd:
            mn, mx = f"round({mn}, 6)", f"round({mx}, 6)"
        parts.append(
            f"""
        SELECT '{name}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({expr}) AS BIGINT) AS n_notnull,
               CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
               {mn} AS min_val,
               {mx} AS max_val
        FROM orders
        """
        )
    return " UNION ALL ".join(parts)


@query("q_profile_table", oracle=_profile_oracle())
def q_profile_table(spark, sf_dir):
    """ANALYZE-style profile of ``orders`` — one row per profiled
    column with row/null/exact-distinct counts and min/max.

    All statistics for all columns come from a SINGLE aggregation
    (one scan; the distinct counts share one Expand), then the 1-row
    result is pivoted long with ``inline`` — no second pass, no
    per-column jobs.  At 100 TB this is the profile pass a catalog
    runs per partition and merges; swap ``count(DISTINCT)`` for
    ``approx_count_distinct`` when exactness stops paying (that
    trade-off is q_approx_distinct's subject)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, expr, rnd in _PROFILE_COLS:
        c = F.expr(expr)
        mn, mx = F.min(c).cast("double"), F.max(c).cast("double")
        if rnd:
            mn, mx = F.round(mn, 6), F.round(mx, 6)
        aggs += [
            F.count(c).cast("long").alias(f"nn_{name}"),
            F.countDistinct(c).cast("long").alias(f"nd_{name}"),
            mn.alias(f"mn_{name}"),
            mx.alias(f"mx_{name}"),
        ]
    wide = o.agg(*aggs)
    return wide.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column_name"),
                        F.col("n_rows"),
                        F.col(f"nn_{name}").alias("n_notnull"),
                        F.col(f"nd_{name}").alias("n_distinct"),
                        F.col(f"mn_{name}").alias("min_val"),
                        F.col(f"mx_{name}").alias("max_val"),
                    )
                    for name, _, _ in _PROFILE_COLS
                ]
            )
        )
    )


@query(
    "q_skew_metrics",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events
               GROUP BY user_id),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(cnt) AS BIGINT) AS n_rows,
                 CAST(max(cnt) AS BIGINT) AS max_count FROM c),
    h AS (SELECT user_id AS hottest_user FROM c
          ORDER BY cnt DESC, user_id LIMIT 1)
    SELECT h.hottest_user, t.max_count, t.n_keys, t.n_rows,
           round(CAST(t.max_count AS DOUBLE) * t.n_keys / t.n_rows, 6)
             AS skew_factor
    FROM t, h
    """,
)
def q_skew_metrics(spark, sf_dir):
    """Key-skew diagnostics for ``events.user_id``: key count, total
    rows, the hottest key and its count, and the skew factor
    (hottest share × key count; 1.0 = perfectly uniform).

    This is the measurement that sizes ``salted_join``'s salt factor
    before a 100 TB join: one groupBy on the key (the same shuffle
    the join would do), then ONE scalar aggregate over the tiny
    per-key counts (r3 rework: the hottest key comes from the same
    aggregate via max over (cnt, ~key) structs — lexicographic max =
    highest count, lowest key on ties, identical to the oracle's
    (count DESC, key) order — where the previous top-1 sort branch
    re-evaluated the whole per-key aggregate: 2 scans → 1)."""
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_count"),
        # ~key, not -key (r9, hostile-extremes sweep): bitwise NOT is
        # the overflow-free order-reversing involution on int64 —
        # ANSI negate(-2^63) is a job kill, ~ is total
        F.max(
            F.struct(F.col("cnt"), F.expr("~user_id").alias("nid"))
        ).alias("_h"),
    ).select(
        F.expr("~_h.nid").cast("long").alias("hottest_user"),
        "max_count",
        "n_keys",
        "n_rows",
        F.round(
            F.col("max_count").cast("double")
            * F.col("n_keys")
            / F.col("n_rows"),
            6,
        ).alias("skew_factor"),
    )


# -- q_value_outliers: per-user z-score anomaly detection -----------------

#: z is scale-invariant, so the ×10⁶ integer scaling cancels — no
#: descale.  ``sx``/``sxx`` are the per-user MIN-SHIFTED sums
#: Σ(vu−m) and Σ(vu−m)² (exact integer arithmetic, see
#: :func:`value_outliers`), so the doubles here only ever hold
#: spread-sized numbers — the r3 unshifted form lost the variance to
#: catastrophic cancellation once |mean| ≫ sd (e.g. values ~1e9 with
#: sd ~1: sxx/n and (sx/n)² were ~1e30-scale doubles whose true
#: difference was ~1; ADVICE r3).  All inputs are exact integers cast
#: to DOUBLE, so the shared formula text runs the same IEEE-754
#: sequence on both engines (the q_corr_stats recipe).
_Z_EXPR = (
    "((CAST(vu - m AS DOUBLE) - sx / n)"
    " / sqrt(sxx / n - (sx / n) * (sx / n)))"
)
_Z_GATE = (
    f"n >= 10 AND (sxx / n - (sx / n) * (sx / n)) > 0"
    f" AND abs({_Z_EXPR}) > 3"
)


def value_outliers(events) -> "DataFrame":
    """Events whose value is > 3 population standard deviations from
    the SAME user's mean — the per-entity anomaly flag a data-quality
    monitor runs over every numeric ingest column (corrupt sensors,
    unit mix-ups, fat-fingered backfills).

    Scale shape: one groupBy collapses events to a per-user statistics
    table (n, min, Σv, Σv² as exact DECIMAL(38,0) integer sums —
    map-side combined, shuffle ∝ users), which joins back by BROADCAST
    (the stats table is users-sized, orders below the event log; a
    million-user table is ~24 MB and still broadcasts; beyond that
    drop the hint and AQE picks the shuffle join).  The z computation
    is a per-row projection; nothing but the stats table ever
    shuffles.

    Numerical stability (ADVICE r3): the naive E[x²]−E[x]² in doubles
    loses the variance to cancellation once |mean| ≫ sd.  Rather than
    a second shifted-sum pass over the events (an extra shuffle), the
    min-shift is applied ALGEBRAICALLY to the one-pass sums, still in
    exact integer arithmetic:  with m = min(vu),
        Σ(vu−m)  = Σvu  − n·m
        Σ(vu−m)² = Σvu² − 2·m·Σvu + n·m²
    Only these spread-sized shifted sums are ever cast to DOUBLE, so
    the formula in ``_Z_EXPR`` never subtracts near-equal huge
    numbers.  Exactness headroom: every intermediate is ≤ ~n·max|vu|²
    ≈ n·(|value|×10⁶)², inside DECIMAL(38,0) / HUGEINT for
    |value| ≤ 1e9 with up to ~1e7 events per user — far beyond the
    |mean|/sd ≈ 1e8 point where the unshifted doubles had already
    failed."""
    ev = events.where(F.abs(F.col("value")) <= F.lit(1e9)).select(
        "event_id",
        "user_id",
        "value",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vu"),
    )
    dec = "decimal(38,0)"
    # the vu² product must leave BIGINT BEFORE multiplying: vu is
    # value×10⁶, so vu·vu overflows int64 once |value| ≥ ~3037 (and
    # without ANSI mode Spark would wrap silently, poisoning sxx and
    # suppressing exactly the wild anomalies this query exists to
    # flag).  decimal(38,0)·bigint keeps the product exact to 1e19×
    # headroom; the DuckDB oracle widens to HUGEINT the same way.
    raw = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.min("vu").alias("m"),
        F.sum(F.col("vu").cast(dec)).alias("sx0"),
        F.sum(F.col("vu").cast(dec) * F.col("vu")).alias("sxx0"),
    )
    n_dec = F.col("nn").cast(dec)
    m_dec = F.col("m").cast(dec)
    stats = raw.select(
        "user_id",
        "m",
        F.col("nn").cast("double").alias("n"),
        (F.col("sx0") - n_dec * m_dec).cast("double").alias("sx"),
        (
            F.col("sxx0")
            - F.lit(2).cast(dec) * m_dec * F.col("sx0")
            + n_dec * m_dec * m_dec
        )
        .cast("double")
        .alias("sxx"),
    )
    return (
        ev.join(F.broadcast(stats), "user_id")
        .where(F.expr(_Z_GATE))
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(F.expr(_Z_EXPR), 6).alias("zscore"),
        )
    )


@query(
    "q_value_outliers",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, value,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events WHERE abs(value) <= 1e9
    ),
    raw AS (
      SELECT user_id,
             count(*) AS nn,
             min(vu) AS m,
             sum(CAST(vu AS HUGEINT)) AS sx0,
             sum(CAST(vu AS HUGEINT) * vu) AS sxx0
      FROM ev GROUP BY user_id
    ),
    stats AS (
      SELECT user_id, m,
             CAST(nn AS DOUBLE) AS n,
             CAST(sx0 - CAST(nn AS HUGEINT) * m AS DOUBLE) AS sx,
             CAST(sxx0 - 2 * CAST(m AS HUGEINT) * sx0
                  + CAST(nn AS HUGEINT) * m * m AS DOUBLE) AS sxx
      FROM raw
    )
    SELECT event_id, ev.user_id, value,
           round({_Z_EXPR}, 6) AS zscore
    FROM ev JOIN stats ON ev.user_id = stats.user_id
    WHERE {_Z_GATE}
    """,
)
def q_value_outliers(spark, sf_dir):
    """See :func:`value_outliers`.  Driver-mandated surface (SURVEY
    §2.4); no Main.scala counterpart."""
    return value_outliers(load_table(spark, sf_dir, "events"))


# -- q_winsorize: per-group percentile clipping (r4 addition) -------------

_WINSOR_LO = 0.01
_WINSOR_HI = 0.99


def winsorize(events, lo: float = _WINSOR_LO, hi: float = _WINSOR_HI):
    """Clip ``events.value`` to its per-event-type [p_lo, p_hi] range —
    winsorization, the standard numeric-cleaning step before training
    statistics (caps fat-finger outliers without dropping rows, unlike
    the flag-only :func:`value_outliers`).

    Cross-engine exactness: percentiles run on ×10⁶ fixed-point BIGINTs
    (the q_percentiles recipe — Spark ``percentile`` and DuckDB
    ``quantile_cont`` interpolate identically), and the bounds are
    ROUNDED BACK TO INTEGER µ-units, so every clip comparison is pure
    integer arithmetic — no float-boundary flip can differ between
    engines.

    Scale shape: one groupBy collapses events to a ≤|event_types|-row
    bounds table (exact percentile needs the sort-based aggregate —
    swap in ``approx_percentile`` at 100 TB if the groups are huge,
    same plan otherwise), which joins back by BROADCAST; the clip is a
    per-row projection.  Nothing but the bounds table ever shuffles."""
    ev = events.where(F.abs(F.col("value")) <= F.lit(9.2e12)).select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vu"),
    )
    bounds = ev.groupBy("event_type").agg(
        F.expr(f"CAST(round(percentile(vu, {lo})) AS BIGINT)").alias("lo_u"),
        F.expr(f"CAST(round(percentile(vu, {hi})) AS BIGINT)").alias("hi_u"),
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.expr("CAST(least(greatest(vu, lo_u), hi_u) AS DOUBLE)")
            / F.lit(1000000),
            6,
        ).alias("value_w"),
        (F.col("vu") < F.col("lo_u")).alias("clipped_low"),
        (F.col("vu") > F.col("hi_u")).alias("clipped_high"),
    )


@query(
    "q_winsorize",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events WHERE abs(value) <= 9.2e12
    ),
    b AS (
      SELECT event_type,
             CAST(round(quantile_cont(vu, {_WINSOR_LO})) AS BIGINT) AS lo_u,
             CAST(round(quantile_cont(vu, {_WINSOR_HI})) AS BIGINT) AS hi_u
      FROM ev GROUP BY event_type
    )
    SELECT event_id, ev.event_type, value,
           round(CAST(least(greatest(vu, lo_u), hi_u) AS DOUBLE)
                 / 1000000, 6) AS value_w,
           vu < lo_u AS clipped_low,
           vu > hi_u AS clipped_high
    FROM ev JOIN b USING (event_type)
    """,
)
def q_winsorize(spark, sf_dir):
    """See :func:`winsorize`.  r4 addition to the data-quality surface
    (SURVEY §2.4); no Main.scala counterpart."""
    return winsorize(load_table(spark, sf_dir, "events"))


# -- q_outlier_mad: median-absolute-deviation outliers (r5 addition) ------

#: modified z-score gate |0.6745·(v−med)/MAD| > 3.5 (Iglewicz-Hoaglin),
#: cross-multiplied to exact integers: 6745·|vu−med_u| > 35000·mad_u.
_MAD_GATE = "mad_u > 0 AND 6745 * au > 35000 * mad_u"
_MAD_Z = (
    "round(0.6745 * CAST(au AS DOUBLE) / CAST(mad_u AS DOUBLE), 6)"
)


@query(
    "q_outlier_mad",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events WHERE abs(value) <= 1e8
    ),
    med AS (
      SELECT event_type,
             CAST(round(quantile_cont(vu, 0.5)) AS BIGINT) AS med_u
      FROM ev GROUP BY event_type
    ),
    dev AS (
      SELECT event_id, ev.event_type, value, med_u,
             abs(vu - med_u) AS au
      FROM ev JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             CAST(round(quantile_cont(au, 0.5)) AS BIGINT) AS mad_u
      FROM dev GROUP BY event_type
    )
    SELECT event_id, dev.event_type, value,
           {_MAD_Z} AS mad_z
    FROM dev JOIN mad USING (event_type)
    WHERE {_MAD_GATE}
    """,
)
def q_outlier_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    estimator that, unlike :func:`value_outliers`' mean/σ z-score,
    doesn't let the outliers inflate their own yardstick (50%
    breakdown point vs 0%).  Flags events whose modified z-score
    |0.6745·(v−med)/MAD| exceeds 3.5 (Iglewicz-Hoaglin).

    Cross-engine exactness, the q_winsorize recipe twice over: both
    medians run on ×10⁶ fixed-point BIGINTs (Spark ``percentile`` and
    DuckDB ``quantile_cont`` interpolate identically on identical
    integers) and are rounded back to integer µ-units, so the outlier
    GATE is pure integer arithmetic (`_MAD_GATE`) — only the reported
    score divides, after the row is already selected.

    Scale shape: two groupBy passes, each collapsing to a
    ≤|event_types|-row table joined back by BROADCAST; per-row work is
    a projection.  Exact percentile is sort-based per group — at
    100 TB swap ``approx_percentile`` into the same plan (the
    flag-quality loss is bounded by the sketch error, the shape is
    unchanged).  Driver-mandated surface (SURVEY §2.4); no Main.scala
    counterpart."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.abs(F.col("value")) <= F.lit(1e8))
        .select(
            "event_id",
            "event_type",
            "value",
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vu"),
        )
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(round(percentile(vu, 0.5)) AS BIGINT)").alias("med_u")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("vu") - F.col("med_u")).alias("au"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(round(percentile(au, 0.5)) AS BIGINT)").alias("mad_u")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.expr(_MAD_GATE))
        .select("event_id", "event_type", "value",
                F.expr(_MAD_Z).alias("mad_z"))
    )
