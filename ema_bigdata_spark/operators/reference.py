"""Part A — the reference's own operator surface (SURVEY.md §2.2).

The reference (``/root/reference/src/main/scala/com/kuznetsov/Main.scala``)
implements every statistic as its own RDD job (5K+2 jobs per EM
iteration).  Here each query is ONE declarative DataFrame aggregation —
Catalyst fuses the per-row density math into a single whole-stage-
codegen'd scan with partial (map-side) aggregation, so each runs as one
shuffle-free pass regardless of data size.

Dataset: the reference's ``RDD[Double]`` (Main.scala:40-41) maps to the
driver's ``events.value`` double column (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ema_bigdata_spark.functions.gaussian import (
    K,
    gamma_k,
    log_density,
)
from ema_bigdata_spark.functions.parity import (
    avg_fixed,
    cents,
    sql_avg_fixed,
    sql_cents,
)
from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# -- q_scan_count: dataset load + count (Main.scala:40-41,61) -------------


@query(
    "q_scan_count",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM events",
)
def q_scan_count(spark, sf_dir):
    # count(*) needs no column data: parquet row-group metadata serves it.
    return _events(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n"))


# -- q_mean: arithmetic mean (Main.scala:163-166) -------------------------
# The reference's mean() divides by a count set as a side effect of EM()
# (latent div-by-zero standalone; SURVEY.md §2.2) — we compute the
# self-contained textbook mean.  Bit-exact via fixed-point (parity.py).


@query(
    "q_mean",
    oracle=f"SELECT round({sql_avg_fixed('value')}, 6) AS mean_value FROM events",
)
def q_mean(spark, sf_dir):
    return _events(spark, sf_dir).agg(
        F.round(avg_fixed("value"), 6).alias("mean_value")
    )


# -- q_variance_pop: population variance (Main.scala:168-175) -------------
# Σ(x−x̄)²/N via the E[x²]−E[x]² identity over *exact integer* sums of
# cents and cents² — every float op after the integer sums is the same
# single expression on both engines.


_VAR_SQL = (
    "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n)"
    " / CAST(10000 AS DOUBLE)"
)


@query(
    "q_variance_pop",
    oracle=f"""
    WITH s AS (
      SELECT CAST(sum({sql_cents('value')} * {sql_cents('value')}) AS BIGINT) AS sxx,
             CAST(sum({sql_cents('value')}) AS BIGINT) AS sx,
             count({sql_cents('value')}) AS n
      FROM events
    )
    SELECT round({_VAR_SQL}, 6) AS var_pop_value FROM s
    """,
)
def q_variance_pop(spark, sf_dir):
    # n counts the GATED snap (r8, parity.py finite gate): a
    # non-finite row the sums ignored must not inflate the denominator
    c = cents("value")
    s = _events(spark, sf_dir).agg(
        F.sum(c * c).alias("sxx"),
        F.sum(c).alias("sx"),
        F.count(c).alias("n"),
    )
    return s.select(F.round(F.expr(_VAR_SQL), 6).alias("var_pop_value"))


# -- q_init_means: K initial means (Main.scala:94-96) ---------------------
# The reference uses unseeded takeSample(false, K) — nondeterministic.
# Deterministic stand-in (SURVEY.md §2.4 hard spots): a Knuth
# multiplicative hash over the unique event_id gives a pseudo-random but
# engine-identical total order; take the first K values.  Pure BIGINT
# arithmetic → identical in Spark and DuckDB.


#: mod-first (r9, hostile-extremes sweep): event_id * 2654435761
#: overflows int64 under ANSI for event_id >= ~3.5e9; reducing the
#: id first caps the product at ~2.7e18 and is value-identical
#: everywhere the old form didn't overflow (same congruence class,
#: same truncated-% sign on both engines)
_HASH_ORDER = "((event_id % 1000000007) * 2654435761) % 1000000007"


@query(
    "q_init_means",
    # event_id IS NOT NULL (r9, hostile-nulls sweep): the sample key
    # IS the event identity — hash(NULL) is NULL and the engines sort
    # it to opposite ends (Spark ASC = NULLS FIRST, DuckDB NULLS
    # LAST), silently swapping which rows make the K-sample.  An
    # identity-less event cannot be deterministically sampled.
    oracle=f"""
    SELECT round(value, 6) AS init_mean
    FROM events WHERE event_id IS NOT NULL
    ORDER BY {_HASH_ORDER}, event_id
    LIMIT {K}
    """,
)
def q_init_means(spark, sf_dir):
    # TakeOrderedAndProject: a per-partition top-K then a K-row merge on
    # the driver — no full sort/shuffle of the table at any scale.
    return (
        _events(spark, sf_dir)
        .where(F.col("event_id").isNotNull())
        .orderBy(F.expr(_HASH_ORDER), F.col("event_id"))
        .select(F.round("value", 6).alias("init_mean"))
        .limit(K)
    )


# -- q_loglik_fixed: log-likelihood at fixed params (Main.scala:98-120) ---
# One pass: per-row ln Σ_k φ_k N(x|μ_k,σ²_k) (textbook density — the
# reference's precedence bugs are documented deviations, SURVEY.md §2.3),
# floored at 1e-300 instead of dropping −∞ rows (Main.scala:112).
# Rounded to 4: the |Σ|≈5e4 double sum is order-dependent at ~1e-8.


@query(
    "q_loglik_fixed",
    oracle=f"SELECT round(sum({log_density('value')}), 4) AS loglik FROM events",
)
def q_loglik_fixed(spark, sf_dir):
    return _events(spark, sf_dir).agg(
        F.round(F.sum(F.expr(log_density("value"))), 4).alias("loglik")
    )


# -- q_gamma_fixed: responsibilities at fixed params (Main.scala:123-161) -
# Textbook per-row normalization (the reference divides by one GLOBAL
# scalar — deviation #3, SURVEY.md §2.3); emitted as K named columns.
# Narrow projection — no extra job for a global denominator.


@query(
    "q_gamma_fixed",
    oracle=f"""
    SELECT event_id,
           {', '.join(f"round({gamma_k('value', k)}, 6) AS g{k}" for k in range(K))}
    FROM events
    """,
)
def q_gamma_fixed(spark, sf_dir):
    df = _events(spark, sf_dir)
    cols = [F.col("event_id")] + [
        F.round(F.expr(gamma_k("value", k)), 6).alias(f"g{k}") for k in range(K)
    ]
    return df.select(*cols)


# -- q_mstep_*_fixed: M-step updates at fixed params ----------------------
# The reference runs 5 jobs per component plus RDD zips
# (Main.scala:177-210); all three updates here are single aggregations
# computing every component's statistic in the same pass (SURVEY.md §4.3).


def _gamma_agg(df):
    """All sufficient statistics for all K components in ONE aggregation."""
    aggs = []
    for k in range(K):
        g = F.expr(gamma_k("value", k))
        aggs += [
            F.sum(g).alias(f"n{k}"),
            F.sum(g * F.col("value")).alias(f"sx{k}"),
            F.sum(g * F.col("value") * F.col("value")).alias(f"sxx{k}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    return df.agg(*aggs)


_GAMMA_AGG_SQL = (
    "SELECT "
    + ", ".join(
        f"sum({gamma_k('value', k)}) AS n{k}, "
        f"sum({gamma_k('value', k)} * value) AS sx{k}, "
        f"sum({gamma_k('value', k)} * value * value) AS sxx{k}"
        for k in range(K)
    )
    + ", count(*) AS n FROM events"
)


@query(
    "q_mstep_weight_fixed",
    oracle=f"""
    WITH s AS ({_GAMMA_AGG_SQL})
    SELECT {', '.join(f"round(n{k} / n, 6) AS w{k}" for k in range(K))} FROM s
    """,
)
def q_mstep_weight_fixed(spark, sf_dir):
    s = _gamma_agg(_events(spark, sf_dir))
    return s.select(
        *[F.round(F.col(f"n{k}") / F.col("n"), 6).alias(f"w{k}") for k in range(K)]
    )


@query(
    "q_mstep_mean_fixed",
    oracle=f"""
    WITH s AS ({_GAMMA_AGG_SQL})
    SELECT {', '.join(f"round(sx{k} / n{k}, 6) AS mu{k}" for k in range(K))} FROM s
    """,
)
def q_mstep_mean_fixed(spark, sf_dir):
    s = _gamma_agg(_events(spark, sf_dir))
    return s.select(
        *[
            F.round(F.col(f"sx{k}") / F.col(f"n{k}"), 6).alias(f"mu{k}")
            for k in range(K)
        ]
    )


@query(
    "q_mstep_var_fixed",
    # trailing `+ CAST(0 AS DOUBLE)` = the signed-zero guard (r7,
    # found by adding this family to the adversarial constant-column
    # fixture): on a constant column E[x²]−μ² is a tiny NEGATIVE
    # rounding residue that snaps to -0.0 on one engine and +0.0 on
    # the other — same class and same fix as q_char_entropy (r6)
    oracle=f"""
    WITH s AS ({_GAMMA_AGG_SQL})
    SELECT {', '.join(
        f"(round(sxx{k} / n{k} - (sx{k} / n{k}) * (sx{k} / n{k}), 6)"
        f" + CAST(0 AS DOUBLE)) AS v{k}"
        for k in range(K)
    )} FROM s
    """,
)
def q_mstep_var_fixed(spark, sf_dir):
    # σ²_k via E[x²]−μ² so mean+variance come from the SAME single pass
    # (the reference re-scans with the fresh μ_k, Main.scala:197-210).
    s = _gamma_agg(_events(spark, sf_dir))
    outs = []
    for k in range(K):
        mu = F.col(f"sx{k}") / F.col(f"n{k}")
        outs.append(
            (
                F.round(F.col(f"sxx{k}") / F.col(f"n{k}") - mu * mu, 6)
                + F.lit(0.0)
            ).alias(f"v{k}")
        )
    return s.select(*outs)
