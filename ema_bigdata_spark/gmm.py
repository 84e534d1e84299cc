"""EM for a 1-D Gaussian Mixture Model — the reference's core algorithm
(``/root/reference`` ``Main.scala:59-92``), rebuilt Spark-first.

Reference job structure: per EM iteration a global-denominator scan, a
persisted N×K responsibilities RDD, then **5 jobs per component** plus a
log-likelihood job — 5K+2 full passes (Main.scala:72-89; SURVEY.md §3.3).

This rebuild (SURVEY.md §4.3): each iteration is ONE shuffle-free
whole-stage-codegen'd aggregation returning all 3K sufficient statistics
plus the log-likelihood (3K+2 numbers to the driver).  Parameters live
in Python between iterations and are injected as literals, so nothing
iterative is ever stored cluster-side.  At 100 TB this is a linear
cached scan per iteration with a 1-row result — the optimal shape.

Textbook math throughout (SURVEY.md §2.3 records the reference's two
operator-precedence bugs and its global-γ-denominator deviation; we do
not reproduce them).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ema_bigdata_spark.functions.gaussian import DENSITY_FLOOR, wdens
from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table, spread

#: reference converged when Δ lnP ≤ 80 absolute (Main.scala:89) — a
#: dataset-size-dependent threshold; ours is configurable.
DEFAULT_TOL = 1e-3
DEFAULT_MAX_ITER = 30


@dataclass
class GMMModel:
    weights: list[float]
    means: list[float]
    variances: list[float]
    log_likelihood: float
    n_iter: int


def _init_params(df: DataFrame, x: str, k: int) -> tuple[list, list, list, int]:
    """Deterministic init (replaces unseeded takeSample, Main.scala:95):
    means = spread quantiles (j+1)/(k+1) via Spark's approx-quantile
    sketch (deterministic, mergeable, scales to any data size — and
    unlike the reference's uniform sample it can't draw all K seeds
    from one mode); variance = global var_pop for every component
    (Main.scala:67); weights uniform 1/K (Main.scala:68)."""
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.var_pop(x).alias("v"),
    ).collect()[0]
    probs = [(j + 1) / (k + 1) for j in range(k)]
    means = df.approxQuantile(x, probs, 0.001)
    return [1.0 / k] * k, means, [float(stats.v)] * k, int(stats.n)


def gmm_fit(
    df: DataFrame,
    x: str = "value",
    k: int = 3,
    tol: float = DEFAULT_TOL,
    max_iter: int = DEFAULT_MAX_ITER,
) -> GMMModel:
    """Fit a K-component 1-D GMM with EM; one Spark job per iteration."""
    # one narrow double column, spread across cores, cached: every
    # iteration re-scans this in parallel from memory
    df = spread(df.select(x)).cache()
    phi, mu, s2, n = _init_params(df, x, k)

    lnp_prev = None
    it = 0
    for it in range(1, max_iter + 1):
        p, m, v = tuple(phi), tuple(mu), tuple(s2)
        # two-stage plan, still one job: a projection computes each
        # weighted density ONCE (the naive all-in-agg form replicates
        # the k-term density tree 3k+1 times — slower to analyze and
        # codegen), then the agg sums trivial column refs.
        weights = df.select(
            F.col(x).alias("_x"),
            *[
                F.expr(wdens(x, p[j], m[j], v[j])).alias(f"w{j}")
                for j in range(k)
            ],
        )
        rowsum = F.greatest(
            sum((F.col(f"w{j}") for j in range(k)), F.lit(0.0)),
            F.lit(DENSITY_FLOOR),
        )
        resp = weights.select(
            "_x",
            F.log(rowsum).alias("_lnp"),
            *[(F.col(f"w{j}") / rowsum).alias(f"g{j}") for j in range(k)],
        )
        aggs = []
        for j in range(k):
            g = F.col(f"g{j}")
            aggs += [
                F.sum(g).alias(f"n{j}"),
                F.sum(g * F.col("_x")).alias(f"sx{j}"),
                F.sum(g * F.col("_x") * F.col("_x")).alias(f"sxx{j}"),
            ]
        aggs.append(F.sum("_lnp").alias("lnp"))
        row = resp.agg(*aggs).collect()[0]  # ONE job; 3K+2 scalars back

        lnp = float(row.lnp)
        for j in range(k):
            nj = float(row[f"n{j}"]) or 1e-300
            phi[j] = nj / n
            mu[j] = float(row[f"sx{j}"]) / nj
            s2[j] = max(float(row[f"sxx{j}"]) / nj - mu[j] * mu[j], 1e-12)

        if lnp_prev is not None and abs(lnp - lnp_prev) <= tol:
            lnp_prev = lnp
            break
        lnp_prev = lnp

    df.unpersist()
    return GMMModel(phi, mu, s2, lnp_prev, it)


@query("gmm_fit")  # rows-only: iterative, not SQL-expressible (SURVEY §2.2)
def q_gmm_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EM fit on events.value → K-row parameter table.

    Fixed iteration budget (tol=0 → always exactly 15 iterations) so
    the declared query is deterministic AND its bench cost measures
    per-iteration throughput, not convergence luck."""
    model = gmm_fit(
        load_table(spark, sf_dir, "events"), "value", k=3, tol=0.0, max_iter=15
    )
    rows = [
        (j, round(model.weights[j], 6), round(model.means[j], 6),
         round(model.variances[j], 6))
        for j in range(3)
    ]
    return spark.createDataFrame(
        rows, "component BIGINT, weight DOUBLE, mean DOUBLE, variance DOUBLE"
    )


@query("q_gmm_bic")  # rows-only: iterative model selection
def q_gmm_bic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection over K via BIC = p·ln(n) − 2·lnL with
    p = 3K−1 free parameters — fits K ∈ {2, 3, 4} with the same
    one-job-per-iteration EM and reports each fit, lowest BIC first.
    The candidate fits share one cached column, so the marginal cost
    per extra K is iterations, not I/O."""
    import math

    ev = load_table(spark, sf_dir, "events").select("value")
    n = ev.count()
    rows = []
    for k in (2, 3, 4):
        m = gmm_fit(ev, "value", k=k, tol=0.0, max_iter=10)
        p = 3 * k - 1
        bic = p * math.log(n) - 2.0 * m.log_likelihood
        rows.append((k, round(m.log_likelihood, 3), round(bic, 3)))
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(
        rows, "k BIGINT, log_likelihood DOUBLE, bic DOUBLE"
    )
