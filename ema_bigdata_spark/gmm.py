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
    means = EXACT spread quantiles (j+1)/(k+1); variance = global
    population variance (Main.scala:67); weights uniform 1/K
    (Main.scala:68).

    Everything here must be PARTITIONING-INDEPENDENT or the whole fit
    is: approxQuantile's sketch merges and var_pop's double sums both
    vary with partition count (observed: different fits on local[4]
    vs local[32]).  So: exact `percentile` over the ×100 fixed-point
    integers (the data is 2-decimal), and variance from exact integer
    moment sums."""
    probs = ", ".join(str((j + 1) / (k + 1)) for j in range(k))
    xi = f"CAST(round({x} * 100) AS BIGINT)"
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"CAST({xi} AS DECIMAL(38,0))")).alias("s1"),
        F.sum(F.expr(f"CAST({xi} * {xi} AS DECIMAL(38,0))")).alias("s2"),
        F.expr(f"percentile({xi}, array({probs}))").alias("qs"),
    ).collect()[0]
    n = int(stats.n)
    mean = float(stats.s1) / n / 100.0
    var = float(stats.s2) / n / 10000.0 - mean * mean
    means = [float(q) / 100.0 for q in stats.qs]
    return [1.0 / k] * k, means, [var] * k, n


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
        # Sufficient statistics as EXACT fixed-point DECIMAL(38,0) sums:
        # double addition is order-dependent, so raw double sums vary
        # with partition count and the fit would differ between a
        # local[4] and a local[32] session (observed: 6-dp outputs
        # flipped).  Quantizing each per-row term to 1e-12 and summing
        # integers is associative — identical under ANY partitioning —
        # and the 1e-12 quantization is far below EM's statistical
        # noise.  Headroom: |term| ≤ ~1e6, ×1e12 ×1e12 rows ≈ 1e30 ≪
        # 10^38.
        def fp(col):
            return F.sum(
                F.expr(f"CAST(round(({col}) * 1e12) AS DECIMAL(38,0))")
            ).cast("double") / F.lit(1e12)

        aggs = []
        for j in range(k):
            aggs += [
                fp(f"g{j}").alias(f"n{j}"),
                fp(f"g{j} * _x").alias(f"sx{j}"),
                fp(f"g{j} * _x * _x").alias(f"sxx{j}"),
            ]
        aggs.append(fp("_lnp").alias("lnp"))
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
        # equal 6-iteration budget per candidate: enough for the BIC
        # ordering to stabilize on this data, and the selection query
        # stays ~half the cost of the full flagship fit
        m = gmm_fit(ev, "value", k=k, tol=0.0, max_iter=6)
        p = 3 * k - 1
        bic = p * math.log(n) - 2.0 * m.log_likelihood
        rows.append((k, round(m.log_likelihood, 3), round(bic, 3)))
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(
        rows, "k BIGINT, log_likelihood DOUBLE, bic DOUBLE"
    )
