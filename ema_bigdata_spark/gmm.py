"""EM for a 1-D Gaussian Mixture Model — the reference's core algorithm
(``/root/reference`` ``Main.scala:59-92``), rebuilt Spark-first.

Reference job structure: per EM iteration a global-denominator scan, a
persisted N×K responsibilities RDD, then **5 jobs per component** plus a
log-likelihood job — 5K+2 full passes (Main.scala:72-89; SURVEY.md §3.3).

This rebuild exploits a structural fact of 1-D EM: every per-row
quantity depends on the row ONLY through the scalar ``x``, so the exact
sufficient statistics over N rows equal the same statistics over the
**value histogram** (distinct x, count) — and a histogram's cardinality
is bounded by the value DOMAIN, not by N.  The engine therefore runs

1. ONE distributed ``groupBy(x).count()`` pass (map-side partial agg:
   shuffle volume = distinct-values-per-partition, not rows — at 100 TB
   this is the only full scan the whole fit performs);
2. EM iterations over the histogram: collected to the driver and
   vectorized in numpy when bins ≤ ``MAX_DRIVER_BINS`` (the histogram
   IS a tiny aggregate — ~60 k bins for 2-decimal data in [0, 600]
   regardless of row count), else a frequency-weighted single-job
   aggregation per iteration over the cached histogram (SURVEY.md
   §4.3's 3K+2-scalar shape, just over ``bins ≪ N`` rows).

Either way the cluster does one pass total instead of the reference's
5K+2 passes *per iteration*.

Textbook math throughout (SURVEY.md §2.3 records the reference's two
operator-precedence bugs and its global-γ-denominator deviation; we do
not reproduce them).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ema_bigdata_spark.functions.gaussian import DENSITY_FLOOR, wdens
from ema_bigdata_spark.sources.tables import load_table

#: reference converged when Δ lnP ≤ 80 absolute (Main.scala:89) — a
#: dataset-size-dependent threshold; ours is configurable.
DEFAULT_TOL = 1e-3
DEFAULT_MAX_ITER = 30

#: histogram-size cutover between the driver (numpy) and distributed
#: iteration paths.  1 M bins ≈ 16 MB collected — still a "tiny
#: aggregate" in SURVEY §4.3's sense; beyond it, iterate cluster-side.
MAX_DRIVER_BINS = 1 << 20


@dataclass
class GMMModel:
    weights: list[float]
    means: list[float]
    variances: list[float]
    log_likelihood: float
    n_iter: int
    #: per-iteration lnP trace (r4, VERDICT r3 §Next-7): a SECOND
    #: deterministic output beyond the final parameters.  EM guarantees
    #: lnP is non-decreasing, so the trace is a machine-checkable
    #: numeric contract (tests/test_properties.py
    #: ::TestGMMNumericContract) — a math bug that still converges to
    #: *some* fixed point breaks the trace even when double-run
    #: determinism can't see it.
    lnp_trace: list[float] = field(default_factory=list)


def _weighted_percentiles(vals, cnts, probs) -> list[float]:
    """Spark ``percentile(col, p, freq)`` semantics: linear interpolation
    at position p·(N−1) in the expanded sorted multiset."""
    import numpy as np

    cum = np.cumsum(cnts)  # vals already sorted ascending
    n = int(cum[-1])
    out = []
    for p in probs:
        pos = p * (n - 1)
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        frac = pos - lo
        vlo = float(vals[np.searchsorted(cum, lo + 1)])
        vhi = float(vals[np.searchsorted(cum, hi + 1)])
        out.append(vlo * (1.0 - frac) + vhi * frac)
    return out


def _driver_em(vals, cnts, k: int, tol: float, max_iter: int) -> GMMModel:
    """Vectorized EM over the collected (value, count) histogram.

    Deterministic and partitioning-independent by construction: the
    histogram's keys/counts are exact, the arrays are sorted by value,
    and every numpy reduction runs over the same arrays regardless of
    how the cluster partitioned the scan."""
    import numpy as np

    x = vals
    c = cnts.astype(np.float64)
    n = float(c.sum())
    # init (replaces unseeded takeSample, Main.scala:95): means = exact
    # spread quantiles (j+1)/(K+1); variance = global population
    # variance (Main.scala:67); weights uniform 1/K (Main.scala:68)
    mean = float((x * c).sum() / n)
    var = float((((x - mean) ** 2) * c).sum() / n)
    mu = np.array(
        _weighted_percentiles(x, cnts, [(j + 1) / (k + 1) for j in range(k)])
    )
    s2 = np.full(k, max(var, 1e-12))
    phi = np.full(k, 1.0 / k)

    lnp_prev = None
    trace: list[float] = []
    it = 0
    for it in range(1, max_iter + 1):
        norm = phi / np.sqrt(2.0 * math.pi * s2)
        w = norm[None, :] * np.exp(
            (x[:, None] - mu[None, :]) ** 2 / (-2.0 * s2[None, :])
        )
        rowsum = np.maximum(w.sum(axis=1), DENSITY_FLOOR)
        lnp = float((np.log(rowsum) * c).sum())
        trace.append(lnp)
        g = (w / rowsum[:, None]) * c[:, None]  # count-weighted γ
        nj = np.maximum(g.sum(axis=0), 1e-300)
        sx = (g * x[:, None]).sum(axis=0)
        sxx = (g * (x * x)[:, None]).sum(axis=0)
        phi = nj / n
        mu = sx / nj
        s2 = np.maximum(sxx / nj - mu * mu, 1e-12)
        if lnp_prev is not None and abs(lnp - lnp_prev) <= tol:
            lnp_prev = lnp
            break
        lnp_prev = lnp
    return GMMModel(
        [float(v) for v in phi],
        [float(v) for v in mu],
        [float(v) for v in s2],
        lnp_prev,
        it,
        trace,
    )


def _init_params_hist(
    hist: DataFrame, k: int
) -> tuple[list, list, list, int, int]:
    """Distributed-path init over the histogram; PARTITIONING-INDEPENDENT
    (exact frequency-weighted `percentile` over ×100 fixed-point integers
    and exact DECIMAL moment sums — approxQuantile's sketch merges and
    var_pop's double sums both vary with partition count).  Also returns
    the bin count (free — same aggregate job), which sizes the
    per-iteration limb-sum overflow guard (``_LIMB_MAX_BINS``)."""
    probs = ", ".join(str((j + 1) / (k + 1)) for j in range(k))
    xi = "CAST(round(_x * 100) AS BIGINT)"
    stats = hist.agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("nbins"),
        F.sum(F.expr(f"CAST({xi} AS DECIMAL(38,0)) * cnt")).alias("s1"),
        F.sum(F.expr(f"CAST({xi} AS DECIMAL(38,0)) * {xi} * cnt")).alias(
            "s2"
        ),
        F.expr(f"percentile({xi}, array({probs}), cnt)").alias("qs"),
    ).collect()[0]
    n = int(stats.n)
    mean = float(stats.s1) / n / 100.0
    var = float(stats.s2) / n / 10000.0 - mean * mean
    means = [float(q) / 100.0 for q in stats.qs]
    return [1.0 / k] * k, means, [var] * k, n, int(stats.nbins)


#: exact-sum strategy for ``_distributed_em``'s per-iteration
#: sufficient statistics.  The r12 A/B on the 1.73 M-bin fixture
#: measured the DECIMAL(38,0) sums at 1.37-2.33 s/iteration vs
#: 0.22-0.41 s for (order-dependent, hence forbidden) double sums — a
#: ~6× exactness tax paid to Decimal128/BigDecimal per-row adds.  The
#: limb path below keeps the EXACT SAME per-bin quantized integer
#: (``round(term·1e12)`` as a double) but splits it into four int64
#: limbs (31/31/31/top bits) with exact power-of-two double arithmetic
#: — a double has 53 significant bits, so every floor/scale/subtract
#: below is exact — sums each limb with plain codegen'd BIGINT adds,
#: and recombines driver-side in Python's arbitrary-precision ints.
#: Order-independent (integer sums), range-equivalent to DECIMAL(38,0)
#: (4 limbs cover |d| < 2^126 ≈ 8.5e37), and bit-identical to the
#: decimal path's result (equivalence-tested).  Limb-sum overflow is
#: impossible while bins < 2^29 (top-limb |q3| < 2^33, Σ < 2^62); the
#: bin count is known from the init aggregate, so wider histograms
#: fall back to the decimal path instead of silently wrapping.
#: ``SPARK_GRAFT_EM_DECIMAL=1`` forces the decimal path (A/B lever and
#: the equivalence test's hook).
_LIMB_SHIFTS = (93, 62, 31, 0)
_LIMB_MAX_BINS = 1 << 29


def _em_quantized_terms(resp: DataFrame, names: dict[str, str]) -> DataFrame:
    """Shared exact quantizer of both sum paths: per-bin term →
    ``(sg, a)`` with ``a = floor(|term|·1e12 + 0.5)`` and ``sg`` the
    term's sign — i.e. round-half-up away from zero at 1e-12, the same
    snap discipline as gmm_parity's ``_snap`` (r13: the previous
    ``round()`` call routes every value through BigDecimal and
    measured ~0.27 s/iteration on the 1.73 M-bin fixture; the
    ``u − u % 1.0`` truncation below is plain double arithmetic and
    EXACT — IEEE fmod never rounds, and trunc == floor on the
    non-negative ``u``).  ``a`` stays a DOUBLE column: ``floor()``'s
    BIGINT return would ANSI-overflow for terms beyond 2^63·1e-12,
    which in-domain sufficient statistics legitimately exceed."""
    t = resp.select(
        *[F.expr(expr).alias(f"t_{n}") for n, expr in names.items()]
    )
    u = t.select(
        *[
            F.expr(f"CASE WHEN t_{n} < 0 THEN -1L ELSE 1L END").alias(
                f"sg_{n}"
            )
            for n in names
        ],
        *[
            F.expr(f"abs(t_{n}) * 1e12 + 0.5").alias(f"u_{n}")
            for n in names
        ],
    )
    return u.select(
        *[F.col(f"sg_{n}") for n in names],
        *[
            F.expr(f"u_{n} - (u_{n} % 1.0)").alias(f"a_{n}")
            for n in names
        ],
    )


def _em_stats_decimal(resp: DataFrame, names: dict[str, str]) -> dict:
    """DECIMAL(38,0) exact fixed-point sums (the pre-r13 form, kept as
    the wide-histogram fallback and A/B hook): sum the quantized
    per-bin integers as Decimal128 — associative, so the result is
    identical under ANY partitioning."""
    q = _em_quantized_terms(resp, names)
    aggs = [
        (
            F.sum(
                F.expr(
                    f"CAST(CAST(sg_{n} AS DOUBLE) * a_{n}"
                    f" AS DECIMAL(38,0))"
                )
            ).cast("double")
            / F.lit(1e12)
        ).alias(n)
        for n in names
    ]
    row = q.agg(*aggs).collect()[0]  # ONE job; 3K+2 scalars
    return {n: float(row[n]) for n in names}


def _em_stats_limb(resp: DataFrame, names: dict[str, str]) -> dict:
    """Four-limb int64 exact sums (see ``_LIMB_SHIFTS`` note): the same
    quantized per-bin integers as the decimal path, split into four
    BIGINT limbs, summed with plain codegen'd adds, and recombined
    exactly driver-side in Python's arbitrary-precision ints.

    The decomposition runs on the NON-NEGATIVE ``a`` with the sign
    applied to each finished limb: floor/mod of a non-negative double
    by a power of two is exact (the remainder reuses a suffix of the
    53 significand bits), whereas a floor-mod of a negative value
    yields ``2^s − |d|``, which can need up to ``s`` significand bits
    and silently rounds.  Each limb is computed FLAT from ``a``
    (``a % 2^hi / 2^lo``) rather than by chained remainders — IEEE
    fmod is always exact, and the chained form measured 2× slower
    (every level re-inlines the whole upstream expression tree)."""
    p93, p62, p31 = repr(2.0**93), repr(2.0**62), repr(2.0**31)
    q = _em_quantized_terms(resp, names)
    limbs = q.select(
        *[
            F.expr(f"sg_{n} * floor(a_{n} / {p93})").alias(f"q0_{n}")
            for n in names
        ],
        *[
            F.expr(
                f"sg_{n} * floor((a_{n} % {p93}) / {p62})"
            ).alias(f"q1_{n}")
            for n in names
        ],
        *[
            F.expr(
                f"sg_{n} * floor((a_{n} % {p62}) / {p31})"
            ).alias(f"q2_{n}")
            for n in names
        ],
        *[
            F.expr(f"sg_{n} * CAST(a_{n} % {p31} AS BIGINT)").alias(
                f"q3_{n}"
            )
            for n in names
        ],
    )
    row = limbs.agg(
        *[
            F.sum(f"q{i}_{n}").alias(f"s{i}_{n}")
            for i in range(4)
            for n in names
        ]
    ).collect()[0]  # ONE job; 4·(3K+2) int64 scalars
    out = {}
    for n in names:
        total = sum(
            int(row[f"s{i}_{n}"]) << s
            for i, s in enumerate(_LIMB_SHIFTS)
        )
        out[n] = float(total) / 1e12
    return out


def _distributed_em(
    hist: DataFrame, k: int, tol: float, max_iter: int,
    pre_cached: bool = False,
) -> GMMModel:
    """Scale fallback when the histogram exceeds ``MAX_DRIVER_BINS``:
    SURVEY §4.3's one-aggregation-per-iteration loop, frequency-weighted
    over the cached histogram (bins ≪ N rows scanned per iteration).
    ``pre_cached=True`` means the caller already holds a materialized
    ``cache()`` of ``hist`` and owns its release (ADVICE r12: the old
    form re-cached ``spread(hist)``, which when spread repartitions
    creates a SECOND InMemoryRelation of the same histogram)."""
    from ema_bigdata_spark.sources.tables import spread

    if not pre_cached:
        hist = spread(hist).cache()
    try:
        phi, mu, s2, n, nbins = _init_params_hist(hist, k)
        use_decimal = (
            nbins >= _LIMB_MAX_BINS
            or os.environ.get("SPARK_GRAFT_EM_DECIMAL") == "1"
        )

        lnp_prev = None
        trace: list[float] = []
        it = 0
        for it in range(1, max_iter + 1):
            p, m, v = tuple(phi), tuple(mu), tuple(s2)
            # two-stage plan, still one job: a projection computes each
            # weighted density ONCE, then the agg sums trivial refs.
            weights = hist.select(
                F.col("_x"),
                F.col("cnt").cast("double").alias("_c"),
                *[
                    F.expr(wdens("_x", p[j], m[j], v[j])).alias(f"w{j}")
                    for j in range(k)
                ],
            )
            rowsum = F.greatest(
                sum((F.col(f"w{j}") for j in range(k)), F.lit(0.0)),
                F.lit(DENSITY_FLOOR),
            )
            resp = weights.select(
                "_x",
                "_c",
                F.log(rowsum).alias("_lnp"),
                *[
                    (F.col(f"w{j}") / rowsum).alias(f"g{j}")
                    for j in range(k)
                ],
            )
            # Sufficient statistics as exact fixed-point sums (per-bin
            # term quantized to 1e-12, summed as integers — associative,
            # hence identical under ANY partitioning; raw double sums
            # are order-dependent).  The limb form is the fast path
            # (plain int64 adds); the decimal form is the wide-histogram
            # fallback and A/B hook (_LIMB_SHIFTS note).
            stat_names = {}
            for j in range(k):
                stat_names[f"n{j}"] = f"g{j} * _c"
                stat_names[f"sx{j}"] = f"g{j} * _x * _c"
                stat_names[f"sxx{j}"] = f"g{j} * _x * _x * _c"
            stat_names["lnp"] = "_lnp * _c"
            stats_fn = _em_stats_decimal if use_decimal else _em_stats_limb
            vals = stats_fn(resp, stat_names)

            lnp = vals["lnp"]
            trace.append(lnp)
            for j in range(k):
                nj = vals[f"n{j}"] or 1e-300
                phi[j] = nj / n
                mu[j] = vals[f"sx{j}"] / nj
                s2[j] = max(
                    vals[f"sxx{j}"] / nj - mu[j] * mu[j], 1e-12
                )

            if lnp_prev is not None and abs(lnp - lnp_prev) <= tol:
                lnp_prev = lnp
                break
            lnp_prev = lnp
    finally:
        if not pre_cached:
            hist.unpersist()
    return GMMModel(phi, mu, s2, lnp_prev, it, trace)


def value_histogram(df: DataFrame, x: str = "value") -> DataFrame:
    """The ONE full scan a fit performs: exact ``(value, count)``
    histogram via map-side-combined groupBy — shuffle volume is
    distinct-values-per-partition, not rows.  Values outside the
    fit's snap-exact domain (|x| ≤ 1e6 — the module docstring's
    fixed-point headroom; non-finite included, as NaN/±Inf compare
    greater than any finite bound) are excluded like NULLs (r8,
    parity.py posture): a NaN or 1e308 bin would overflow the EM's
    sufficient-statistic snaps mid-iteration — one corrupt double
    must not kill a 100 TB fit."""
    return (
        df.select(F.col(x).alias("_x"))
        .where(F.abs(F.col("_x")) <= F.lit(1e6))
        .groupBy("_x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _head_rows(head) -> int:
    """Row count of a head probe — a pyarrow Table or legacy Row list."""
    return head.num_rows if hasattr(head, "num_rows") else len(head)


def _head_arrays(head):
    """(vals, cnts) numpy arrays from a head probe (Table or Row list)."""
    import numpy as np

    if hasattr(head, "num_rows"):  # pyarrow.Table from DataFrame.toArrow
        vals = head.column("_x").to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        cnts = head.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        return vals, cnts
    vals = np.array([r._x for r in head], dtype=np.float64)
    cnts = np.array([r.cnt for r in head], dtype=np.int64)
    return vals, cnts


def gmm_fit_hist(
    hist: DataFrame,
    k: int = 3,
    tol: float = DEFAULT_TOL,
    max_iter: int = DEFAULT_MAX_ITER,
    head=None,
) -> GMMModel:
    """Fit from a precomputed ``(value, count)`` histogram.  ``head``
    is an optional already-collected ``hist.limit(MAX_DRIVER_BINS+1)``
    head probe — a pyarrow Table from ``.toArrow()`` (preferred) or a
    legacy ``.collect()`` row list — so multi-fit callers (model
    selection) collect it once.

    The probe moves up to ``MAX_DRIVER_BINS`` rows driver-side, so it
    crosses as ONE Arrow batch set (``toArrow``), not pickled Rows —
    measured 38× cheaper at 500 k rows (guide §4.1: control how
    efficiently bytes cross the JVM↔Python boundary; a 1 M-row pickled
    collect was ~10 s of the wide-domain bench fixture).  The probe
    also ``cache()``-s the histogram first: a wide domain would
    otherwise compute the full histogram twice — once under the probe's
    limit (an agg cannot short-circuit) and again inside
    ``_distributed_em``'s cache — and a driver-bound histogram is ≤1 M
    rows, so the cache write is noise there."""
    own_cache = head is None
    if own_cache:
        hist = hist.cache()
        head = hist.limit(MAX_DRIVER_BINS + 1).toArrow()
    try:
        if _head_rows(head) > MAX_DRIVER_BINS:
            # domain too wide: iterate on-cluster over OUR cache entry
            # (pre_cached=True — ADVICE r12: letting _distributed_em
            # re-cache spread(hist) could hold the histogram twice)
            if own_cache:
                return _distributed_em(
                    hist, k, tol, max_iter, pre_cached=True
                )
            return _distributed_em(hist, k, tol, max_iter)
        import numpy as np

        vals, cnts = _head_arrays(head)
        order = np.argsort(vals, kind="stable")
        return _driver_em(vals[order], cnts[order], k, tol, max_iter)
    finally:
        if own_cache:
            hist.unpersist()


def gmm_fit(
    df: DataFrame,
    x: str = "value",
    k: int = 3,
    tol: float = DEFAULT_TOL,
    max_iter: int = DEFAULT_MAX_ITER,
) -> GMMModel:
    """Fit a K-component 1-D GMM with EM.

    One distributed histogram pass over the data, then EM over the
    bounded-cardinality histogram (module docstring).  The cluster
    touches the full dataset exactly once per fit."""
    return gmm_fit_hist(value_histogram(df, x), k, tol, max_iter)


def q_gmm_fit_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r6 registered form of ``gmm_fit`` (numpy EM over the
    histogram).  Since r6 the REGISTERED ``gmm_fit`` lives in
    ``gmm_parity.py`` — a bit-exact cross-engine EM with a real DuckDB
    oracle (libm exp/ln here diverge by 1 ulp between engines, which
    iteration feedback amplifies; SURVEY §2.2 no longer exempts it).
    This numpy path stays as the fast library API and equivalence
    fixture.

    Fixed iteration budget (tol=0 → always exactly 15 iterations) so
    the query is deterministic AND its bench cost measures
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


def q_gmm_bic_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection over K via BIC = p·ln(n) − 2·lnL with
    p = 3K−1 free parameters — fits K ∈ {2, 3, 4} with the same
    one-job-per-iteration EM and reports each fit, lowest BIC first.

    ONE histogram scan total: the ``(value, count)`` histogram is built
    and collected once (n = Σcnt comes from it for free — no separate
    ``count()`` job), then all three candidate fits iterate over the
    same arrays driver-side; the marginal cost per extra K is numpy
    iterations, not I/O.  The wide-domain fallback caches the histogram
    so the distributed path also scans events exactly once.

    INTENTIONAL (r2): n here is the histogram total, i.e. the count of
    non-NULL values — the likelihood's actual sample size — not
    ``ev.count()``, which would also count NULL rows the lnL term never
    sees.  On data with NULLs the two differ and BIC shifts; the
    null-excluding n is the statistically correct one."""
    import math

    ev = load_table(spark, sf_dir, "events").select("value")
    hist = value_histogram(ev, "value")
    wide = False
    # Arrow head probe (r12 optimization, same rationale as
    # gmm_fit_hist: batch the boundary crossing instead of pickling
    # up to 1 M Rows)
    head = hist.limit(MAX_DRIVER_BINS + 1).toArrow()
    if head.num_rows > MAX_DRIVER_BINS:
        wide = True
        hist = hist.cache()  # one events scan shared by the K fits
        n = hist.agg(F.sum("cnt")).collect()[0][0]
    else:
        n = int(_head_arrays(head)[1].sum())
    rows = []
    try:
        for k in (2, 3, 4):
            # equal 6-iteration budget per candidate: enough for the BIC
            # ordering to stabilize on this data, and the selection query
            # stays ~half the cost of the full flagship fit
            m = gmm_fit_hist(hist, k=k, tol=0.0, max_iter=6, head=head)
            p = 3 * k - 1
            bic = p * math.log(n) - 2.0 * m.log_likelihood
            rows.append((k, round(m.log_likelihood, 3), round(bic, 3)))
    finally:
        if wide:
            hist.unpersist()
    rows.sort(key=lambda r: r[2])
    return spark.createDataFrame(
        rows, "k BIGINT, log_likelihood DOUBLE, bic DOUBLE"
    )
