#!/usr/bin/env python
"""Architecture A/B: the reference's per-iteration-scan EM versus the
histogram EM this engine ships — measured, not asserted.

The reference (``/root/reference`` ``Main.scala:72-89``) runs **5 jobs
per component plus 2 per iteration** over the full dataset (SURVEY.md
§3.3).  Three architectures, identical textbook math and 10 iterations
each, timed at ``$SPARK_GRAFT_SF_DIR``:

- ``reference_shape`` — one *separate* aggregation job per sufficient
  statistic per component per iteration (3K+1 jobs/iter here; the
  reference itself does 5K+2, so this flatters it), every job a full
  pass over the cached values.
- ``fused_pass`` — the obvious Spark-first fix: ALL 3K+1 statistics in
  ONE ``agg()`` per iteration (one pass per iteration).
- ``histogram`` — the shipped :func:`ema_bigdata_spark.gmm.gmm_fit`:
  ONE pass total (``groupBy(value).count()``), EM over the bounded
  histogram.

All three paths produce the same parameters (the fused/naive paths are
algebraically identical; gmm_fit's equivalence to a raw-data fit is
property-tested in tests/test_properties.py).  Prints one JSON line and
writes BENCH_REFSHAPE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 3
ITERS = 10


def _em_over_values(vals_df, jobs_fused: bool) -> tuple:
    """10 EM iterations over raw rows; one agg() per statistic
    (jobs_fused=False, the reference's job structure) or one agg() per
    iteration (jobs_fused=True)."""
    from pyspark.sql import functions as F

    from ema_bigdata_spark.functions.gaussian import DENSITY_FLOOR, wdens

    n = vals_df.count()
    # identical cheap init for every path: spread means over the range
    lo, hi = vals_df.agg(F.min("x"), F.max("x")).first()
    mu = [lo + (hi - lo) * (j + 1) / (K + 1) for j in range(K)]
    var = [((hi - lo) / (K + 1)) ** 2] * K
    phi = [1.0 / K] * K

    for _ in range(ITERS):
        dens = [wdens("x", phi[j], mu[j], var[j]) for j in range(K)]
        denom = (
            "greatest(" + " + ".join(dens) + f", {DENSITY_FLOOR:.1e})"
        )
        gam = [f"({d} / {denom})" for d in dens]
        stats = []
        for j in range(K):
            stats += [
                F.expr(f"sum({gam[j]})").alias(f"w{j}"),
                F.expr(f"sum({gam[j]} * x)").alias(f"m{j}"),
                F.expr(
                    f"sum({gam[j]} * (x - {mu[j]!r}) * (x - {mu[j]!r}))"
                ).alias(f"v{j}"),
            ]
        stats.append(F.expr(f"sum(ln({denom}))").alias("lnl"))
        if jobs_fused:
            row = vals_df.agg(*stats).first()
            got = list(row)
        else:
            got = [vals_df.agg(s).first()[0] for s in stats]  # 3K+1 jobs
        for j in range(K):
            w, m, v = got[3 * j], got[3 * j + 1], got[3 * j + 2]
            mu[j] = m / w
            var[j] = max(v / w, 1e-12)
            phi[j] = w / n
    return phi, mu, var


def main() -> None:
    from ema_bigdata_spark.gmm import gmm_fit
    from ema_bigdata_spark.session import get_spark
    from ema_bigdata_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    spark = get_spark(app_name="ema-bigdata-refshape")
    ev = load_table(spark, SF_DIR, "events")
    vals = (
        ev.select(F.col("value").cast("double").alias("x"))
        .where("x IS NOT NULL")
        .cache()
    )
    vals.count()  # materialize the cache; the reference persists X too

    out: dict[str, float] = {}
    t0 = time.monotonic()
    _em_over_values(vals, jobs_fused=False)
    out["reference_shape_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    _em_over_values(vals, jobs_fused=True)
    out["fused_pass_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    gmm_fit(ev, "value", k=K, tol=0.0, max_iter=ITERS)
    out["histogram_sec"] = round(time.monotonic() - t0, 3)

    out["speedup_vs_reference_shape"] = round(
        out["reference_shape_sec"] / out["histogram_sec"], 1
    )
    out["speedup_vs_fused"] = round(
        out["fused_pass_sec"] / out["histogram_sec"], 1
    )
    payload = json.dumps(
        {"sf_dir": SF_DIR, "k": K, "iters": ITERS, **out}
    )
    print(payload)
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_REFSHAPE.json",
            ),
            "w",
        ) as f:
            f.write(payload + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
