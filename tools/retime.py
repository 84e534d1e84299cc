#!/usr/bin/env python
"""Isolated per-query retime against the standing pins (VERDICT r9
item 3's protocol, extracted from bench.py's post-sweep step so a
round can retime a handful of suspects WITHOUT paying a full sweep).

For each named query (or bench fixture): warm once, then min-of-N
(default 3) with the same JVM-noop forcing bench.py uses, bracketed by
calibration probes so the reading carries its own load evidence.
Prints one JSON line::

    {"retimes": {name: {"sec": min, "spread": max-min,
                        "ratio_vs_pin": r, "pin": p}},
     "calibration": {...}, "sf": ..., "cpus": ...}

Usage: python tools/retime.py [--runs N] [--sf DIR] name [name ...]

Interpretation rule (the r8 gmm re-pin precedent): a retime at ≤1.25×
pin on a quiet machine (calibration ≤1.15) dissolves the flag as
co-tenant band; a retime that HOLDS above pin on a quiet machine is
structural — re-pin it with a written rationale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    import bench  # the harness: _force/_calibrate and the fixtures

    from ema_bigdata_spark import registry
    from ema_bigdata_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="ema-bigdata-retime")
    sf_dir = args.sf

    # same warm-up bench.py uses: fact tables, Arrow worker pool, and
    # one throwaway calibration so the gated probe reads warm
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop_udf(s):
        return s

    spark.range(0, 64, 1, 32).select(_noop_udf("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    bench._calibrate(spark)

    try:
        with open(os.path.join(REPO, "BASELINE_LOCAL.json")) as f:
            base = json.load(f)
        base_q, calib_pin = base.get("queries", {}), base.get(
            "calibration_sec"
        )
    except (OSError, ValueError):
        base_q, calib_pin = {}, None

    def probe() -> float | None:
        if not calib_pin:
            return None
        return round(bench._calibrate(spark) / calib_pin, 3)

    # resolve names: registry queries plus the bench-only fixtures
    # (bench.bench_fixtures — r12: this resolution was promised by the
    # docstring since r9 but never implemented; fixture thunks close
    # over bench.SF_DIR, so retiming them honors --sf only when it
    # matches that env-derived dir)
    fixtures = dict(bench.bench_fixtures(spark))
    thunks = {}
    for name in args.names:
        if name in registry.QUERIES:
            thunks[name] = (
                lambda fn: lambda: bench._force(fn(spark, sf_dir))
            )(registry.QUERIES[name])
        elif name in fixtures:
            if os.path.normpath(sf_dir) != os.path.normpath(bench.SF_DIR):
                # ADVICE r12: fixture thunks close over bench.SF_DIR,
                # so a mismatched --sf would silently measure the
                # env-derived dir; refuse instead of mis-measuring
                raise SystemExit(
                    f"fixture {name} is bound to bench.SF_DIR="
                    f"{bench.SF_DIR!r}; rerun with SPARK_GRAFT_SF_DIR="
                    f"{sf_dir!r} in the environment instead of --sf"
                )
            thunks[name] = fixtures[name]
        else:
            raise SystemExit(f"unknown query: {name}")

    out: dict = {"retimes": {}, "sf": sf_dir, "runs": args.runs}
    calib_before = probe()
    for name, thunk in thunks.items():
        thunk()  # warm: codegen + JIT, outside the measurement
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            thunk()
            ts.append(time.monotonic() - t0)
        rec = {
            "sec": round(min(ts), 3),
            "spread": round(max(ts) - min(ts), 3),
        }
        pin = base_q.get(name)
        if pin:
            rec["pin"] = pin
            rec["ratio_vs_pin"] = round(min(ts) / pin, 3)
        out["retimes"][name] = rec
    calib_after = probe()
    out["calibration"] = {
        "before": calib_before,
        "after": calib_after,
        "pin_sec": calib_pin,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
