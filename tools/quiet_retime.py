#!/usr/bin/env python
"""Quiet-window hunter around tools/retime.py's protocol (VERDICT r10
item 4): the r10 round burned 20 isolated retime attempts without ever
CATCHING a quiet window because each attempt paid a fresh session and
read the machine exactly once.  This keeps ONE warm session open and
polls the calibration probe once a minute; only when the probe reads
quiet (<= --gate, default 1.15 per the retime interpretation rule) does
it take the min-of-N retime block, bracketed by before/after probes so
the reading carries its own load evidence.  Exits on the first quiet
reading or at --deadline minutes, printing one JSON line either way.

Usage: python tools/quiet_retime.py [--runs N] [--gate R]
           [--deadline MIN] [--sf DIR] name [name ...]
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
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--gate", type=float, default=1.15)
    ap.add_argument("--deadline", type=float, default=20.0)
    ap.add_argument("--poll", type=float, default=60.0)
    ap.add_argument(
        "--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    import bench

    from ema_bigdata_spark import registry
    from ema_bigdata_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="ema-bigdata-quiet-retime")

    # same warm-up retime.py uses, so the gated probe reads warm
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.read.parquet(f"{args.sf}/events.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop_udf(s):
        return s

    spark.range(0, 64, 1, 32).select(_noop_udf("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    bench._calibrate(spark)

    # mirror tools/retime.py:70-77 — a missing or malformed
    # BASELINE_LOCAL.json must not crash the hunter (ADVICE r11)
    try:
        with open(os.path.join(REPO, "BASELINE_LOCAL.json")) as f:
            base = json.load(f)
        base_q, calib_pin = base.get("queries", {}), base.get(
            "calibration_sec"
        )
    except (OSError, ValueError):
        base_q, calib_pin = {}, None
    if not calib_pin:
        raise SystemExit(
            "BASELINE_LOCAL.json missing or has no calibration_sec: the "
            "quiet gate needs a calibration pin to compare against"
        )

    def probe() -> float:
        return round(bench._calibrate(spark) / calib_pin, 3)

    thunks = {}
    for name in args.names:
        if name not in registry.QUERIES:
            raise SystemExit(f"unknown query: {name}")
        thunks[name] = (
            lambda fn: lambda: bench._force(fn(spark, args.sf))
        )(registry.QUERIES[name])

    t_end = time.monotonic() + args.deadline * 60
    trace: list[float] = []
    out: dict = {
        "sf": args.sf, "runs": args.runs, "gate": args.gate,
        "retimes": None, "probe_trace": trace,
    }
    while time.monotonic() < t_end:
        r = probe()
        trace.append(r)
        if r <= args.gate:
            out["retimes"] = {}
            for name, thunk in thunks.items():
                thunk()  # warm: codegen + JIT, outside the measurement
                ts = []
                for _ in range(args.runs):
                    t0 = time.monotonic()
                    thunk()
                    ts.append(time.monotonic() - t0)
                pin = base_q.get(name)
                out["retimes"][name] = {
                    "sec": round(min(ts), 3),
                    "spread": round(max(ts) - min(ts), 3),
                    "pin": pin,
                    "ratio_vs_pin": (
                        round(min(ts) / pin, 3) if pin else None
                    ),
                }
            out["probe_before"] = r
            out["probe_after"] = probe()
            break
        time.sleep(args.poll)
    out["caught_quiet"] = out["retimes"] is not None
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
