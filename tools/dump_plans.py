#!/usr/bin/env python
"""Dump ``explain("formatted")`` for every registered query to
``plans/$SPARK_GRAFT_PLANS_DIR/<name>_<label>.txt`` (default r13) (guide §7.2: the optimization round's
before/after plan evidence — the judge reads these files, not a live
Spark UI).

Usage: python tools/dump_plans.py <label> [name ...]

With no names, dumps every registry query.  Building a query's
DataFrame may itself run jobs (iterative operators collect scalars;
streaming queries run their availableNow batches), so a full dump is
minutes, not seconds.  The captured text is the plan of the RETURNED
DataFrame — the exact frame the bench forces through the noop sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_text(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from ema_bigdata_spark import registry
    from ema_bigdata_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="ema-bigdata-dump-plans")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)

    names = sorted(only or registry.QUERIES)
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        try:
            df = fn(spark, SF_DIR)
            text = plan_text(df)
        except Exception as exc:  # record the failure, keep going
            text = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{label}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
