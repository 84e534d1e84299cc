#!/usr/bin/env python
"""Full-surface sf1 scaling probe (VERDICT r10 item 6): time EVERY
registered query at sf0.1 and at the full sf1 fixture
(tools/make_sf1_full.py) and record per-query 10x exponents, so a
query whose constant hides superlinearity OUTSIDE the r10 heavy set
shows up.  Reuses bench_scaling._probe_10x (min-of-N per scale,
spreads recorded, exponent = log10(t_big/t_small)).

Per-family rollup: families are the operator modules (the qualname's
module basename), published as each family's max exponent + the query
that set it — the alarm shape, mirroring SCALING_r10's reading rule
(fixed overhead deflates exponents at this scale; treat ≫1 as the
alarm, not the slope).

Usage: python tools/sf1_surface_probe.py [out.json] [sf1_dir]
       (defaults SCALING_r11.json /tmp/spark_graft_sf1/full)

Driver heap note: the default 1g local driver OOMs at sf1 (the
UnsafeExternalSorter spill-read path during q_ngram_jaccard's shingle
aggregate), so this tool now defaults spark.driver.memory to 48g
(override with SPARK_GRAFT_DRIVER_MEM, or set PYSPARK_SUBMIT_ARGS
with an explicit --driver-memory to bypass the default entirely) — a
resource config, not a plan property (executors on a real cluster
size their own heaps).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALING_r11.json"
    )
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else (
        "/tmp/spark_graft_sf1/full"
    )
    from pyspark.sql import SparkSession

    import bench_scaling as bs
    from ema_bigdata_spark import registry

    builder = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Default the driver heap (see module docstring): the 1g local
    # default OOMs at sf1.  Skipped when PYSPARK_SUBMIT_ARGS already
    # sets driver memory, so explicit invocations still win.
    if "driver-memory" not in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    names = sorted(registry.QUERIES)
    probes = bs._probe_10x(spark, names, sf1_dir)

    families: dict[str, dict] = {}
    for name, rec in probes.items():
        fam = registry.QUERIES[name].__module__.rsplit(".", 1)[-1]
        cur = families.setdefault(
            fam, {"max_exponent_10x": float("-inf"), "argmax": None,
                  "n_queries": 0}
        )
        cur["n_queries"] += 1
        if rec["exponent_10x"] > cur["max_exponent_10x"]:
            cur["max_exponent_10x"] = rec["exponent_10x"]
            cur["argmax"] = name

    payload = {
        "harness": "tools/sf1_surface_probe.py",
        "fixture": "tools/make_sf1_full.py (full 10-table sf1)",
        "small_dir": "/root/testdata/sf0.1",
        "big_dir": sf1_dir,
        "n_queries": len(names),
        "families": families,
        "queries": probes,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    worst = sorted(
        ((r["exponent_10x"], n) for n, r in probes.items()), reverse=True
    )[:8]
    print(json.dumps({"out": out_path, "worst_exponents": worst}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
