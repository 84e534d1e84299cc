"""SparkSession construction tuned for the 100-TB design point.

The reference (``/root/reference`` ``Main.scala:22-30``) builds a bare
``local[2]`` session with no tuning.  Our sessions enable AQE (runtime
join-strategy + skew handling), partition coalescing, and Arrow so the
same code scales from ``local[*]`` tests to a 1000-executor cluster
without plan changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and desirable) at any scale.  All of these are
# runtime-settable so they also work when applied to an externally
# provided session (the verify driver owns its own SparkSession).
RUNTIME_CONFS: dict[str, str] = {
    # AQE re-plans joins/shuffles from runtime statistics: converts
    # sort-merge joins to broadcast when a side turns out small, splits
    # skewed shuffle partitions, coalesces tiny ones.  Essential at
    # 100 TB where static estimates are unreliable.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE sort-merge→shuffled-hash rewrite (guide §3.1; default 0 =
    # off): when every post-shuffle partition of the build side is
    # under this bound, the sort of both sides is skipped.  Bounded at
    # the AQE advisory partition size (64 MiB default), so a rewritten
    # partition's hash table is no larger than a normal post-AQE
    # partition — the OOM guard is the threshold itself.  Local effect
    # is small (SMJ queries: pagerank/cdc_merge/join_full measured
    # ~3-10% min-side, within co-tenant noise — ROUND/OPTIMIZATION
    # r12 notes); the motivation is the sort elimination on iterative
    # joins at scale.  Env-overridable for cluster sizing.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
        "SPARK_GRAFT_SHJ_THRESHOLD", str(64 * 1024 * 1024)
    ),
    # Guard for TIMESTAMP(NANOS) parquet columns, which Spark cannot
    # read natively: read them as long (ns since epoch); the loader
    # (tables.py) converts to TIMESTAMP_NTZ only when a column actually
    # arrives as a raw long.  The current testdata is TIMESTAMP(MICROS)
    # (reads natively), so this is dormant — but harmless — there.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas interchange (mapInPandas paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Confs only applied when *we* build the session (static or
# environment-shaped).
BUILDER_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    # 64 MiB broadcast threshold: region/nation/customer/supplier/part
    # are dimension tables; at 100 TB the fact tables grow but the dims
    # stay broadcastable.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-owned)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; loader re-asserts what it needs
    return spark


def get_spark(
    app_name: str = "ema-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = SparkSession.builder.master(master).appName(app_name)
    for k, v in {**BUILDER_CONFS, **RUNTIME_CONFS}.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return tune(spark)
