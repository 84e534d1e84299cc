#!/usr/bin/env python
"""Build a FULL sf1 fixture — every driver table, single-file parquet —
so the whole 151-query surface can run one decade past bench scale
(VERDICT r10 item 6: "run the full 151 at sf1 once ... to catch any
query whose constant hides superlinearity outside the heavy set").

Layout mirrors /root/testdata/sf0.1 exactly (one FILE per table, not a
part-file directory) because two consumers require files, not dirs:
DuckDB's ``read_parquet('<dir>/<t>.parquet')`` in the oracle harness,
and the streaming source seam's ``pathGlobFilter=events.parquet``
(see bench_scaling._make_big_events).

Growth shape (the realistic-warehouse scale-up the r7-r10 scaling
fixtures converged on, rationales in bench_scaling.py):

- facts ×10 with shifted surrogate keys: orders/lineitem (shifted
  o_orderkey only — dims stay 1×, per-dim-key fact density grows 10×,
  the honest warehouse growth; bench_scaling.py:394), events (shifted
  event_id AND user_id — 10× users at constant per-user density, so
  sessionize/stream state scales by keys, not by density;
  bench_scaling.py:353), embeddings (shifted vec_id), documents via
  the DISJOINT rotated-alphabet replicas (shifted doc_id; verbatim
  replication would make every original a 10-way near-dup family and
  grow true dedup pairs ~50× — an output artifact, not a plan
  property; bench_scaling.py:326).
- dims ×1 byte-copied: region, nation, customer, supplier, part.

Usage: python tools/make_sf1_full.py [out_dir]
       (default /tmp/spark_graft_sf1/full)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
FACTOR = 10


def _single_file(df, out_dir: str, table: str) -> None:
    """Write df as ONE parquet file at {out_dir}/{table}.parquet."""
    tmp = f"{out_dir}/_{table}_build"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    target = f"{out_dir}/{table}.parquet"
    if os.path.isdir(target):
        shutil.rmtree(target)
    elif os.path.exists(target):
        os.remove(target)
    shutil.move(part, target)
    shutil.rmtree(tmp)


def _replicate(df, key_shifts: dict[str, int], factor: int = FACTOR):
    from pyspark.sql import functions as F

    return reduce(
        lambda a, b: a.unionByName(b),
        [
            reduce(
                lambda d, kv: d.withColumn(
                    kv[0], F.col(kv[0]) + F.lit(i * kv[1])
                ),
                key_shifts.items(),
                df,
            )
            for i in range(factor)
        ],
    )


def build(spark, out_dir: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def mx(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    o = spark.read.parquet(f"{SRC}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    mo = mx(o, "o_orderkey")
    _single_file(_replicate(o, {"o_orderkey": mo}), out_dir, "orders")
    _single_file(_replicate(li, {"l_orderkey": mo}), out_dir, "lineitem")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    _single_file(
        _replicate(ev, {"event_id": mx(ev, "event_id"),
                        "user_id": mx(ev, "user_id")}),
        out_dir, "events",
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    _single_file(
        _replicate(emb, {"vec_id": mx(emb, "vec_id")}), out_dir,
        "embeddings",
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    md = mx(docs, "doc_id")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    big_docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * md))
            .withColumn("text", F.translate("text", alpha,
                                            alpha[i:] + alpha[:i]))
            for i in range(FACTOR)
        ],
    )
    _single_file(big_docs, out_dir, "documents")

    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet",
                        f"{out_dir}/{dim}.parquet")

    return {
        t: spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        for t in ("orders", "lineitem", "events", "embeddings",
                  "documents", "customer")
    }


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/spark_graft_sf1/full"
    )
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    counts = build(spark, out_dir)
    print({"out_dir": out_dir, "rows": counts})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
