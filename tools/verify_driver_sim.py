"""Full driver-contract verify: entry() + every queries() name, oracled
via DuckDB compare, rows-only via double-run determinism (the verify
skill recipe, driven through __spark_entry__ like the external driver).
"""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb
from pyspark.sql import SparkSession

builder = (
    SparkSession.builder.master(f"local[{os.environ.get('PAR_CPUS', '8')}]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
)
# Default a roomy driver heap: the default 1g local driver OOMs at sf1
# in the UnsafeExternalSorter spill-read path (ROUND11_NOTES §5 /
# VERDICT r11 item 3).  Resource config, not a plan property — and
# only applied when the JVM isn't already configured via
# PYSPARK_SUBMIT_ARGS, so explicit invocations still win.
if "driver-memory" not in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

res = e.entry(spark)
rows = res.collect()
print(f"entry(): {len(rows)} rows, schema={res.columns}", flush=True)

from ema_bigdata_spark.sources.tables import TABLES
from tests.oracle import rowset

queries = e.queries()
oracles = e.oracle_sql()

duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

fails = []
t_start = time.time()
for i, n in enumerate(queries):
    t0 = time.time()
    try:
        sdf = queries[n](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if n in oracles:
            ores = duck.execute(oracles[n])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            assert len(srows) == len(orows), (
                f"rows {len(srows)} != oracle {len(orows)}"
            )
            sn, sset = rowset(sdf.columns, srows)
            on, oset = rowset(ocols, orows)
            assert sn == on, f"cols {sn} != {on}"
            assert sset == oset, (
                "value mismatch; first diffs "
                f"{[(a, b) for a, b in zip(sset, oset) if a != b][:3]}"
            )
            status = f"OK({len(srows)})"
        else:
            sdf2 = queries[n](spark, sf_dir)
            r1 = rowset(sdf.columns, srows)
            r2 = rowset(sdf2.columns, [tuple(r) for r in sdf2.collect()])
            assert r1 == r2, "nondeterministic"
            status = f"DET({len(srows)})"
    except Exception as ex:
        status = f"FAIL {type(ex).__name__}: {str(ex)[:200]}"
        fails.append(n)
    print(f"[{i+1:3d}/{len(queries)}] {n:28s} {status}", flush=True)

print(
    f"\n{len(queries) - len(fails)}/{len(queries)} passed in "
    f"{time.time()-t_start:.0f}s; fails: {fails}"
)
sys.exit(1 if fails else 0)
