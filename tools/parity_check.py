"""Driver-sim parity check for named queries (or all oracled ones).

Usage: python /tmp/parity.py [sf_dir] [name ...]
Defaults: sf0.01, all ORACLES. Rows-only names run twice and compare.
"""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2:]

import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('PAR_CPUS', '8')}]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ema_bigdata_spark import registry
from ema_bigdata_spark.sources.tables import TABLES
from tests.oracle import compare_query, rowset

registry.load_all()
if not names:
    names = list(registry.ORACLES)

duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

fails = []
for n in names:
    t0 = time.time()
    try:
        if n in registry.ORACLES:
            compare_query(spark, duck, sf_dir, n)
            status = "OK"
        else:
            df1 = registry.QUERIES[n](spark, sf_dir)
            r1 = rowset(df1.columns, [tuple(r) for r in df1.collect()])
            df2 = registry.QUERIES[n](spark, sf_dir)
            r2 = rowset(df2.columns, [tuple(r) for r in df2.collect()])
            assert r1 == r2, f"{n}: nondeterministic"
            assert len(r1[1]) >= 0
            status = f"DET({len(r1[1])} rows)"
    except Exception as ex:
        status = f"FAIL {type(ex).__name__}: {str(ex)[:300]}"
        fails.append(n)
    print(f"{n:28s} {status:14s} {time.time()-t0:5.1f}s", flush=True)

print(f"\n{len(names) - len(fails)}/{len(names)} passed; fails: {fails}")
sys.exit(1 if fails else 0)
