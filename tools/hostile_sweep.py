"""Hostile-input sweep harness (r8): poison the testdata and run every
oracled query on both engines, reporting crashes and parity breaks.

This is the tool behind ROUND8_NOTES §15/§17/§18 — the three sweeps
that found 12 + 10 + 8 latent crashers.  Each mode plants a different
hostile class on top of a pristine sf-dir copy:

  python tools/hostile_sweep.py nonfinite-tpch   # NaN/±Inf/1e17 in every
                                                 # DOUBLE measure column,
                                                 # IN-WINDOW dates
  python tools/hostile_sweep.py hostile-ts       # NULL / year-0001 /
                                                 # year-9999 timestamps
  python tools/hostile_sweep.py all              # both, sequentially

Exit code 0 only if every oracled query is parity-OK and crash-free.
The fixture rules that make a sweep honest (learned the hard way):
poison ONE column per row with benign in-filter values in the others,
and put hostile rows INSIDE the date windows the queries filter on —
a hostile row a predicate silently excludes proves nothing (§17: the
first TPC-H sweep missed 10 crashers that way; the §15 events fixture
missed q_events_hourly's crash because its timestamps fell outside
the query's window).
"""
from __future__ import annotations

import datetime
import glob
import os
import shutil
import sys
import tempfile

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

_D = datetime.datetime
NAN, INF = float("nan"), float("inf")

#: non-finite measures: one hostile column per row; benign values keep
#: the row inside q6-class predicates; dates cycle through the TPC-H
#: filter windows
_NF_POISON = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
}
_NF_HOSTILE = [NAN, INF, -INF, 1e17]
_NF_DATES = [_D(1994, 6, 15), _D(1995, 3, 10), _D(1995, 9, 15), _D(1996, 6, 15)]
_NF_BENIGN = {
    "l_quantity": 10.0, "l_extendedprice": 1000.0,
    "l_discount": 0.06, "l_tax": 0.04,
}

#: hostile timestamps: NULL + both representable-year extremes
_TS_HOSTILE = {
    "events": ("ts", "event_id"),
    "orders": ("o_orderdate", "o_orderkey"),
    "lineitem": ("l_shipdate", None),
}
_TS_VALUES = [None, _D(1, 1, 1, 0, 0, 0), _D(9999, 12, 31, 23, 59, 59)]


def _single_file(df, path: str) -> None:
    tmp = path + "__d"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")
    assert len(part) == 1
    shutil.move(part[0], path)
    shutil.rmtree(tmp)


def _build_nonfinite_tpch(spark, tables, root: str) -> None:
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        if t not in _NF_POISON and t != "events":
            shutil.copy(src, f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(src)
        base = df.limit(1).collect()[0].asDict()
        rows = []
        if t == "events":
            # in-window ts for q_events_hourly (2024-01-02..04)
            for i, h in enumerate(_NF_HOSTILE):
                d = dict(base)
                d["event_id"] = 10_000_000 + i
                d["ts"] = _D(2024, 1, 2, 6, i)
                d["value"] = h
                rows.append(tuple(d[f.name] for f in df.schema.fields))
        else:
            for ci, c in enumerate(_NF_POISON[t]):
                for hi, h in enumerate(_NF_HOSTILE):
                    d = dict(base)
                    for b, v in _NF_BENIGN.items():
                        if b in d:
                            d[b] = v
                    d[c] = h
                    for dc in ("l_shipdate", "o_orderdate"):
                        if dc in d:
                            d[dc] = _NF_DATES[(ci + hi) % 4]
                    rows.append(tuple(d[f.name] for f in df.schema.fields))
        _single_file(
            df.unionByName(spark.createDataFrame(rows, df.schema)),
            f"{root}/{t}.parquet",
        )


def _build_hostile_ts(spark, tables, root: str) -> None:
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        if t not in _TS_HOSTILE:
            shutil.copy(src, f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(src)
        base = df.limit(1).collect()[0].asDict()
        tscol, idcol = _TS_HOSTILE[t]
        rows = []
        for i, v in enumerate(_TS_VALUES):
            d = dict(base)
            if idcol:
                d[idcol] = 20_000_000 + i
            d[tscol] = v
            rows.append(tuple(d[f.name] for f in df.schema.fields))
        _single_file(
            df.unionByName(spark.createDataFrame(rows, df.schema)),
            f"{root}/{t}.parquet",
        )


#: hostile documents: degenerate text and NULL metadata.  n_chars is
#: kept CONSISTENT with the text (some queries trust the column);
#: doc_ids far above the corpus range.
_DOC_ROWS = [
    (30_000_000, None, "en", "src0"),            # NULL text
    (30_000_001, "", "en", "src0"),              # empty text
    (30_000_002, "   \t  \n ", "en", "src1"),    # whitespace only
    (30_000_003, "x", "en", "src1"),             # single char
    (30_000_004, "!!! ??? ... ;;; :::", "en", "src2"),  # punct only
    (30_000_005, "word " * 20_000, "en", "src2"),  # 100 kB one-token-type
    (30_000_006, "the quick brown fox", None, "src0"),   # NULL lang
    (30_000_007, "the quick brown fox", "en", None),     # NULL source
    (30_000_008, "éèê 中文 مرح"
                 "با \U0001f600", "zh", "src1"),  # non-ASCII+emoji
]


def _build_hostile_docs(spark, tables, root: str) -> None:
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        if t != "documents":
            shutil.copy(src, f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(src)
        rows = [
            (i, txt, lang, source, len(txt) if txt is not None else None)
            for i, txt, lang, source in _DOC_ROWS
        ]
        _single_file(
            df.unionByName(spark.createDataFrame(rows, df.schema)),
            f"{root}/{t}.parquet",
        )


def _build_hostile_keys(spark, tables, root: str) -> None:
    """NULL / orphan / negative / duplicated join keys: orders whose
    custkey is NULL, matches no customer, or is negative; a customer
    with a duplicated primary key; lineitem rows pointing at a
    nonexistent order/part/supplier.  Joins must treat these as SQL
    does (NULL matches nothing, orphans drop from inner joins,
    duplicate dim keys fan out) — never crash or silently mis-bucket
    (q_join_salted's salt arithmetic runs on the key itself)."""
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        if t not in ("orders", "customer", "lineitem"):
            shutil.copy(src, f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(src)
        base = df.limit(1).collect()[0].asDict()
        rows = []

        def mk(**over):
            d = dict(base)
            d.update(over)
            return tuple(d[f.name] for f in df.schema.fields)

        if t == "orders":
            rows = [
                mk(o_orderkey=40_000_000, o_custkey=None),
                mk(o_orderkey=40_000_001, o_custkey=88_000_000),
                mk(o_orderkey=40_000_002, o_custkey=-5),
            ]
        elif t == "customer":
            # duplicate primary key: same c_custkey twice, different
            # attrs — inner joins fan out, both engines identically
            rows = [
                mk(c_custkey=base["c_custkey"], c_name="dupe"),
                mk(c_custkey=-5, c_name="negative-key"),
            ]
        elif t == "lineitem":
            rows = [
                mk(l_orderkey=77_000_000, l_linenumber=1),
                mk(l_orderkey=77_000_001, l_partkey=99_000_000,
                   l_suppkey=99_000_000, l_linenumber=1),
            ]
        _single_file(
            df.unionByName(spark.createDataFrame(rows, df.schema)),
            f"{root}/{t}.parquet",
        )


_MODES = {
    "nonfinite-tpch": _build_nonfinite_tpch,
    "hostile-ts": _build_hostile_ts,
    "hostile-docs": _build_hostile_docs,
    "hostile-keys": _build_hostile_keys,
}


def run_mode(spark, mode: str) -> list[str]:
    import duckdb

    from ema_bigdata_spark import registry
    from ema_bigdata_spark.sources.tables import TABLES
    from tests.oracle import compare_query

    root = tempfile.mkdtemp(prefix=f"sweep_{mode.replace('-', '_')}_")
    _MODES[mode](spark, TABLES, root)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{root}/{t}.parquet')"
        )
    bad: list[str] = []
    names = [n for n in registry.QUERIES if n in registry.ORACLES]
    for i, name in enumerate(names):
        try:
            compare_query(spark, duck, root, name)
        except AssertionError:
            bad.append(f"{name}: MISMATCH")
        except Exception as ex:
            bad.append(f"{name}: CRASH {ex!r:.200}")
        if (i + 1) % 25 == 0:
            print(f"  [{i + 1}/{len(names)}]", flush=True)
    duck.close()
    print(f"{mode}: {len(names) - len(bad)}/{len(names)} clean")
    for b in bad:
        print(f"  {b}")
    return bad


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    modes = list(_MODES) if mode == "all" else [mode]
    for m in modes:
        if m not in _MODES:
            print(f"unknown mode {m!r}; modes: {sorted(_MODES)} or 'all'")
            return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('PAR_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ema_bigdata_spark import registry

    registry.load_all()
    failures: list[str] = []
    for m in modes:
        failures += run_mode(spark, m)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
