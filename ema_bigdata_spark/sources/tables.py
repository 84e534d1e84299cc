"""Parquet table loading for the driver's TPC-H-ish star schema.

Tables (``TESTDATA.md``): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
an sf dir.

Timestamp handling
------------------
``events.ts`` is parquet ``INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false)``
(verified via pyarrow on sf0.001/0.01/0.1), which Spark reads natively as
``TIMESTAMP_NTZ`` — no conversion needed.  The loader still *guards* for a
raw-nanos physical type (``spark.sql.legacy.parquet.nanosAsLong=true``
reads TIMESTAMP(NANOS) as a LONG of ns-since-epoch): if the loaded dtype
is LongType we convert ``ns div 1000`` to TIMESTAMP_NTZ, a truncation
that matches DuckDB's ns→µs parquet read bit-for-bit.  The guard means a
testdata regeneration with either physical type loads identically.
``orders.o_orderdate`` / ``lineitem.l_shipdate`` are millisecond
timestamps (isAdjustedToUTC=false) read natively as TIMESTAMP_NTZ.  NTZ
is timezone-free so results never depend on the session timezone
(DuckDB's TIMESTAMP is likewise naive).

Scale note: the conversion is a codegen'd per-row projection (no
shuffle, no Python).  Filters on a *converted* column cannot be pushed
into the parquet scan, so hot queries that filter on time ranges should
use :func:`ts_ns` literals against the raw long column — see
``filter_ts_range`` — which keeps predicate pushdown + row-group
pruning intact at 100 TB.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# event-time columns per table that may arrive as raw nanos LONGs
# (everything else reads natively)
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ns_to_ntz(col: str) -> F.Column:
    # integer µs arithmetic — identical to DuckDB's ns→µs truncation
    return F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {_EPOCH_NTZ})")


def ts_ns(value: str | _dt.datetime) -> int:
    """Nanoseconds-since-epoch literal for pushdown-friendly filters on
    the raw long column (naive UTC interpretation, matching NTZ)."""
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    return int(value.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000) * 1_000


def load_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table with nanos timestamps left as raw long columns."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table with event-time columns normalized to TIMESTAMP_NTZ.

    Conversion only fires when the column actually loaded as a raw nanos
    LONG (legacy nanosAsLong path); native TIMESTAMP(MICROS) columns —
    the testdata's current physical type — pass through untouched so
    time-range predicates on them still push into the parquet scan.
    """
    from pyspark.sql.types import LongType

    df = load_raw(spark, sf_dir, name)
    for c in NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, _ns_to_ntz(c))
    return df


def event_epoch_us(df: DataFrame, col: str = "ts") -> F.Column:
    """BIGINT µs-since-epoch expression for an event-time column,
    whatever physical type it loaded as.

    The ONE place that knows the events timestamp encoding: a raw nanos
    LONG (legacy nanosAsLong read) truncates ``ns div 1000``; a native
    TIMESTAMP_NTZ (the testdata's current type) diffs against the NTZ
    epoch — both pure integer codegen, no session-timezone dependence.
    """
    from pyspark.sql.types import LongType

    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"{col} div 1000")
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")


def event_instant(df: DataFrame, col: str = "ts") -> F.Column:
    """Event time as a TIMESTAMP (LTZ) *instant* — what watermarks and
    ``F.window`` require — derived via :func:`event_epoch_us` so the
    UTC wall clock is preserved regardless of loaded dtype."""
    return F.timestamp_micros(event_epoch_us(df, col))


#: the streaming event-time domain (r8, found by the hostile-ts
#: sweep): [1900-01-01, 9000-01-01) as epoch-µs.  Window/watermark
#: arithmetic (≤ 1-day windows/slides/gaps) can push an event time at
#: most days past these bounds, so every derived window start/end
#: stays inside [0001-01-01, 9999-12-31] — the range BOTH engines and
#: Python datetimes represent.  Outside it, a year-0001 event made
#: s_stream_sliding emit a year-0 window start (unrepresentable in
#: Python — the driver's collect() dies), a year-9999 event pushed
#: tumbling window ends past 9999-12-31, and a NULL event time
#: crashed the stateful cores.  NULL fails the comparisons, so the
#: gate subsumes IS NOT NULL.  Out-of-domain events are ignored like
#: NULL keys; the 7100-year window is ~50× any lived data range.
TS_DOMAIN_MIN_US = -2_208_988_800_000_000
TS_DOMAIN_MAX_US = 221_845_392_000_000_000


def ts_domain_gate(df: DataFrame, col: str = "ts") -> F.Column:
    """Spark predicate of the event-time domain (see constants)."""
    us = event_epoch_us(df, col)
    return (us >= F.lit(TS_DOMAIN_MIN_US)) & (us < F.lit(TS_DOMAIN_MAX_US))


def sql_ts_domain(col: str = "ts") -> str:
    """Oracle text of :func:`ts_domain_gate` (DuckDB parses these
    wall-clock literals to the same instants the µs bounds encode)."""
    return (
        f"({col} >= TIMESTAMP '1900-01-01 00:00:00'"
        f" AND {col} < TIMESTAMP '9000-01-01 00:00:00')"
    )


#: memoized spread() verdicts: (sorted input files, n) -> has >= n splits
_SPREAD_CACHE: dict[tuple, bool] = {}


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan for CPU-heavy per-row operators.

    The testdata parquet files hold ONE row group each, so Spark plans a
    single split and per-row compute (shingling, minhash, vector math,
    Arrow batches) runs on one core.  At 100 TB a scan yields thousands
    of row-group splits and this is a no-op (guarded below) — the
    round-robin exchange only fires when the input has fewer splits
    than cores, where shuffling a few MB to unlock every core is free.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # two-tier guard (ADVICE r2): file count is only a FAST POSITIVE
    # signal — >= n files always means >= n splits, but the converse
    # fails both ways (Spark packs many small files into few partitions
    # via maxPartitionBytes/openCostInBytes; a few large files can hold
    # many row-group splits).  When the file count is inconclusive,
    # fall back to the real partition count from the RDD translation —
    # a driver-side planning step, no job, but NOT free (~0.1-0.3 s of
    # analysis), so the verdict is memoized per (files, n): split count
    # derives from the scan's files alone, not the projection above it.
    try:
        files: tuple[str, ...] | None = tuple(sorted(df.inputFiles()))
    except Exception:
        files = None
    if files is not None and len(files) >= n:
        return df
    key = (files, n)
    if files is None or key not in _SPREAD_CACHE:
        try:
            enough = df.rdd.getNumPartitions() >= n
        except Exception:
            enough = False
        if files is None:
            return df if enough else df.repartition(n)
        _SPREAD_CACHE[key] = enough
    return df if _SPREAD_CACHE[key] else df.repartition(n)


def filter_ts_range(
    df_raw: DataFrame,
    col: str,
    lo: str | None = None,
    hi: str | None = None,
) -> DataFrame:
    """Pushdown-friendly time-range filter (``lo`` inclusive, ``hi``
    exclusive, ISO strings).

    For a raw nanos LONG column the comparison stays integer (parquet
    pushdown + row-group stats pruning survive) and the column is then
    converted to TIMESTAMP_NTZ; native TIMESTAMP_NTZ columns filter
    directly (Spark pushes NTZ predicates into the scan).
    """
    from pyspark.sql.types import LongType

    is_raw = isinstance(df_raw.schema[col].dataType, LongType)
    if lo is not None:
        bound = F.lit(ts_ns(lo)) if is_raw else F.lit(lo).cast("timestamp_ntz")
        df_raw = df_raw.where(F.col(col) >= bound)
    if hi is not None:
        bound = F.lit(ts_ns(hi)) if is_raw else F.lit(hi).cast("timestamp_ntz")
        df_raw = df_raw.where(F.col(col) < bound)
    return df_raw.withColumn(col, _ns_to_ntz(col)) if is_raw else df_raw
