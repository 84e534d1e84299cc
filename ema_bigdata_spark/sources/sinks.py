"""Sinks.  The reference's only sink is stdout ``println``
(``Main.scala:46-52``); a real pipeline needs durable, re-readable
outputs, so the engine standardizes on Spark's native writers with
scale-safe defaults.

Scale notes baked in:
- parquet + snappy: splittable, column-pruned, predicate-pushed on
  re-read — the only sane default at 100 TB;
- ``partition_by`` turns downstream equality filters into partition
  pruning (zero I/O for unselected keys);
- ``buckets`` pre-shuffles by join key at write time so later joins on
  that key are exchange-free (bucketed table join);
- writers never ``collect()`` — data flows executor→storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write a partitioned snappy-parquet dataset."""
    w = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table: co-locates rows by hash of
    ``bucket_col`` so subsequent equi-joins/aggregations on it skip the
    shuffle entirely (Spark reads bucket files as pre-partitioned)."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header — interchange format for small result sets."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines output — for nested/array results."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC with zlib — the columnar interchange format for Hive/Trino
    estates; same splittable, predicate-pushed re-read properties as
    parquet (Spark pushes filters into ORC scans natively)."""
    w = df.write.mode(mode).option("compression", "zlib")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """Parquet with rows sorted *within each file* by ``sort_cols``.

    Sorting clusters values so parquet row-group min/max statistics
    become selective: a later range filter on ``sort_cols`` skips
    whole row groups at scan time (the poor-man's Z-order — the
    single-column layout optimization that matters most at 100 TB).
    ``sortWithinPartitions`` keeps the sort shuffle-free.
    """
    (
        df.sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .option("compression", "snappy")
        .parquet(path)
    )
