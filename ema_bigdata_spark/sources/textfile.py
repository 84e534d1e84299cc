"""The reference's native input format: a text file with one double per
line (``/root/reference`` ``Main.scala:40-41`` —
``sc.textFile(path).map(el => el.toDouble)``).

Spark-first rebuild: ``spark.read.text`` (a real FileScan with column
pruning and parallel splits) + a codegen'd cast — no RDD, no Python.
The reference's cluster variant (``Main.scala:34-36``) passed
``minPartitions=4``; here split parallelism comes from the file-source
config (``spark.sql.files.maxPartitionBytes``), which is the knob that
still works at 100 TB.

Malformed-line policy is explicit (the reference would throw mid-job on
the first bad line): ``strict=False`` drops non-numeric lines;
``strict=True`` (default) fails the query like the reference, but with
ANSI's precise error instead of a Scala NumberFormatException.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_doubles_text(
    spark: SparkSession,
    path: str,
    column: str = "value",
    strict: bool = True,
) -> DataFrame:
    """Read a one-double-per-line text file as a single-column DataFrame."""
    lines = spark.read.text(path).select(F.trim("value").alias("_raw"))
    if strict:
        return lines.select(F.col("_raw").cast("double").alias(column))
    parsed = lines.select(
        F.expr("try_cast(_raw AS DOUBLE)").alias(column)
    )
    return parsed.where(F.col(column).isNotNull())
