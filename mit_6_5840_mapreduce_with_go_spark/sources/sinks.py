"""Sinks: the reference's two output formats plus engine-native parquet.

Reference formats:
- job output: text lines ``"%v %v"`` per key, compared as a sorted set
  (src/mr/worker.go:206, src/main/test-mr.sh:103-110) — ``write_kv_text``;
- intermediate files: newline-delimited JSON ``{"Key":...,"Value":...}``
  (src/mr/worker.go:121-132) — ``write_kv_json``. Spark manages its own
  shuffle so this format survives only as an interchange sink.

Both use Spark's committer protocol (task temp dir + atomic job commit),
which supplies the reference's temp-file+rename atomicity (worker.go:
136-144) and the early_exit "no partial output visible" guarantee
(test-mr.sh:226-280) engine-wide.

``write_parquet_partitioned`` is the native 100 TB sink: splittable
columnar files, hive-style partition pruning for downstream readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, key: str = "key", value: str = "value") -> None:
    """Reference job-output format: one line '<key> <value>'."""
    df.select(
        F.format_string("%s %s", F.col(key).cast("string"), F.col(value).cast("string")).alias(
            "line"
        )
    ).write.mode("overwrite").text(path)


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Inverse of write_kv_text: split on the FIRST space (keys cannot
    contain spaces in the reference's corpus; values may)."""
    lines = spark.read.text(path)
    sep = F.instr("value", " ")
    return lines.select(
        F.substring(F.col("value"), 1, sep - 1).alias("key"),
        F.expr("substring(value, instr(value, ' ') + 1)").alias("value"),
    )


def write_kv_json(df: DataFrame, path: str, key: str = "key", value: str = "value") -> None:
    """Reference intermediate format: NDJSON {"Key": ..., "Value": ...}
    (capitalized field names per the Go struct, worker.go:16-19)."""
    df.select(
        F.col(key).cast("string").alias("Key"), F.col(value).cast("string").alias("Value")
    ).write.mode("overwrite").json(path)


def read_kv_json(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema("Key string, Value string")
        .json(path)
        .select(F.col("Key").alias("key"), F.col("Value").alias("value"))
    )


def write_parquet_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Native sink: hive-partitioned parquet. Readers prune partitions on
    the partition columns for free (verified in tests via explain)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, files: int = 8
) -> None:
    """Range-partitioned, internally-sorted parquet layout: rows are
    range-partitioned on ``sort_col`` (global order across files) and
    sorted within each file, so every file covers a narrow, disjoint key
    range. Parquet footers then carry tight min/max stats and a reader's
    ``WHERE sort_col BETWEEN ...`` skips whole files / row groups — the
    sort-based layout that complements hive partitioning for
    high-cardinality keys (dates, ids) at 100 TB."""
    (
        df.repartitionByRange(files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
