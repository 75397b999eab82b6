"""Table-maintenance operations for parquet datasets: partition-scoped
MERGE (upsert), small-file compaction, and schema-evolution reads.

The reference's KV surface is upsert-by-nature (Put overwrites —
src/kvsrv1/server.go semantics); at warehouse scale the same contract is
a MERGE into partitioned storage. Without a table format (no Delta/
Iceberg in this container) the atomic unit is the PARTITION directory:
rewrite only partitions that received changes, leave every other file
byte-identical — at 100 TB a day's upsert batch typically touches <1% of
partitions, and this is the difference between rewriting 100 TB and
rewriting 500 GB.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_upsert_partitioned(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> list[str]:
    """Last-writer-wins MERGE of ``updates`` into the hive-partitioned
    parquet dataset at ``target_dir``.

    Plan: (1) driver-side list of affected partition values from the
    updates (tiny distinct collect); (2) read ONLY those partitions of
    the target (partition pruning via an IN filter on the partition
    column); (3) union + per-key top-1 by ``order_col`` (ties break to
    the update side); (4) atomically swap the rewritten partition dirs.
    Untouched partitions are never read, shuffled, or rewritten.

    Returns the list of rewritten partition values (as strings).
    """
    touched = [
        str(r[0]) for r in updates.select(partition_col).distinct().collect()
    ]
    target = spark.read.parquet(target_dir)
    existing = target.filter(F.col(partition_col).isin(touched)).withColumn(
        "_src", F.lit(0)
    )
    upd = updates.select(*target.columns).withColumn("_src", F.lit(1))
    w = W.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    merged = (
        existing.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    staging = target_dir.rstrip("/") + ".staging"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    for val in touched:
        part = f"{partition_col}={val}"
        src, dst = os.path.join(staging, part), os.path.join(target_dir, part)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            shutil.move(src, dst)
    shutil.rmtree(staging, ignore_errors=True)
    return touched


def compact_small_files(
    spark: SparkSession, data_dir: str, target_rows_per_file: int
) -> tuple[int, int]:
    """Bin-pack a directory of small parquet files into ~target-sized
    files (the periodic maintenance job every streaming/append pipeline
    needs — small files poison scan parallelism bookkeeping and NameNode/
    listing costs at scale). Rewrites via a staging dir + atomic swap.
    Returns (files_before, files_after)."""
    df = spark.read.parquet(data_dir)
    n_rows = df.count()
    n_files_before = sum(
        1 for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    n_out = max(1, -(-n_rows // target_rows_per_file))
    staging = data_dir.rstrip("/") + ".compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    old = data_dir.rstrip("/") + ".old"
    shutil.move(data_dir, old)
    shutil.move(staging, data_dir)
    shutil.rmtree(old)
    n_files_after = sum(
        1 for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    return n_files_before, n_files_after


def read_with_schema_evolution(spark: SparkSession, data_dir: str) -> DataFrame:
    """Read a dataset whose files were written under EVOLVING schemas
    (columns added over time): ``mergeSchema`` unions the footers, and
    files missing a column yield nulls — the append-only evolution
    contract a long-lived 100 TB dataset depends on."""
    return spark.read.option("mergeSchema", "true").parquet(data_dir)
