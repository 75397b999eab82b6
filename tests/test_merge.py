"""Table maintenance: partition-scoped MERGE leaves untouched partitions
byte-identical; compaction preserves rows; schema evolution reads."""

from __future__ import annotations

import os
import pathlib

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.sources import load_table
from mit_6_5840_mapreduce_with_go_spark.sources.merge import (
    compact_small_files,
    merge_upsert_partitioned,
    read_with_schema_evolution,
)


def _partition_files(root: str) -> dict[str, set[tuple[str, float]]]:
    out: dict[str, set[tuple[str, float]]] = {}
    for p in pathlib.Path(root).glob("*=*/*.parquet"):
        out.setdefault(p.parent.name, set()).add((p.name, p.stat().st_mtime))
    return out


def test_merge_upsert_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    target = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    orders.write.partitionBy("o_orderstatus").parquet(target)
    before = _partition_files(target)
    statuses = sorted(k.split("=", 1)[1] for k in before)  # dir name -> value
    assert len(statuses) >= 2

    touched_status = statuses[0]
    some_keys = [
        r[0]
        for r in orders.filter(F.col("o_orderstatus") == touched_status)
        .select("o_orderkey")
        .limit(5)
        .collect()
    ]
    updates = spark.createDataFrame(
        [(k, touched_status, 999999.99, None) for k in some_keys]
        + [(10**12 + 1, touched_status, 1.23, None)],  # brand-new key
        "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    ).withColumn("o_orderdate", F.lit("2002-01-01").cast("timestamp"))

    touched = merge_upsert_partitioned(
        spark,
        target,
        updates,
        key_cols=["o_orderkey"],
        partition_col="o_orderstatus",
        order_col="o_orderdate",
    )
    assert touched == [touched_status]

    after = _partition_files(target)
    for status in statuses[1:]:  # untouched partitions: same files, same mtimes
        key = f"o_orderstatus={status}"
        assert after[key] == before[key]
    assert (
        after[f"o_orderstatus={touched_status}"]
        != before[f"o_orderstatus={touched_status}"]
    )

    merged = spark.read.parquet(target)
    # updated keys carry the new price; new key present; row count = old + 1
    got = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in merged.filter(F.col("o_orderkey").isin(some_keys)).collect()
    }
    assert all(v == 999999.99 for v in got.values()) and len(got) == len(some_keys)
    assert merged.filter(F.col("o_orderkey") == 10**12 + 1).count() == 1
    assert merged.count() == orders.count() + 1


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    d = str(tmp_path / "frag")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    n = li.count()
    li.repartition(64).write.parquet(d)  # fragment into 64 tiny files
    nb, na = compact_small_files(spark, d, target_rows_per_file=n // 4)
    assert nb == 64 and na <= 8
    assert spark.read.parquet(d).count() == n


def test_schema_evolution_read(spark, tmp_path):
    d = str(tmp_path / "evolving")
    os.makedirs(d)
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)
    df = read_with_schema_evolution(spark, d)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 3.5
