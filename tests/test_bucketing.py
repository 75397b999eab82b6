"""Bucketed co-located join: the 100 TB shuffle-elimination strategy.
Writing both join sides bucketed by the join key lets Catalyst plan a
sort-merge join with NO Exchange on either side — the Spark analog of
the reference's static shard layout (Key2Shard pinning keys to fixed
buckets, shardcfg.go:29-34)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.plans.explain import physical_plan
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "orders_b"))
            .saveAsTable("orders_bucketed")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "lineitem_b"))
            .saveAsTable("lineitem_bucketed")
        )
        ob = spark.table("orders_bucketed")
        lb = spark.table("lineitem_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        import re

        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        # both sides read pre-bucketed: the ONLY Exchange node allowed in
        # the plan is the one feeding the final 5-row aggregate (formatted
        # explain prints each node twice — count the "(n) Exchange" details)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan
        # result parity with the unbucketed join
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        want = {r["o_orderpriority"]: r["n"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Runtime bloom-filter injection (the 100 TB shuffle-reduction
    pattern): a selective dim filter on the creation side makes Spark
    inject might_contain(bloom(o_orderkey)) into the FACT-side scan
    before the shuffle join, so most fact rows are dropped pre-shuffle.
    On a cluster the thresholds trigger naturally at fact-table scale;
    here they're lowered to demonstrate the plan shape.  Results must be
    identical with and without the filter (bloom FPs are removed by the
    real join; no false negatives exist)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        got = {r["l_returnflag"]: r["n"] for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    # parity against default-config execution (broadcast join, no bloom)
    orders2 = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = (
        li2.join(orders2, li2.l_orderkey == orders2.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["l_returnflag"]: r["n"] for r in plain.collect()}
    assert got == want and sum(got.values()) > 0
