"""AQE skew-join handling: a pathologically hot join key is split into
multiple tasks at runtime (OptimizeSkewedJoin), complementing the manual
salting pattern (salted_user_event_counts). The skew thresholds are
lowered so the mitigation triggers at test scale; at 100 TB the defaults
(256 MB / 5x median) fire on real skew."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # left: 200k rows, 99% on ONE hot key; right: uniform dimension
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("attr")
        )
        # NOTE: aggregate on a DIFFERENT key than the join key — if the
        # next stage required the join key's partitioning, AQE would
        # (correctly) refuse to split the skewed partition.
        joined = (
            left.join(right, "k")
            .groupBy("attr")
            .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("k"),
                 F.max("payload").alias("_keep_payload_in_join"))
        )
        rows = {r["k"]: r["n"] for r in joined.collect() if r["k"] == 7}
        assert rows[7] == 198_000  # correctness under the split

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
