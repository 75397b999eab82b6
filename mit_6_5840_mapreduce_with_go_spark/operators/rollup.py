"""Incremental materialized rollup (continuous-aggregate pattern): an
hourly aggregate table over ``events`` that is REFRESHED INCREMENTALLY —
a new batch of events triggers recomputation of only the hour partitions
it touches, by merging base data with the delta per affected hour.

No reference counterpart (the reference has no storage/aggregate layer);
this is the time-series rollup a 100 TB event pipeline maintains instead
of re-aggregating history: a day's late/new data touches a handful of
hour partitions, so refresh cost is O(delta), not O(history).

Built on the same partition-scoped atomic-swap machinery as
sources/merge.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The aggregate definition: per (hour, event_type) counts + value
    sums. ``hour`` doubles as the partition column of the materialized
    table (string, filesystem-safe)."""
    return (
        events.withColumn(
            "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH")
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def rollup_build(events: DataFrame, out_dir: str) -> None:
    """Initial full build of the materialized rollup, hour-partitioned."""
    hourly_rollup(events).write.mode("overwrite").partitionBy("hour").parquet(out_dir)


def rollup_refresh(
    spark: SparkSession, out_dir: str, events_dir_or_df, new_events: DataFrame
) -> list[str]:
    """Incremental refresh: recompute ONLY the hours present in
    ``new_events``, reading just those hours from the base event store
    (predicate prunes the scan) plus the delta, and atomically swap the
    affected hour partitions of the rollup. Returns refreshed hours.

    ``events_dir_or_df``: the base events table (DataFrame) — at scale a
    date/hour-partitioned store so the re-read is partition-pruned.
    """
    delta_hours = [
        r[0]
        for r in new_events.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH")
        )
        .distinct()
        .collect()
    ]
    base = events_dir_or_df
    hour_of = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH")
    affected = base.filter(hour_of.isin(delta_hours)).unionByName(
        new_events.filter(hour_of.isin(delta_hours))
    )
    recomputed = hourly_rollup(affected)
    staging = out_dir.rstrip("/") + ".staging"
    recomputed.write.mode("overwrite").partitionBy("hour").parquet(staging)
    for h in delta_hours:
        part = f"hour={h}"
        src, dst = os.path.join(staging, part), os.path.join(out_dir, part)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            shutil.move(src, dst)
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(delta_hours)
