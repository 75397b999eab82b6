"""Incremental rollup refresh == full recompute, touching only delta
hours."""

from __future__ import annotations

import pathlib

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.rollup import (
    hourly_rollup,
    rollup_build,
    rollup_refresh,
)
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def test_incremental_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    # split: base = everything except two specific hours' worth of late data
    late = ev.orderBy("event_id").limit(200)
    out = str(tmp_path / "rollup")
    rollup_build(ev.select("event_id", "ts", "event_type", "value"), out)
    before = {p.name for p in pathlib.Path(out).glob("hour=*")}

    refreshed = rollup_refresh(
        spark,
        out,
        ev.select("event_id", "ts", "event_type", "value"),
        late.select("event_id", "ts", "event_type", "value"),
    )
    assert len(refreshed) >= 1

    # the refreshed table equals a full recompute over base+late
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hourly_rollup(
            ev.select("event_id", "ts", "event_type", "value").unionByName(
                late.select("event_id", "ts", "event_type", "value")
            )
        ).collect()
    }
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # only delta hours gained/changed partitions; the hour-partition set
    # is unchanged (late data falls in existing hours)
    after = {p.name for p in pathlib.Path(out).glob("hour=*")}
    assert after == before
