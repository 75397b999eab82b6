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


def test_bitmap_overlap_equals_set_arithmetic(spark, sf_dir):
    """Bitmap AND/popcount must reproduce plain set intersection."""
    import pyspark.sql.functions as F

    from mit_6_5840_mapreduce_with_go_spark.operators.relational3 import (
        bitmap_type_day_overlap,
    )

    rows = {(r["type_a"], r["type_b"]): r for r in bitmap_type_day_overlap(spark, sf_dir).collect()}
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("d"),
    ).distinct().collect()
    sets: dict[str, set] = {}
    for e in ev:
        sets.setdefault(e["event_type"], set()).add((e["user_id"], e["d"]))
    for (ta, tb), r in rows.items():
        sa, sb = sets[ta], sets[tb]
        assert r["n_a"] == len(sa) and r["n_b"] == len(sb)
        assert r["n_common"] == len(sa & sb)
        assert r["jaccard"] == round(len(sa & sb) / len(sa | sb), 4)
