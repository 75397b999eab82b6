"""Tests for the Z-order layout operator (operators/layout.py): totals,
bucket bounds, and the actual pruning property — Z-buckets must carry
tighter per-file bounding boxes than a hash layout of the same width."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
    layout_zorder_buckets,
)
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def _bbox_cost(rows) -> float:
    """Mean row-weighted bounding-box area: the expected number of
    (ck, day) cells a file's footer stats cannot exclude."""
    total = sum(r["n_rows"] for r in rows)
    cost = 0.0
    for r in rows:
        ck_span = r["max_ck"] - r["min_ck"] + 1
        day_span = (r["max_dt"] - r["min_dt"]).days + 1
        cost += (r["n_rows"] / total) * ck_span * day_span
    return cost


def test_zorder_buckets_partition_the_table(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rows = layout_zorder_buckets(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == orders.count()
    for r in rows:
        assert r["min_ck"] <= r["max_ck"]
        assert r["min_dt"] <= r["max_dt"]


def test_zorder_beats_hash_layout_on_bbox_tightness(spark, sf_dir):
    """The point of the layout: a same-width HASH bucketing gives every
    file a near-full-domain bounding box; Z-order must be strictly
    tighter (else the operator buys nothing at the scan)."""
    zrows = layout_zorder_buckets(spark, sf_dir).collect()
    n_buckets = max(len(zrows), 2)
    orders = load_table(spark, sf_dir, "orders")
    hrows = (
        orders.withColumn(
            "b", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_buckets))
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_ck"),
            F.max("o_custkey").alias("max_ck"),
            F.min(F.col("o_orderdate").cast("date")).alias("min_dt"),
            F.max(F.col("o_orderdate").cast("date")).alias("max_dt"),
        )
        .collect()
    )
    assert _bbox_cost(zrows) < 0.5 * _bbox_cost(hrows)


def test_delta_varint_estimate_bounds(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
        layout_delta_varint_estimate,
    )

    rows = layout_delta_varint_estimate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # varint never beats 1 byte/event + 9-byte head, never exceeds raw+1
        assert r["n_events"] + 8 <= r["delta_varint_bytes"] <= r["raw_bytes"] + 1
        assert 0 < r["ratio"] <= 1.2
    # the sorted-time stream should compress well overall
    total_ratio = sum(r["delta_varint_bytes"] for r in rows) / sum(
        r["raw_bytes"] for r in rows
    )
    assert total_ratio < 0.75


def test_rle_run_estimate_bounds(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
        layout_rle_run_estimate,
    )

    r = layout_rle_run_estimate(spark, sf_dir).collect()[0]
    # value-sorted: one run per distinct value (3 statuses)
    assert r["runs_sorted_by_value"] == 3
    assert 3 <= r["runs_sorted_by_key"] <= r["n_rows"]
    assert r["run_inflation"] >= 1.0


def test_partition_prune_advisor_semantics(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
        layout_partition_prune_advisor,
    )

    rows = {
        (r["candidate_key"], r["template"]): r
        for r in layout_partition_prune_advisor(spark, sf_dir).collect()
    }
    assert len(rows) == 9
    # the matched layouts prune perfectly for their own predicate family
    st = rows[("o_orderstatus", "status_eq_F")]
    assert st["n_partitions"] == 3 and st["partitions_skipped"] == 2
    date = rows[("month(o_orderdate)", "date_range_q1_1995")]
    assert date["prune_frac"] > 0.9  # all but ~3 months skipped
    # a hash layout is far worse than the date layout for a date range
    # (asymptotically zero pruning; at tiny SF a few buckets happen to
    # be empty of Q1-1995 rows, so compare verdicts, not absolutes)
    hashed = rows[("o_custkey_mod16", "date_range_q1_1995")]
    assert hashed["prune_frac"] < 0.3 < date["prune_frac"]
    # the point lookup prunes all-but-one partition under its own key
    pt = rows[("o_custkey_mod16", "custkey_point")]
    assert pt["partitions_skipped"] >= 15
    for r in rows.values():
        assert 0.0 <= r["prune_frac"] <= 1.0
        assert r["partitions_skipped"] <= r["n_partitions"]


def test_zorder_skip_measure_pruning_laws(spark, sf_dir):
    """Invariants that hold regardless of quantizer-domain effects:
    the custkey-linear layout can never prune a date-only predicate,
    always prunes the custkey slice, and conjunction pruning is at
    least as strong as each single-predicate pruning per layout."""
    from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
        layout_zorder_skip_measure,
    )

    rows = {
        (r["layout"], r["qname"]): r
        for r in layout_zorder_skip_measure(spark, sf_dir).collect()
    }
    lin_date = rows[("custkey_linear", "date_halfyear")]
    assert lin_date["skip_frac"] == 0.0
    lin_ck = rows[("custkey_linear", "custkey_slice")]
    # with one linear file (sf0.001: all 150 custkeys quantize to xq=0
    # under the fixed 150k domain) nothing can prune; with several, the
    # slice must prune
    if lin_ck["n_files"] > 1:
        assert lin_ck["skip_frac"] > 0.0
    for layout in ("zorder", "custkey_linear"):
        conj = rows[(layout, "conjunction_box")]
        for single in ("custkey_slice", "date_halfyear"):
            assert conj["n_scanned"] <= rows[(layout, single)]["n_scanned"]
    # zorder must beat linear on the date predicate (its reason to exist)
    assert (
        rows[("zorder", "date_halfyear")]["skip_frac"]
        > rows[("custkey_linear", "date_halfyear")]["skip_frac"]
    )
