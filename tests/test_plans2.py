"""Plan-shape pins for the round-2 session flagships: the physical
strategies that make these ops scale are asserted, not assumed."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators.dedup import (
    dedup_incremental_batch,
)
from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
    layout_partition_prune_advisor,
)
from mit_6_5840_mapreduce_with_go_spark.operators.scaleops import (
    layout_range_partition_plan,
    profile_fk_candidates,
    stats_key_skew_profile,
)
from mit_6_5840_mapreduce_with_go_spark.operators.text import (
    text_keywords_tfidf,
)
from mit_6_5840_mapreduce_with_go_spark.plans.explain import physical_plan


def test_skew_profile_topk_never_sorts_globally(spark, sf_dir):
    plan = physical_plan(stats_key_skew_profile(spark, sf_dir))
    # top-10 via TakeOrdered, not a full sort of the counts table
    assert "TakeOrderedAndProject" in plan


def test_range_planner_aggregates_before_window(spark, sf_dir):
    plan = physical_plan(layout_range_partition_plan(spark, sf_dir))
    # the scan-side partial aggregate (pre-bin histogram) must exist:
    # rows are compressed BEFORE the cumulative window
    assert "partial" in plan.lower() or "HashAggregate" in plan
    # the window runs over the bin domain — a single-partition exchange
    # of the (bounded) histogram is acceptable; a rangepartitioning sort
    # of raw rows is not
    assert "rangepartitioning(o_totalprice" not in plan.lower()


def test_incremental_dedup_exact_leg_is_anti_join(spark, sf_dir):
    plan = physical_plan(dedup_incremental_batch(spark, sf_dir))
    # survivors are selected by LEFT ANTI against the exact matches
    assert "LeftAnti" in plan


def test_fk_profile_single_pass_no_joins(spark, sf_dir):
    """r14: the per-pair loop (distinct + LeftSemi + crossJoins = 56
    sequential driver jobs) was collapsed into one tall union feeding a
    two-level aggregate — the plan must contain NO join of any kind and
    exactly one exchange pair (per-key collapse, then the 5-row
    per-pair rollup)."""
    plan = physical_plan(profile_fk_candidates(spark, sf_dir))
    assert "Join" not in plan
    assert "Union" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_keywords_broadcasts_df_table(spark, sf_dir):
    plan = physical_plan(text_keywords_tfidf(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # rank<=3 prunes inside the window operator before any later stage
    assert "WindowGroupLimit" in plan


def test_prune_advisor_single_pass_per_candidate(spark, sf_dir):
    plan = physical_plan(layout_partition_prune_advisor(spark, sf_dir))
    # all templates fold into conditional sums: 3 scans (one per
    # candidate key), never candidates x templates
    assert plan.count("FileScan parquet") <= 3
