"""Plan-property tests: the scale contract. Correct rows are not enough —
the plan must push filters into the scan, broadcast dimension joins, keep
expressions inside codegen, and avoid cartesian products (SURVEY.md §4 /
driver north-star)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators import relational as R
from mit_6_5840_mapreduce_with_go_spark.operators import similarity as S
from mit_6_5840_mapreduce_with_go_spark.plans.explain import (
    assert_broadcast_join,
    assert_codegen,
    assert_no_cartesian,
    assert_pushed_filter,
    physical_plan,
)


def test_q1_filter_pushed_and_codegen(spark, sf_dir):
    df = R.q1_pricing_summary(spark, sf_dir)
    assert_pushed_filter(df)
    assert_codegen(df)


def test_q1_prunes_columns(spark, sf_dir):
    plan = physical_plan(R.q1_pricing_summary(spark, sf_dir))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # 7 needed columns, not all 11
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q1_sums_are_decimal_exact(spark, sf_dir):
    """The sf1 decade mirror caught raw double money sums diverging from
    DuckDB in the 4th decimal once group sums reached ~3e10 (partial-sum
    association order).  Pin the fix: every money/qty aggregate is a
    DECIMAL sum over exact integer cents, divided/rounded only at the
    end — a future 'optimization' back to sum-of-doubles fails here."""
    plan = physical_plan(R.q1_pricing_summary(spark, sf_dir))
    aggs = [
        l for l in plan.splitlines() if "Functions" in l and "sum(" in l
    ]
    assert aggs, "no aggregate Functions lines in plan"
    # the 5 sums accumulate the decimal-cast integer columns (qty /
    # *_c cents), never the raw double lineitem columns
    assert any("sum(qty#" in l and "sum(price_c#" in l for l in aggs)
    assert "decimal(38,0)" in plan
    for raw in ("sum(l_quantity", "sum(l_extendedprice", "sum(l_discount"):
        assert raw not in plan, f"double-typed aggregate leaked: {raw}"


def test_q3_broadcasts_customer(spark, sf_dir):
    df = R.q3_top_revenue_orders(spark, sf_dir)
    assert_broadcast_join(df)
    assert_pushed_filter(df)  # c_mktsegment = 'BUILDING' reaches the scan


def test_q5_no_cartesian(spark, sf_dir):
    df = R.q5_nation_revenue(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = physical_plan(R.topk_expensive_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_bruteforce_broadcasts_queries(spark, sf_dir):
    # the small query-vector side must broadcast; the big side must not shuffle
    assert_broadcast_join(S.sim_topk_bruteforce(spark, sf_dir))


def test_semi_join_is_semi(spark, sf_dir):
    plan = physical_plan(R.semi_customers_with_orders(spark, sf_dir))
    assert "LeftSemi" in plan


def test_scalar_query_single_codegen_stage(spark, sf_dir):
    # pure per-row expressions: no KEY-based shuffle. (The source fan-out
    # repartition for single-row-group test files is round-robin and the
    # only exchange allowed.)
    plan = physical_plan(R.scalar_part_features(spark, sf_dir))
    import re

    key_exchanges = [
        m
        for m in re.findall(r"Exchange \w+", plan)
        if "RoundRobin" not in m and "SinglePartition" not in m
    ]
    assert key_exchanges == [], plan
    assert_codegen(R.scalar_part_features(spark, sf_dir))


def test_q6_all_predicates_pushed(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators import relational3 as R3

    df = R3.q6_forecast_revenue(spark, sf_dir)
    assert_pushed_filter(df)
    plan = physical_plan(df)
    assert "Join" not in plan  # pure scan+agg


def test_q4_exists_is_semi_join(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators import relational3 as R3

    plan = physical_plan(R3.q4_late_shipment_orders(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q18_aggregates_before_join(spark, sf_dir):
    # the grouped fact must sit BELOW the joins (survivors broadcast)
    from mit_6_5840_mapreduce_with_go_spark.operators import relational3 as R3

    plan = physical_plan(R3.q18_large_volume_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
