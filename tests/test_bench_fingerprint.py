"""Regression pins for bench.py's run-stable plan fingerprints
(VERDICT r10 #2).  Each test rebuilds the same logical plan twice in
one session and asserts the fingerprint reproduces — exercising the
three real nondeterminism sources diagnosed in round 11:

1. RewriteDistinctAggregates orders rewritten aggregates / gid
   assignments by exprId-hash iteration (multi-distinct aggregates);
2. higher-order-function lambda variables carry a session-GLOBAL
   counter in their NAME (x_21 vs x_44), surviving the exprId strip;
3. AQE numbers QueryStage/WholeStageCodegen by stage completion order.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from bench import _plan_fingerprint  # noqa: E402


def _fp_twice(build):
    return _plan_fingerprint(build()), _plan_fingerprint(build())


def test_multi_distinct_aggregate_fingerprint_stable(spark, sf_dir):
    def build():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return li.groupBy("l_suppkey").agg(
            F.countDistinct("l_partkey").alias("a"),
            F.countDistinct("l_orderkey").alias("b"),
            F.count(F.lit(1)).alias("c"),
        )

    a, b = _fp_twice(build)
    assert a == b


def test_lambda_variable_counter_fingerprint_stable(spark, sf_dir):
    def build():
        em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return em.select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("norm2"),
            F.filter("embedding", lambda v: v > 0).alias("pos"),
        )

    a, b = _fp_twice(build)
    assert a == b
    # burn some lambda counter state between builds, then again
    spark.range(1).select(
        F.transform(F.array(F.lit(1)), lambda v: v + 1)
    ).collect()
    assert _plan_fingerprint(build()) == a


def test_fingerprint_still_detects_real_plan_changes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = _plan_fingerprint(li.groupBy("l_suppkey").count())
    b = _plan_fingerprint(li.groupBy("l_partkey").count())
    c = _plan_fingerprint(
        li.where(F.col("l_quantity") > 10).groupBy("l_suppkey").count()
    )
    assert len({a, b, c}) == 3  # different plans, different fingerprints


def test_current_round_counts_bench_artifacts_only(tmp_path, monkeypatch):
    """VERDICT r11 #5: the driver writes CORRECTNESS_r{N}.json BEFORE
    bench runs, so deriving the label from it made BENCH_r11 self-label
    round 12 — the round label must come from BENCH artifacts (or the
    env override) only."""
    import bench

    (tmp_path / "BENCH_r11.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r12.json").write_text("{}")  # must be ignored
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert bench._current_round(str(tmp_path)) == 12
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert bench._current_round(str(tmp_path)) == 7


def test_bench_baseline_updates_latest_always_best_only_when_cleaner(tmp_path):
    """BENCH_BASELINE.json (VERDICT r11 #4): latest_clean tracks the
    most recent clean run; best is replaced only by a lower total.
    Records are keyed by (sf, cpus) since r14 (VERDICT r13 #1): a clean
    low-core scaling run lands in its own slot."""
    import json

    import bench

    rec1 = {"round": 11, "value": 90.0, "queries": {"q": 90.0}}
    bench._update_bench_baseline(str(tmp_path), 0.1, rec1)
    rec2 = {"round": 12, "value": 95.0, "queries": {"q": 95.0}}
    bench._update_bench_baseline(str(tmp_path), 0.1, rec2)
    got = json.load(open(tmp_path / "BENCH_BASELINE.json"))["by_sf"]["0.1@32"]
    assert got["latest_clean"]["round"] == 12
    assert got["best"]["value"] == 90.0
    rec3 = {"round": 13, "value": 85.0, "queries": {"q": 85.0}}
    bench._update_bench_baseline(str(tmp_path), 0.1, rec3)
    got = json.load(open(tmp_path / "BENCH_BASELINE.json"))["by_sf"]["0.1@32"]
    assert got["best"]["value"] == 85.0 and got["latest_clean"]["round"] == 13
    # an 8-core record must NOT displace the 32-core one
    rec4 = {"round": 13, "value": 300.0, "queries": {"q": 300.0}}
    bench._update_bench_baseline(str(tmp_path), 0.1, rec4, cpus=8)
    data = json.load(open(tmp_path / "BENCH_BASELINE.json"))["by_sf"]
    assert data["0.1@32"]["latest_clean"]["round"] == 13
    assert data["0.1@32"]["best"]["value"] == 85.0
    assert data["0.1@8"]["latest_clean"]["value"] == 300.0


def test_previous_plan_fps_keyed_by_cpus(tmp_path, monkeypatch):
    """VERDICT r13 #1: the r13 8-core scaling run overwrote the sf-only
    fingerprint baseline, so the next 32-core bench would have diffed
    against 8-core plans (shuffle.partitions follows the core count and
    survives normalization).  The baseline lookup must be (sf, cpus)."""
    import json

    import bench

    (tmp_path / "PLAN_FP_BASELINE.json").write_text(
        json.dumps(
            {
                "by_sf_cpus": {
                    "0.1@8": {"round": 13, "plan_fp": {"q": "aaaa"}},
                    "0.1@32": {"round": 12, "plan_fp": {"q": "bbbb"}},
                }
            }
        )
    )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _p: str(tmp_path / "bench.py")
    )
    assert bench._previous_plan_fps(0.1, 32) == (12, {"q": "bbbb"})
    assert bench._previous_plan_fps(0.1, 8) == (13, {"q": "aaaa"})
    assert bench._previous_plan_fps(0.1, 16) == (-1, {})
