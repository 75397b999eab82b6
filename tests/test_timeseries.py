"""Timeseries operators: oracle equality plus the semantic invariants
(grid density, LOCF correctness) that the hash-compare alone would not
explain if they broke."""

from __future__ import annotations

import datetime as dt

from conftest import assert_df_matches_oracle

from mit_6_5840_mapreduce_with_go_spark.registry import ORACLES, QUERIES, load_all

load_all()


def test_twa_matches_oracle(spark, sf_dir, duck):
    df = QUERIES["events_time_weighted_avg"](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES["events_time_weighted_avg"])


def test_gap_fill_matches_oracle(spark, sf_dir, duck):
    df = QUERIES["events_gap_fill_hourly"](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES["events_gap_fill_hourly"])


def test_gap_fill_grid_is_dense_and_locf(spark, sf_dir):
    rows = QUERIES["events_gap_fill_hourly"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r["hour"])
        hours = [dt.datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S") for r in urows]
        # dense: consecutive grid points are exactly 1 hour apart
        for a, b in zip(hours, hours[1:]):
            assert b - a == dt.timedelta(hours=1), user
        # endpoints are observations, not gaps; fill never yields NULL
        assert not urows[0]["is_gap"] and not urows[-1]["is_gap"]
        assert all(r["filled_value"] is not None for r in urows)
        # LOCF: a gap row repeats the previous filled value
        for prev, cur in zip(urows, urows[1:]):
            if cur["is_gap"]:
                assert cur["filled_value"] == prev["filled_value"]


def test_forward_asof_matches_oracle(spark, sf_dir, duck):
    df = QUERIES["asof_join_next_purchase_after_error"](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES["asof_join_next_purchase_after_error"])
    rows = df.collect()
    # left semantics: every probe error appears exactly once
    assert len(rows) == len({r["event_id"] for r in rows})
    # the tolerance window must be NON-vacuous: some match, some don't
    matched = [r for r in rows if r["purchase_event_id"] is not None]
    assert 0 < len(matched) < len(rows)
    assert all(0 <= r["secs_ahead"] <= 24 * 3600 for r in matched)


def test_forward_asof_is_hash_agg_not_window(spark, sf_dir):
    plan = (
        QUERIES["asof_join_next_purchase_after_error"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
