"""chi-square + correlation matrix: oracle parity and numpy/scipy-free
Python replicas."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators import stats2 as S2
from mit_6_5840_mapreduce_with_go_spark.registry import ORACLES
from mit_6_5840_mapreduce_with_go_spark.sources import load_table

from conftest import assert_df_matches_oracle


def test_chi2_matches_oracle(spark, sf_dir, duck):
    assert_df_matches_oracle(
        S2.stats_chi2_independence(spark, sf_dir), duck,
        ORACLES["stats_chi2_independence"],
    )


def test_chi2_python_replica(spark, sf_dir):
    rows = load_table(spark, sf_dir, "documents").select("lang", "source").collect()
    from collections import Counter

    o = Counter((r["lang"], r["source"]) for r in rows)
    rt = Counter(r["lang"] for r in rows)
    ct = Counter(r["source"] for r in rows)
    n = len(rows)
    chi2_micro = 0
    for lang in rt:
        for src in ct:
            e = rt[lang] * ct[src] * 1.0 / n
            obs = o.get((lang, src), 0)
            chi2_micro += int((obs - e) * (obs - e) / e * 1_000_000)
    got = S2.stats_chi2_independence(spark, sf_dir).collect()[0]
    assert got["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert got["n_cells"] == len(rt) * len(ct)
    assert abs(got["chi2"] - chi2_micro / 1_000_000.0) < 1e-3


def test_corr_matches_oracle(spark, sf_dir, duck):
    assert_df_matches_oracle(
        S2.stats_correlation_matrix(spark, sf_dir), duck,
        ORACLES["stats_correlation_matrix"],
    )


def test_corr_python_replica(spark, sf_dir):
    import math

    rows = load_table(spark, sf_dir, "lineitem").select(*S2._CORR_COLS).collect()
    q = {
        c: [int(math.floor(float(r[c]) * 100)) for r in rows] for c in S2._CORR_COLS
    }
    got = {
        (r["col_a"], r["col_b"]): r["pearson_r"]
        for r in S2.stats_correlation_matrix(spark, sf_dir).collect()
    }
    from itertools import combinations

    for a, b in combinations(S2._CORR_COLS, 2):
        xa, xb = q[a], q[b]
        n = len(xa)
        sa, sb = sum(xa), sum(xb)
        ssa, ssb = sum(v * v for v in xa), sum(v * v for v in xb)
        sp = sum(x * y for x, y in zip(xa, xb))
        r = (n * sp - sa * sb) / (
            math.sqrt(n * ssa - sa * sa) * math.sqrt(n * ssb - sb * sb)
        )
        assert abs(got[(a, b)] - round(r, 6)) < 1e-5
        assert -1.0 <= got[(a, b)] <= 1.0


def test_winsorized_matches_oracle(spark, sf_dir, duck):
    assert_df_matches_oracle(
        S2.stats_winsorized_moments(spark, sf_dir), duck,
        ORACLES["stats_winsorized_moments"],
    )


def test_winsorized_shrinks_std(spark, sf_dir):
    r = S2.stats_winsorized_moments(spark, sf_dir).collect()[0]
    assert r["p01"] <= r["p99"]
    assert r["std_wins"] <= r["std_raw"]
    assert r["p01"] <= r["mean_wins"] <= r["p99"]
