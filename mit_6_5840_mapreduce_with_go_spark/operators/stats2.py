"""One-scan multivariate statistics: chi-square independence over a
contingency table and the full pairwise Pearson correlation matrix from
exact integer moments.

No reference counterpart (SURVEY.md §2.D) — north-star additions.  Both
follow the repo's one-pass moment discipline (profile_orders_columns,
events_ab_welch_t): quantize to integers, accumulate every moment
side-by-side in ONE scan, divide exact integers at the very end.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_CHI2_CRIT_95_DOF = {  # chi-square 95th percentile by dof (public table)
    76: 97.35,  # (5-1)(20-1) for the lang x source grid
}

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "stats_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY 1, 2),
    rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS r FROM o GROUP BY 1),
    ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS c FROM o GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    grid AS (
      SELECT rt.lang, ct.source, coalesce(o.obs, 0) AS obs,
             rt.r * ct.c * 1.0 / n.n AS expected
      FROM rt CROSS JOIN ct CROSS JOIN n
      LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
    cells AS (
      SELECT CAST(floor((obs - expected) * (obs - expected) / expected
                        * 1000000) AS BIGINT) AS contrib_micro
      FROM grid),
    agg AS (SELECT CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro,
                   CAST(count(*) AS BIGINT) AS n_cells FROM cells),
    dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS nr,
                    (SELECT CAST(count(*) AS BIGINT) FROM ct) AS nc)
    SELECT round(chi2_micro / 1000000.0, 4) AS chi2,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           n_cells,
           chi2_micro / 1000000.0 > 97.35 AS reject_independence_95
    FROM agg, dims
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for the (lang, source)
    contingency table: chi2 = sum (O-E)^2/E with E = row*col/N, compared
    against the 95th-percentile critical value for dof=(R-1)(C-1)=76
    (97.35, standard table).  Per-cell contributions are identical
    doubles in both engines (exact-integer inputs, same IEEE ops) and
    are floor-quantized to micros before the SUM, so the statistic is
    association-order-free.  No p-value: that needs the incomplete
    gamma, i.e. libm — the critical-value comparison is the portable
    formulation.

    Scale: the contingency table is a bounded (|langs| x |sources|)
    aggregate with map-side partials; margins and the final sum run
    over the tiny grid.  Independence testing of a 100 TB table costs
    one scan."""
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    grid = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(n))
        .join(o, ["lang", "source"], "left")
        .select(
            F.coalesce("obs", F.lit(0)).alias("obs"),
            (F.col("r") * F.col("c") * 1.0 / F.col("n")).alias("expected"),
        )
    )
    contrib = F.floor(
        (F.col("obs") - F.col("expected"))
        * (F.col("obs") - F.col("expected"))
        / F.col("expected")
        * 1_000_000
    ).cast("long")
    agg = grid.select(contrib.alias("cm")).agg(
        F.sum("cm").alias("chi2_micro"), F.count(F.lit(1)).alias("n_cells")
    )
    dims = rt.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("nc"))
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        F.round(F.col("chi2_micro") / 1_000_000.0, 4).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        "n_cells",
        (F.col("chi2_micro") / 1_000_000.0 > 97.35).alias(
            "reject_independence_95"
        ),
    )


def _corr_moment_cols():
    """All moments needed for every pair, computed side-by-side."""
    singles = [(c, f"s_{c}") for c in _CORR_COLS] + [
        (f"{c} * {c}", f"ss_{c}") for c in _CORR_COLS
    ]
    pairs = [
        (f"{a} * {b}", f"sp_{a}__{b}") for a, b in combinations(_CORR_COLS, 2)
    ]
    return singles + pairs


@query(
    "stats_correlation_matrix",
    oracle=f"""
    WITH q AS (
      SELECT {", ".join(f"CAST(floor(CAST({c} AS DOUBLE) * 100) AS BIGINT) AS {c}"
                        for c in _CORR_COLS)}
      FROM lineitem),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {", ".join(f"CAST(sum(CAST({expr} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS {name}"
                        for expr, name in _corr_moment_cols())}
      FROM q)
    {" UNION ALL ".join(
        f'''SELECT '{a}' AS col_a, '{b}' AS col_b, n,
             round((CAST(n AS DOUBLE) * CAST(sp_{a}__{b} AS DOUBLE)
                    - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                   / (sqrt(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                           - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                             - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
                   6) AS pearson_r
        FROM m''' for a, b in combinations(_CORR_COLS, 2))}
    """,
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric columns, from ONE scan: values quantize to integer cents,
    every moment (4 sums, 4 sums of squares, 6 cross products)
    accumulates side-by-side in exact DECIMAL(38,0), and each r is the
    closed-form moment ratio — identical doubles in both engines.

    Scale: this is the textbook one-pass correlation — a single
    map-side-combinable aggregate over 100 TB, then a 1-row fan-out to
    the C(k,2) pair rows.  Never k passes, never a sort, no sampling."""
    li = load_table(spark, sf_dir, "lineitem").select(
        *[
            F.floor(F.col(c).cast("double") * 100).cast("long").alias(c)
            for c in _CORR_COLS
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for expr, name in _corr_moment_cols():
        aggs.append(F.sum(F.expr(expr).cast("decimal(38,0)")).alias(name))
    m = li.agg(*aggs)
    outs = []
    for a, b in combinations(_CORR_COLS, 2):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        ssa, ssb = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
        sp = F.col(f"sp_{a}__{b}").cast("double")
        r = (n * sp - sa * sb) / (
            F.sqrt(n * ssa - sa * sa) * F.sqrt(n * ssb - sb * sb)
        )
        outs.append(
            m.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n"),
                F.round(r, 6).alias("pearson_r"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionAll(df)
    return out


# --------------------------------------------------------------------------
# Winsorized moments — robust mean/std by clamping at exact p01/p99:
# the outlier-containment transform a metrics pipeline applies before
# z-scoring; reported against the raw moments so the effect is visible.
# --------------------------------------------------------------------------
_WZ_LO, _WZ_HI = 0.01, 0.99


@query(
    "stats_winsorized_moments",
    oracle=f"""
    WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    b AS (SELECT CAST(quantile_disc(c, {_WZ_LO}) AS BIGINT) AS lo,
                 CAST(quantile_disc(c, {_WZ_HI}) AS BIGINT) AS hi FROM v),
    w AS (SELECT least(greatest(v.c, b.lo), b.hi) AS wc, v.c
          FROM v, b),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
                 CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS ss,
                 CAST(sum(CAST(wc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ws,
                 CAST(sum(CAST(wc AS DECIMAL(38,0)) * CAST(wc AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS wss
          FROM w)
    SELECT n,
           round((SELECT lo FROM b) / 100.0, 4) AS p01,
           round((SELECT hi FROM b) / 100.0, 4) AS p99,
           round(CAST(s AS DOUBLE) / n / 100.0, 4) AS mean_raw,
           round(CAST(ws AS DOUBLE) / n / 100.0, 4) AS mean_wins,
           round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
                       * CAST(s AS DOUBLE) / n) / n) / 100.0, 4) AS std_raw,
           round(sqrt((CAST(wss AS DOUBLE) - CAST(ws AS DOUBLE)
                       * CAST(ws AS DOUBLE) / n) / n) / 100.0, 4) AS std_wins
    FROM m
    """,
)
def stats_winsorized_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/std of order totals: clamp at the exact
    DISCRETE p01/p99 (order statistics in integer cents — interpolation
    is deliberately avoided: a cont percentile differs by an ulp across
    engines and flips the clamp), then accumulate raw and clamped
    moments side-by-side
    in exact DECIMAL(38,0) — one extra column pair, not a second scan.
    Winsorized std must shrink; the report shows by how much.

    Scale: the percentile legs are the verification-grade exact path
    (production swaps in the histogram-quantile estimator above for the
    cut points — same clamp plan); the moment pass is one map-side
    combinable aggregate.  All comparisons divide exact integers."""
    v = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    # DISCRETE percentiles (actual order statistics, integer cents):
    # percentile_approx at max accuracy == DuckDB quantile_disc exactly,
    # while interpolated cont percentiles differ by an ulp between
    # engines and flip the clamp for boundary rows (caught by the
    # sf0.01 mirror).
    b = v.agg(
        F.expr(f"percentile_approx(c, {_WZ_LO}, 2147483647)").alias("lo"),
        F.expr(f"percentile_approx(c, {_WZ_HI}, 2147483647)").alias("hi"),
    )
    w = v.crossJoin(F.broadcast(b)).select(
        "c",
        F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi")).alias("wc"),
        "lo",
        "hi",
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    m = w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("c")).alias("s"),
        F.sum(dec("c") * dec("c")).alias("ss"),
        F.sum(dec("wc")).alias("ws"),
        F.sum(dec("wc") * dec("wc")).alias("wss"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    n = F.col("n")
    sd = lambda ss, s: F.sqrt(  # noqa: E731
        (ss.cast("double") - s.cast("double") * s.cast("double") / n) / n
    )
    return m.select(
        "n",
        F.round(F.col("lo") / 100.0, 4).alias("p01"),
        F.round(F.col("hi") / 100.0, 4).alias("p99"),
        F.round(F.col("s").cast("double") / n / 100.0, 4).alias("mean_raw"),
        F.round(F.col("ws").cast("double") / n / 100.0, 4).alias("mean_wins"),
        F.round(sd(F.col("ss"), F.col("s")) / 100.0, 4).alias("std_raw"),
        F.round(sd(F.col("wss"), F.col("ws")) / 100.0, 4).alias("std_wins"),
    )
