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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

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
           CASE WHEN (nr - 1) * (nc - 1) = 76
                THEN chi2_micro / 1000000.0 > 97.35 END
             AS reject_independence_95_dof76
    FROM agg, dims
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for the (lang, source)
    contingency table: chi2 = sum (O-E)^2/E with E = row*col/N, compared
    against the 95th-percentile critical value for dof=(R-1)(C-1)=76
    (97.35, standard table; the verdict column is NULL if the data's
    cardinalities ever make dof differ from 76 — better than a silently
    wrong comparison).  Per-cell contributions are identical
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
        # the 97.35 critical value is the 95th percentile for dof=76
        # (the (5 langs - 1) x (20 sources - 1) grid); NULL rather than a
        # wrong verdict if the data's cardinalities ever change
        F.when(
            (F.col("nr") - 1) * (F.col("nc") - 1) == 76,
            F.col("chi2_micro") / 1_000_000.0 > 97.35,
        ).alias("reject_independence_95_dof76"),
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


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov via binned CDFs — the distribution-drift
# test for continuous columns (chi-square above covers categorical).
# --------------------------------------------------------------------------
_KS_BINS = 256
_KS_A, _KS_B = "click", "purchase"  # compare value distributions
# critical coefficient c(alpha) for alpha=0.05 (public KS table)
_KS_C05 = 1.358


@query(
    "stats_ks_two_sample",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND event_type IN ('{_KS_A}', '{_KS_B}')),
    mm AS (SELECT min(value) AS mn, max(value) AS mx FROM v),
    b AS (
      SELECT event_type,
             least({_KS_BINS - 1},
                   CAST(floor((value - mm.mn) * {_KS_BINS}.0
                              / greatest(mm.mx - mm.mn, 1e-12))
                        AS BIGINT)) AS bin
      FROM v, mm),
    counts AS (
      SELECT bin,
             CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM b GROUP BY bin),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM counts),
    cdf AS (
      SELECT bin,
             CAST(sum(ca) OVER (ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
             CAST(sum(cb) OVER (ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
      FROM counts),
    d AS (
      SELECT max(abs(cuma * 1.0 / tot.na - cumb * 1.0 / tot.nb)) AS ks_d
      FROM cdf, tot)
    SELECT round(d.ks_d, 6) AS ks_d,
           tot.na AS n_a, tot.nb AS n_b,
           round({_KS_C05} * sqrt((tot.na + tot.nb) * 1.0
                                  / (tot.na * tot.nb)), 6) AS crit_05,
           d.ks_d > {_KS_C05} * sqrt((tot.na + tot.nb) * 1.0
                                     / (tot.na * tot.nb))
             AS reject_same_dist_05
    FROM d, tot
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over {b}-bin CDFs: D = max |F_a -
    F_b| between the '{ea}' and '{eb}' value distributions, with the
    alpha=0.05 decision D > c * sqrt((n+m)/nm) (c={c}, standard table;
    sqrt is IEEE-correctly-rounded, not libm-approximated, so the
    verdict is deterministic).  Binning makes D a max over exact-integer
    CDF ratios — the at-scale KS (the exact test needs a global sort of
    both samples; the binned D under-estimates by at most one bin's
    mass, the standard trade).

    Scale: one shared min/max pass, one (bin, type) count aggregate,
    CDFs + max over the {b}-row bin table.  Drift-testing two 100 TB
    cohorts costs two scans.
    """.format(b=_KS_BINS, ea=_KS_A, eb=_KS_B, c=_KS_C05)
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isin(_KS_A, _KS_B))
        .select("event_type", "value")
    )
    mm = v.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = v.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.least(
            F.lit(_KS_BINS - 1),
            F.floor(
                (F.col("value") - F.col("mn"))
                * float(_KS_BINS)
                # guarded span: an all-equal value column yields bin 0 for
                # every row (D = 0) instead of NULL/Inf bins
                / F.greatest(F.col("mx") - F.col("mn"), F.lit(1e-12))
            ),
        )
        .cast("long")
        .alias("bin"),
    )
    counts = b.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = W.partitionBy(F.lit(0)).orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    cdf = counts.select(
        "bin",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    d = (
        cdf.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("cuma") * 1.0 / F.col("na")
                - F.col("cumb") * 1.0 / F.col("nb")
            ).alias("diff")
        )
        .agg(F.max("diff").alias("ks_d"))
    )
    crit = F.lit(_KS_C05) * F.sqrt(
        (F.col("na") + F.col("nb")) * 1.0 / (F.col("na") * F.col("nb"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        F.round("ks_d", 6).alias("ks_d"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("ks_d") > crit).alias("reject_same_dist_05"),
    )


# --------------------------------------------------------------------------
# Lorenz curve / Gini coefficient of revenue concentration — the
# inequality statistic behind "top X% of customers drive Y% of revenue".
# --------------------------------------------------------------------------
_GINI_BINS = 256


@query(
    "stats_lorenz_gini",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM rev),
    b AS (
      SELECT least({_GINI_BINS - 1},
                   CAST(((cents - mm.mn) * {_GINI_BINS})
                        // (mm.mx - mm.mn + 1) AS BIGINT)) AS bin,
             cents
      FROM rev, mm),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM b GROUP BY bin),
    cum AS (
      SELECT bin, n, s,
             CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cn,
             CAST(sum(s) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cs
      FROM bins),
    tt AS (SELECT max(cn) AS tn, max(cs) AS ts FROM cum),
    -- trapezoid area under the binned Lorenz curve, x = pop share,
    -- y = revenue share; all terms exact integers scaled by 2*tn*ts
    area2 AS (
      SELECT CAST(sum(n * (2 * cs - s)) AS BIGINT) AS a2 FROM cum)
    SELECT (SELECT tn FROM tt) AS n_customers,
           round((SELECT ts FROM tt) / 100.0, 2) AS total_revenue,
           round(1.0 - CAST((SELECT a2 FROM area2) AS DOUBLE)
                       / ((SELECT tn FROM tt) * 1.0
                          * (SELECT ts FROM tt)), 6) AS gini
    """,
)
def stats_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue from a {b}-bin Lorenz
    curve: customers bucket by revenue (integer arithmetic), the Lorenz
    curve is the cumulative (population share, revenue share) polyline
    over ascending bins, and Gini = 1 - 2*AUC via the trapezoid rule —
    the numerator sum(n_b * (2*cum_s_b - s_b)) stays an exact integer,
    so both engines divide the same numbers.

    Scale: per-customer revenue is one map-side-combinable aggregate;
    the curve runs over the {b}-row bin table (the exact Gini needs a
    global sort by revenue; binning bounds the error by one bin's
    share).  Concentration analysis of a 100 TB ledger is two passes.
    """.format(b=_GINI_BINS)
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    mm = rev.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    b = rev.crossJoin(F.broadcast(mm)).select(
        F.expr(f"least({_GINI_BINS - 1},"
               f" ((cents - mn) * {_GINI_BINS}) div (mx - mn + 1))").alias("bin"),
        "cents",
    )
    bins = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    w = W.partitionBy(F.lit(0)).orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = bins.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    tt = cum.agg(F.max("cn").alias("tn"), F.max("cs").alias("ts"))
    area2 = cum.agg(F.sum(F.col("n") * (2 * F.col("cs") - F.col("s"))).alias("a2"))
    return (
        area2.crossJoin(F.broadcast(tt))
        .select(
            F.col("tn").alias("n_customers"),
            F.round(F.col("ts") / 100.0, 2).alias("total_revenue"),
            F.round(
                1.0 - F.col("a2").cast("double") / (F.col("tn") * 1.0 * F.col("ts")),
                6,
            ).alias("gini"),
        )
    )


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval — THE distributed bootstrap
# (resampling n rows with replacement needs global coordination; giving
# every row an independent Poisson(1) weight per replica does not).
# Weights here come from a deterministic hash so the driver can verify
# the whole pipeline; swapping in true Poisson draws is one expression.
# --------------------------------------------------------------------------
_PB_B = 32  # bootstrap replicas
_PB_A, _PB_C, _PB_D, _PB_P = 48271, 12345, 67891, 999983
# integer-micro thresholds approximating Poisson(1) pmf:
# P(0)=P(1)=0.367879, P(2)=0.183939, P(3)=rest (tail lumped)
_PB_T0, _PB_T1, _PB_T2 = 367879, 735758, 919697


@query(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
    WITH v AS (SELECT o_orderkey AS k,
                      CAST(floor(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    reps AS (SELECT unnest(generate_series(0, {_PB_B - 1})) AS b),
    wtd AS (
      SELECT reps.b, v.c,
             CASE WHEN u < {_PB_T0} THEN 0
                  WHEN u < {_PB_T1} THEN 1
                  WHEN u < {_PB_T2} THEN 2
                  ELSE 3 END AS w
      FROM v CROSS JOIN reps,
           LATERAL (SELECT ({_PB_A} * (v.k % {_PB_P}) + {_PB_C} * reps.b
                            + {_PB_D}) % {_PB_P} AS u) t),
    means AS (
      SELECT b,
             CAST(sum(w * c) AS BIGINT) * 1.0
               / (CAST(sum(w) AS BIGINT) * 100.0) AS mean_b
      FROM wtd GROUP BY b),
    full_m AS (
      SELECT CAST(sum(c) AS BIGINT) * 1.0 / (count(*) * 100.0) AS est FROM v)
    SELECT round((SELECT est FROM full_m), 4) AS estimate,
           CAST(count(*) AS BIGINT) AS n_replicas,
           round(quantile_disc(mean_b, 0.05), 4) AS ci_lo,
           round(quantile_disc(mean_b, 0.95), 4) AS ci_hi
    FROM means
    """,
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 90% CI for the mean order total: every row gets
    an independent pseudo-Poisson(1) weight per replica (hash-thresholded
    into 0/1/2/3 — deterministic for the oracle; a production run swaps
    in true Poisson draws, same plan), each of the {b} replicas reduces
    to an exact integer-weighted mean, and the CI is the DISCRETE
    p05/p95 of the replica means (order statistics — cont interpolation
    would reintroduce the cross-engine ulp hazard).

    Scale: this is why the Poisson bootstrap exists — classic resampling
    needs to know n and coordinate draws; here each row independently
    weights itself, so the whole bootstrap is ONE pass producing {b}
    weighted partial aggregates (map-side combinable), no shuffles of
    the data beyond the {b}-group reduce.  Bootstrap CIs over 100 TB
    cost one scan.
    """.format(b=_PB_B)
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    reps = spark.range(_PB_B).select(F.col("id").alias("b"))
    u = (F.lit(_PB_A) * (F.col("k") % _PB_P) + F.lit(_PB_C) * F.col("b") + _PB_D) % _PB_P
    w = (
        F.when(u < _PB_T0, 0)
        .when(u < _PB_T1, 1)
        .when(u < _PB_T2, 2)
        .otherwise(3)
    )
    means = (
        v.crossJoin(F.broadcast(reps))
        .select("b", "c", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("c")) * 1.0
                / (F.sum("w") * 100.0)
            ).alias("mean_b")
        )
    )
    full_m = v.agg(
        (F.sum("c") * 1.0 / (F.count(F.lit(1)) * 100.0)).alias("est")
    )
    return (
        means.agg(
            F.count(F.lit(1)).alias("n_replicas"),
            F.expr("percentile_approx(mean_b, 0.05, 2147483647)").alias("lo"),
            F.expr("percentile_approx(mean_b, 0.95, 2147483647)").alias("hi"),
        )
        .crossJoin(F.broadcast(full_m))
        .select(
            F.round("est", 4).alias("estimate"),
            "n_replicas",
            F.round("lo", 4).alias("ci_lo"),
            F.round("hi", 4).alias("ci_hi"),
        )
    )


# --------------------------------------------------------------------------
# Difference-in-differences — the workhorse quasi-experimental estimator:
# compare outcome changes across a cutoff between a treated and a
# control cohort; the double difference cancels both group-level and
# period-level confounds.
# --------------------------------------------------------------------------
_DID_CUT = "2024-01-16 00:00:00"
_DID_TREAT_FIRST = "error"  # treated: users whose first event is an error


@query(
    "stats_diff_in_diff",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, event_type AS first_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1),
    x AS (
      SELECT CASE WHEN f.first_type = '{_DID_TREAT_FIRST}'
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN e.ts >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END
               AS post,
             CAST(floor(e.value * 1000000) AS BIGINT) AS vm
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.value IS NOT NULL),
    cells AS (
      SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s
      FROM x GROUP BY treated, post),
    m AS (
      SELECT
        (SELECT CAST(s AS DOUBLE) / n / 1000000.0 FROM cells
         WHERE treated = 1 AND post = 0) AS t_pre,
        (SELECT CAST(s AS DOUBLE) / n / 1000000.0 FROM cells
         WHERE treated = 1 AND post = 1) AS t_post,
        (SELECT CAST(s AS DOUBLE) / n / 1000000.0 FROM cells
         WHERE treated = 0 AND post = 0) AS c_pre,
        (SELECT CAST(s AS DOUBLE) / n / 1000000.0 FROM cells
         WHERE treated = 0 AND post = 1) AS c_post,
        (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS n_obs)
    SELECT round(t_pre, 6) AS treated_pre, round(t_post, 6) AS treated_post,
           round(c_pre, 6) AS control_pre, round(c_post, 6) AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate,
           n_obs
    FROM m
    """,
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on event values: treated = users whose
    FIRST event (by ts, event_id — deterministic) is an
    '{t}'; periods split at {c}.  DiD = (treated_post - treated_pre) -
    (control_post - control_pre) — the parallel-trends double
    difference.  All four cell means are exact-integer-micro sums over
    exact counts, so the estimate is identical cross-engine.

    Scale: cohort assignment is one arg-min groupBy (struct-min
    hash-agg, no window); the 2x2 cell table is a map-side-combinable
    aggregate over the joined stream (user cohort broadcast if small,
    shuffle-joined otherwise).  Causal dashboards over 100 TB = two
    aggregates.
    """.format(t=_DID_TREAT_FIRST, c=_DID_CUT)
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.struct("ts", "event_id", F.col("event_type").alias("t"))
            ).alias("b")
        )
        .select("user_id", F.col("b.t").alias("first_type"))
    )
    x = (
        ev.filter(F.col("value").isNotNull())
        .join(firsts, "user_id")
        .select(
            F.when(F.col("first_type") == _DID_TREAT_FIRST, 1)
            .otherwise(0)
            .alias("treated"),
            F.when(
                F.col("ts") >= F.lit(_DID_CUT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
        )
    )
    cells = x.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vm").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n") / 1_000_000.0
    # collect the 2x2 cells via conditional aggregation in one pass
    agg = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), mean
                )
            ).alias(f"m_{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        F.sum("n").alias("n_obs"),
    )
    return agg.select(
        F.round(F.col("m_10"), 6).alias("treated_pre"),
        F.round(F.col("m_11"), 6).alias("treated_post"),
        F.round(F.col("m_00"), 6).alias("control_pre"),
        F.round(F.col("m_01"), 6).alias("control_post"),
        F.round(
            (F.col("m_11") - F.col("m_10")) - (F.col("m_01") - F.col("m_00")), 6
        ).alias("did_estimate"),
        "n_obs",
    )
