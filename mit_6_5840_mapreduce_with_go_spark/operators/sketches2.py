"""Histogram quantile sketch — completes the sketch family (Count-Min,
HLL, KMV in operators/relational2/3.py) with the streaming/at-scale
quantile estimator: a fixed-width histogram + within-bin interpolation,
evaluated against the exact percentile.

No reference counterpart (SURVEY.md §2.D) — north-star addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_QH_BINS = 512
_QH_PS = [0.5, 0.9, 0.99]


@query(
    "sketch_quantile_histogram",
    oracle=f"""
    WITH v AS (SELECT o_totalprice AS x FROM orders),
    mm AS (SELECT min(x) AS mn, max(x) AS mx,
                  CAST(count(*) AS BIGINT) AS n FROM v),
    b AS (SELECT least({_QH_BINS - 1},
                       CAST(floor((x - mm.mn) * {_QH_BINS}.0
                                  / (mm.mx - mm.mn)) AS BIGINT)) AS bin
          FROM v, mm),
    bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY bin),
    cum AS (SELECT bin, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS below
            FROM bins),
    ps AS (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _QH_PS)}])
                    AS p),
    est AS (
      SELECT ps.p,
             mm.mn + (cum.bin + (ps.p * (mm.n - 1) - cum.below) / cum.cnt)
               * ((mm.mx - mm.mn) / {_QH_BINS}.0) AS est
      FROM ps, mm, cum
      WHERE cum.below <= ps.p * (mm.n - 1)
        AND ps.p * (mm.n - 1) < cum.below + cum.cnt),
    exw AS (SELECT {", ".join(f"quantile_cont(x, {p}) AS e{i}"
                              for i, p in enumerate(_QH_PS))} FROM v),
    ex AS (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _QH_PS)}])
                    AS p,
                  unnest([{", ".join(f"e{i}" for i in range(len(_QH_PS)))}])
                    AS exact
           FROM exw)
    SELECT est.p, round(est.est, 4) AS est, round(ex.exact, 4) AS exact,
           round(abs(est.est - ex.exact) / ex.exact, 6) AS rel_err
    FROM est JOIN ex ON est.p = ex.p
    """,
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a {b}-bin equal-width histogram with
    within-bin linear interpolation (target rank (n-1)p, the same rank
    convention as the exact percentile), reported next to the exact
    quantile and the relative error.

    Cross-engine determinism: the bucket expression keeps the exact
    IEEE association of events_value_histogram; rank arithmetic and the
    interpolation divide identically-derived doubles.  Spark's
    `percentile` and DuckDB's `quantile_cont` share the (n-1)p linear
    definition, and results round at 4 decimals (a last-ulp divergence
    at ~1e5 magnitude is 1e-11 — far below the rounding).

    Scale: this is THE quantile pattern for 100 TB — two
    map-side-combinable passes (min/max, then {b} bin counts), a window
    over the {b}-row bin table, never a sort of the data.  The exact
    companion (a per-group sorted aggregate, memory-bound at scale) is
    the small-SF verification leg; production keeps only the histogram
    path, with accuracy bounded by bin width.
    """.format(b=_QH_BINS)
    v = load_table(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("x"))
    mm = v.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    b = v.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(_QH_BINS - 1),
            F.floor(
                (F.col("x") - F.col("mn")) * float(_QH_BINS) / (F.col("mx") - F.col("mn"))
            ).cast("long"),
        ).alias("bin")
    )
    bins = b.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy(F.lit(0)).orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    cum = bins.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    ps = spark.createDataFrame([(p,) for p in _QH_PS], "p double")
    target = F.col("p") * (F.col("n") - 1)
    est = (
        cum.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(mm))
        .filter((F.col("below") <= target) & (target < F.col("below") + F.col("cnt")))
        .select(
            "p",
            (
                F.col("mn")
                + (F.col("bin") + (target - F.col("below")) / F.col("cnt"))
                * ((F.col("mx") - F.col("mn")) / float(_QH_BINS))
            ).alias("est"),
        )
    )
    # percentile() needs a foldable fraction — aggregate all three
    # side-by-side in ONE pass, then unpivot the 1-row result
    ex_wide = v.agg(
        *[
            F.expr(f"percentile(x, {p})").alias(f"e{i}")
            for i, p in enumerate(_QH_PS)
        ]
    )
    stack_expr = ", ".join(
        f"CAST({p} AS DOUBLE), e{i}" for i, p in enumerate(_QH_PS)
    )
    ex = ex_wide.select(
        F.expr(f"stack({len(_QH_PS)}, {stack_expr}) AS (p, exact)")
    )
    return (
        est.join(ex, "p")
        .select(
            "p",
            F.round("est", 4).alias("est"),
            F.round("exact", 4).alias("exact"),
            F.round(F.abs(F.col("est") - F.col("exact")) / F.col("exact"), 6).alias(
                "rel_err"
            ),
        )
    )
