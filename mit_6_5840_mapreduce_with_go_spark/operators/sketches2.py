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
                                  / greatest(mm.mx - mm.mn, 1e-12))
                            AS BIGINT)) AS bin
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
                (F.col("x") - F.col("mn"))
                * float(_QH_BINS)
                # greatest(span, eps): a constant column (mx == mn) would
                # make every bin NULL/Inf; with the guard all rows land in
                # bin 0 and the estimate degenerates to mn — defined, and
                # identical in both engines.
                / F.greatest(F.col("mx") - F.col("mn"), F.lit(1e-12))
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


# --------------------------------------------------------------------------
# Sliding-window Count-Min merge: CMS is LINEAR, so per-hour sketches
# sum into any window — the mergeability property that makes sketches
# the distributed answer (per-partition build, associative combine).
# Evaluated against the exact trailing counts for a probe user set.
# --------------------------------------------------------------------------
_CMS_D = 2  # rows
_CMS_W = 32  # counters per row
_CMS_WIN_H = 6  # trailing window, hours
_CMS_PROBE = 10  # probe users: user_id < 10
_CMS_A = [2654435761 % 999983, 97531]
_CMS_B = [15485863, 32452843]
_CMS_P = 999983


def _cms_idx(row: int, key: str) -> str:
    return (
        f"(({_CMS_A[row]} * ({key} % {_CMS_P}) + {_CMS_B[row]})"
        f" % {_CMS_P}) % {_CMS_W}"
    )


@query(
    "sketch_cms_sliding_counts",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      FROM events),
    hours AS (SELECT DISTINCT h FROM ev),
    raw AS (
      SELECT h, r, idx, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT h, 0 AS r, {_cms_idx(0, "user_id")} AS idx FROM ev
        UNION ALL
        SELECT h, 1 AS r, {_cms_idx(1, "user_id")} AS idx FROM ev)
      GROUP BY 1, 2, 3),
    -- densify: a sliding window over SPARSE counter rows would miss
    -- hours with no new arrivals for that cell
    cells AS (SELECT hours.h, t.r, u.idx
              FROM hours,
                   unnest([0, 1]) AS t(r),
                   unnest(generate_series(0, {_CMS_W - 1})) AS u(idx)),
    counters AS (
      SELECT cells.h, cells.r, cells.idx, coalesce(raw.c, 0) AS c
      FROM cells LEFT JOIN raw
        ON raw.h = cells.h AND raw.r = cells.r AND raw.idx = cells.idx),
    summed AS (
      SELECT h, r, idx,
             CAST(sum(c) OVER (PARTITION BY r, idx ORDER BY h
               RANGE BETWEEN {_CMS_WIN_H - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cw
      FROM counters),
    probes AS (SELECT DISTINCT user_id, {_cms_idx(0, "user_id")} AS idx0,
                      {_cms_idx(1, "user_id")} AS idx1
               FROM ev WHERE user_id < {_CMS_PROBE}),
    grid AS (SELECT p.user_id, p.idx0, p.idx1, hours.h
             FROM probes p CROSS JOIN hours),
    est AS (
      SELECT g.user_id, g.h, least(s0.cw, s1.cw) AS est
      FROM grid g
      JOIN summed s0 ON s0.h = g.h AND s0.r = 0 AND s0.idx = g.idx0
      JOIN summed s1 ON s1.h = g.h AND s1.r = 1 AND s1.idx = g.idx1),
    peru AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS c
             FROM ev WHERE user_id < {_CMS_PROBE} GROUP BY 1, 2),
    exact AS (
      SELECT g.user_id, g.h,
             CAST(sum(coalesce(p.c, 0)) OVER (PARTITION BY g.user_id
               ORDER BY g.h RANGE BETWEEN {_CMS_WIN_H - 1} PRECEDING
               AND CURRENT ROW) AS BIGINT) AS exact
      FROM grid g LEFT JOIN peru p ON p.user_id = g.user_id AND p.h = g.h)
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(x.exact) AS BIGINT) AS total_exact,
           CAST(sum(e.est) AS BIGINT) AS total_est,
           CAST(min(e.est - x.exact) AS BIGINT) >= 0 AS never_underestimates,
           CAST(max(e.est - x.exact) AS BIGINT) AS max_overestimate
    FROM est e JOIN exact x ON x.user_id = e.user_id AND x.h = e.h
    GROUP BY e.user_id
    """,
)
def sketch_cms_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window frequency estimation by MERGING per-hour Count-Min
    sketches: each hour builds a d={d} x w={w} counter grid; because CMS
    is a linear sketch, the trailing-{win}h sketch is just the
    RANGE-window SUM of hourly counters — no re-scan of raw events.
    The counter grid is DENSIFIED over (hour, row, idx) first: a sliding
    window over sparse counter rows silently misses hours where a cell
    received no new arrivals (found by the oracle during development —
    the exact bug class this harness exists to catch).  Probe users
    (user_id < {p}) are then estimated as min-over-rows and scored
    against the exact trailing counts: per user, totals, the
    never-underestimates guarantee, and the worst overestimate.

    Scale: hourly counters are a bounded (hour x {d} x {w}) grid
    REGARDLESS of event volume (24*365*{d}*{w} rows/year); the sliding
    merge is a keyed window over that grid, never the data; the probe is
    a broadcast-sized join.  This is the pattern for continuous
    monitoring at 100 TB/day: tiny linear sketches per partition/hour,
    combined associatively for ANY window.  All arithmetic is exact
    integers — both engines agree bit-for-bit.
    """.format(d=_CMS_D, w=_CMS_W, win=_CMS_WIN_H, p=_CMS_PROBE)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    )
    from functools import reduce

    row_dfs = [
        ev.select(
            "h", F.lit(r).alias("r"), F.expr(_cms_idx(r, "user_id")).alias("idx")
        )
        for r in range(_CMS_D)
    ]
    raw = (
        reduce(lambda a, b: a.unionAll(b), row_dfs)
        .groupBy("h", "r", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hours = ev.select("h").distinct()
    cells = (
        hours.crossJoin(spark.range(_CMS_D).select(F.col("id").alias("r")))
        .crossJoin(spark.range(_CMS_W).select(F.col("id").alias("idx")))
    )
    counters = cells.join(raw, ["h", "r", "idx"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    win = (
        W.partitionBy("r", "idx")
        .orderBy("h")
        .rangeBetween(-(_CMS_WIN_H - 1), 0)
    )
    summed = counters.withColumn("cw", F.sum("c").over(win))
    probes = (
        ev.filter(F.col("user_id") < _CMS_PROBE)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            *[
                F.expr(_cms_idx(r, "user_id")).alias(f"idx{r}")
                for r in range(_CMS_D)
            ],
        )
    )
    g = probes.crossJoin(hours)
    for r in range(_CMS_D):
        s_r = summed.filter(F.col("r") == r).select(
            F.col("h"), F.col("idx").alias(f"idx{r}"), F.col("cw").alias(f"cw{r}")
        )
        g = g.join(s_r, ["h", f"idx{r}"])
    est = g.select(
        "user_id",
        "h",
        F.least(*[F.col(f"cw{r}") for r in range(_CMS_D)]).alias("est"),
    )
    peru = (
        ev.filter(F.col("user_id") < _CMS_PROBE)
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exw = W.partitionBy("user_id").orderBy("h").rangeBetween(-(_CMS_WIN_H - 1), 0)
    exact = (
        probes.select("user_id")
        .crossJoin(hours)
        .join(peru, ["user_id", "h"], "left")
        .withColumn("cx", F.coalesce("c", F.lit(0)))
        .withColumn("exact", F.sum("cx").over(exw))
        .select("user_id", "h", "exact")
    )
    j = est.join(exact, ["user_id", "h"])
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("exact").alias("total_exact"),
        F.sum("est").alias("total_est"),
        (F.min(F.col("est") - F.col("exact")) >= 0).alias("never_underestimates"),
        F.max(F.col("est") - F.col("exact")).alias("max_overestimate"),
    )


# --------------------------------------------------------------------------
# Sliding-window HLL union: the MAX-merge counterpart of the CMS
# sum-merge above — HyperLogLog registers combine under max, so per-hour
# register grids union into any window without touching raw events.
# --------------------------------------------------------------------------
_HLL_M = 64  # registers (bucket = low 6 bits of the hash)
_HLL_ALPHA = 0.709  # alpha_64 (standard HLL constant for m=64)
_HLL_WIN_H = 6
_HLL_HASH_A, _HLL_HASH_B, _HLL_HASH_P = 48271, 11213, 2147483647


def _hll_hash(key: str) -> str:
    return f"(({_HLL_HASH_A} * ({key} % {_HLL_HASH_P}) + {_HLL_HASH_B}) % {_HLL_HASH_P})"


def _hll_rho_duck(h: str) -> str:
    # rho = 1 + trailing zeros of the hash's bucket-stripped bits,
    # via the binary-string trick (no libm, identical both engines)
    s = f"bin({h} // {_HLL_M})"
    return f"(1 + length({s}) - length(rtrim({s}, '0')))"


def _hll_rho_spark(h: str) -> str:
    s = f"conv(CAST({h} div {_HLL_M} AS STRING), 10, 2)"
    return f"(1 + length({s}) - length(rtrim('0', {s})))"


@query(
    "sketch_hll_sliding_union",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      FROM events),
    hashed AS (
      SELECT h, {_hll_hash("user_id")} % {_HLL_M} AS bucket,
             {_hll_rho_duck(_hll_hash("user_id"))} AS rho
      FROM ev),
    hourly AS (
      SELECT h, bucket, CAST(max(rho) AS BIGINT) AS r
      FROM hashed GROUP BY 1, 2),
    hours AS (SELECT DISTINCT h FROM ev),
    cells AS (SELECT hours.h, u.bucket
              FROM hours, unnest(generate_series(0, {_HLL_M - 1})) AS u(bucket)),
    dense AS (
      SELECT cells.h, cells.bucket, coalesce(hourly.r, 0) AS r
      FROM cells LEFT JOIN hourly
        ON hourly.h = cells.h AND hourly.bucket = cells.bucket),
    merged AS (
      SELECT h, bucket,
             CAST(max(r) OVER (PARTITION BY bucket ORDER BY h
               RANGE BETWEEN {_HLL_WIN_H - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS rw
      FROM dense),
    est AS (
      SELECT h,
             {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
               / sum(power(2.0, -rw)) AS raw_est
      FROM merged GROUP BY h),
    exact AS (
      SELECT g.h, CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact
      FROM hours g JOIN ev e ON e.h BETWEEN g.h - {_HLL_WIN_H - 1} AND g.h
      GROUP BY g.h)
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(exact) AS BIGINT) AS total_exact,
           round(CAST(sum(CAST(floor(abs(raw_est - exact) / exact * 1000000)
                              AS BIGINT)) AS BIGINT)
                 / (count(*) * 1000000.0), 4) AS mean_rel_err,
           round(max(abs(raw_est - exact) / exact), 4) AS max_rel_err
    FROM est JOIN exact USING (h)
    """,
)
def sketch_hll_sliding_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct-user estimation by UNIONING per-hour
    HyperLogLog register grids: registers merge under element-wise max,
    so the trailing-{win}h sketch is a RANGE-window MAX over the densified
    (hour x {m}) register grid — the max-merge twin of the CMS sum-merge
    above, and the reason HLL unions are free across partitions, hours,
    or cluster nodes.  The raw HLL estimator alpha*m^2/sum(2^-R) is
    used WITHOUT the small-range ln() correction: 2^-R terms are exact
    dyadic doubles (their sums are exact in any association order), so
    the whole estimate is bit-identical cross-engine, while ln() would
    reintroduce libm ulp skew.  Scored against exact sliding distinct
    counts (mean/max relative error across all windows; raw-estimator
    bias at small cardinalities is visible and honest).

    Scale: per-hour registers are a bounded (hour x {m}) grid whatever
    the event volume; the merge window runs over the grid, never the
    data; the exact companion (a range self-join) is the small-SF
    verification leg only.  rho() is computed with the binary-string
    trailing-zeros trick — string ops, no libm, no UDF.
    """.format(win=_HLL_WIN_H, m=_HLL_M)
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .distinct()
    )
    hexpr = _hll_hash("user_id")
    hashed = ev.select(
        "h",
        F.expr(f"{hexpr} % {_HLL_M}").alias("bucket"),
        F.expr(_hll_rho_spark(hexpr)).alias("rho"),
    )
    hourly = hashed.groupBy("h", "bucket").agg(F.max("rho").alias("r"))
    hours = ev.select("h").distinct()
    cells = hours.crossJoin(spark.range(_HLL_M).select(F.col("id").alias("bucket")))
    dense = cells.join(hourly, ["h", "bucket"], "left").withColumn(
        "r", F.coalesce("r", F.lit(0))
    )
    win = (
        W.partitionBy("bucket").orderBy("h").rangeBetween(-(_HLL_WIN_H - 1), 0)
    )
    merged = dense.withColumn("rw", F.max("r").over(win))
    est = merged.groupBy("h").agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("rw")))
        ).alias("raw_est")
    )
    e2 = ev.select(F.col("h").alias("eh"), "user_id")
    exact = (
        hours.join(
            e2,
            (F.col("eh") >= F.col("h") - (_HLL_WIN_H - 1)) & (F.col("eh") <= F.col("h")),
        )
        .groupBy("h")
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    j = est.join(exact, "h")
    rel = F.abs(F.col("raw_est") - F.col("exact")) / F.col("exact")
    # mean over integer-micro quantized rel: a plain avg() of doubles is
    # association-order-sensitive across partitions (latent hash-compare
    # hazard); the max() of identical doubles is order-free
    rel_micro = F.floor(rel * 1_000_000).cast("long")
    return j.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("exact").alias("total_exact"),
        F.round(
            F.sum(rel_micro) / (F.count(F.lit(1)) * 1_000_000.0), 4
        ).alias("mean_rel_err"),
        F.round(F.max(rel), 4).alias("max_rel_err"),
    )
