"""Model-evaluation operators at corpus scale: histogram AUC, calibration
(reliability) bins, and a threshold sweep — the eval loop of a quality
classifier inside a training-data pipeline.

No reference counterpart (SURVEY.md §2.D) — north-star additions.  The
scored model is the repo's fastText-shape hashed-feature linear classifier
(`text_quality_classifier_linear`, integer-micro logits); the ground-truth
label is `lang = 'en'` so the metrics exercise a real (imperfect)
classifier, which is exactly what an eval harness must handle.

Cross-engine determinism rules used throughout:
- scores are integer micro-logits, so binning/thresholding is integer
  arithmetic (no float boundary hazards);
- probabilities use the ALGEBRAIC sigmoid 0.5 + 0.5*s/(|s|+K) — plain
  IEEE +,*,/ which both engines evaluate bit-identically — instead of
  libm exp() whose last-ulp differs between the JVM and C++ and would
  flip floor()/round() at bin boundaries;
- every mean/ratio is (exact integer) / (exact integer) as one double op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

from .curation3 import _TOKEN_WEIGHT_DUCK, _TOKEN_WEIGHT_SPARK

_AUC_BINS = 256
_POS_LANG = "en"
_SIG_K = 200_000  # algebraic-sigmoid scale, micro units
_CAL_BINS = 10
# threshold sweep: 9 evenly spaced micro-logit cutoffs
_THR_LO, _THR_HI, _THR_STEP = -300_000, 300_000, 75_000

_SCORED_DUCK = f"""
      SELECT doc_id,
             CAST(list_sum(list_transform(string_split(text, ' '),
                  t -> {_TOKEN_WEIGHT_DUCK})) AS BIGINT) AS s,
             CASE WHEN lang = '{_POS_LANG}' THEN 1 ELSE 0 END AS y
      FROM documents"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s BIGINT micro-logit, y 0/1 label) — one codegen'd
    projection over the scan, identical to the classifier op."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    logit = F.expr(
        f"aggregate(split(text, ' '), CAST(0 AS BIGINT),"
        f" (acc, t) -> acc + ({_TOKEN_WEIGHT_SPARK}))"
    )
    return docs.select(
        "doc_id",
        logit.alias("s"),
        F.when(F.col("lang") == _POS_LANG, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )


@query(
    "eval_quality_auc",
    oracle=f"""
    WITH scored AS ({_SCORED_DUCK}),
    mm AS (SELECT min(s) AS mn, max(s) AS mx FROM scored),
    binned AS (
      SELECT ((s - mm.mn) * {_AUC_BINS}) // (mm.mx - mm.mn + 1) AS bin,
             y FROM scored, mm),
    bins AS (
      SELECT bin, CAST(sum(y) AS BIGINT) AS p,
             CAST(count(*) - sum(y) AS BIGINT) AS n
      FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, p, n,
             coalesce(sum(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumn
      FROM bins),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS pos,
                   CAST(sum(n) AS BIGINT) AS neg,
                   CAST(sum(p * (2 * cumn + n)) AS BIGINT) AS num2,
                   CAST(count(*) AS BIGINT) AS n_bins
            FROM cum)
    SELECT pos AS n_pos, neg AS n_neg, n_bins,
           round(num2 / (2.0 * pos * neg), 6) AS auc,
           round(num2 / (1.0 * pos * neg) - 1.0, 6) AS gini
    FROM tot
    """,
)
def eval_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the hashed-feature quality classifier against the
    lang='{pos}' label, computed the 100 TB way: histogram AUC.  Scores
    collapse into {b} equal-width integer bins (one map-side-combinable
    aggregate); the Mann-Whitney rank statistic is then a prefix sum
    OVER THE {b}-ROW BIN TABLE, never over the data — with the standard
    half-credit tie correction inside a bin, AUC = sum_b p_b*(cum_neg_<b
    + n_b/2) / (P*N).  The numerator is kept as the integer
    sum p*(2*cum+n) so both engines divide the same exact integers.

    Scale: pass 1 is a 1-row min/max broadcast; pass 2 a (bin) count
    aggregate — {b} groups regardless of input rows; the window runs on
    {b} aggregated rows (a deliberately bounded single-partition sort,
    allow-listed).  Exact-rank AUC would need a global sort of all N
    scores; the binned estimator is the standard scale substitute and is
    exact when a bin holds a single distinct score.
    """.format(pos=_POS_LANG, b=_AUC_BINS)
    scored = _scored(spark, sf_dir)
    mm = scored.agg(F.min("s").alias("mn"), F.max("s").alias("mx"))
    binned = scored.crossJoin(F.broadcast(mm)).select(
        F.expr(f"((s - mn) * {_AUC_BINS}) div (mx - mn + 1)").alias("bin"), "y"
    )
    bins = binned.groupBy("bin").agg(
        F.sum("y").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n"),
    )
    w = (
        W.partitionBy(F.lit(0))
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = bins.withColumn("cumn", F.coalesce(F.sum("n").over(w), F.lit(0)))
    tot = cum.agg(
        F.sum("p").alias("pos"),
        F.sum("n").alias("neg"),
        F.sum(F.col("p") * (2 * F.col("cumn") + F.col("n"))).alias("num2"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    return tot.select(
        F.col("pos").alias("n_pos"),
        F.col("neg").alias("n_neg"),
        "n_bins",
        F.round(F.col("num2") / (2.0 * F.col("pos") * F.col("neg")), 6).alias("auc"),
        F.round(F.col("num2") / (1.0 * F.col("pos") * F.col("neg")) - 1.0, 6).alias(
            "gini"
        ),
    )


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS ({_SCORED_DUCK}),
    probs AS (
      SELECT y,
             0.5 + 0.5 * s / (abs(s) + {_SIG_K}.0) AS prob FROM scored),
    b AS (
      SELECT least({_CAL_BINS - 1},
                   CAST(floor(prob * {_CAL_BINS}) AS BIGINT)) AS bin,
             y, CAST(floor(prob * 1000000) AS BIGINT) AS p_micro
      FROM probs)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(p_micro) AS BIGINT) / (count(*) * 1000000.0), 6)
             AS mean_pred,
           round(CAST(sum(y) AS BIGINT) / (count(*) * 1.0), 6) AS frac_pos,
           round(abs(CAST(sum(p_micro) AS BIGINT) / (count(*) * 1000000.0)
                     - CAST(sum(y) AS BIGINT) / (count(*) * 1.0)), 6) AS gap
    FROM b GROUP BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the quality classifier: probability =
    algebraic sigmoid 0.5 + 0.5*s/(|s|+K) (IEEE-exact in both engines —
    libm exp() is NOT, its last ulp flips floor() at bin edges), {b}
    fixed-width bins, per-bin mean predicted vs observed positive rate
    and the |gap| that an ECE would weight.

    Cross-engine exactness: per-row probs are identical doubles, the
    per-bin mean accumulates floor(prob*1e6) INTEGERS (a double sum
    would depend on association order across partitions), and every
    output is one exact-integer division.

    Scale: a single map-side-combinable groupBy over {b} fixed bins —
    calibration of a 100 TB scored corpus is one scan, no sort, no
    per-row state.
    """.format(b=_CAL_BINS)
    scored = _scored(spark, sf_dir)
    prob = 0.5 + 0.5 * F.col("s") / (F.abs(F.col("s")) + float(_SIG_K))
    b = scored.select(
        F.least(
            F.lit(_CAL_BINS - 1), F.floor(prob * _CAL_BINS).cast("long")
        ).alias("bin"),
        "y",
        F.floor(prob * 1_000_000).cast("long").alias("p_micro"),
    )
    mean_pred = F.sum("p_micro") / (F.count(F.lit(1)) * 1_000_000.0)
    frac_pos = F.sum("y") / (F.count(F.lit(1)) * 1.0)
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(mean_pred, 6).alias("mean_pred"),
        F.round(frac_pos, 6).alias("frac_pos"),
        F.round(F.abs(mean_pred - frac_pos), 6).alias("gap"),
    )


@query(
    "eval_threshold_sweep",
    oracle=f"""
    WITH scored AS ({_SCORED_DUCK}),
    thr AS (SELECT unnest(generate_series({_THR_LO}, {_THR_HI},
                                          {_THR_STEP})) AS thr_micros),
    cells AS (
      SELECT t.thr_micros,
             CAST(sum(CASE WHEN s.y = 1 AND s.s > t.thr_micros
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s.y = 0 AND s.s > t.thr_micros
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s.y = 1 AND s.s <= t.thr_micros
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s.y = 0 AND s.s <= t.thr_micros
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored s CROSS JOIN thr t
      GROUP BY t.thr_micros)
    SELECT thr_micros, tp, fp, fn, tn,
           round(tp / nullif(tp + fp, 0), 6) AS precision,
           round(tp / nullif(tp + fn, 0), 6) AS recall,
           round(2.0 * tp / nullif(2 * tp + fp + fn, 0), 6) AS f1
    FROM cells
    """,
)
def eval_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: confusion matrix + precision/recall/F1 of
    the quality classifier at {k} fixed micro-logit thresholds — the
    table behind choosing a curation cutoff (keep-rate vs purity).

    All counts are integers and every metric is one exact-integer
    division (F1 in the 2tp/(2tp+fp+fn) form avoids a float
    precision*recall intermediate), so both engines emit identical
    doubles.

    Scale: the {k}-row threshold table broadcasts into the scan
    (crossJoin-with-broadcast preserves the scan partitioning), and the
    groupBy has {k} groups with map-side partials — one pass over 100 TB
    for the whole sweep, vs the naive one-scan-per-threshold loop.
    """.format(k=(_THR_HI - _THR_LO) // _THR_STEP + 1)
    scored = _scored(spark, sf_dir)
    thr = spark.range(_THR_LO, _THR_HI + 1, _THR_STEP).select(
        F.col("id").alias("thr_micros")
    )
    cells = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("thr_micros")
        .agg(
            F.sum(
                ((F.col("y") == 1) & (F.col("s") > F.col("thr_micros"))).cast("long")
            ).alias("tp"),
            F.sum(
                ((F.col("y") == 0) & (F.col("s") > F.col("thr_micros"))).cast("long")
            ).alias("fp"),
            F.sum(
                ((F.col("y") == 1) & (F.col("s") <= F.col("thr_micros"))).cast("long")
            ).alias("fn"),
            F.sum(
                ((F.col("y") == 0) & (F.col("s") <= F.col("thr_micros"))).cast("long")
            ).alias("tn"),
        )
    )
    return cells.select(
        "thr_micros",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6).alias(
            "precision"
        ),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6).alias(
            "recall"
        ),
        F.round(
            2.0 * F.col("tp")
            / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("f1"),
    )


# --------------------------------------------------------------------------
# Split-conformal coverage — distribution-free prediction intervals
# (Vovk et al.; split-conformal variant, public): calibrate a
# nonconformity quantile on pre-split data, verify coverage post-split.
# --------------------------------------------------------------------------
_CF_SPLIT = "2024-01-16 00:00:00"
_CF_ALPHA = 0.9  # target coverage


@query(
    "eval_conformal_coverage",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL),
    mu AS (
      SELECT event_type,
             CAST(sum(vm) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM ev WHERE ts <= TIMESTAMP '{_CF_SPLIT}' GROUP BY 1),
    scores AS (
      SELECT e.event_type,
             abs(e.vm - CAST(mu.s AS DOUBLE) / mu.n) AS score
      FROM ev e JOIN mu ON mu.event_type = e.event_type
      WHERE e.ts <= TIMESTAMP '{_CF_SPLIT}'),
    q AS (
      SELECT event_type, quantile_disc(score, {_CF_ALPHA}) AS qhat
      FROM scores GROUP BY event_type),
    test AS (
      SELECT e.event_type,
             abs(e.vm - CAST(mu.s AS DOUBLE) / mu.n) <= q.qhat AS covered
      FROM ev e
      JOIN mu ON mu.event_type = e.event_type
      JOIN q ON q.event_type = e.event_type
      WHERE e.ts > TIMESTAMP '{_CF_SPLIT}')
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           round(sum(CASE WHEN covered THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS coverage
    FROM test GROUP BY event_type
    """,
)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval check: the "model" is the per-type
    pre-split mean (integer-micro sums, one exact double division);
    nonconformity = |value - mean|; the calibration quantile q_alpha
    ({a}) comes from pre-split scores as a DISCRETE order statistic
    (an interpolated percentile differs by an ulp across engines and
    this is a comparison threshold); post-split events count as covered
    when their nonconformity is <= q_alpha.  Coverage near {a} is the
    distribution-free guarantee; the per-type report is the conformal
    calibration table a forecasting pipeline ships.

    Scale: two time-pruned scans + bounded per-type aggregates; the
    calibration quantile is per event type (a bounded domain) — at
    100 TB the exact percentile swaps for the histogram-quantile
    estimator above, same plan.  All doubles derive from identical
    exact integers."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
        )
    )
    split = F.lit(_CF_SPLIT).cast("timestamp")
    mu = (
        ev.filter(F.col("ts") <= split)
        .groupBy("event_type")
        .agg(F.sum("vm").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    scores = (
        ev.filter(F.col("ts") <= split)
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            F.abs(F.col("vm") - F.col("s").cast("double") / F.col("n")).alias(
                "score"
            ),
        )
    )
    # DISCRETE order statistic, not the interpolated percentile: cont
    # interpolation differs by an ulp across engines and this value is a
    # <= decision threshold (the winsorize clamp lesson)
    q = scores.groupBy("event_type").agg(
        F.expr(f"percentile_approx(score, {_CF_ALPHA}, 2147483647)").alias("qhat")
    )
    test = (
        ev.filter(F.col("ts") > split)
        .join(F.broadcast(mu), "event_type")
        .join(F.broadcast(q), "event_type")
        .select(
            "event_type",
            (
                F.abs(F.col("vm") - F.col("s").cast("double") / F.col("n"))
                <= F.col("qhat")
            ).alias("covered"),
        )
    )
    cov = F.sum(F.when(F.col("covered"), 1).otherwise(0))
    return test.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        cov.alias("n_covered"),
        F.round(cov * 1.0 / F.count(F.lit(1)), 6).alias("coverage"),
    )
