"""DSIR-style hashed importance reweighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
public): score every document by how much its hashed-feature
distribution looks like a TARGET domain relative to the overall
source corpus — the standard pretraining-data selection lever when a
quality-classifier is too expensive to run at 100 TB.

Engine-exact reformulation: the original scores sum log-likelihood
ratios of hashed n-gram features; logs are a cross-engine hazard
(libm last-ulp), so this op sums CLIPPED INTEGER-MICRO likelihood
ratios instead — per bucket
``r1 = (1e6 * (ct+1)) // (cs+1)`` (add-one smoothing), clipped at
100x (importance-weight clipping is standard DSIR practice), then
``ratio_micro = (min(r1, 1e8) * Ns) // Nt`` — every step integer and
performed in the SAME order by both engines, so the score is
hash-exact, not approximately equal.  Selection downstream is a plain
top-quantile on the score (the repo's rank-window idiom); this query
emits the score itself plus feature mass.

Spark shape: tokens explode once; the 64-bucket ratio table derives
from two tiny aggregates over the SAME exploded tokens (exchange
reused) and broadcasts; the per-document score is one hash
aggregation.  No Python anywhere; the char-fold bucket hash is the
package's engine-portable fold (dedup.charfold_spark).  At 100 TB the
bucket table is still 64 rows — the whole point of hashed features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .dedup import charfold_duck, charfold_spark

_B = 64  # feature buckets
_CLIP = 100_000_000  # 100x ratio clip, in micro units


@query(
    "curation_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents),
    feat AS (
      SELECT doc_id, {charfold_duck("t")} % {_B} AS b
      FROM tok WHERE t <> ''),
    tgt AS (
      SELECT b, count(*) AS ct FROM feat WHERE doc_id % 7 = 0 GROUP BY b),
    src AS (
      SELECT b, count(*) AS cs FROM feat GROUP BY b),
    totals AS (
      SELECT (SELECT count(*) FROM feat WHERE doc_id % 7 = 0) AS nt,
             (SELECT count(*) FROM feat) AS ns),
    ratio AS (
      SELECT src.b,
             least((1000000 * (COALESCE(tgt.ct, 0) + 1))
                     // (src.cs + 1), {_CLIP})
               * (SELECT ns FROM totals) // (SELECT nt FROM totals)
               AS ratio_micro
      FROM src LEFT JOIN tgt ON tgt.b = src.b)
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(r.ratio_micro) AS BIGINT) AS score_micro,
           CAST(CASE WHEN f.doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS is_target
    FROM feat f JOIN ratio r ON r.b = f.b
    GROUP BY f.doc_id
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weights for target-domain resampling over the real
    documents text (target = every 7th document standing in for the
    high-quality domain).  See the module docstring for the
    integer-exact ratio construction.  Emits per-document token count,
    the summed clipped likelihood-ratio score (micro units), and the
    target flag — a downstream selector keeps the top quantile or
    samples proportionally."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id", "text"
    )
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    feat = tokens.select(
        "doc_id", (F.expr(charfold_spark("t")) % _B).alias("b")
    )
    tgt = (
        feat.filter(F.col("doc_id") % 7 == 0)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    src = feat.groupBy("b").agg(F.count(F.lit(1)).alias("cs"))
    totals = feat.agg(
        F.sum(F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)).alias("nt"),
        F.count(F.lit(1)).alias("ns"),
    )
    ratio = (
        src.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"least((1000000 * (COALESCE(ct, 0) + 1)) div (cs + 1), "
                f"{_CLIP}) * ns div nt"
            ).alias("ratio_micro"),
        )
    )
    return (
        feat.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ratio_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("score_micro").cast("long").alias("score_micro"),
            F.when(F.col("doc_id") % 7 == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_target"),
        )
    )
