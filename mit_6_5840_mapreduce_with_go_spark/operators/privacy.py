"""PII detection and redaction over ``documents`` — the privacy-scrub
stage every pretraining corpus passes through before tokenization.

No reference counterpart (the reference's only text op is wc's
tokenizer — SURVEY.md §2.B); north-star addition alongside the curation
stages (operators/curation.py, curation2.py, pipelines.py).

The synthetic corpus is deliberately PII-free, so the scrub would be
vacuous on the raw text; like the multimodal decode stub
(operators/multimodal.py) we make the PLUMBING real and the payload
synthetic: a deterministic pseudo-PII suffix (email + phone derived
from doc_id) is appended in-query, then detected and redacted with the
same regex machinery a real pipeline ships.  Detection counts, length
deltas, and an md5 digest of the redacted text are all engine-exact, so
the driver's hash compare verifies the scrub END TO END (a redaction
differing by one byte flips the digest).

Patterns stay inside the RE2 / Java-regex common subset (character
classes, +, {n} quantifiers — no backrefs, no lookaround) so Spark and
DuckDB compile them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_EMAIL_RE = r"[a-z0-9.]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"555-[0-9]{4}"


def _with_pii(docs: DataFrame) -> DataFrame:
    """Append the deterministic pseudo-PII suffix: every doc gains one
    email + one phone; every third doc a second email."""
    base = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    full = F.when(
        F.col("doc_id") % 3 == 0, F.concat(base, F.lit(" cc admin@corp.net"))
    ).otherwise(base)
    return docs.withColumn("full", full)


_PII_SQL_FULL = """
      CASE WHEN doc_id % 3 = 0
           THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' cc admin@corp.net'
           ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      END
"""


@query(
    "pii_doc_redaction",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_PII_SQL_FULL} AS ftext FROM documents),
    r AS (
      SELECT doc_id, ftext,
             regexp_replace(regexp_replace(ftext, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS clean
      FROM d)
    SELECT doc_id,
           CAST(len(regexp_extract_all(ftext, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(ftext, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(ftext) - len(clean) AS BIGINT) AS chars_removed,
           md5(clean) AS clean_digest
    FROM r
    """,
)
def pii_doc_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: email/phone hit counts, the redaction's
    length delta, and an md5 digest of the scrubbed text — the digest
    makes the oracle compare the redacted BYTES, not just the counts.

    Scale: pure narrow map — regex eval and md5 are JVM-side expressions
    inside whole-stage codegen; no shuffle at all (the scan partition
    layout is the output layout).  At 100 TB this is the ideal operator
    shape: bytes stream through codegen once, nothing wide."""
    docs = _with_pii(load_table(spark, sf_dir, "documents", fan_out=True))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("full"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("full"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("full"), F.lit(_PHONE_RE)).alias("n_phones"),
        (F.length("full") - F.length(clean)).cast("long").alias("chars_removed"),
        F.md5(clean).alias("clean_digest"),
    )


@query(
    "pii_scrub_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_PII_SQL_FULL} AS ftext FROM documents),
    r AS (
      SELECT source,
             len(regexp_extract_all(ftext, '{_EMAIL_RE}')) AS e,
             len(regexp_extract_all(ftext, '{_PHONE_RE}')) AS p,
             len(ftext)
               - len(regexp_replace(regexp_replace(ftext, '{_EMAIL_RE}',
                                                   '<EMAIL>', 'g'),
                                    '{_PHONE_RE}', '<PHONE>', 'g'))
               AS removed
      FROM d)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(e) AS BIGINT) AS n_emails,
           CAST(sum(p) AS BIGINT) AS n_phones,
           CAST(sum(removed) AS BIGINT) AS chars_removed,
           round(sum(e) * 1.0 / count(*), 4) AS emails_per_doc
    FROM r GROUP BY source
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub audit report by source: documents scanned, PII instances
    found by class, total bytes redacted — the compliance summary a
    privacy pipeline emits per ingest batch.

    Scale: narrow regex map, then one map-side-combinable agg on the
    tiny source key (20 values) — partial sums collapse before the
    single small shuffle."""
    docs = _with_pii(load_table(spark, sf_dir, "documents", fan_out=True))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("full"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    per_doc = docs.select(
        "source",
        F.regexp_count(F.col("full"), F.lit(_EMAIL_RE)).alias("e"),
        F.regexp_count(F.col("full"), F.lit(_PHONE_RE)).alias("p"),
        (F.length("full") - F.length(clean)).cast("long").alias("removed"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("e").cast("long").alias("n_emails"),
        F.sum("p").cast("long").alias("n_phones"),
        F.sum("removed").alias("chars_removed"),
        F.round(F.sum("e") * 1.0 / F.count(F.lit(1)), 4).alias("emails_per_doc"),
    )


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------
_KA_K = 5


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, count(*) AS group_size
      FROM documents GROUP BY lang, source)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(group_size) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN group_size < {_KA_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violating_groups,
           CAST(sum(CASE WHEN group_size < {_KA_K} THEN group_size ELSE 0 END)
                AS BIGINT) AS n_risky_docs,
           round(sum(CASE WHEN group_size < {_KA_K} THEN group_size ELSE 0 END)
                 * 1.0 / sum(group_size), 4) AS risky_frac
    FROM g
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: treat (lang, source) as the quasi-identifier
    tuple and report the dataset's k (smallest equivalence-class size),
    how many classes fall under k={_KA_K}, and the share of documents in
    those re-identifiable classes — the release-gate metric for
    publishing corpus slices.

    Scale: one map-side-combinable groupBy over the quasi-identifier
    key, then a scalar rollup over the class table (|langs|x|sources|
    rows). Generalization loops (coarsening QI columns until k >= K)
    re-run exactly this plan per iteration."""
    g = load_table(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    viol = F.col("group_size") < _KA_K
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("k_anonymity"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("group_size")).otherwise(0)).alias(
            "n_risky_docs"
        ),
        F.round(
            F.sum(F.when(viol, F.col("group_size")).otherwise(0))
            / F.sum("group_size"),
            4,
        ).alias("risky_frac"),
    )


# --------------------------------------------------------------------------
# l-diversity audit (companion to k-anonymity)
# --------------------------------------------------------------------------
_LD_BUCKET = 500  # sensitive stand-in: n_chars bucket width


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH x AS (
      SELECT lang, source, n_chars // {_LD_BUCKET} AS sv
      FROM documents),
    per_val AS (
      SELECT lang, source, sv, count(*) AS c
      FROM x GROUP BY 1, 2, 3)
    SELECT lang, source,
           CAST(sum(c) AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS l_distinct,
           round(max(c) * 1.0 / sum(c), 4) AS top_value_share
    FROM per_val
    GROUP BY lang, source
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the k-anonymity companion: within each
    (lang, source) quasi-identifier class, how many DISTINCT sensitive
    values appear (here the length bucket stands in — the framework is
    attribute-agnostic) and how dominant the most frequent one is. A
    class can be k-anonymous yet leak everything if all members share
    one sensitive value; l_distinct = 1 or top_value_share near 1 flags
    exactly that.

    Scale: one map-side-combinable (QI, value) count and one class-level
    reduce over the bounded class table; integer-exact except the final
    share ratio."""
    x = load_table(spark, sf_dir, "documents").select(
        "lang", "source", F.expr(f"n_chars div {_LD_BUCKET}").alias("sv")
    )
    per_val = x.groupBy("lang", "source", "sv").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_val.groupBy("lang", "source").agg(
        F.sum("c").cast("bigint").alias("class_size"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.round(F.max("c") * 1.0 / F.sum("c"), 4).alias("top_value_share"),
    )


# --------------------------------------------------------------------------
# Differential-privacy-style noisy histogram release — completes the
# privacy release gate: k-anonymity / l-diversity audit the classes,
# PII scrub cleans the payload, this releases the aggregate.
# --------------------------------------------------------------------------
_DP_EPS = 0.5  # release budget recorded with every row
_DP_B = 3  # bounded-noise half-width (~1/eps scale stand-in)

# Deterministic per-key "noise": charfold-hash the key (the repo's
# cross-engine fold, h*31+c mod 2^32) and map it into [-B, B].  A real
# release swaps this for a two-sided-geometric sampler — SAME plan, the
# noise column is one expression either way; the deterministic stand-in
# makes the release end-to-end oracle-checkable (same pattern as the
# multimodal decode stub and the pseudo-PII injector above).
_DP_NOISE_SPARK = (
    "CAST((aggregate(transform(sequence(1, length(lang)),"
    " i -> CAST(ascii(substring(lang, i, 1)) AS BIGINT)),"
    f" CAST(7 AS BIGINT), (h, c) -> (h * 31 + c) % 4294967296)) % {2 * _DP_B + 1}"
    f" - {_DP_B} AS BIGINT)"
)
_DP_NOISE_DUCK = (
    "CAST((list_reduce(list_prepend(CAST(7 AS BIGINT),"
    " list_transform(range(1, length(lang) + 1),"
    " i -> CAST(ascii(substr(lang, i, 1)) AS BIGINT))),"
    f" (h, c) -> (h * 31 + c) % 4294967296)) % {2 * _DP_B + 1}"
    f" - {_DP_B} AS BIGINT)"
)


@query(
    "privacy_dp_noisy_counts",
    oracle=f"""
    WITH h AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_count
               FROM documents GROUP BY lang)
    SELECT lang, true_count,
           {_DP_NOISE_DUCK} AS noise,
           greatest(CAST(0 AS BIGINT), true_count + {_DP_NOISE_DUCK})
             AS released_count,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon,
           CAST(1 AS BIGINT) AS sensitivity
    FROM h
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy-histogram release of per-language document counts, the
    differential-privacy release shape: sensitivity-1 counting query +
    per-cell additive noise + non-negativity post-processing, with the
    (epsilon, sensitivity) accounting columns a release log records.
    The noise here is a DETERMINISTIC bounded stand-in (charfold hash of
    the key into [-{b}, {b}]) so the driver hash-verifies the release
    end to end; a production release swaps the one noise expression for
    a calibrated two-sided-geometric sampler on the identical plan.
    `true_count` is emitted for the oracle compare and would be dropped
    from a real release.

    Scale: one map-side-combinable count over the bounded lang domain;
    noise + clamp are per-ROW expressions on the tiny aggregate — the
    noisy release of a 100 TB table costs exactly the histogram.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("true_count"))
    noise = F.expr(_DP_NOISE_SPARK)
    return h.select(
        "lang",
        "true_count",
        noise.alias("noise"),
        F.greatest(F.lit(0).cast("long"), F.col("true_count") + noise).alias(
            "released_count"
        ),
        F.lit(_DP_EPS).alias("epsilon"),
        F.lit(1).cast("long").alias("sensitivity"),
    )
