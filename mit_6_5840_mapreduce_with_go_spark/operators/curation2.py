"""Second tranche of corpus-curation operators over ``documents``:
quality-bucket resampling, Zipf vocabulary coverage, cross-source n-gram
overlap, and corpus-internal boilerplate detection.

No reference counterpart (SURVEY.md §2.D: the reference's only text op
is wc's tokenizer) — these complete the standard curation stages of a
100 TB pretraining pipeline alongside operators/curation.py (repetition
quality, benchmark contamination, packing, domain caps).

Cross-engine determinism: bucket boundaries and keep decisions are pure
integer arithmetic (equal-width buckets from exact min/max; the
pipelines.py reduced-residue universal hash); all ratios are ratios of
exact integer counts rounded at 4 places; DuckDB BIGINT-sum widening to
HUGEINT is cast away everywhere (tools/audit_oracle_types.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.stitch import stitched_order
from ..registry import query
from ..sources import load_table
from .curation import _word_ngrams
from .pipelines import _SPLIT_A_RED, _SPLIT_B, _SPLIT_P


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents", fan_out=True)


# universal hash residue in [0, 10) used for per-bucket keep decisions
_RESAMPLE_MOD = 10


# --------------------------------------------------------------------------
# Quality-bucket temperature resampling: docs binned into 10 equal-width
# length buckets; bucket b keeps b/10 of its docs by deterministic hash.
# The standard "upweight high-quality, downweight low-quality" resampling
# step, made integer-exact so any engine reproduces the same corpus.
# --------------------------------------------------------------------------
@query(
    "pipeline_quality_resample",
    oracle=f"""
    WITH bounds AS (
      SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
    b AS (
      SELECT doc_id, n_chars,
             1 + least(9, ((n_chars - lo) * 10) // (hi - lo + 1)) AS bucket,
             (({_SPLIT_A_RED} * (doc_id % {_SPLIT_P}) + {_SPLIT_B})
              % {_SPLIT_P}) % {_RESAMPLE_MOD} AS h
      FROM documents, bounds)
    SELECT bucket, count(*) AS n_docs,
           count(*) FILTER (WHERE h < bucket) AS n_kept,
           round(count(*) FILTER (WHERE h < bucket) * 1.0 / count(*), 4)
             AS kept_frac,
           CAST(coalesce(sum(n_chars) FILTER (WHERE h < bucket), 0) AS BIGINT)
             AS kept_chars
    FROM b GROUP BY bucket
    """,
)
def pipeline_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality resampling: documents fall into 10
    equal-width ``n_chars`` buckets (the stand-in quality signal) and
    bucket ``b`` keeps ``b/10`` of its documents, selected by the
    pipelines.py reduced-residue universal hash — higher-quality buckets
    survive at higher rates, and the kept set is bit-identical in any
    engine.

    Scale: the bucket bounds are one map-side-combinable min/max agg
    broadcast back as a 1-row scalar (no global sort — an ntile()
    formulation would need one); bucketing + keep decisions are then a
    pure narrow map, and the final agg groups 10 keys with map-side
    partials. This is the shape that survives 100 TB: two passes, zero
    wide shuffles beyond the 10-key agg."""
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    bounds = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    b = docs.join(F.broadcast(bounds)).select(
        "n_chars",
        (
            1
            + F.least(
                F.lit(9),
                F.floor(
                    (F.col("n_chars") - F.col("lo")) * 10
                    / (F.col("hi") - F.col("lo") + 1)
                ),
            )
        ).alias("bucket"),
        (
            (F.lit(_SPLIT_A_RED) * (F.col("doc_id") % _SPLIT_P) + F.lit(_SPLIT_B))
            % _SPLIT_P
            % _RESAMPLE_MOD
        ).alias("h"),
    )
    kept = F.col("h") < F.col("bucket")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(kept).alias("n_kept"),
        F.round(F.count_if(kept) * 1.0 / F.count(F.lit(1)), 4).alias("kept_frac"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0)).alias(
            "kept_chars"
        ),
    )


# --------------------------------------------------------------------------
# Zipf vocabulary coverage: global word frequencies ranked, with each
# word's corpus share and the running coverage — the "how many types
# cover 90% of tokens" curve that drives tokenizer/vocab decisions.
# --------------------------------------------------------------------------
@query(
    "text_vocab_coverage",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    c AS (
      SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank,
           word, cnt,
           round(cnt * 1.0 / CAST(sum(cnt) OVER () AS BIGINT), 4) AS share,
           round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 * 1.0 / CAST(sum(cnt) OVER () AS BIGINT), 4) AS cum_share
    FROM c
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency spectrum: every word ranked by corpus
    frequency (ties broken lexically) with its token share and the
    cumulative coverage up to that rank.

    Scale: the token explode + count is map-side combinable and shuffles
    only (word, partial-count) pairs.  The rank/cumsum then runs as the
    STITCHED two-pass ordering (plans/stitch.py) — per-bucket windows
    partitioned by the sampled range-bucket id plus a P-row offset
    stitch — never a single-partition sort: the repo's own Heaps fit
    (beta 0.56) puts a 100 TB corpus at ~3x10^8 word types, multi-GB on
    one task under the naive global window (the hazard class the BM25
    idf fix established; GWIN-checked).  The token total is a 1-row
    broadcast.  DuckDB window sums over BIGINT widen to HUGEINT, hence
    the oracle CASTs."""
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # descending frequency composes as an ascending struct key (-cnt, word)
    key = F.struct((-F.col("cnt")).alias("_nc"), F.col("word").alias("_w"))
    ranked = stitched_order(
        counts, key, rank_col="rank", sum_cols={"cnt": "running"}
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        F.col("rank").cast("long").alias("rank"),
        "word",
        "cnt",
        F.round(F.col("cnt") * 1.0 / F.col("_total"), 4).alias("share"),
        F.round(F.col("running") * 1.0 / F.col("_total"), 4).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Cross-source n-gram overlap matrix: Jaccard similarity of the distinct
# word-4-gram sets of every source pair — the dedup/contamination view
# at SOURCE granularity (which crawls duplicate which).
# --------------------------------------------------------------------------
_OVERLAP_N = 4


@query(
    "pipeline_source_overlap_matrix",
    oracle=f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
    g AS (
      SELECT DISTINCT source,
             unnest(list_transform(range(1, len(l) - {_OVERLAP_N - 2}), i ->
                    list_aggregate(l[i:i+{_OVERLAP_N - 1}], 'string_agg', ' ')))
               AS ng
      FROM t WHERE len(l) >= {_OVERLAP_N}),
    sizes AS (SELECT source, count(*) AS n FROM g GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
      FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, shared,
           round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def pipeline_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level near-duplication matrix: for every pair of sources
    sharing at least one word 4-gram, the shared-ngram count and the
    Jaccard similarity of their distinct 4-gram sets.

    Scale: the expansion is an inverted-index self-join on the n-gram
    key — per n-gram the pair fan-out is bounded by |sources|^2 (a few
    hundred), NEVER |docs|^2; the distinct (source, ngram) set is
    map-side combinable and the final matrix is |sources|^2 rows. The
    per-source size table is tiny and broadcast into the final join.
    This is the same bucketed-pair shape as dedup_ngram_jaccard one
    granularity up."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.split("text", " ").alias("l"))
    g = (
        toks.filter(F.size("l") >= _OVERLAP_N)
        .select("source", F.explode(_word_ngrams(F.col("l"), _OVERLAP_N)).alias("ng"))
        .distinct()
    )
    sizes = g.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = g.alias("a")
    b = g.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ng") == F.col("b.ng"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("n", "na")),
            F.col("source") == F.col("source_a"),
        )
        .drop("source")
        .join(
            F.broadcast(sizes.withColumnRenamed("n", "nb")),
            F.col("source") == F.col("source_b"),
        )
        .drop("source")
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(
                F.col("shared") * 1.0 / (F.col("na") + F.col("nb") - F.col("shared")),
                4,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Corpus-internal boilerplate: word 3-grams occurring in many DISTINCT
# documents are boilerplate (headers, licence blurbs, nav text); report
# each document's boilerplate load.  Differs from the benchmark
# contamination scan (curation.py) in that the "bad set" is derived from
# corpus-internal frequency, not an external benchmark.
# --------------------------------------------------------------------------
_BOILER_N = 3
_BOILER_MIN_DOCS = 3


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (
      SELECT doc_id, len(l) - {_BOILER_N - 1} AS n_ngrams,
             unnest(list_transform(range(1, len(l) - {_BOILER_N - 2}), i ->
                    list_aggregate(l[i:i+{_BOILER_N - 1}], 'string_agg', ' ')))
               AS ng
      FROM t WHERE len(l) >= {_BOILER_N}),
    d AS (SELECT DISTINCT doc_id, n_ngrams, ng FROM g),
    b AS (SELECT ng FROM d GROUP BY ng
          HAVING count(*) >= {_BOILER_MIN_DOCS})
    SELECT doc_id, any_value(n_ngrams) AS n_ngrams,
           count(*) AS n_boiler_ngrams,
           round(count(*) * 1.0 / any_value(n_ngrams), 4) AS boiler_frac
    FROM d JOIN b USING (ng)
    GROUP BY doc_id
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate load per document: count of distinct word 3-grams
    that occur in >= {_BOILER_MIN_DOCS} distinct documents corpus-wide,
    and their share of the document's n-gram positions.

    Scale: the boilerplate set is built by one map-side-combinable
    distinct + count over (ngram, doc) keys; by construction it is the
    HEAD of the n-gram frequency distribution (a tiny fraction of
    distinct n-grams), so the join back to per-doc n-grams broadcasts
    the boilerplate side. Exploded rows stay clustered by doc_id, so the
    final per-doc count collapses map-side — the exact
    pipeline_contamination_check shape with a corpus-derived bad set."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    g = (
        toks.filter(F.size("l") >= _BOILER_N)
        .select(
            "doc_id",
            (F.size("l") - (_BOILER_N - 1)).alias("n_ngrams"),
            F.explode(_word_ngrams(F.col("l"), _BOILER_N)).alias("ng"),
        )
        .distinct()
    )
    boiler = (
        g.groupBy("ng")
        .agg(F.count(F.lit(1)).alias("n_docs_with"))
        .filter(F.col("n_docs_with") >= _BOILER_MIN_DOCS)
        .select("ng")
    )
    return (
        g.join(F.broadcast(boiler), "ng")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("n_ngrams")).alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_boiler_ngrams"),
            F.round(
                F.count(F.lit(1)) * 1.0 / F.any_value(F.col("n_ngrams")), 4
            ).alias("boiler_frac"),
        )
    )


# --------------------------------------------------------------------------
# Corpus composition matrix: the "data mixture" table — token and doc
# counts per (lang, source) cell with corpus-wide and within-lang token
# shares.  This is the report a pretraining run's sampling weights are
# derived from.
# --------------------------------------------------------------------------
@query(
    "pipeline_corpus_composition",
    oracle="""
    WITH d AS (
      SELECT lang, source, len(string_split(text, ' ')) AS toks
      FROM documents),
    c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM d GROUP BY lang, source)
    SELECT lang, source, n_docs, n_tokens,
           round(n_tokens * 1.0 /
                 CAST(sum(n_tokens) OVER () AS BIGINT), 4) AS corpus_share,
           round(n_tokens * 1.0 /
                 CAST(sum(n_tokens) OVER (PARTITION BY lang) AS BIGINT), 4)
             AS lang_share
    FROM c
    """,
)
def pipeline_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture composition: per (lang, source) cell the document
    and whitespace-token counts, the cell's share of all corpus tokens,
    and its share within its language — the inputs to mixture-weight /
    temperature-sampling decisions.

    Scale: token counting is a narrow size(split()) map (no explode —
    the array never materializes past the expression); one
    map-side-combinable agg on the tiny (lang x source) key space; the
    share windows run over the ~100-row result, not the corpus.  DuckDB
    window sums over BIGINT widen to HUGEINT, hence the CASTs."""
    docs = _docs(spark, sf_dir)
    c = docs.select(
        "lang", "source", F.size(F.split("text", " ")).alias("toks")
    ).groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )
    return c.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(W.partitionBy()), 4
        ).alias("corpus_share"),
        F.round(
            F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(W.partitionBy("lang")),
            4,
        ).alias("lang_share"),
    )
