"""Corpus-curation operators for LLM training-data pipelines over
``documents``: Gopher-style repetition quality signals, benchmark
contamination checking, greedy sequence packing, and per-domain caps.

No reference counterpart (the reference's only text op is wc's tokenizer,
src/mrapps/wc.go:19-24) — these extend the north-star LLM-pipeline
surface (text.py, dedup.py, pipelines.py) with the remaining standard
curation steps a 100 TB pretraining run needs.

All hot paths are native Catalyst expressions; the only joins are
inverted-index joins on n-gram keys (never all-pairs) with the small
benchmark side broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.stitch import stitched_order
from ..registry import query
from ..sources import load_table
from .pipelines import _SPLIT_A_RED, _SPLIT_B, _SPLIT_P


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents", fan_out=True)


def _word_ngrams(toks, n: int):
    """n-gram strings from a materialized token-array COLUMN (never inline
    the split() expression here — Catalyst re-evaluates it per element).
    Empty array when the doc has fewer than n tokens: Spark's
    ``sequence(1, 0)`` yields a DESCENDING list, so the short-doc case
    must be guarded explicitly."""
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def _dup_bigram_frac(l):
    """Duplicate-bigram fraction WITHOUT building bigram strings (r14,
    guide §4.2-adjacent: cheaper per-row expression, same value):
    bigrams are (w1, w2) STRUCT pairs via one zip_with — distinct-pair
    counts equal distinct-"w1 w2" counts exactly because tokens come
    from split(' ') and can never contain the join character.  The old
    string form concat'd every position and was re-instantiated per
    reference; gate leg measured 4.69 -> 0.98 s at sf0.1."""
    bg = F.when(
        F.size(l) < 2,
        F.expr("CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)"),
    ).otherwise(
        F.zip_with(
            F.slice(l, 1, F.size(l) - 1),
            F.slice(l, 2, F.size(l) - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        )
    )
    return F.when(F.size(bg) == 0, F.lit(0.0)).otherwise(
        1 - F.size(F.array_distinct(bg)) / F.size(bg)
    )


# top-word share via the longest run in the SORTED token array — the
# max run length of equal adjacent tokens IS the max per-word count,
# O(n log n) per doc instead of the O(distinct x tokens) rescan of the
# transform+filter form (value-identical; 0 mismatches corpus-wide)
_TOP_RUN_SQL = (
    "aggregate(array_sort({l}),"
    " struct(CAST(NULL AS STRING) AS prev, CAST(0 AS INT) AS cur,"
    " CAST(0 AS INT) AS best),"
    " (acc, x) -> struct(x AS prev,"
    " IF(x <=> acc.prev, acc.cur + 1, 1) AS cur,"
    " GREATEST(acc.best, IF(x <=> acc.prev, acc.cur + 1, 1)) AS best),"
    " acc -> acc.best)"
)


def _top_word_frac(col_name: str = "l"):
    return F.expr(_TOP_RUN_SQL.format(l=col_name)) / F.size(col_name)


# --------------------------------------------------------------------------
# Gopher-style repetition signals: the classic "remove boilerplate and
# degenerate text" quality filters (fraction of duplicate word bigrams,
# most-frequent-word share).  Pure per-row expressions — the 100 TB plan
# is a narrow map with zero shuffles, exactly like text_quality_score.
# --------------------------------------------------------------------------
@query(
    "text_repetition_quality",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (SELECT doc_id, l,
                 list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]) AS bg
          FROM t)
    SELECT doc_id,
           len(l) AS n_tokens,
           round(CASE WHEN len(bg) = 0 THEN 0.0
                      ELSE 1 - len(list_distinct(bg)) * 1.0 / len(bg) END,
                 4) AS dup_bigram_frac,
           round(list_max(list_transform(list_distinct(l),
                                         w -> len(list_filter(l, x -> x = w))))
                 * 1.0 / len(l), 4) AS top_word_frac,
           (CASE WHEN len(bg) = 0 THEN 0.0
                 ELSE 1 - len(list_distinct(bg)) * 1.0 / len(bg) END) > 0.2
             OR (list_max(list_transform(list_distinct(l),
                                         w -> len(list_filter(l, x -> x = w))))
                 * 1.0 / len(l)) > 0.2 AS repetitive
    FROM g
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document (the Gopher rules'
    deterministic core): duplicate-bigram fraction and top-word share,
    plus a combined ``repetitive`` flag at the 0.2 thresholds.

    Scale: per-row expressions only — no shuffle, no UDF; the per-row
    work is bounded by document length (the top-word scan is O(distinct
    words x tokens) on a short-doc corpus; r14 replaced that scan with
    the sorted-run formulation in ``_top_word_frac`` — O(n log n) per
    doc, value-identical — and the bigram strings with struct pairs
    (``_dup_bigram_frac``), so the operator now scales to book-length
    docs as-is."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("l"))
    dup_frac = _dup_bigram_frac(F.col("l"))
    top_frac = _top_word_frac("l")
    return docs.select(
        "doc_id",
        F.size("l").alias("n_tokens"),
        F.round(dup_frac, 4).alias("dup_bigram_frac"),
        F.round(top_frac, 4).alias("top_word_frac"),
        ((dup_frac > 0.2) | (top_frac > 0.2)).alias("repetitive"),
    )


# --------------------------------------------------------------------------
# Benchmark-contamination check: which corpus documents share word
# 4-grams with a held-out benchmark set (here: the deterministic pseudo-
# benchmark doc_id % 101 == 0, standing in for an eval suite).  The real
# pipeline shape: explode both sides to n-grams, inverted-index join on
# the n-gram key with the (small) benchmark side broadcast — the corpus
# is never shuffled, and per-doc overlap counts collapse map-side because
# exploded rows stay clustered by document.
# --------------------------------------------------------------------------
_CONTAM_N = 4


@query(
    "pipeline_contamination_check",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (SELECT doc_id, len(l) - {_CONTAM_N - 1} AS n_ngrams,
                 unnest(list_transform(range(1, len(l) - {_CONTAM_N - 2}), i ->
                        list_aggregate(l[i:i+{_CONTAM_N - 1}], 'string_agg', ' ')))
                   AS ng
          FROM t WHERE len(l) >= {_CONTAM_N}),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 101 = 0),
    corpus AS (SELECT * FROM g WHERE doc_id % 101 <> 0)
    SELECT doc_id,
           count(DISTINCT corpus.ng) AS n_shared_ngrams,
           any_value(n_ngrams) AS n_ngrams,
           round(count(DISTINCT corpus.ng) * 1.0 / any_value(n_ngrams), 4)
             AS contaminated_frac
    FROM corpus JOIN bench USING (ng)
    GROUP BY doc_id
    """,
)
def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: corpus docs sharing any word
    {4}-gram with the benchmark set, with per-doc shared-n-gram counts.
    Only contaminated docs are emitted (the output is an audit/removal
    list, tiny relative to the corpus)."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("l"))
    grams = (
        docs.filter(F.size("l") >= _CONTAM_N)
        .select(
            "doc_id",
            (F.size("l") - (_CONTAM_N - 1)).alias("n_ngrams"),
            F.explode(_word_ngrams(F.col("l"), _CONTAM_N)).alias("ng"),
        )
    )
    bench = (
        grams.filter(F.col("doc_id") % 101 == 0).select("ng").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 101 != 0)
    return (
        corpus.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ng").alias("n_shared_ngrams"),
            F.first("n_ngrams").alias("n_ngrams"),
            F.round(F.countDistinct("ng") / F.first("n_ngrams"), 4).alias(
                "contaminated_frac"
            ),
        )
    )


# --------------------------------------------------------------------------
# Greedy sequence packing: assign documents to fixed-size token bins
# (context windows) by contiguous fill order, the standard pretraining
# batching step.  Deterministic offset-based assignment: a doc belongs to
# the bin its START offset falls in (docs may straddle a boundary — the
# packer's fill accounting, not a truncation policy).
# --------------------------------------------------------------------------
_PACK_BIN = 256


@query(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT lang, doc_id, n_tokens,
                 -- window sum widens to HUGEINT in DuckDB; reduce back
                 CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
          FROM t)
    SELECT lang, (cum - n_tokens) // {_PACK_BIN} AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           round(CAST(sum(n_tokens) AS BIGINT) * 1.0 / {_PACK_BIN}, 4) AS fill_ratio
    FROM c
    GROUP BY lang, (cum - n_tokens) // {_PACK_BIN}
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {256}-token context-window bins per language:
    running token cumsum in doc_id order, bin = start_offset div BIN,
    then per-bin fill stats.

    Scale: the per-lang running sum is the GROUPED stitch
    (plans/stitch.py ``stitched_order(partition_by=["lang"])``) — a
    plain ``Window.partitionBy(lang)`` puts a whole language on ONE
    task, and one language is ~80% of a real web corpus; the stitch
    sorts P parallel (lang, doc_id) range-buckets and offsets them with
    a (P x |langs|)-row stats window.  Then a map-side-combinable
    groupBy on (lang, bin).  Integer division uses floor semantics in
    BOTH engines (DuckDB ``//``, Spark ``floor``) — CAST(double AS
    BIGINT) rounds in DuckDB but truncates in Spark, a round-1
    divergence class."""
    docs = _docs(spark, sf_dir).select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    cum = stitched_order(
        docs,
        F.col("doc_id"),
        partition_by=["lang"],
        sum_cols={"n_tokens": "_cum"},
    )
    binned = cum.withColumn(
        "bin_id", F.floor((F.col("_cum") - F.col("n_tokens")) / _PACK_BIN)
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / _PACK_BIN, 4).alias("fill_ratio"),
    )


# --------------------------------------------------------------------------
# Per-domain cap: bound any single source's share of the corpus (the
# anti-domination rule every web-scale corpus applies).  Deterministic:
# docs ranked within each source by the same universal hash as the
# split/sample operators, first CAP kept.
# --------------------------------------------------------------------------
_DOMAIN_CAP = 10


@query(
    "pipeline_domain_cap",
    oracle=f"""
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ({_SPLIT_A_RED} * (doc_id % {_SPLIT_P}) + {_SPLIT_B})
                        % {_SPLIT_P}, doc_id
             ) AS rn
      FROM documents)
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rn > {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM r GROUP BY source
    """,
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at {10} docs, chosen by universal-hash rank
    (deterministic across runs and cluster sizes, like the train/val/test
    split), and report kept/dropped accounting per source.

    Scale: one shuffle on the source key; rank truncation is the same
    TakeOrdered-per-group window as the stratified sampler.  With a
    mega-domain (web crawl skew) the window sort buffer only needs the
    top CAP rows per partition key — and the accounting aggregation is
    map-side combinable."""
    docs = _docs(spark, sf_dir)
    hkey = (
        F.lit(_SPLIT_A_RED) * (F.col("doc_id") % _SPLIT_P) + F.lit(_SPLIT_B)
    ) % _SPLIT_P
    w = W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
    r = docs.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") <= _DOMAIN_CAP
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum((~kept).cast("long")).alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


# --------------------------------------------------------------------------
# Capstone: the full pretraining-corpus pipeline — every curation stage
# of this round composed into ONE Catalyst plan, end-to-end oracle-
# checked.  Order mirrors production practice: cheap per-row gates first
# (quality, repetition), then the contamination anti-join, then exact
# dedup, then the domain cap, then the split — so each shuffle stage sees
# an already-reduced corpus.
# --------------------------------------------------------------------------
_PP_MIN_TOKENS = 20
_PP_REP_MAX = 0.2
_PP_CAP = 15


@query(
    "pipeline_pretrain_corpus",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS l,
             md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents WHERE doc_id % 101 <> 0),
    sig AS (
      SELECT doc_id, lang, source, l, fp, len(l) AS n_tokens,
             list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]) AS bg
      FROM t),
    gated AS (
      SELECT doc_id, lang, source, l, fp, n_tokens FROM sig
      WHERE n_tokens >= {_PP_MIN_TOKENS}
        AND (len(bg) = 0 OR 1 - len(list_distinct(bg)) * 1.0 / len(bg)
             <= {_PP_REP_MAX})
        AND list_max(list_transform(list_distinct(l),
                                    w -> len(list_filter(l, x -> x = w))))
            * 1.0 / len(l) <= {_PP_REP_MAX}),
    bench AS (
      SELECT DISTINCT unnest(list_transform(range(1, len(l) - {_CONTAM_N - 2}),
                             i -> list_aggregate(l[i:i+{_CONTAM_N - 1}],
                                                 'string_agg', ' '))) AS ng
      FROM (SELECT string_split(text, ' ') AS l FROM documents
            WHERE doc_id % 101 = 0 AND len(string_split(text, ' ')) >= {_CONTAM_N})),
    contaminated AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(l) - {_CONTAM_N - 2}),
                              i -> list_aggregate(l[i:i+{_CONTAM_N - 1}],
                                                  'string_agg', ' '))) AS ng
        FROM gated WHERE len(l) >= {_CONTAM_N}) g
      WHERE ng IN (SELECT ng FROM bench)),
    clean AS (
      SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    deduped AS (
      SELECT * FROM clean
      WHERE doc_id IN (SELECT min(doc_id) FROM clean GROUP BY fp)),
    capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source
          ORDER BY ({_SPLIT_A_RED} * (doc_id % {_SPLIT_P}) + {_SPLIT_B})
                   % {_SPLIT_P}, doc_id) AS rn
        FROM deduped) WHERE rn <= {_PP_CAP}),
    split AS (
      SELECT lang, n_tokens,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT lang, n_tokens,
                   (({_SPLIT_A_RED} * (doc_id % {_SPLIT_P}) + {_SPLIT_B})
                    % {_SPLIT_P}) % 100 AS b
            FROM capped))
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM split GROUP BY 1, 2
    """,
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-corpus pipeline as one Catalyst plan:
    quality gate (min tokens) -> repetition gates (dup-bigram + top-word
    share) -> benchmark contamination anti-join -> exact dedup on the
    normalized fingerprint (keep lowest doc_id) -> per-source cap ->
    deterministic train/val/test split -> per-(split, lang) accounting.

    Scale: stage order puts the zero-shuffle per-row gates first, so the
    three shuffles (contamination n-gram join, fingerprint dedup, source
    cap window) each see an already-reduced corpus; the benchmark n-gram
    set broadcasts; every sampling/split decision is the universal hash
    of the row — no RNG, no driver state, reproducible at any cluster
    size.  This is the composition the standalone operators
    (text_repetition_quality, pipeline_contamination_check,
    pipeline_domain_cap, pipeline_train_val_test_split) exist to serve."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 101 != 0)
    toks = F.split("text", " ")
    fp = F.md5(F.trim(F.lower(F.regexp_replace("text", r"\s+", " "))))
    sig = docs.select(
        "doc_id", "lang", "source", toks.alias("l"), fp.alias("fp"),
        F.size(toks).alias("n_tokens"),
    )
    # r14: the same cheap gate forms as text_repetition_quality —
    # struct-pair bigrams and sorted-run top-word share (value-identical;
    # the gated leg alone measured 4.69 -> 0.98 s at sf0.1)
    dup_frac = _dup_bigram_frac(F.col("l"))
    top_frac = _top_word_frac("l")
    gated = sig.filter(
        (F.col("n_tokens") >= _PP_MIN_TOKENS)
        & (dup_frac <= _PP_REP_MAX)
        & (top_frac <= _PP_REP_MAX)
    )
    bench_docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 101 == 0).select(
        F.split("text", " ").alias("l")
    )
    bench = (
        bench_docs.filter(F.size("l") >= _CONTAM_N)
        .select(F.explode(_word_ngrams(F.col("l"), _CONTAM_N)).alias("ng"))
        .distinct()
    )
    # grams derive from the UNGATED sig (r13): a contaminated doc_id
    # that fails the repetition gates is simply absent from `gated`, so
    # the anti-join ignores it — and the expensive per-row gate
    # expressions (top_frac is O(|distinct| x |tokens|) per doc) then
    # evaluate once (the clean branch) instead of twice (~15% at sf0.1,
    # result-identical by the oracle).
    grams = sig.filter(F.size("l") >= _CONTAM_N).select(
        "doc_id", F.explode(F.array_distinct(_word_ngrams(F.col("l"), _CONTAM_N))).alias("ng")
    )
    contaminated = grams.join(F.broadcast(bench), "ng").select("doc_id").distinct()
    clean = gated.join(contaminated, "doc_id", "left_anti")
    # exact dedup as a WINDOW (r14): rn=1 over partitionBy(fp) ordered
    # by doc_id selects exactly the min-doc_id row per fingerprint —
    # identical to the old groupBy(fp)+left_semi pair, but `clean` (and
    # the gate expressions above it) evaluates ONCE instead of feeding
    # both sides of the semi-join (10.48 -> 9.01 s before the gate
    # rewrite; one fp exchange instead of an aggregate + a join)
    deduped = (
        clean.withColumn(
            "rfp",
            F.row_number().over(
                W.partitionBy("fp").orderBy(F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rfp") == 1)
        .drop("rfp")
    )
    hkey = (
        F.lit(_SPLIT_A_RED) * (F.col("doc_id") % _SPLIT_P) + F.lit(_SPLIT_B)
    ) % _SPLIT_P
    w = W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
    capped = deduped.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PP_CAP
    )
    b = hkey % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return (
        capped.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
