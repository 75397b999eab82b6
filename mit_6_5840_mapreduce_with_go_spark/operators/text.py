"""Text-analysis operators for training-data pipelines over ``documents``:
token statistics, quality scoring, language-ID heuristic, fingerprinting,
BPE-ish token counting.

No reference counterpart (the reference's only text op is wc's tokenizer,
src/mrapps/wc.go:19-24) — these are the north-star LLM-pipeline additions.

All hot-path logic is native Catalyst expressions (split / filter /
transform / md5) — zero Python UDFs, so the plans stay inside
whole-stage codegen and scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents", fan_out=True)


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_tokens,
           len(list_distinct(string_split(text, ' ')))     AS n_distinct,
           round(len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')), 4)        AS ttr,
           length(replace(text, ' ', ''))                  AS n_letter_chars,
           length(text)                                    AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4).alias("ttr"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_letter_chars"),
        F.length("text").alias("n_chars"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, stop_ratio,
           round(least(1.0, n_tokens / 100.0) * (1 - stop_ratio), 4) AS quality_score
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             round(len(list_filter(string_split(text, ' '),
                                   t -> t IN {STOPWORDS!r})) * 1.0
                   / len(string_split(text, ' ')), 4) AS stop_ratio
      FROM documents)
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality score: length saturation x (1 - stopword
    ratio). The exact formula is arbitrary but deterministic — what
    matters is the shape (per-row expression, no shuffle)."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens, 4
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        F.round(F.least(F.lit(1.0), n_tokens / 100.0) * (1 - stop_ratio), 4).alias(
            "quality_score"
        ),
    )


@query(
    "text_lang_guess",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN contains(' ' || text || ' ', ' the ') THEN 'en'
                WHEN contains(' ' || text || ' ', ' le ')  THEN 'fr'
                WHEN contains(' ' || text || ' ', ' der ') THEN 'de'
                WHEN contains(' ' || text || ' ', ' el ')  THEN 'es'
                ELSE 'und' END AS lang_guess,
           (CASE WHEN contains(' ' || text || ' ', ' the ') THEN 'en'
                 WHEN contains(' ' || text || ' ', ' le ')  THEN 'fr'
                 WHEN contains(' ' || text || ' ', ' der ') THEN 'de'
                 WHEN contains(' ' || text || ' ', ' el ')  THEN 'es'
                 ELSE 'und' END) = lang AS guess_matches
    FROM documents
    """,
)
def text_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic (the classic n-gram/stopword
    approach collapsed to its deterministic core). On the synthetic corpus
    the markers rarely fire — the operator contract (per-row CASE over
    contains()) is what's exercised; a real model would slot into the same
    per-row shape."""
    docs = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    guess = (
        F.when(padded.contains(" the "), "en")
        .when(padded.contains(" le "), "fr")
        .when(padded.contains(" der "), "de")
        .when(padded.contains(" el "), "es")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("guess_matches"),
    )


@query(
    "text_langid_confusion",
    oracle="""
    WITH g AS (
      SELECT lang,
             CASE WHEN contains(' ' || text || ' ', ' the ') THEN 'en'
                  WHEN contains(' ' || text || ' ', ' le ')  THEN 'fr'
                  WHEN contains(' ' || text || ' ', ' der ') THEN 'de'
                  WHEN contains(' ' || text || ' ', ' el ')  THEN 'es'
                  ELSE 'und' END AS lang_guess
      FROM documents)
    SELECT lang, lang_guess, count(*) AS n,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY lang), 4) AS frac_of_lang
    FROM g GROUP BY lang, lang_guess
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID model evaluation: confusion matrix of the labeled
    ``lang`` column against the stopword-marker classifier
    (text_lang_guess), with each cell's share of its true-language row.
    The eval harness every corpus-pipeline model needs — swap any
    classifier into the same shape and the matrix stays the contract.

    Scale: one map-side-combinable groupBy over a bounded (lang x guess)
    key space; the per-language normalization is a window over the
    already-aggregated matrix (≤ |langs|·|classes| rows), not the
    corpus."""
    docs = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    guess = (
        F.when(padded.contains(" the "), "en")
        .when(padded.contains(" le "), "fr")
        .when(padded.contains(" der "), "de")
        .when(padded.contains(" el "), "es")
        .otherwise("und")
    )
    cells = docs.select("lang", guess.alias("lang_guess")).groupBy(
        "lang", "lang_guess"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("frac_of_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_md5,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (lowercase, collapse whitespace,
    md5) — the exact-dedup key. Per-row expression; at 100 TB this is the
    map side of a dedup shuffle keyed on fp_md5."""
    docs = _docs(spark, sf_dir)
    normalized = F.trim(F.lower(F.regexp_replace("text", r"\s+", " ")))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fp_md5"),
        F.length("text").alias("n_chars"),
    )


@query(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer count: letter runs | digit runs | single
    punctuation — the standard byte-pair pre-segmentation regex family."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        ).alias("n_bpe_tokens"),
    )


# --------------------------------------------------------------------------
# Character-distribution entropy (quality signal)
# --------------------------------------------------------------------------
_ENTROPY_BOUND = 300  # bounded output slice


@query(
    "text_char_entropy",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
      FROM documents WHERE doc_id < {_ENTROPY_BOUND}),
    cc AS (
      SELECT doc_id, substr(text, i, 1) AS c, count(*) AS cnt
      FROM pos GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
             count(*) AS n_distinct_chars,
             sum(cnt * log2(CAST(cnt AS DOUBLE))) AS slc
      FROM cc GROUP BY 1)
    SELECT doc_id, n AS n_chars_counted, n_distinct_chars,
           round(log2(CAST(n AS DOUBLE)) - slc / n, 4) AS char_entropy_bits
    FROM agg
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — the
    Gopher-style quality gate that catches mojibake (entropy too high)
    and repeated-character spam (too low) that token-level filters miss.
    Identity: H = log2(n) - (sum c*log2(c)) / n over per-char counts c.

    Scale: the position explode is linear in corpus bytes and the
    (doc_id, char) count is map-side combinable on the doc-clustered
    explode output, so partials collapse before any exchange; the final
    per-doc reduce touches ~alphabet-size rows per doc. All expressions
    are JVM codegen (no Python). At 100 TB this is the shape you want:
    no driver state, no per-row Python, one narrow shuffle."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _ENTROPY_BOUND
    )
    ch = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        "text",
    ).select("doc_id", F.expr("substr(text, i, 1)").alias("c"))
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("cnt"))
    return cc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(
            F.log2(F.sum("cnt").cast("double"))
            - F.sum(F.col("cnt") * F.log2(F.col("cnt").cast("double")))
            / F.sum("cnt"),
            4,
        ).alias("char_entropy_bits"),
    )


# --------------------------------------------------------------------------
# N-gram novelty (data-accumulation diagnostic)
# --------------------------------------------------------------------------
_NOVELTY_BOUND = 300


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
        range(len(string_split(text, ' ')) - 2),
        i -> string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2] || ' ' ||
             string_split(text, ' ')[i+3])) AS s
      FROM documents WHERE doc_id < {_NOVELTY_BOUND}),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    first_seen AS (SELECT g, min(doc_id) AS fs FROM ex GROUP BY g)
    SELECT ex.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN fs = ex.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(sum(CASE WHEN fs = ex.doc_id THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty_rate
    FROM ex JOIN first_seen ON first_seen.g = ex.g
    GROUP BY ex.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the fraction of a document's
    distinct word-3-grams not seen in any LOWER-doc_id document — the
    marginal-value curve of data accumulation (when new shards stop
    bringing novel n-grams, more of the same source is worthless).
    A shingle is "novel" in the document where it first appears.

    Scale: shingle → min(doc_id) is one map-side-combinable aggregate
    over the exploded shingles (the same inverted index the Jaccard
    family builds); the join back is shingle-keyed and the per-doc
    reduce collapses on the already doc-clustered explode output. No
    all-pairs anything. Docs with fewer than 3 tokens have no shingles
    and produce no row (count parity pinned by the oracle)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _NOVELTY_BOUND
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    sh = toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, greatest(size(toks) - 3, 0)),"
                " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
            )
        ).alias("s"),
    )
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    first_seen = ex.groupBy("g").agg(F.min("doc_id").alias("fs"))
    novel = (F.col("fs") == F.col("doc_id")).cast("long")
    return (
        ex.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(F.sum(novel) * 1.0 / F.count(F.lit(1)), 4).alias(
                "novelty_rate"
            ),
        )
    )


# --------------------------------------------------------------------------
# Per-document keyword extraction (tf-idf top-3)
# --------------------------------------------------------------------------
_KW_BOUND = 100
_KW_TOP = 3


@query(
    "text_keywords_tfidf",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, w, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {_KW_BOUND})
      WHERE w <> '' GROUP BY 1, 2),
    df AS (SELECT w, count(*) AS df FROM w GROUP BY w),
    n AS (SELECT count(*) AS n
          FROM documents WHERE doc_id < {_KW_BOUND}),
    scored AS (
      SELECT doc_id, w.w, tf,
             tf * ln((n + 1.0) / (df + 1.0)) AS score
      FROM w JOIN df ON df.w = w.w CROSS JOIN n),
    ranked AS (
      SELECT doc_id, w, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w) AS rank
      FROM scored)
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS keyword,
           CAST(tf AS BIGINT) AS tf, round(score, 4) AS score
    FROM ranked WHERE rank <= {_KW_TOP}
    """,
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf-idf against
    the corpus slice — the summarization/tagging primitive (what is this
    document ABOUT) next to the similarity-oriented tf-idf above.

    Determinism: scores are ``tf * ln((N+1)/(df+1))`` — identical double
    products of exact integers — and ranking tie-breaks on the word, so
    equal-score keywords (same tf, same df) order identically in both
    engines. Scale: term counts and document frequencies are the same
    two map-side-combinable aggregates the tf-idf index builds; the df
    table broadcasts; rank<=3 compiles to WindowGroupLimit per-partition
    pruning."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _KW_BOUND
    )
    w = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = w.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        w.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            "tf",
            (
                F.col("tf")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
            ).alias("score"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(F.desc("score"), "w")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _KW_TOP)
        .select(
            "doc_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.col("w").alias("keyword"),
            F.col("tf").cast("bigint").alias("tf"),
            F.round("score", 4).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# Collocation extraction (pointwise mutual information)
# --------------------------------------------------------------------------
_PMI_BOUND = 150
_PMI_MIN_CO = 5
_PMI_TOP = 20


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH dw AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {_PMI_BOUND})
      WHERE w <> ''),
    n AS (SELECT count(DISTINCT doc_id) AS nd
          FROM documents WHERE doc_id < {_PMI_BOUND}),
    df AS (SELECT w, count(*) AS dfreq FROM dw GROUP BY w),
    co AS (
      SELECT a.w AS w1, b.w AS w2, count(*) AS cofreq
      FROM dw a JOIN dw b ON b.doc_id = a.doc_id AND a.w < b.w
      GROUP BY 1, 2
      HAVING count(*) >= {_PMI_MIN_CO}),
    scored AS (
      SELECT w1, w2, cofreq, da.dfreq AS df1, db.dfreq AS df2,
             ln(cofreq * 1.0 * nd / (da.dfreq * 1.0 * db.dfreq)) AS pmi
      FROM co JOIN df da ON da.w = w1 JOIN df db ON db.w = w2
      CROSS JOIN n)
    SELECT w1, w2, CAST(cofreq AS BIGINT) AS cofreq,
           CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
           round(pmi, 4) AS pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOP}
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the top word pairs by document-level
    pointwise mutual information (how much more often two words share a
    document than independence predicts) — the phrase-mining signal
    behind multi-word vocabulary entries and topic seeds.

    Determinism: PMI = ln(cofreq * N / (df1 * df2)) on exact integers —
    identical doubles in both engines; ranking tie-breaks on the words.
    Scale: the co-occurrence join is doc-bucketed (pairs only within a
    document, an inverted-index join like the shingle family — never
    corpus x corpus); the min-cofreq HAVING prunes the tail before
    scoring; top-k is TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _PMI_BOUND
    )
    dw = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    nd = docs.agg(F.countDistinct("doc_id").alias("nd"))
    df = dw.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq"))
    a = dw.select(F.col("doc_id"), F.col("w").alias("w1"))
    b = dw.select(F.col("doc_id"), F.col("w").alias("w2"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cofreq"))
        .filter(F.col("cofreq") >= _PMI_MIN_CO)
    )
    da = df.select(F.col("w").alias("w1"), F.col("dfreq").alias("df1"))
    db = df.select(F.col("w").alias("w2"), F.col("dfreq").alias("df2"))
    pmi = F.log(
        F.col("cofreq") * 1.0 * F.col("nd") / (F.col("df1") * 1.0 * F.col("df2"))
    )
    return (
        co.join(F.broadcast(da), "w1")
        .join(F.broadcast(db), "w2")
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            F.col("cofreq").cast("bigint").alias("cofreq"),
            F.col("df1").cast("bigint").alias("df1"),
            F.col("df2").cast("bigint").alias("df2"),
            F.round(pmi, 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP)
    )


# --------------------------------------------------------------------------
# Positional-index phrase search — exact multi-word phrase lookup via
# consecutive-position joins, the classic IR positional-index pattern
# (how a search engine answers "exact phrase" without re-scanning text).
# --------------------------------------------------------------------------
_PHRASES = [
    ("hash value table", "hash value table"),
    ("fast merge batch", "fast merge batch"),
    ("key agg row", "key agg row"),
]


@query(
    "text_phrase_search",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i - 1 AS p, string_split(text, ' ')[i] AS w
      FROM documents,
           unnest(generate_series(1, len(string_split(text, ' ')))) AS t(i)),
    phrases AS (SELECT * FROM (VALUES
      {", ".join(f"('{n}', '{p.split()[0]}', '{p.split()[1]}', '{p.split()[2]}')" for n, p in _PHRASES)})
      AS t(phrase, w1, w2, w3)),
    hits AS (
      SELECT ph.phrase, p1.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM phrases ph
      JOIN pos p1 ON p1.w = ph.w1
      JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.p = p1.p + 1
                 AND p2.w = ph.w2
      JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.p = p1.p + 2
                 AND p3.w = ph.w3
      GROUP BY 1, 2)
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_occurrences) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id
    FROM hits GROUP BY phrase
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search through a positional inverted index: tokens
    carry their position; a 3-word phrase is three self-joins of the
    postings on (doc, position+k) — the standard positional-index
    algorithm, no text re-scan, no regex.  Per phrase: matching docs,
    total occurrences, first doc id.

    Scale: the positional index is built once (posexplode — the same
    narrow pass as `posexplode_doc_tokens`) and would be written as a
    bucketed table keyed on word at 100 TB; each phrase lookup then
    touches only the phrase words' postings (the first join leg prunes
    to the rarest word's list).  The consecutive-position joins are
    keyed on (doc_id, position) — co-located after the first join, no
    extra shuffle per additional phrase word."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "w")
    )
    phrases = spark.createDataFrame(
        [(n, p.split()[0], p.split()[1], p.split()[2]) for n, p in _PHRASES],
        "phrase string, w1 string, w2 string, w3 string",
    )
    p1 = pos.join(F.broadcast(phrases), pos.w == phrases.w1).select(
        "phrase", "doc_id", "p", "w2", "w3"
    )
    p2 = pos.select(
        F.col("doc_id").alias("doc_id"), F.col("p").alias("p2"), F.col("w").alias("wb")
    )
    p3 = pos.select(
        F.col("doc_id").alias("doc_id"), F.col("p").alias("p3"), F.col("w").alias("wc")
    )
    hits = (
        p1.join(
            p2,
            (p1.doc_id == p2.doc_id)
            & (F.col("p2") == F.col("p") + 1)
            & (F.col("wb") == F.col("w2")),
        )
        .drop(p2.doc_id)
        .join(
            p3,
            (p1.doc_id == p3.doc_id)
            & (F.col("p3") == F.col("p") + 2)
            & (F.col("wc") == F.col("w3")),
        )
        .drop(p3.doc_id)
        .groupBy("phrase", p1.doc_id)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return hits.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_occurrences").alias("n_occurrences"),
        F.min("doc_id").alias("first_doc_id"),
    )
