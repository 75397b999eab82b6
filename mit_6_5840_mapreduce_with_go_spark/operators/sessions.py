"""Sessionization and TF-IDF similarity — two classic large-scale
pipeline operators with non-obvious Spark-native formulations.

No reference counterpart (SURVEY.md §2.D) — north-star additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

SESSION_GAP_MIN = 30


@query(
    "events_sessionization",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec,
           round(sum(value), 4) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``
    (gap = {gap} min): consecutive events of a user merge while the gap
    is < the threshold. The oracle derives identical sessions with the
    classic lag()+cumulative-sum construction — the two formulations
    agree because session_window's merge window is end-exclusive
    (an event exactly `gap` after the last one starts a new session).

    Scale: session_window is a single shuffle on user_id and works
    unchanged in Structured Streaming (state = open sessions).
    """.format(gap=SESSION_GAP_MIN)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")).alias(
                "duration_sec"
            ),
            "session_value",
        )
    )


@query(
    "sim_tfidf_topk",
    oracle="""
    WITH terms AS (
      SELECT doc_id, word, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY doc_id, word),
    n_docs AS (SELECT count(*) AS n FROM documents),
    idf AS (
      SELECT word, ln((SELECT n FROM n_docs) / count(*)) + 1.0 AS idf
      FROM terms GROUP BY word),
    weighted AS (
      SELECT t.doc_id, t.word, t.tf * i.idf AS w
      FROM terms t JOIN idf i ON t.word = i.word),
    norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM weighted GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dp
      FROM weighted a JOIN weighted b ON a.word = b.word AND a.doc_id < b.doc_id
      WHERE a.doc_id < 100
      GROUP BY 1, 2),
    scored AS (
      SELECT doc_a, doc_b, dp / (na.nrm * nb.nrm) AS cos_raw
      FROM dots JOIN norms na ON na.doc_id = doc_a
                JOIN norms nb ON nb.doc_id = doc_b)
    SELECT doc_a, doc_b, rank, round(cos_raw, 4) AS cos_sim
    FROM (SELECT doc_a, doc_b, cos_raw,
                 CAST(row_number() OVER (PARTITION BY doc_a
                                    ORDER BY cos_raw DESC, doc_b) AS INTEGER) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def sim_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF document similarity, top-3 neighbors per query doc
    (doc_id < 100), computed the scalable way: dot products via the TERM
    inverted-index join (docs only pair where they share a term — the
    sparse-vector formulation), never a dense cross join. idf = ln(N/df)+1.

    Scale: the ≤100-doc query side broadcasts, so the corpus postings
    NEVER shuffle on the hot `word` key; stop-word-like hot terms (huge
    postings) would be capped or dropped by df-threshold — at this corpus
    size the full join is exact.
    """
    # fan_out deliberately OFF: the explode/tf work is cheap relative to
    # the pair join, and the round-robin repartition's extra exchange
    # (recomputed by every consumer of `weighted`) measured ~40% slower
    # at sf0.1 (7.8s → 4.7s steady-state). At real scale the scan splits
    # by itself and fan_out is a no-op anyway.
    # The explicit isNotNull mirrors the _bm25_postings exchange-reuse
    # discipline (uniform predicates keep shared subtrees canonical so
    # ReuseExchange can fire).  Here it is uniformity, not a measured
    # win: tfidf's final plan already reuses its exchanges with or
    # without this filter (verified by removing it — identical
    # Generate/ReusedExchange counts), so the filter is kept only so
    # every postings derivation in the repo has the same base shape.
    # test_plans3 pins ReusedExchange presence in the executed plan.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    terms = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus size from the RAW scan (metadata-only parquet count — through
    # the fan-out exchange it would become a full shuffle + count job)
    n_docs = load_table(spark, sf_dir, "documents").count()
    idf = terms.groupBy("word").agg(
        (F.log(F.lit(float(n_docs)) / F.count(F.lit(1))) + 1.0).alias("idf")
    )
    # weighted feeds four consumers (norms, both dot sides); its groupBy
    # exchange is identical in each, so ReusedExchange computes it once —
    # measured equal to an explicit persist() without the blocking
    # materialization job (and without persist's cold-run penalty).
    # idf joins as a SHUFFLE join on word, NOT a broadcast: unlike the
    # BM25 family (where scoring only needs the bounded query vocabulary),
    # every posting needs its idf here — the per-doc NORMS sum over all
    # words — and a full-vocab broadcast is ~10 GB at a 100 TB corpus per
    # the repo's Heaps fit.  The join is free of extra exchanges anyway:
    # idf comes out of terms.groupBy("word"), so both join sides share the
    # hash-partition-on-word exchange (ReusedExchange) and the join is
    # co-partitioned.
    weighted = terms.join(idf, "word").select(
        "doc_id", "word", (F.col("tf") * F.col("idf")).alias("w")
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = weighted.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("doc_a"), "word", F.col("w").alias("wa")
    )
    # Prune the corpus side to the QUERY vocabulary before anything else:
    # only postings sharing a word with some query doc can contribute a
    # dot product, and the broadcast semi-join drops them map-side —
    # BEFORE the doc_b exchange below, which would otherwise shuffle the
    # full corpus postings.
    qwords = a.select("word").distinct()
    # Re-cluster the surviving postings by document BEFORE the pair join:
    # weighted comes out hash-partitioned on word, which scatters a
    # document's postings across partitions, so the (doc_a, doc_b)
    # partial aggregation below combines almost nothing and the exchange
    # carries ~every joined row. Partitioned by doc_b, each partition
    # holds complete documents and the partials collapse to one row per
    # pair (~30x fewer shuffled rows; measured faster at sf0.1 and
    # structurally necessary at 100 TB).
    b = (
        weighted.join(F.broadcast(qwords), "word")
        .select(F.col("doc_id").alias("doc_b"), "word", F.col("w").alias("wb"))
        .repartition(F.col("doc_b"))
    )
    # The query side is ~100 docs' postings — broadcast it so the full
    # postings table never shuffles on the hot `word` key (this is the
    # 100 TB-critical choice: the corpus side streams map-side).
    dots = (
        b.join(F.broadcast(a), "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    # Norms are one float per doc — broadcast both lookup sides (the
    # candidate-pair set is ~100× LARGER than the norm table here;
    # broadcasting pairs would collect+rebroadcast half a million rows).
    # At corpus sizes where norms outgrow the broadcast threshold, this
    # becomes a shuffle join on doc_b — AQE picks that automatically.
    scored = (
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn("cos_raw", F.col("dp") / (F.col("na") * F.col("nb")))
    )
    w = W.partitionBy("doc_a").orderBy(F.col("cos_raw").desc(), F.col("doc_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_a", "doc_b", "rank", F.round("cos_raw", 4).alias("cos_sim"))
    )
