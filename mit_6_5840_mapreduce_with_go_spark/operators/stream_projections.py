"""Batch projections of the streaming twins' FINAL STATE tables —
driver-window evidence for the streaming semantics.

The stateful streaming operators (streaming/kv_state.py, ewma.py,
sketch_state.py) are proven equal to their batch counterparts by the
stream==batch pytest equality suites (tests/test_streaming*.py), but
structured-streaming queries cannot run inside the driver's batch
CORRECTNESS window.  Each query here recomputes, in batch, exactly the
state table the twin converges to after consuming the whole events
table — with the SAME output schema as the twin — and does so through
the twin's own algebra rather than the one-shot batch plan:

- ``stream_kv_cas_final_state`` folds each key's op log in TWO
  time-ordered segments, feeding segment 1's final state in as segment
  2's initial state — the checkpoint-restart composition the streaming
  CAS operator performs at every micro-batch boundary.  Fold
  composition is exact (same operation sequence), so the result is
  bit-identical to the single-pass ``kv_cas_replay``.
- ``stream_ewma_final_state`` does the same two-segment composition
  for the alpha = 0.5 smoothing fold (power-of-two multiplies keep it
  bit-exact across the split).
- ``stream_kmv_final_state`` builds the K-minimum-values sketch per
  segment and MERGES the two sketches (union, dedup, truncate to K) —
  the mergeable-sketch property the streaming KMV operator relies on;
  output schema matches streaming/sketch_state.KMV_OUTPUT_SCHEMA
  (``n_hashes_kept`` = values actually held, not total distinct).

Chain of evidence: driver green here + stream==batch equality in pytest
=> the streaming state machines compute what the oracles say.

Scale: the segment folds are the same one-shuffle gather-fold plans as
their parents; the KMV merge ranks within (type, segment) BEFORE the
final exchange, so the merge shuffle carries at most K rows per
segment per type — the partial-aggregate shape that makes sketches
stream at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import fnv32a_col
from ..registry import query
from ..sources import load_table
from .crawl import FRONTIER_ORACLE
from .kv import CAS_ORACLE, _ops
from .relational3 import _KMV_K


@query("stream_kv_cas_final_state", oracle=CAS_ORACLE)
def stream_kv_cas_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAS fold as the streaming twin executes it: each key's op log is
    folded in two time-ordered segments with an explicit state handoff
    (segment 1's final (value, version, counters) initializes segment
    2's fold) — the micro-batch/checkpoint-restart composition of
    streaming/kv_state.py, whose equality with the one-shot fold is
    what makes streaming CAS replay-safe.  Oracle: CAS_ORACLE verbatim
    (the composed fold must land on the same final state)."""
    ops = _ops(spark, sf_dir)
    gathered = ops.groupBy("key").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "expected", "value"))
        ).alias("oplist")
    )
    init = F.struct(
        F.lit(None).cast("string").alias("value"),
        F.lit(0).cast("long").alias("version"),
        F.lit(0).cast("long").alias("n_ok"),
        F.lit(0).cast("long").alias("n_errversion"),
    )

    def step(acc, op):
        applied = F.struct(
            op["value"].alias("value"),
            (acc["version"] + 1).alias("version"),
            (acc["n_ok"] + 1).alias("n_ok"),
            acc["n_errversion"].alias("n_errversion"),
        )
        rejected = F.struct(
            acc["value"].alias("value"),
            acc["version"].alias("version"),
            acc["n_ok"].alias("n_ok"),
            (acc["n_errversion"] + 1).alias("n_errversion"),
        )
        return F.when(op["expected"] == acc["version"], applied).otherwise(
            rejected
        )

    n = F.size("oplist")
    half = (n / 2).cast("int")
    seg1 = F.slice(F.col("oplist"), F.lit(1), half)
    seg2 = F.slice(F.col("oplist"), half + 1, n - half)
    mid_state = F.aggregate(seg1, init, step)
    final_state = F.aggregate(seg2, mid_state, step)
    return gathered.select("key", final_state.alias("st")).select(
        "key", "st.value", "st.version", "st.n_ok", "st.n_errversion"
    )


@query(
    "stream_ewma_final_state",
    oracle="""
    WITH RECURSIVE o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 100),
    r AS (
      SELECT user_id, rn, value AS s FROM o WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.value * 0.5 + r.s * 0.5
      FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT user_id, CAST(rn AS BIGINT) AS n_events,
           round(s, 4) AS ewma_value
    FROM (SELECT user_id, rn, s,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY rn DESC) AS k
          FROM r)
    WHERE k = 1
    """,
)
def stream_ewma_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha = 0.5) as the streaming twin executes it: per-user
    two-segment fold with the smoothed value handed from segment 1 to
    segment 2 as initial state — streaming/ewma.py's micro-batch
    composition in batch form.  Power-of-two multiplies make the split
    fold bit-identical to the one-shot fold, so the recursive DuckDB
    oracle (same as events_ewma_value) hash-matches."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    gathered = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("ordered")
    )
    init = F.lit(None).cast("double")

    def step(acc, x):
        return F.when(acc.isNull(), x["value"]).otherwise(
            x["value"] * 0.5 + acc * 0.5
        )

    n = F.size("ordered")
    half = (n / 2).cast("int")
    seg1 = F.slice(F.col("ordered"), F.lit(1), half)
    seg2 = F.slice(F.col("ordered"), half + 1, n - half)
    mid = F.aggregate(seg1, init, step)
    final = F.aggregate(seg2, mid, step)
    return gathered.select(
        "user_id",
        n.cast("bigint").alias("n_events"),
        F.round(final, 4).alias("ewma_value"),
    )


@query(
    "stream_kmv_final_state",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             list_reduce(
               list_prepend(CAST(2166136261 AS BIGINT),
                            list_transform(string_split(CAST(user_id AS VARCHAR), ''),
                                           c -> CAST(ord(c) AS BIGINT))),
               (h, b) -> (xor(h, b) * 16777619) % 4294967296) AS hv
      FROM events),
    r AS (SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM h)
    SELECT event_type,
           CAST(CASE WHEN max(cnt) >= {_KMV_K} THEN {_KMV_K}
                     ELSE max(cnt) END AS BIGINT) AS n_hashes_kept,
           round(CASE WHEN max(cnt) >= {_KMV_K}
                      THEN ({_KMV_K} - 1) * 4294967296.0
                           / max(CASE WHEN rn = {_KMV_K} THEN hv END)
                      ELSE max(cnt) * 1.0 END, 4) AS kmv_estimate
    FROM r
    WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
)
def stream_kmv_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch as the streaming twin holds it: events split into two
    arbitrary segments (event_id parity — KMV state is a SET, so any
    split works), the K smallest distinct FNV-32a hashes computed per
    segment, then the two sketches MERGED (union, dedup, truncate to K)
    — streaming/sketch_state.py's "union, sort, truncate" micro-batch
    step.  Output schema matches KMV_OUTPUT_SCHEMA: ``n_hashes_kept``
    is the values the state actually holds (min(distinct, K)), and the
    estimate is oracle-checked exactly, not just bounded."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            (F.col("event_id") % 2).alias("seg"),
            F.col("user_id").cast("string").alias("key"),
        )
        .distinct()
        .select("event_type", "seg", fnv32a_col(F.col("key")).alias("hv"))
        .distinct()
    )
    w_seg = Window.partitionBy("event_type", "seg").orderBy("hv")
    per_segment_mins = (
        h.withColumn("rn", F.row_number().over(w_seg))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "hv")
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    merged = per_segment_mins.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    agg = merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("kept"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("hv"))).alias("hk"),
    )
    est = F.when(
        F.col("kept") >= _KMV_K,
        (_KMV_K - 1) * F.lit(4294967296.0) / F.col("hk"),
    ).otherwise(F.col("kept") * 1.0)
    return agg.select(
        "event_type",
        F.col("kept").cast("bigint").alias("n_hashes_kept"),
        F.round(est, 4).alias("kmv_estimate"),
    )


@query(
    "stream_cdc_final_state",
    oracle="""
    WITH seg AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_id % 2
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    latest AS (SELECT user_id, event_id, value FROM seg WHERE rn = 1),
    final AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rk
      FROM latest)
    SELECT user_id,
           CAST(event_id AS BIGINT) AS last_event_id,
           value AS last_value,
           CAST(user_id % 8 AS BIGINT) AS bucket
    FROM final WHERE rk = 1
    """,
)
def stream_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert state as the streaming twin maintains it
    (streaming/cdc.py: per-micro-batch latest-per-key reduction, then a
    partition-scoped MERGE whose cross-batch winner is the larger
    last_event_id).  Batch projection: events split into two arbitrary
    segments (event_id parity — the MERGE is last-writer-wins, so any
    split composes), each reduced with the twin's own in-batch order
    (ts DESC, event_id DESC), then merged with the twin's own MERGE
    order (last_event_id).  Output = the state table
    ``stream_upsert_state`` converges to; the batch twin equality for
    the streaming leg lives in tests/test_streaming_cdc.py."""
    ev = load_table(spark, sf_dir, "events")
    w_seg = Window.partitionBy(
        "user_id", (F.col("event_id") % 2).alias("seg")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        ev.withColumn("rn", F.row_number().over(w_seg))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )
    w_merge = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        latest.withColumn("rk", F.row_number().over(w_merge))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").cast("bigint").alias("last_event_id"),
            F.col("value").alias("last_value"),
            F.pmod("user_id", F.lit(8)).cast("bigint").alias("bucket"),
        )
    )


@query("stream_frontier_final_state", oracle=FRONTIER_ORACLE)
def stream_frontier_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier dedup as the streaming twin executes it
    (streaming/windows.py::stream_frontier_unique): the URL corpus is
    split into two micro-batch segments (doc parity), each segment is
    deduplicated, and segment 2 keeps only keys ABSENT from segment
    1's state (the anti-join a streaming dropDuplicates state store
    performs); the final state is the union.  Raw/doc counters
    accumulate additively across segments, the way streaming counters
    do.  Oracle: FRONTIER_ORACLE verbatim — the composed state must
    land on the identical per-host census."""
    from .crawl import _planted_raw_urls, normalize_urls

    docs = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id")
    norm = normalize_urls(_planted_raw_urls(docs), "url").withColumn(
        "seg", (F.col("doc_id") % 2).cast("int")
    )
    # additive per-segment counters (micro-batch partials summed)
    raw_agg = (
        norm.groupBy("host", "seg")
        .agg(
            F.count(F.lit(1)).alias("n_raw_seg"),
            F.countDistinct("doc_id").alias("n_docs_seg"),
        )
        .groupBy("host")
        .agg(
            F.sum("n_raw_seg").alias("n_raw"),
            # doc ids are parity-disjoint across segments, so the doc
            # counter is additive too — same invariant the streaming
            # counter relies on (each doc arrives in exactly one batch)
            F.sum("n_docs_seg").alias("n_docs"),
        )
    )
    s1 = (
        norm.filter(F.col("seg") == 0)
        .select("host", "norm_url")
        .distinct()
    )
    s2 = (
        norm.filter(F.col("seg") == 1)
        .select("host", "norm_url")
        .distinct()
        .join(s1, ["host", "norm_url"], "left_anti")
    )
    state = s1.unionByName(s2)
    uniq = state.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.length("norm_url")).alias("norm_len_sum"),
    )
    return raw_agg.join(uniq, "host").select(
        "host",
        F.col("n_raw").cast("long").alias("n_raw"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("norm_len_sum").cast("long").alias("norm_len_sum"),
    )
