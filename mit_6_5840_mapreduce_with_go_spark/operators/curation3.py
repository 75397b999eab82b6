"""Curation tranche 3: segment-level exact dedup with document
reassembly, context-window chunking, a hashed-feature linear quality
classifier, and a snapshot-diff (CDC) operator.

These extend the training-data curation surface (operators/curation.py,
curation2.py, pipelines.py) with four more stages a 100 TB corpus pass
needs:

- **paragraph/segment dedup** — the RefinedWeb/FineWeb-style pass that
  removes *repeated spans* (boilerplate, mirrored paragraphs) rather
  than whole documents.  The testdata corpus has no newlines, so the
  "paragraph" unit here is a fixed 10-word segment; the operator shape
  (explode → hash → canonical-min groupBy → windowed reassembly) is
  identical for any paragraph delimiter.
- **chunking with overlap** — how long documents become fixed-size
  training sequences (window 24 tokens, stride 16 → 8-token overlap).
- **linear quality classifier** — fastText-style inference: hash each
  token into one of 64 feature buckets, dot with a deterministic weight
  table, emit the integer logit.  The whole forward pass is a JVM-side
  expression fold — no model server, no Python UDF.
- **snapshot diff (CDC)** — classify per-user state rows as
  insert/delete/changed/unchanged between two activity-window
  snapshots; the audit artifact of an incremental MERGE pipeline.

Reference parity note: like everything in this tranche these have no
counterpart in the reference engine (a 2-phase MapReduce runtime —
src/mr/coordinator.go, src/mr/worker.go); they are north-star additions
per the driver's BASELINE.json. The segment-hash → canonical-owner
pattern is the reference's reduce-bucket idea (src/mr/worker.go:28-34)
pointed at span-level dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# --------------------------------------------------------------------------
# Segment-level exact dedup ("paragraph" dedup on a newline-free corpus)
# --------------------------------------------------------------------------
SEG_WORDS = 10
# Canonical-owner ordering key: first occurrence = lowest (doc_id, seg_idx).
# Encoded as doc_id*100000 + seg_idx so min() is a plain map-side-combinable
# BIGINT agg (seg_idx < 100000 for any document under ~1M words; doc ids up
# to ~9e13 stay inside int64).
_SEG_KEY_MUL = 100000

_SEGS_SPARK = (
    f"transform(sequence(0, CAST(ceil(size(split(text, ' ')) / {SEG_WORDS}.0) AS INT) - 1),"
    f" s -> array_join(slice(split(text, ' '), s * {SEG_WORDS} + 1, {SEG_WORDS}), ' '))"
)


@query(
    "pipeline_paragraph_dedup",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    segs AS (
      SELECT doc_id, CAST(s.seg AS BIGINT) AS seg_idx,
             array_to_string(ws[CAST(s.seg * {SEG_WORDS} + 1 AS BIGINT)
                               :CAST(s.seg * {SEG_WORDS} + {SEG_WORDS} AS BIGINT)],
                             ' ') AS seg_text
      FROM docs, unnest(range(0, CAST(ceil(len(ws) / {SEG_WORDS}.0) AS BIGINT))) AS s(seg)),
    hashed AS (
      SELECT doc_id, seg_idx, seg_text, md5(seg_text) AS seg_md5,
             doc_id * {_SEG_KEY_MUL} + seg_idx AS okey
      FROM segs),
    canon AS (
      SELECT seg_md5, min(okey) AS canon_key FROM hashed GROUP BY seg_md5),
    j AS (
      SELECT h.doc_id, h.seg_idx, h.seg_text, (h.okey = c.canon_key) AS kept
      FROM hashed h JOIN canon c USING (seg_md5)),
    perdoc AS (
      SELECT doc_id, count(*) AS n_segs,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM j GROUP BY doc_id),
    keptagg AS (
      SELECT doc_id, md5(string_agg(seg_text, ' ' ORDER BY seg_idx)) AS dedup_md5
      FROM j WHERE kept GROUP BY doc_id)
    SELECT p.doc_id, p.n_segs, p.n_kept,
           round(p.n_kept * 1.0 / p.n_segs, 4) AS retained_ratio,
           coalesce(k.dedup_md5, md5('')) AS dedup_md5
    FROM perdoc p LEFT JOIN keptagg k USING (doc_id)
    """,
)
def pipeline_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact segment dedup with reassembly accounting: every
    {SEG_WORDS}-word segment is hashed; only its canonical occurrence
    (lowest (doc_id, position)) survives; each document reports how much
    of it remains and the md5 of its deduplicated text.

    Scale: the explode is a narrow ~n_segs-per-doc fan-out feeding ONE
    shuffle on the 16-byte segment hash (min+count are map-side
    combinable); reassembly groups by doc_id — the second and last
    shuffle.  No all-pairs stage, no driver state; survivor text at
    100 TB would be written partitioned instead of hashed.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    segs = docs.select(
        "doc_id",
        F.posexplode(F.expr(_SEGS_SPARK)).alias("seg_idx", "seg_text"),
    ).select(
        "doc_id",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        "seg_text",
        F.md5("seg_text").alias("seg_md5"),
        (F.col("doc_id") * _SEG_KEY_MUL + F.col("seg_idx")).alias("okey"),
    )
    canon = segs.groupBy("seg_md5").agg(F.min("okey").alias("canon_key"))
    j = segs.join(canon, "seg_md5").withColumn(
        "kept", F.col("okey") == F.col("canon_key")
    )
    perdoc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    )
    keptagg = (
        j.filter("kept")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(seg_idx, seg_text))),"
                        " x -> x.seg_text)"
                    ),
                )
            ).alias("dedup_md5")
        )
    )
    return (
        perdoc.join(keptagg, "doc_id", "left")
        .select(
            "doc_id",
            "n_segs",
            "n_kept",
            F.round(F.col("n_kept") * 1.0 / F.col("n_segs"), 4).alias("retained_ratio"),
            F.coalesce("dedup_md5", F.md5(F.lit(""))).alias("dedup_md5"),
        )
    )


# --------------------------------------------------------------------------
# Context-window chunking with overlap
# --------------------------------------------------------------------------
CHUNK_WORDS = 24
CHUNK_STRIDE = 16  # overlap = CHUNK_WORDS - CHUNK_STRIDE = 8 tokens

_N_CHUNKS_SPARK = (
    f"CASE WHEN size(split(text, ' ')) <= {CHUNK_WORDS} THEN 1"
    f" ELSE 1 + CAST(ceil((size(split(text, ' ')) - {CHUNK_WORDS}) / {CHUNK_STRIDE}.0) AS INT) END"
)
_CHUNKS_SPARK = (
    f"transform(sequence(0, {_N_CHUNKS_SPARK} - 1), k -> named_struct("
    f"'n_tokens', size(slice(split(text, ' '), k * {CHUNK_STRIDE} + 1, {CHUNK_WORDS})),"
    f"'chunk_md5', md5(array_join(slice(split(text, ' '), k * {CHUNK_STRIDE} + 1, {CHUNK_WORDS}), ' '))))"
)


@query(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sized AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) <= {CHUNK_WORDS} THEN 1
                  ELSE 1 + CAST(ceil((len(ws) - {CHUNK_WORDS}) / {CHUNK_STRIDE}.0) AS BIGINT)
             END AS n_chunks
      FROM docs)
    SELECT doc_id, CAST(c.k AS INTEGER) AS chunk_idx,
           CAST(len(ws[CAST(c.k * {CHUNK_STRIDE} + 1 AS BIGINT)
                       :CAST(c.k * {CHUNK_STRIDE} + {CHUNK_WORDS} AS BIGINT)]) AS INTEGER)
             AS n_tokens,
           md5(array_to_string(ws[CAST(c.k * {CHUNK_STRIDE} + 1 AS BIGINT)
                                  :CAST(c.k * {CHUNK_STRIDE} + {CHUNK_WORDS} AS BIGINT)],
                               ' ')) AS chunk_md5
    FROM sized, unnest(range(0, n_chunks)) AS c(k)
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size training-sequence chunking: window {CHUNK_WORDS} tokens,
    stride {CHUNK_STRIDE} ({CHUNK_WORDS - CHUNK_STRIDE}-token overlap so no
    boundary context is lost), final partial chunk kept.  Chunk identity is
    (doc_id, chunk_idx) — deterministic across runs and cluster sizes.

    Scale: pure narrow map-side fan-out (transform + posexplode inside one
    projection — no shuffle at all); at 100 TB the chunk rows stream
    straight into a partitioned parquet sink.  The md5 here stands in for
    the chunk payload; a real pipeline would carry the token array.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return docs.select(
        "doc_id",
        F.posexplode(F.expr(_CHUNKS_SPARK)).alias("chunk_idx", "c"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# Hashed-feature linear quality classifier (fastText-style inference)
# --------------------------------------------------------------------------
N_BUCKETS = 64
_W_MUL = 2654435761  # Knuth multiplicative constant (public)
_W_ADD = 97531
_W_MOD = 1000003
_W_SHIFT = 501001  # centers weights on ~0: range [-501001, 499002] micro-units

# Per-token weight: charfold-hash the token (h*31+c mod 2^32, the same
# cross-engine fold as dedup_minhash_xengine), reduce to a feature bucket,
# map the bucket through a fixed affine-mod pseudo-weight table.  Every
# intermediate stays far inside int64: bucket < 64, bucket*_W_MUL < 1.7e11.
_TOKEN_WEIGHT_SPARK = (
    "((((aggregate(transform(sequence(1, greatest(length(t), 1)),"
    " i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)),"
    " CAST(7 AS BIGINT), (h, c) -> (h * 31 + c) % 4294967296))"
    f" % {N_BUCKETS}) * {_W_MUL} + {_W_ADD}) % {_W_MOD}) - {_W_SHIFT}"
)

_TOKEN_WEIGHT_DUCK = (
    "((((list_reduce(list_prepend(CAST(7 AS BIGINT),"
    " list_transform(range(1, greatest(length(t), 1) + 1),"
    " i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),"
    " (h, c) -> (h * 31 + c) % 4294967296))"
    f" % {N_BUCKETS}) * {_W_MUL} + {_W_ADD}) % {_W_MOD}) - {_W_SHIFT}"
)


@query(
    "text_quality_classifier_linear",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> {_TOKEN_WEIGHT_DUCK})) AS BIGINT) AS logit_micros,
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> {_TOKEN_WEIGHT_DUCK})) AS BIGINT) > 0 AS keep_label
    FROM documents
    """,
)
def text_quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-quality classifier inference, the fastText shape:
    token → hash bucket (64 features) → weight lookup → summed logit →
    threshold label.  Weights come from a fixed affine-mod table so the
    forward pass is integer-exact in any engine; swapping in trained
    weights is a broadcast map lookup with the identical plan.

    Scale: the entire forward pass is ONE whole-stage-codegen projection
    (an expression fold per row) — no shuffle, no UDF, no model-server
    round trip.  This is the 100 TB way to run a linear/ngram quality
    gate: classifier inference at scan speed.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    logit = F.expr(
        f"aggregate(split(text, ' '), CAST(0 AS BIGINT),"
        f" (acc, t) -> acc + ({_TOKEN_WEIGHT_SPARK}))"
    )
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        logit.alias("logit_micros"),
        (logit > 0).alias("keep_label"),
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC): classify keyed-state changes between two snapshots
# --------------------------------------------------------------------------
_SNAP_T1 = "2024-01-15 00:00:00"
_SNAP_T2 = "2024-01-22 00:00:00"
_SNAP_T0 = "2024-01-08 00:00:00"  # T1 minus the 7-day activity window

_SNAP_STATE_DUCK = """
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
               AS value_micros
      FROM events WHERE ts > TIMESTAMP '{lo}' AND ts <= TIMESTAMP '{hi}'
      GROUP BY user_id"""


@query(
    "maintenance_snapshot_diff",
    oracle=f"""
    WITH s1 AS ({_SNAP_STATE_DUCK.format(lo=_SNAP_T0, hi=_SNAP_T1)}),
    s2 AS ({_SNAP_STATE_DUCK.format(lo=_SNAP_T1, hi=_SNAP_T2)})
    SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                WHEN s1.n_events = s2.n_events
                     AND s1.value_micros = s2.value_micros THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           coalesce(s1.n_events, 0) AS old_n_events,
           coalesce(s2.n_events, 0) AS new_n_events,
           coalesce(s2.value_micros, 0) - coalesce(s1.value_micros, 0)
             AS value_micros_delta
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    """,
)
def maintenance_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two activity-window snapshots of
    per-user state (event count + integer-quantized value sum over a
    7-day window): each key is classified insert / delete / changed /
    unchanged, with the value delta — the audit artifact that drives an
    incremental MERGE (sources/merge.py pattern) instead of a full
    rewrite.

    Scale: each snapshot is one time-pruned scan (the ts predicates reach
    the parquet scan; on a date-partitioned 100 TB table this is partition
    pruning) + one map-side-combinable agg; the diff itself is a single
    full-outer join on the key.  Quantized integer sums make the
    changed/unchanged verdict order-independent and engine-exact —
    a float sum would misclassify on reordering alone.
    """
    events = load_table(spark, sf_dir, "events")

    def snapshot(lo: str, hi: str) -> DataFrame:
        return (
            events.filter((F.col("ts") > F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
                    "value_micros"
                ),
            )
        )

    s1 = snapshot(_SNAP_T0, _SNAP_T1).alias("s1")
    s2 = snapshot(_SNAP_T1, _SNAP_T2).alias("s2")
    change = (
        F.when(F.col("s1.user_id").isNull(), "insert")
        .when(F.col("s2.user_id").isNull(), "delete")
        .when(
            (F.col("s1.n_events") == F.col("s2.n_events"))
            & (F.col("s1.value_micros") == F.col("s2.value_micros")),
            "unchanged",
        )
        .otherwise("changed")
    )
    return s1.join(s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer").select(
        F.coalesce("s1.user_id", "s2.user_id").alias("user_id"),
        change.alias("change_type"),
        F.coalesce("s1.n_events", F.lit(0)).alias("old_n_events"),
        F.coalesce("s2.n_events", F.lit(0)).alias("new_n_events"),
        (
            F.coalesce("s2.value_micros", F.lit(0))
            - F.coalesce("s1.value_micros", F.lit(0))
        ).alias("value_micros_delta"),
    )
