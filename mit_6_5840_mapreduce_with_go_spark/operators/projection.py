"""Johnson-Lindenstrauss random projection + deterministic epoch shuffle —
two training-pipeline primitives over embeddings / documents.

No reference counterpart (SURVEY.md §2.D) — north-star additions:
- JL (Achlioptas 2003, public: database-friendly ±1 projections) shrinks
  embedding width for cheaper downstream ANN/clustering while provably
  preserving pairwise distances.
- The epoch shuffle is the data-loader side of training: a reproducible
  global permutation of the corpus, sharded for parallel readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_JL_IN = 64
_JL_OUT = 16
# sign(i, j) = ±1 from an affine-mod hash of the cell — the projection
# "matrix" is an expression, never a materialized table
_JL_A, _JL_B, _JL_P = 2654435761 % 1000003, 97531, 1000003


def _jl_sign(i: int) -> str:
    """Spark/DuckDB-shared integer sign expression for output dim i
    (j is the lambda variable): ±1 via parity of an affine-mod hash."""
    return f"(1 - 2 * ((({_JL_A} * {i} + {_JL_B} * j) % {_JL_P}) % 2))"


def _jl_y_spark(i: int) -> str:
    # x_micro_j = floor(x_j * 1e6): one IEEE multiply + floor per cell,
    # identical in both engines; the signed sum is exact BIGINT
    return (
        f"aggregate(transform(sequence(0, {_JL_IN - 1}),"
        f" j -> {_jl_sign(i)} * CAST(floor(embedding[j] * 1000000.0) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


_X_MICRO_DUCK = (
    # CAST to DOUBLE before the multiply: a DuckDB float * 1000000.0
    # (DECIMAL literal) runs in FLOAT and rounds differently than
    # Spark's float->double promotion
    "CAST(floor(CAST(embedding[j + 1] AS DOUBLE) * 1000000) AS BIGINT)"
)


def _jl_y_duck(i: int) -> str:
    return (
        f"list_sum(list_transform(range(0, {_JL_IN}),"
        f" j -> {_jl_sign(i)} * {_X_MICRO_DUCK}))"
    )


@query(
    "mm_jl_projection",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             {", ".join(f"CAST({_jl_y_duck(i)} AS BIGINT) AS y{i}" for i in range(_JL_OUT))},
             CAST(list_sum(list_transform(range(0, {_JL_IN}),
               j -> {_X_MICRO_DUCK} * {_X_MICRO_DUCK})) AS BIGINT) AS x_norm2
      FROM embeddings)
    SELECT vec_id, y0, y1, x_norm2,
           CAST({" + ".join(f"y{i} * y{i}" for i in range(_JL_OUT))} AS BIGINT)
             AS y_norm2,
           round(sqrt(({" + ".join(f"y{i} * y{i}" for i in range(_JL_OUT))})
                      / ({_JL_OUT}.0 * x_norm2)), 4) AS distortion
    FROM proj WHERE x_norm2 > 0
    """,
)
def mm_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> {d} dims with a database-friendly ±1
    matrix (Achlioptas): sign(i,j) = parity of an affine-mod hash, so
    the matrix is an EXPRESSION — nothing is materialized, broadcast, or
    joined.  Inputs quantize to integer micros, every projected
    coordinate is an exact BIGINT signed sum, and the reported
    distortion sqrt(||y||^2 / (d * ||x||^2)) (JL preserves it near 1)
    divides exact integers.  Emits the first two coordinates + norms per
    vector.

    Scale: the whole operator is ONE narrow whole-stage-codegen
    projection over the scan — zero shuffles, zero Python; re-widening a
    100 TB embedding table costs exactly one pass.  The {d} per-dim
    folds unroll at plan-build time (same trick as the LSH hyperplane
    dots in operators/similarity.py).
    """.format(d=_JL_OUT)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    ys = [F.expr(_jl_y_spark(i)).alias(f"y{i}") for i in range(_JL_OUT)]
    x_norm2 = F.expr(
        f"aggregate(transform(sequence(0, {_JL_IN - 1}),"
        f" j -> CAST(floor(embedding[j] * 1000000.0) AS BIGINT)"
        f" * CAST(floor(embedding[j] * 1000000.0) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    proj = emb.select("vec_id", *ys, x_norm2.alias("x_norm2"))
    y_norm2 = None
    for i in range(_JL_OUT):
        term = F.col(f"y{i}") * F.col(f"y{i}")
        y_norm2 = term if y_norm2 is None else y_norm2 + term
    return (
        proj.filter(F.col("x_norm2") > 0)
        .select(
            "vec_id",
            "y0",
            "y1",
            "x_norm2",
            y_norm2.alias("y_norm2"),
            F.round(
                F.sqrt(y_norm2 / (float(_JL_OUT) * F.col("x_norm2"))), 4
            ).alias("distortion"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffle: reproducible global training order
# --------------------------------------------------------------------------
_EP_A, _EP_B, _EP_P = 2654435761 % 999983, 424243, 999983
_EP_SHARDS = 16
_EP_CHK = 1_000_000_007


@query(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             ({_EP_A} * (doc_id % {_EP_P}) + {_EP_B}) % {_EP_P} AS order_key
      FROM documents),
    sharded AS (
      SELECT doc_id, order_key, order_key % {_EP_SHARDS} AS shard,
             row_number() OVER (PARTITION BY order_key % {_EP_SHARDS}
                                ORDER BY order_key, doc_id) AS pos
      FROM keyed)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(order_key) AS BIGINT) AS min_key,
           CAST(max(order_key) AS BIGINT) AS max_key,
           -- terms reduced mod p BEFORE the sum, sum in exact decimal:
           -- a bare int64 sum of pos*doc_id wraps at scale in Spark
           -- while DuckDB promotes to HUGEINT
           CAST(CAST(sum(CAST((pos % {_EP_CHK}) * (doc_id % {_EP_CHK})
                              % {_EP_CHK} AS DECIMAL(38,0)))
                     AS DECIMAL(38,0)) % {_EP_CHK} AS BIGINT)
             AS order_checksum
    FROM sharded GROUP BY shard
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch shuffle: every doc gets a universal-hash order
    key (reduced residues first, so intermediates stay bounded — the
    same overflow discipline as the train/val/test split), is routed to
    order_key % {s} reader shards, and is consumed shard-locally in
    (order_key, doc_id) order.  The output certifies the order: per
    shard, the position-weighted checksum sum(pos * doc_id) mod p pins
    the EXACT sequence each reader sees — any transposition changes it.

    Scale: one shuffle on the shard key; the per-shard sort is a
    partition-local sort (sortWithinPartitions shape), never global.
    Epoch e would add e to the hash seed — same plan per epoch.  This is
    how a 100 TB corpus gets a reproducible, restartable training order
    with no RNG state and no driver involvement.
    """.format(s=_EP_SHARDS)
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        ((F.lit(_EP_A) * (F.col("doc_id") % _EP_P) + _EP_B) % _EP_P).alias(
            "order_key"
        ),
    )
    sharded = keyed.withColumn("shard", F.col("order_key") % _EP_SHARDS)
    w = W.partitionBy("shard").orderBy("order_key", "doc_id")
    pos = sharded.withColumn("pos", F.row_number().over(w))
    # reduce each term mod p (bounded < p^2 ~ 1e18, inside int64), then
    # sum in exact DECIMAL so the aggregate can never wrap — the same
    # reduce-residues-first discipline as the split hash
    term = (
        (F.col("pos") % _EP_CHK) * (F.col("doc_id") % _EP_CHK) % _EP_CHK
    ).cast("decimal(38,0)")
    return pos.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("order_key").alias("min_key"),
        F.max("order_key").alias("max_key"),
        (F.sum(term) % _EP_CHK).cast("long").alias("order_checksum"),
    )


# --------------------------------------------------------------------------
# Padding-waste accounting for length-bucketed batching — the data-loader
# economics report behind sequence bucketing.
# --------------------------------------------------------------------------
_PW_BUCKET = 16  # token-length bucket width


@query(
    "pipeline_padding_waste",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    b AS (SELECT n_tok // {_PW_BUCKET} AS bucket, n_tok FROM lens)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           CAST(sum(n_tok) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_tokens,
           round((count(*) * max(n_tok) - sum(n_tok)) * 1.0
                 / (count(*) * max(n_tok)), 6) AS pad_frac
    FROM b GROUP BY bucket
    """,
)
def pipeline_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report for length-bucketed batching: docs bucket by
    token length ({w}-token ranges); padding every doc in a bucket to
    the bucket max costs pad_tokens = n*max - sum — the exact-integer
    waste a training data-loader pays.  Comparing pad_frac here against
    the single-bucket baseline (everything padded to the global max)
    quantifies what bucketing buys; the test asserts bucketing strictly
    wins.

    Scale: one narrow length projection + one map-side-combinable
    bounded-cardinality groupBy — the whole report is a single pass with
    ~max_len/{w} output rows, no sort (fixed-width buckets, not
    ntile-by-rank, exactly so the global sort disappears).
    """.format(w=_PW_BUCKET)
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    b = lens.select(
        F.expr(f"n_tok div {_PW_BUCKET}").alias("bucket"), "n_tok"
    )
    pad = F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tok").alias("max_len"),
        F.sum("n_tok").alias("sum_len"),
        pad.alias("pad_tokens"),
        F.round(pad * 1.0 / (F.count(F.lit(1)) * F.max("n_tok")), 6).alias(
            "pad_frac"
        ),
    )
