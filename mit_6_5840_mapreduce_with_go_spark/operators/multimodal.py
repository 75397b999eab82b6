"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract as Arrow-batched ``mapInPandas``.

No reference counterpart — north-star LLM-pipeline additions. The
container has no image/audio libraries, so the actual byte decode is a
clearly-marked deterministic STUB (``decode_image_stub``); everything
around it — binary column construction, schema, Arrow batching, the
mapInPandas signature and partitioning — is the real 100 TB plumbing
(payloads never hit the driver; each task decodes its own Arrow batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: utf-8 bytes of ``text`` stand in for an
    image/audio payload, with typed metadata alongside."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB decode: real image decoding (PIL/opencv) is unavailable in
    this container. Derives deterministic fake dimensions from the byte
    length so the pipeline around it is fully testable. A real deployment
    replaces ONLY this function body.
    """
    n = len(payload)
    return {"width": 64 + n % 1024, "height": 64 + (n * 7) % 768, "n_frames": 1 + n % 30}


def decode_image_real(payload: bytes):  # pragma: no cover - by design
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this container; "
        "use decode_image_stub (deterministic fake) instead"
    )


@query(
    "mm_binary_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS content_md5,
           ord(substr(text, 1, 1))    AS head_byte
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over the binary payload — native expressions
    only (octet_length/md5 run on the JVM against the bytes)."""
    mm = with_binary_payload(load_table(spark, sf_dir, "documents", fan_out=True))
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.ascii(F.decode(F.substring("payload", 1, 1), "UTF-8")).alias("head_byte"),
    )


@query(
    "mm_decode_frames",
    oracle="""
    SELECT doc_id,
           64 + octet_length(encode(text)) % 1024       AS width,
           64 + (octet_length(encode(text)) * 7) % 768  AS height,
           1 + octet_length(encode(text)) % 30          AS n_frames
    FROM documents
    """,
)
def mm_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas: each task
    pulls its Arrow batches, runs the (stubbed) decoder per payload, and
    emits a typed frame-metadata row. The oracle checks the stub's
    arithmetic end-to-end through the Python boundary, proving batch
    shape + schema + decode plumbing."""
    mm = with_binary_payload(load_table(spark, sf_dir, "documents", fan_out=True)).select(
        "doc_id", "payload"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(decoded)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return mm.mapInPandas(
        decode_batches, schema="doc_id long, width long, height long, n_frames long"
    )


@query(
    "mm_embedding_dim_stats",
    oracle="""
    WITH x AS (
      SELECT i - 1 AS dim,
             CAST(floor(v[i] * 10000000) AS BIGINT) AS q,
             v[i] AS raw
      FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           unnest(generate_series(1, len(v))) AS t(i)),
    s AS (
      SELECT dim, count(*) AS n,
             CAST(sum(q) AS BIGINT) AS s1,
             sum(CAST(q AS HUGEINT) * q) AS s2,
             min(raw) AS mn, max(raw) AS mx
      FROM x GROUP BY dim)
    SELECT dim, CAST(n AS BIGINT) AS n,
           round(CAST(s1 AS DOUBLE) / 1e7 / n, 6) AS mean,
           round(sqrt((CAST(s2 AS DOUBLE) / 1e14
                       - (CAST(s1 AS DOUBLE) / 1e7) * (CAST(s1 AS DOUBLE) / 1e7) / n)
                      / (n - 1)), 6) AS stddev,
           round(mn, 6) AS dim_min, round(mx, 6) AS dim_max
    FROM s
    """,
)
def mm_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature statistics over the embedding column (the
    normalization / whitening precursor): mean, sample stddev, min, max
    for each of the 64 dimensions.

    Moments accumulate as EXACT integer sums of floor(x * 1e7) — double
    partial sums would make the 6th decimal depend on partition count
    (the stats_price_moments recipe, applied per dimension); min/max are
    order-free so they stay raw doubles.  The quantization error (<1e-7
    per element) is inside the 1e-6 reporting precision.

    Scale: posexplode is a narrow 64x fan-out that stays in codegen;
    the agg groups 64 keys with map-side partials, so the single shuffle
    carries 64 rows per task regardless of corpus size.  s2 accumulates
    in DECIMAL(38,0) (q^2 ~ 1e14 x trillions of rows overflows int64;
    Spark would wrap silently, DuckDB widens to HUGEINT)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "raw")
    )
    q = F.floor(F.col("raw") * 1e7).cast("decimal(38,0)")
    s = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).alias("s2"),
        F.min("raw").alias("mn"),
        F.max("raw").alias("mx"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / 1e7 / n
    var = (s2 / 1e14 - (s1 / 1e7) * (s1 / 1e7) / n) / (n - 1)
    return s.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("stddev"),
        F.round("mn", 6).alias("dim_min"),
        F.round("mx", 6).alias("dim_max"),
    )


# --------------------------------------------------------------------------
# Embedding drift: population-stability index per dimension
# --------------------------------------------------------------------------
_PSI_DIMS = 8  # audit the first 8 dimensions
_PSI_EDGES = (-0.2, -0.1, 0.0, 0.1, 0.2)  # 6 fixed bins
_PSI_NB = len(_PSI_EDGES) + 1


def _psi_bucket_sql(v: str) -> str:
    cases = " ".join(
        f"WHEN {v} < {e} THEN {i}" for i, e in enumerate(_PSI_EDGES)
    )
    return f"(CASE {cases} ELSE {len(_PSI_EDGES)} END)"


@query(
    "mm_embedding_drift_psi",
    oracle=f"""
    WITH d AS (
      SELECT vec_id % 2 AS cohort, CAST(t.i - 1 AS INT) AS dim,
             {_psi_bucket_sql(f"CAST(embedding[CAST(t.i AS INT)] AS DOUBLE)")} AS bucket
      FROM embeddings, range(1, {_PSI_DIMS + 1}) t(i)),
    c AS (
      SELECT dim, bucket,
             sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS nb
      FROM d GROUP BY dim, bucket),
    t AS (
      SELECT dim, sum(na) AS ta, sum(nb) AS tb FROM c GROUP BY dim),
    p AS (
      SELECT c.dim,
             (na + 1.0) / (ta + {_PSI_NB}) AS pa,
             (nb + 1.0) / (tb + {_PSI_NB}) AS pb
      FROM c JOIN t ON c.dim = t.dim)
    SELECT dim,
           round(sum((pa - pb) * ln(pa / pb)), 4) AS psi
    FROM p GROUP BY dim
    """,
)
def mm_embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index per embedding dimension between two
    cohorts (even vs odd vec_id — swap in a date column in production):
    the standard ML-monitoring statistic for feature drift. Fixed bin
    edges + Laplace-smoothed integer counts make the statistic an exact
    function of exact counts, so both engines agree bit-for-bit before
    the round.

    Scale: the explode is bounded to the audited dimensions; counting is
    one map-side-combinable groupBy on (dim, bucket); everything after
    runs on the {_PSI_DIMS}x{_PSI_NB}-row histogram table. PSI ~ 0 here
    (both cohorts draw from one distribution) — the operator's job is
    exactly that readout; alert thresholds (0.1/0.25) sit downstream."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pairs = emb.select(
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode(F.slice("embedding", 1, _PSI_DIMS)).alias("dim", "v"),
    )
    bucket = F.lit(len(_PSI_EDGES))
    for i in reversed(range(len(_PSI_EDGES))):
        bucket = F.when(
            F.col("v").cast("double") < _PSI_EDGES[i], F.lit(i)
        ).otherwise(bucket)
    c = pairs.select("cohort", "dim", bucket.alias("bucket")).groupBy(
        "dim", "bucket"
    ).agg(
        F.sum((F.col("cohort") == 0).cast("long")).alias("na"),
        F.sum((F.col("cohort") == 1).cast("long")).alias("nb"),
    )
    w = W.partitionBy("dim")
    pa = (F.col("na") + 1.0) / (F.sum("na").over(w) + _PSI_NB)
    pb = (F.col("nb") + 1.0) / (F.sum("nb").over(w) + _PSI_NB)
    return (
        c.select("dim", pa.alias("pa"), pb.alias("pb"))
        .groupBy("dim")
        .agg(
            F.round(
                F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))),
                4,
            ).alias("psi")
        )
    )
