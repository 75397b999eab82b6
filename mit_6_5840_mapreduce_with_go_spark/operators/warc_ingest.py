"""Crawl ingest through the ``warcfile`` Data Source (sources/
warcfiles.py): WARC records read from real ``.warc.gz`` shard FILES,
then aggregated with plain JVM-side DataFrame code.

``mm_decode_warc_stats`` (multimodal10) proves the record walk over a
payload column; this module proves the FILE leg a Common-Crawl-shaped
pipeline actually starts from.  The shard fixtures are materialized
once per scale factor under ``<repo>/.warc_shards/<sf>/`` from the same
planted-crawl formula (`_warc_crawl`), doc_id % N_SHARDS per shard,
written atomically (tmp dir + rename) so concurrent sessions race
safely.  The oracle is byte-for-byte the ``mm_decode_warc_stats``
oracle — the two queries must agree with DuckDB *and therefore with
each other*, pinning source-vs-column parity.

Everything after the source is declarative: doc_id recovered with a
JVM regexp from the record id, token statistics via
``aggregate(transform(split(...)))`` — no Python in the aggregation
path, so Catalyst/WSCG own the hot loop and the one shuffle is the
final per-doc groupBy.

Scale shape: one input partition per shard (the CC-MAIN unit, ~1 GB in
the wild), record parsing executor-side, a single hash aggregation on
doc_id.  At 1000 executors this is the canonical crawl-ingest DAG.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .multimodal10 import _warc_crawl

_N_SHARDS = 8

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _shard_dir(sf_dir: str) -> str:
    """Materialize (once, atomically) the shard fixtures for ``sf_dir``
    and return their directory."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    final = os.path.join(_REPO_ROOT, ".warc_shards", tag)
    if os.path.isdir(final):
        return final
    import pyarrow.parquet as pq

    doc_ids = sorted(
        int(d)
        for d in pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )["doc_id"].to_pylist()
    )
    tmp = f"{final}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    try:
        for s in range(_N_SHARDS):
            with open(os.path.join(tmp, f"shard-{s:03d}.warc.gz"), "wb") as fh:
                for d in doc_ids:
                    if d % _N_SHARDS == s:
                        fh.write(_warc_crawl(d))
        try:
            os.rename(tmp, final)
        except OSError:
            # Lost the race to a concurrent session — theirs is
            # byte-identical (deterministic formula), keep it.
            if not os.path.isdir(final):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


# Token-sum over a planted space-joined-int body, entirely JVM-side.
_TOKEN_SUM = (
    "aggregate(transform(split(cast(content as string), ' '), "
    "x -> cast(x as bigint)), cast(0 as bigint), (a, x) -> a + x)"
)


@query(
    "mm_warc_source_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 3 AS k FROM documents),
    fet AS (
      SELECT doc_id, k, t.i - 1 AS s,
             10 + (doc_id + t.i - 1) % 7 AS n
      FROM d, unnest(generate_series(1, CAST(k AS INT))) AS t(i)),
    tok AS (
      SELECT doc_id, s, n,
             (doc_id * 7 + s * 3 + (u.j - 1) * 13) % 1000 AS v
      FROM fet, unnest(generate_series(1, CAST(n AS INT))) AS u(j)),
    resp AS (
      SELECT doc_id, s, n,
             sum(v) AS tok_sum,
             sum(length(CAST(v AS VARCHAR))) + n - 1 AS body_bytes
      FROM tok GROUP BY doc_id, s, n),
    agg AS (
      SELECT doc_id,
             sum(n) AS resp_n_tokens,
             sum(tok_sum) AS resp_token_sum,
             sum(body_bytes) AS resp_bytes,
             sum(length('http://ex.com/d' || CAST(doc_id AS VARCHAR)
                        || '/' || CAST(s AS VARCHAR))) AS uri_len_sum,
             sum(length('GET /d' || CAST(doc_id AS VARCHAR)
                        || '/' || CAST(s AS VARCHAR))) AS req_bytes
      FROM resp GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(1 + 2 * d.k AS BIGINT) AS n_records,
           CAST(d.k AS BIGINT) AS n_responses,
           CAST(agg.resp_n_tokens AS BIGINT) AS resp_n_tokens,
           CAST(agg.resp_token_sum AS BIGINT) AS resp_token_sum,
           CAST(agg.resp_bytes AS BIGINT) AS resp_bytes,
           CAST(agg.req_bytes AS BIGINT) AS req_bytes,
           CAST(agg.uri_len_sum AS BIGINT) AS uri_len_sum,
           CAST(length('software: sparkgraft/'
                       || CAST(d.doc_id AS VARCHAR)) AS BIGINT) AS info_bytes
    FROM d JOIN agg ON agg.doc_id = d.doc_id
    """,
)
def mm_warc_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped FILE ingest end-to-end: the planted crawls
    live in real multi-member ``.warc.gz`` shard files, read through the
    ``warcfile`` Python Data Source (one partition per shard, record
    rows with binary bodies), then aggregated per document with pure
    JVM expressions — regexp doc-id recovery, ``octet_length`` byte
    counts, ``aggregate(transform(split(...)))`` token sums.  The
    DuckDB oracle is identical to ``mm_decode_warc_stats``'s, pinning
    file-source-vs-payload-column parity."""
    from ..sources.warcfiles import read_warc_source

    shards = os.path.join(_shard_dir(sf_dir), "*.warc.gz")
    recs = read_warc_source(spark, shards)
    doc_id = F.regexp_extract("record_id", r"urn:uuid:(\d+)-", 1).cast("long")
    is_resp = F.col("warc_type") == "response"
    is_req = F.col("warc_type") == "request"
    is_info = F.col("warc_type") == "warcinfo"
    zero = F.lit(0).cast("long")
    return (
        recs.withColumn("doc_id", doc_id)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_records"),
            F.sum(F.when(is_resp, 1).otherwise(0)).alias("n_responses"),
            F.sum(
                F.when(
                    is_resp, F.size(F.split(F.col("content").cast("string"), " "))
                ).otherwise(0)
            ).alias("resp_n_tokens"),
            F.sum(F.when(is_resp, F.expr(_TOKEN_SUM)).otherwise(zero)).alias(
                "resp_token_sum"
            ),
            F.sum(
                F.when(is_resp, F.octet_length("content")).otherwise(0)
            ).alias("resp_bytes"),
            F.sum(
                F.when(is_req, F.octet_length("content")).otherwise(0)
            ).alias("req_bytes"),
            F.sum(F.when(is_resp, F.length("uri")).otherwise(0)).alias(
                "uri_len_sum"
            ),
            F.max(F.when(is_info, F.octet_length("content"))).alias(
                "info_bytes"
            ),
        )
        .select(
            "doc_id",
            F.col("n_records").cast("long").alias("n_records"),
            F.col("n_responses").cast("long").alias("n_responses"),
            F.col("resp_n_tokens").cast("long").alias("resp_n_tokens"),
            F.col("resp_token_sum").cast("long").alias("resp_token_sum"),
            F.col("resp_bytes").cast("long").alias("resp_bytes"),
            F.col("req_bytes").cast("long").alias("req_bytes"),
            F.col("uri_len_sum").cast("long").alias("uri_len_sum"),
            F.col("info_bytes").cast("long").alias("info_bytes"),
        )
    )
