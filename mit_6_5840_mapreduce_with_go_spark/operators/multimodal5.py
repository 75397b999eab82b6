"""Image near-duplicate detection: perceptual hash (dHash) over REAL
decoded pixels + banded LSH pairing.

Ties the decode leg (multimodal2's PNG path) into the dedup family:
the standard image-curation near-dup pipeline is decode -> perceptual
hash -> Hamming-bucketed candidate join, exactly the SimHash text
pipeline (operators/dedup.py) with the fingerprint computed from
pixels instead of tokens.

- dHash (public algorithm: difference hash): downscale the grayscale
  image to a tiny grid by box-averaging, then take the horizontal
  gradient SIGN between adjacent cells — 56 bits here (8 rows x 7
  diffs from an 8x8 mean grid; 56 keeps the hash in the positive
  BIGINT range both engines shift without sign surprises).  Constant-
  offset lighting changes cancel (gradient signs are shift-invariant);
  a few changed pixels flip only the bits whose cells they touch.
- Pairing is the SimHash banded-LSH shape: 4 bands x 14 bits, exact
  join on (band index, band value), never an all-pairs product;
  Hamming <= 10 confirms candidates.  Per-band bucket cap 200
  (``_PH_MAX_BUCKET``, same load-bearing convention as
  dedup._LSH_MAX_BUCKET: one degenerate bucket — e.g. solid-color
  images — must not quadratically dominate the join; other bands
  recover the lost candidates).

The test corpus is built INSIDE Spark: groups of 4 doc_ids share a
base texture; variants 1-3 flip ~7 pixels each (the near-dup
structure).  Payloads are real PNGs; the hash side runs the REAL
decoder (``decode_png_pixels``) on every payload, so the measured
pipeline is encode -> decode -> hash -> LSH join end to end.  The
DuckDB oracle recomputes pixels, means, bits, hash, bands, cap, and
Hamming from the pixel definition — prototype-verified: 536 pairs at
sf0.01, every one intra-group (zero false positives), recall 72% of
the 745 true pairs within threshold (the documented banded-LSH
recall trade; raise bands for more).

Scale shape: hashing is a narrow per-row map (Arrow-batched, no
shuffle); the join shuffles 4 band rows per image, buckets are
capped, and the pair set is bounded by bucket sizes — the same
100 TB-safe discipline as the text LSH family.

Synthetic-corpus caveat (data, not plan): the texture formula cycles
with period 256 GROUPS, so corpora past ~1k docs contain exact-
duplicate texture classes and the planted pair count grows ~n^2/256^2
(observed: 536 pairs at 500 docs, 3.9M at 50k — every one a true
duplicate/near-dup, sf1-mirror-verified).  Real image corpora don't
scale their dup-cluster sizes with corpus size; when one does
degenerate, the bucket cap drops the oversized buckets and the
output degrades to the documented partial-recall semantics instead
of a quadratic join.

No reference counterpart — north-star LLM-pipeline addition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .multimodal2 import decode_png_pixels, encode_png

_PH_SIDE = 16  # source images are 16x16 grayscale
_PH_GRID = 8  # box-averaged mean grid
_PH_BITS_PER_ROW = _PH_GRID - 1  # 7 horizontal diffs per row -> 56 bits
_PH_BANDS = 4
_PH_BAND_BITS = 14
_PH_MAX_HAMMING = 10
_PH_MAX_BUCKET = 200


def _pix(doc_id: int, x: int, y: int) -> int:
    """Group texture + per-variant pixel flips: docs doc_id//4 share a
    base multiplicative pattern (dHash-distinct across groups, unlike a
    linear ramp whose gradient signs never change); variants 1-3 shift
    ~7 scattered pixels by +96."""
    g, k = doc_id // 4, doc_id % 4
    base = ((x + 3 * g + 1) * (y + 2 * g + 1) * (g + 13)) % 256
    if k > 0 and (y * _PH_SIDE + x) % (37 + 2 * k) == k:
        return (base + 96) % 256
    return base


def dhash56(raster: bytes, width: int, height: int) -> int:
    """56-bit difference hash from a grayscale raster: box-average to
    an 8x8 mean grid (integer floor), emit 1 where mean[r][c] <
    mean[r][c+1].  Width/height must be multiples of 8."""
    if width % _PH_GRID or height % _PH_GRID:
        raise ValueError("dhash56 needs dimensions divisible by 8")
    bx, by = width // _PH_GRID, height // _PH_GRID
    arr = np.frombuffer(raster, np.uint8).astype(np.int64)
    arr = arr.reshape(_PH_GRID, by, _PH_GRID, bx)
    m = arr.sum(axis=(1, 3)) // (bx * by)
    bits = m[:, : _PH_BITS_PER_ROW] < m[:, 1:]
    weights = 1 << (
        np.arange(_PH_GRID)[:, None] * _PH_BITS_PER_ROW
        + np.arange(_PH_BITS_PER_ROW)[None, :]
    ).astype(np.int64)
    return int((bits * weights).sum())


@query(
    "mm_dedup_image_dhash",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             (t.i - 1) % {_PH_SIDE} AS x,
             (t.i - 1) // {_PH_SIDE} AS y,
             CASE WHEN doc_id % 4 > 0
                   AND (t.i - 1) % (37 + 2 * (doc_id % 4)) = doc_id % 4
                  THEN (((t.i - 1) % {_PH_SIDE} + 3 * (doc_id // 4) + 1)
                        * ((t.i - 1) // {_PH_SIDE} + 2 * (doc_id // 4) + 1)
                        * (doc_id // 4 + 13) + 96) % 256
                  ELSE (((t.i - 1) % {_PH_SIDE} + 3 * (doc_id // 4) + 1)
                        * ((t.i - 1) // {_PH_SIDE} + 2 * (doc_id // 4) + 1)
                        * (doc_id // 4 + 13)) % 256 END AS v
      FROM documents,
           unnest(generate_series(1, {_PH_SIDE * _PH_SIDE})) AS t(i)),
    m AS (
      SELECT doc_id, y // 2 AS r, x // 2 AS c, sum(v) // 4 AS m
      FROM px GROUP BY doc_id, y // 2, x // 2),
    bits AS (
      SELECT a.doc_id, a.r, a.c,
             CASE WHEN a.m < b.m THEN 1 ELSE 0 END AS bit
      FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.r = b.r
                       AND b.c = a.c + 1
      WHERE a.c < {_PH_BITS_PER_ROW}),
    h AS (
      SELECT doc_id,
             CAST(sum(bit * (CAST(1 AS BIGINT)
                   << CAST(r * {_PH_BITS_PER_ROW} + c AS INT))) AS BIGINT)
               AS hash
      FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, hash, t.j,
             (hash >> CAST({_PH_BAND_BITS} * t.j AS INT))
               & {(1 << _PH_BAND_BITS) - 1} AS bv
      FROM h, unnest(generate_series(0, {_PH_BANDS - 1})) AS t(j)),
    sized AS (
      SELECT doc_id, hash, j, bv,
             count(*) OVER (PARTITION BY j, bv) AS bsz
      FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.hash AS ha, b.hash AS hb
      FROM sized a JOIN sized b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
      WHERE a.bsz <= {_PH_MAX_BUCKET})
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {_PH_MAX_HAMMING}
    """,
)
def mm_dedup_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pipeline end to end: build real 16x16 grayscale
    PNGs (4-doc groups share a texture, variants flip ~7 pixels) in one
    Arrow-batched ``mapInPandas`` stage; decode each payload with the
    REAL PNG decoder and compute the 56-bit dHash from the
    reconstructed raster in the next; then the SimHash-style banded
    LSH join — explode 4 x 14-bit bands, exact-match candidates within
    capped buckets, confirm with bit_count(XOR) <= 10.  Returns
    (doc_a, doc_b, hamming) for every confirmed near-dup pair.

    Scale: hash stage is a shuffle-free narrow map; the join shuffles
    4 rows per image keyed by (band, value); ``_PH_MAX_BUCKET``
    excludes degenerate buckets before the self-join can go quadratic
    (the dedup._LSH_MAX_BUCKET discipline — see tests/test_skew_stress
    for why the cap is load-bearing)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_png(
                    _PH_SIDE,
                    _PH_SIDE,
                    lambda x, y, c, d=int(did): _pix(d, x, y),
                    channels=1,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    mm = docs.mapInPandas(encode_batches, schema="doc_id long, payload binary")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                w, h, nch, raster = decode_png_pixels(p)
                if nch != 1:
                    raise ValueError("dhash expects grayscale")
                hashes.append(dhash56(raster, w, h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "hash": hashes})

    hashes = mm.mapInPandas(hash_batches, schema="doc_id long, hash long")

    bands = hashes.select(
        "doc_id",
        "hash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("hash", _PH_BAND_BITS * j).bitwiseAND(
                        (1 << _PH_BAND_BITS) - 1
                    )
                    for j in range(_PH_BANDS)
                ]
            )
        ).alias("j", "bv"),
    )
    sized = bands.withColumn(
        "bsz", F.count(F.lit(1)).over(W.partitionBy("j", "bv"))
    )
    a = sized.filter(F.col("bsz") <= _PH_MAX_BUCKET).select(
        F.col("doc_id").alias("doc_a"), F.col("hash").alias("ha"), "j", "bv"
    )
    b = sized.select(
        F.col("doc_id").alias("doc_b"), F.col("hash").alias("hb"), "j", "bv"
    )
    cand = (
        a.join(b, ["j", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.expr("bit_count(ha ^ hb)")
    return cand.filter(ham <= _PH_MAX_HAMMING).select(
        "doc_a",
        "doc_b",
        ham.cast("long").alias("hamming"),
    )
