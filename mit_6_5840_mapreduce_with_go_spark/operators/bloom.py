"""Bloom-filter partition pruning — the runtime data-skipping structure
behind Spark's row-group bloom filters and runtime filter pushdown,
rebuilt engine-portably: per-partition packed-bitmap blooms over the join
key, probed by a small key set, scored against exact membership.

No reference counterpart (SURVEY.md §2.D) — north-star addition.  The
bitmap machinery reuses the packed-63-bit-word discipline of
`bitmap_type_day_overlap` (operators/relational3.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_BL_M = 1024  # bloom bits per partition
_BL_WORDS = 17  # ceil(1024 / 63) packed words
_BL_PROBE = 100  # probe keys: custkey < 100
# double hashing h_i = (h1 + i*h2) % M, the standard Kirsch-Mitzenmacher
# construction; two affine-mod hashes keep everything in exact int64
_BL_K = 3
_BL_A1, _BL_B1 = 2654435761 % 999983, 15485863
_BL_A2, _BL_B2 = 97531, 32452843
_BL_P = 999983


def _hashes(key: str) -> list[str]:
    """The _BL_K bit positions for a BIGINT key column expression."""
    h1 = f"(({_BL_A1} * ({key} % {_BL_P}) + {_BL_B1}) % {_BL_P})"
    h2 = f"(({_BL_A2} * ({key} % {_BL_P}) + {_BL_B2}) % {_BL_P})"
    return [f"(({h1} + {i} * {h2}) % {_BL_M})" for i in range(_BL_K)]


@query(
    "sketch_bloom_partition_prune",
    oracle=f"""
    WITH parts AS (
      SELECT month(o_orderdate) AS pmonth, o_custkey AS key FROM orders),
    bits AS (
      SELECT DISTINCT pmonth, bit
      FROM parts, unnest([{", ".join(_hashes("key"))}]) AS t(bit)),
    words AS (
      SELECT pmonth, bit // 63 AS w,
             CAST(sum(DISTINCT (CAST(1 AS BIGINT) << (bit % 63))) AS BIGINT)
               AS word
      FROM bits GROUP BY 1, 2),
    probe AS (SELECT c_custkey AS key FROM customer
              WHERE c_custkey < {_BL_PROBE}),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_probe FROM probe),
    phits AS (
      SELECT w.pmonth, p.key,
             CAST(count(*) AS BIGINT) AS nbits
      FROM probe p, unnest([{", ".join(_hashes("p.key"))}]) AS t(bit)
      JOIN words w ON w.w = bit // 63
       AND (w.word >> (bit % 63)) % 2 = 1
      GROUP BY 1, 2),
    maybe AS (SELECT pmonth, key FROM phits WHERE nbits = {_BL_K}),
    exact AS (SELECT DISTINCT pmonth, key FROM parts
              WHERE key < {_BL_PROBE}),
    verdicts AS (
      SELECT m.pmonth,
             CAST(count(*) AS BIGINT) AS n_maybe,
             CAST(count(e.key) AS BIGINT) AS n_present
      FROM maybe m LEFT JOIN exact e
        ON e.pmonth = m.pmonth AND e.key = m.key
      GROUP BY 1)
    SELECT pmonth, n_maybe, n_present,
           CAST(n_maybe - n_present AS BIGINT) AS n_false_positive,
           round((n_maybe - n_present) * 1.0
                 / nullif(np.n_probe - n_present, 0), 6) AS fp_rate
    FROM verdicts, np
    """,
)
def sketch_bloom_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition Bloom filters for join-key skipping: orders
    partition by order month; each partition builds a {m}-bit bloom over
    o_custkey ({k} Kirsch-Mitzenmacher double hashes, packed into 63-bit
    BIGINT words exactly like the bitmap-index op); a {q}-key probe set
    then asks each partition "maybe present?".  Output per partition:
    maybe-count, true-present count, false positives, FP rate — the
    numbers that decide whether a runtime filter is worth shipping.

    Scale: the bloom build is one map-side-combinable (partition, word)
    aggregate — {w} words per partition regardless of rows; the probe is
    a broadcast of q keys x {k} bit tests against the word table.  This
    is exactly the shape of Spark's row-group bloom skipping and runtime
    bloom-filter join pushdown, materialized as a queryable operator.
    All arithmetic is exact int64 (bit < {m} << 63-bit words; the
    distinct-sum trick ORs bits without an overflow-prone power sum).
    """.format(m=_BL_M, k=_BL_K, q=_BL_PROBE, w=_BL_WORDS)
    orders = load_table(spark, sf_dir, "orders").select(
        F.month("o_orderdate").alias("pmonth"), F.col("o_custkey").alias("key")
    )
    bit_exprs = _hashes("key")
    bits = (
        orders.select(
            "pmonth", F.explode(F.array(*[F.expr(b) for b in bit_exprs])).alias("bit")
        )
        .distinct()
    )
    words = bits.groupBy(
        "pmonth", (F.col("bit") / 63).cast("long").alias("w")
    ).agg(
        F.sum_distinct(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 63 AS INT))")
        ).alias("word")
    )
    probe = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < _BL_PROBE)
        .select(F.col("c_custkey").alias("key"))
    )
    probe_bits = probe.select(
        "key", F.explode(F.array(*[F.expr(b) for b in _hashes("key")])).alias("bit")
    )
    phits = (
        probe_bits.withColumn("w", (F.col("bit") / 63).cast("long"))
        .join(words, "w")
        .filter(
            F.expr("shiftrightunsigned(word, CAST(bit % 63 AS INT)) % 2") == 1
        )
        .groupBy("pmonth", "key")
        .agg(F.count(F.lit(1)).alias("nbits"))
    )
    maybe = phits.filter(F.col("nbits") == _BL_K).select("pmonth", "key")
    exact = (
        orders.filter(F.col("key") < _BL_PROBE).select("pmonth", "key").distinct()
    )
    verdicts = (
        maybe.join(
            exact.withColumn("present", F.lit(1)), ["pmonth", "key"], "left"
        )
        .groupBy("pmonth")
        .agg(
            F.count(F.lit(1)).alias("n_maybe"),
            F.count("present").alias("n_present"),
        )
    )
    n_probe = probe.agg(F.count(F.lit(1)).alias("n_probe"))
    return verdicts.crossJoin(F.broadcast(n_probe)).select(
        "pmonth",
        "n_maybe",
        "n_present",
        (F.col("n_maybe") - F.col("n_present")).alias("n_false_positive"),
        # FP rate over the keys that are actually ABSENT from the
        # partition (probed minus present) — dividing by the raw probe
        # count would understate the filter's false-positive behavior
        F.round(
            (F.col("n_maybe") - F.col("n_present")) * 1.0
            / F.nullif(F.col("n_probe") - F.col("n_present"), F.lit(0)),
            6,
        ).alias("fp_rate"),
    )
