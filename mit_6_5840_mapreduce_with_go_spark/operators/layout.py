"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan pruning.

At 100 TB, scan pruning IS the query plan: a table laid out by a single
sort key prunes perfectly on that key and not at all on any other. A
Z-order layout interleaves the bits of several quantized keys so that
rows close in EVERY dimension land in the same file, giving each file a
tight bounding box on all clustered columns at once — min/max footer
stats then prune multi-predicate scans (the technique behind
Delta/Iceberg OPTIMIZE ZORDER; Morton codes are textbook public
knowledge).

No reference counterpart (the reference's storage layer is
one-text-file-per-map-task, src/mr/coordinator.go:191-207); this is
north-star layout engineering for the 100 TB deployment.

The whole Z-value computation is pure integer arithmetic (shift/mask
expressed as div/mod) — identical in Spark and DuckDB, fully inside
whole-stage codegen, and usable directly as a ``repartitionByRange`` /
``sortWithinPartitions`` key when writing the physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

Z_BITS = 10          # 10 bits per dimension → 20-bit Z value
Z_BUCKET_SHIFT = 14  # bucket = z div 2^14 → ≤ 64 buckets ("files")
_EPOCH_LO = "DATE '1995-01-01'"  # o_orderdate domain floor (TESTDATA)
_DAYS_SPAN = 2500                # > max observed span; fixed quantizer


def _zvalue_sql(xq: str, yq: str, bits: int = Z_BITS) -> str:
    """Morton interleave as engine-portable integer arithmetic:
    z = sum_i bit_i(x)*4^i + bit_i(y)*2*4^i."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xq}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({yq}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _zvalue_col(xq: F.Column, yq: F.Column, bits: int = Z_BITS) -> F.Column:
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + ((xq.cast("long") / (1 << i)).cast("long") % 2) * (1 << (2 * i))
        z = z + ((yq.cast("long") / (1 << i)).cast("long") % 2) * (
            1 << (2 * i + 1)
        )
    return z


# Quantizers: customer key and order date each mapped onto [0, 2^Z_BITS).
# Fixed-domain quantization (not data-dependent min/max) so the layout is
# stable under incremental appends — the property a production OPTIMIZE
# job needs (re-quantizing on every write would reshuffle old files).
_XQ_SQL = f"least(o_custkey * {1 << Z_BITS} // 150000, {(1 << Z_BITS) - 1})"
_YQ_SQL = (
    f"least(date_diff('day', {_EPOCH_LO}, CAST(o_orderdate AS DATE))"
    f" * {1 << Z_BITS} // {_DAYS_SPAN}, {(1 << Z_BITS) - 1})"
)


@query(
    "layout_zorder_buckets",
    oracle=f"""
    WITH q AS (
      SELECT o_custkey, o_orderdate,
             {_XQ_SQL} AS xq, {_YQ_SQL} AS yq
      FROM orders),
    z AS (
      SELECT o_custkey, o_orderdate,
             {_zvalue_sql("xq", "yq")} // {1 << Z_BUCKET_SHIFT} AS zbucket
      FROM q)
    SELECT zbucket, count(*) AS n_rows,
           min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
           CAST(min(o_orderdate) AS DATE) AS min_dt,
           CAST(max(o_orderdate) AS DATE) AS max_dt
    FROM z GROUP BY zbucket
    """,
)
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout preview for ``orders`` clustered on
    (o_custkey, o_orderdate): assign each row its Morton-code bucket and
    report per-bucket row counts + the bounding box each "file" would
    carry in its parquet footer. Tight boxes on BOTH columns = both
    single-column predicates AND conjunctions prune files.

    Scale: the Z value is a narrow codegen expression; the bucket stats
    are one map-side-combinable groupBy. The real write path is
    ``df.repartitionByRange(N, zvalue).sortWithinPartitions(zvalue)
    .write...`` — same expression, no extra machinery. Fixed-domain
    quantizers keep the layout append-stable (no data-dependent min/max
    re-shuffles)."""
    orders = load_table(spark, sf_dir, "orders")
    xq = F.least(
        (F.col("o_custkey") * (1 << Z_BITS) / 150000).cast("long"),
        F.lit((1 << Z_BITS) - 1),
    )
    yq = F.least(
        (
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
            * (1 << Z_BITS)
            / _DAYS_SPAN
        ).cast("long"),
        F.lit((1 << Z_BITS) - 1),
    )
    z = _zvalue_col(xq, yq)
    return (
        orders.withColumn(
            "zbucket", (z / (1 << Z_BUCKET_SHIFT)).cast("long")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_ck"),
            F.max("o_custkey").alias("max_ck"),
            F.min(F.col("o_orderdate").cast("date")).alias("min_dt"),
            F.max(F.col("o_orderdate").cast("date")).alias("max_dt"),
        )
    )
