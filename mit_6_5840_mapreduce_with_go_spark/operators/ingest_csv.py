"""Dirty-CSV ingest semantics: PERMISSIVE parsing with a corrupt-record
column — the §2.D scans/dirty-data concern, entirely JVM-side via
``from_csv`` (no Python anywhere in the plan).

Wild CSV fails in specific, distinguishable ways, and Spark's
PERMISSIVE mode has precise per-failure semantics (probed and pinned,
not assumed):

- a field that fails its type -> that field NULL, the other fields
  parsed, ``_corrupt`` = the raw line;
- too FEW fields -> missing ones NULL, present ones parsed,
  ``_corrupt`` set;
- too MANY fields -> declared ones parsed, ``_corrupt`` set;
- an EMPTY field -> NULL without marking the record corrupt.

``ingest_csv_permissive_stats`` plants one corpus mixing all of these
from doc_id formulas, parses with ``from_csv`` +
``columnNameOfCorruptRecord``, and aggregates recovery statistics the
DuckDB oracle re-derives — so the engine's exact dirty-data contract
is oracle-pinned (a Spark behavior change would show up as a hash
mismatch, which is precisely what an ingest pipeline wants to notice).

Scale shape: planted lines are generated with JVM array expressions,
parsing is whole-stage-codegen ``from_csv``, one hash aggregation on
doc_id.  At 100 TB this is the first-pass schema triage over a
heterogeneous CSV lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_SCHEMA = "k int, v int, s string, _corrupt string"
_OPTIONS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}


@query(
    "ingest_csv_permissive_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 4 AS k FROM documents),
    lines AS (
      SELECT doc_id, k, t.i - 1 AS j,
             (t.i - 1) % 4 AS kind
      FROM d, unnest(generate_series(1, CAST(k AS INT))) AS t(i))
    SELECT doc_id,
           CAST(max(k) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN kind IN (1, 2) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(sum(CASE WHEN kind IN (0, 3) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(sum(CASE WHEN kind IN (0, 3) THEN doc_id + j ELSE 0 END)
                AS BIGINT) AS v_sum_clean,
           CAST(sum(CASE WHEN kind IN (0, 1, 3) THEN doc_id + j ELSE 0 END)
                AS BIGINT) AS v_sum_parsed,
           CAST(sum(CASE WHEN kind <> 1 THEN j ELSE 0 END) AS BIGINT)
             AS k_sum_nonnull
    FROM lines GROUP BY doc_id
    """,
)
def ingest_csv_permissive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV triage end-to-end (see module docstring): per document
    a planted line mix — clean rows, a bad-integer row (field-level
    failure: v still parses, k nulls, record marked corrupt), a
    truncated row (k parses, v nulls, marked corrupt) — parsed with
    ``from_csv`` PERMISSIVE + corrupt-record column and aggregated into
    recovery statistics.  ``v_sum_parsed > v_sum_clean`` is the
    field-level-recovery property: PERMISSIVE salvages typed fields
    from corrupt records instead of dropping the row."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id")
    k = (F.lit(4) + F.col("doc_id") % 4).cast("int")
    line = lambda j: (  # noqa: E731
        F.when(
            j % 4 == F.lit(1),
            F.concat(
                F.lit("x"),
                j.cast("string"),
                F.lit(","),
                (F.col("doc_id") + j).cast("string"),
                F.lit(",s"),
                j.cast("string"),
            ),
        )
        .when(j % 4 == F.lit(2), j.cast("string"))
        .otherwise(
            F.concat(
                j.cast("string"),
                F.lit(","),
                (F.col("doc_id") + j).cast("string"),
                F.lit(",s"),
                j.cast("string"),
            )
        )
    )
    lines = docs.select(
        "doc_id",
        F.explode(F.transform(F.sequence(F.lit(0), k - 1), line)).alias(
            "line"
        ),
    )
    parsed = lines.select(
        "doc_id", F.from_csv("line", _SCHEMA, _OPTIONS).alias("r")
    ).select("doc_id", "r.*")
    return (
        parsed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0)).alias(
                "n_corrupt"
            ),
            F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0)).alias(
                "n_clean"
            ),
            F.sum(
                F.when(F.col("_corrupt").isNull(), F.col("v")).otherwise(0)
            ).alias("v_sum_clean"),
            F.sum(F.coalesce(F.col("v"), F.lit(0))).alias("v_sum_parsed"),
            F.sum(F.coalesce(F.col("k"), F.lit(0))).alias("k_sum_nonnull"),
        )
        .select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_corrupt").cast("long").alias("n_corrupt"),
            F.col("n_clean").cast("long").alias("n_clean"),
            F.col("v_sum_clean").cast("long").alias("v_sum_clean"),
            F.col("v_sum_parsed").cast("long").alias("v_sum_parsed"),
            F.col("k_sum_nonnull").cast("long").alias("k_sum_nonnull"),
        )
    )
