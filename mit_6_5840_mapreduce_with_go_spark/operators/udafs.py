"""Python custom-aggregate extension surface: grouped-map
``applyInPandas`` and grouped-agg ``pandas_udf`` — the two Arrow-batched
group-level UDF shapes (completing the taxonomy next to the scalar
Arrow UDFs in functions/vector.py, the UDTF in relational3.py, the
``mapInPandas`` decode in multimodal.py, and the
``applyInPandasWithState`` streaming ops).

Policy (SCALING.md §6): these are the EXTENSION path, not the hot path —
everything here is also expressible natively (and the oracle proves the
Python result equals the SQL result).  The demos compute order-sensitive
statistics (median, interdecile range) and therefore sort INSIDE the UDF:
group row order after a shuffle is nondeterministic, and a UDF that
depends on arrival order is a correctness bug at any scale.

Scale notes: a grouped-map/grouped-agg UDF materializes ONE GROUP per
call in executor memory — fine for per-user / per-type groups (bounded
cardinality per key), wrong for unbounded groups; skewed keys need the
salting pattern (tests/test_skew.py) or a native rewrite.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "udaf_median_event_gap",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('microseconds',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(median(gap_us) AS DOUBLE) AS median_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def udaf_median_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median inter-event gap per user via grouped-map ``applyInPandas``:
    each user's events arrive as one pandas frame, the UDF sorts by
    (ts, event_id) — never trust shuffle arrival order — diffs the
    timestamps, and emits one row.  Gaps are integer microseconds, so
    the median (mean of the two middle values at even counts) is exact
    in any engine.

    Scale: one shuffle on user_id (the group key); per-call memory is
    one user's events.  The native twin is the lag() window the oracle
    uses — the UDF exists to prove the extension surface against it."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dropna()
        # exact integer microseconds (total_seconds() is a float of
        # SECONDS and would reintroduce rounding error)
        us = gaps.astype("timedelta64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_gaps": [len(us)],
                "median_gap_us": [float(us.median())],
            }
        )

    # Output stays in exact microseconds: every median of integer µs is
    # an integer or integer+0.5 — exactly representable in double, so no
    # rounding step exists to diverge. (A rounded-seconds presentation
    # hit 4-dp midpoint ties where Spark's BigDecimal HALF_UP and
    # DuckDB's multiply-then-nearbyint round() disagree per-double.)
    return ev.groupBy("user_id").applyInPandas(
        median_gap, schema="user_id long, n_gaps long, median_gap_us double"
    )


@query(
    "udaf_interdecile_value_spread",
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round((quantile_cont(c, 0.9) - quantile_cont(c, 0.1)) / 100.0, 4)
             AS interdecile_spread
    FROM x GROUP BY event_type
    """,
)
def udaf_interdecile_value_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interdecile spread (p90 - p10) of event value per type via a
    grouped-agg ``pandas_udf``: the UDF receives the group's values as
    one pandas Series and returns one double.  Values are integer cents
    and numpy's linear interpolation matches quantile_cont's
    ``pos = q * (n-1)`` formula double-for-double, so the spread is
    engine-exact before the 4-dp round.

    Scale: same shuffle as a native agg on the same key; per-call memory
    is one group's values (event_type cardinality is tiny, group size is
    the bound to watch).  The native twin is two percentile() calls."""
    import numpy as np

    @F.pandas_udf("double")
    def spread(c: pd.Series) -> float:
        v = np.sort(c.values)
        return float(np.percentile(v, 90, method="linear")
                     - np.percentile(v, 10, method="linear"))

    # Spark disallows mixing grouped-agg pandas UDFs with native
    # aggregates in one agg() — the count rides along as a second UDF.
    @F.pandas_udf("long")
    def n_rows(c: pd.Series) -> int:
        return len(c)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            n_rows("c").alias("n"),
            F.round(spread("c") / 100.0, 4).alias("interdecile_spread"),
        )
    )
