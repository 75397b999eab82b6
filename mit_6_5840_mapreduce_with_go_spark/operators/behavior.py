"""User-behavior analytics over the ``events`` stream: weekly retention
cohorts and event-type Markov transitions — the two classic product /
engagement primitives a training-data telemetry pipeline reports on.

No reference counterpart (the reference has no time type or sessions —
SURVEY.md §1.4, §2.D); north-star additions alongside sessionization,
funnel conversion, and rate anomaly (operators/timeseries.py,
streaming/windows.py).

Cross-engine determinism: week truncation is Monday-based in both Spark
and DuckDB ``date_trunc('week', ...)``; week offsets are integer-exact
(day diffs between week-truncated stamps are multiples of 7); transition
probabilities are ratios of exact integer counts rounded at 4 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


# --------------------------------------------------------------------------
# Weekly retention cohorts: users grouped by first-seen week; for each
# (cohort, week-offset) cell, how many distinct users were active, and
# what fraction of the cohort that is.  The standard retention triangle.
# --------------------------------------------------------------------------
@query(
    "events_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
               AS week_offset
      FROM events e JOIN f USING (user_id)),
    c AS (
      SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
             count(*) AS n_active
      FROM a GROUP BY 1, 2)
    SELECT cohort_week, week_offset, n_active,
           round(n_active * 1.0 /
                 max(CASE WHEN week_offset = 0 THEN n_active END)
                   OVER (PARTITION BY cohort_week), 4) AS retention_frac
    FROM c
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: distinct active users per
    (first-seen-week cohort, weeks-since-first-seen), plus the fraction
    of the cohort still active (offset-0 cell is the cohort size by
    construction — every user is active in their own first week).

    Scale: first-seen table = one map-side-combinable min() per user
    (one shuffle on user_id, co-partitioned with the activity join that
    follows — AQE reuses the exchange); the distinct (user, offset) set
    and the final cohort agg shuffle only the already-reduced keys. The
    cohort-size lookup is a window over the tiny (weeks x offsets)
    result, not the event stream. No driver-side state, no UDFs."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    cells = active.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_active"))
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(W.partitionBy("cohort_week"))
    return cells.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") * 1.0 / cohort_size, 4).alias("retention_frac"),
    )


# --------------------------------------------------------------------------
# Event-type Markov transitions: first-order transition counts and
# probabilities over each user's time-ordered event stream.  The
# behavioral fingerprint used for bot detection / journey modeling.
# --------------------------------------------------------------------------
@query(
    "events_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions,
           round(count(*) * 1.0 /
                 CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS BIGINT),
                 4) AS transition_prob
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    (previous type, next type) pair observed in any user's time-ordered
    stream, the transition count and the row-normalized probability
    (ties on ts broken by event_id for cross-engine determinism).

    Scale: one shuffle on user_id for the lag() window (events for one
    user sort within their partition — bounded per-user state), then a
    groupBy on the tiny (type x type) key space with map-side partial
    counts; the normalizing window runs over at most |types|^2 rows.
    The DuckDB window sum over BIGINT widens to HUGEINT, hence the CAST
    (tools/audit_oracle_types.py hazard class)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = s.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = F.sum("n_transitions").over(W.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") * 1.0 / total, 4).alias("transition_prob"),
    )
