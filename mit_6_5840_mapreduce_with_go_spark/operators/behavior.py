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


# --------------------------------------------------------------------------
# Welch's t-test: A/B comparison of event value between two event types
# --------------------------------------------------------------------------
_AB_A = "purchase"
_AB_B = "click"


@query(
    "events_ab_welch_t",
    oracle=f"""
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DECIMAL(38, 0)) AS s1,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * c) AS DECIMAL(38, 0)) AS s2
      FROM x GROUP BY event_type),
    s AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n / 100.0 AS mean_v,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1) / 10000.0 AS var_v
      FROM m),
    ab AS (
      SELECT
        (SELECT n FROM s WHERE event_type = '{_AB_A}') AS n_a,
        (SELECT n FROM s WHERE event_type = '{_AB_B}') AS n_b,
        (SELECT mean_v FROM s WHERE event_type = '{_AB_A}') AS ma,
        (SELECT mean_v FROM s WHERE event_type = '{_AB_B}') AS mb,
        (SELECT var_v FROM s WHERE event_type = '{_AB_A}') AS va,
        (SELECT var_v FROM s WHERE event_type = '{_AB_B}') AS vb)
    SELECT n_a, n_b,
           round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
           round((ma - mb) / sqrt(va / n_a + vb / n_b), 4) AS t_stat,
           round(
             (va / n_a + vb / n_b) * (va / n_a + vb / n_b)
             / (va * va / (n_a * n_a * (n_a - 1.0))
                + vb * vb / (n_b * n_b * (n_b - 1.0))), 4) AS welch_df
    FROM ab
    """,
)
def events_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic comparing mean event value
    between two event types (the A/B readout every experimentation
    pipeline computes), with the Welch–Satterthwaite degrees of freedom.

    Determinism: values quantize to integer cents; count/sum/sum-of-
    squares accumulate EXACTLY (squares in DECIMAL(38,0) — the
    mm_embedding_dim_stats pattern, no int64 wrap at 100 TB row counts),
    so the t statistic derives from exact integers through an identical
    double expression in both engines — no float-summation-order hazard.

    Scale: one map-side-combinable aggregate over the filtered stream;
    the statistic itself is arithmetic over a 2-row table."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_AB_A, _AB_B)
    )
    c = F.round(F.col("value") * 100).cast("long")
    m = ev.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("s2"),
    )
    s = m.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n") / 100.0).alias("mean_v"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
            / 10000.0
        ).alias("var_v"),
    )
    a = s.filter(F.col("event_type") == _AB_A).select(
        F.col("n").alias("n_a"), F.col("mean_v").alias("ma"), F.col("var_v").alias("va")
    )
    b = s.filter(F.col("event_type") == _AB_B).select(
        F.col("n").alias("n_b"), F.col("mean_v").alias("mb"), F.col("var_v").alias("vb")
    )
    ab = a.crossJoin(F.broadcast(b))
    se2 = F.col("va") / F.col("n_a") + F.col("vb") / F.col("n_b")
    df = (se2 * se2) / (
        F.col("va") * F.col("va") / (F.col("n_a") * F.col("n_a") * (F.col("n_a") - 1.0))
        + F.col("vb") * F.col("vb") / (F.col("n_b") * F.col("n_b") * (F.col("n_b") - 1.0))
    )
    return ab.select(
        "n_a",
        "n_b",
        F.round("ma", 4).alias("mean_a"),
        F.round("mb", 4).alias("mean_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(df, 4).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Session path mining (top opening paths)
# --------------------------------------------------------------------------
_PATH_GAP_MIN = 30  # session idle timeout (minutes), matches sessionization


@query(
    "events_top_session_paths",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_PATH_GAP_MIN} * 60 * 1000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM o),
    r AS (
      SELECT user_id, session_no, event_type,
             row_number() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS rn
      FROM s),
    paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY rn) AS path,
             CAST(count(*) AS BIGINT) AS plen
      FROM r WHERE rn <= 3 GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(min(plen) AS BIGINT) AS path_len
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top opening paths (first 3 event types) per session — the
    lightweight sequence-mining staple behind "how do journeys begin":
    sessionize by 30-minute idle gaps (the same lag+cumsum construction
    proven equivalent to session_window), take each session's first
    three steps in order, count path frequencies.

    Scale: sessionization is one user-keyed window; path assembly
    aggregates at most 3 rows per session (rank<=3 compiles to
    WindowGroupLimit pre-exchange pruning); the top-15 is TakeOrdered.
    Path strings never exceed 3 type names."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_start = F.when(
        gap_us.isNull() | (gap_us > _PATH_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    s = ev.select(
        "user_id", "ts", "event_id", "event_type", is_start.alias("is_start")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_start")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_no"),
    )
    r = s.select(
        "user_id",
        "session_no",
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id", "session_no").orderBy("ts", "event_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = r.groupBy("user_id", "session_no").agg(
        F.concat_ws(
            ">", F.array_sort(F.collect_list(F.struct("rn", "event_type")))
            .getField("event_type")
        ).alias("path"),
        F.count(F.lit(1)).cast("bigint").alias("plen"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.min("plen").cast("bigint").alias("path_len"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Conversion attribution (first-touch vs last-touch)
# --------------------------------------------------------------------------
@query(
    "events_attribution_models",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS vc,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_PATH_GAP_MIN} * 60 * 1000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_no
      FROM o),
    t AS (
      SELECT user_id, session_no, ts, event_id, event_type, vc,
             first_value(event_type) OVER ws AS first_touch,
             lag(event_type) OVER ws AS prev_type
      FROM s
      WINDOW ws AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)),
    conv AS (
      SELECT first_touch,
             coalesce(prev_type, 'direct') AS last_touch, vc
      FROM t WHERE event_type = 'purchase'),
    ft AS (SELECT first_touch AS touch_type, count(*) AS n_first,
                  CAST(sum(vc) AS BIGINT) AS first_touch_cents
           FROM conv GROUP BY 1),
    lt AS (SELECT last_touch AS touch_type, count(*) AS n_last,
                  CAST(sum(vc) AS BIGINT) AS last_touch_cents
           FROM conv GROUP BY 1)
    SELECT coalesce(ft.touch_type, lt.touch_type) AS touch_type,
           CAST(coalesce(n_first, 0) AS BIGINT) AS n_first,
           CAST(coalesce(first_touch_cents, 0) AS BIGINT)
             AS first_touch_cents,
           CAST(coalesce(n_last, 0) AS BIGINT) AS n_last,
           CAST(coalesce(last_touch_cents, 0) AS BIGINT) AS last_touch_cents
    FROM ft FULL OUTER JOIN lt ON lt.touch_type = ft.touch_type
    """,
)
def events_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution under two industry models at once: each
    purchase's value credits (a) the session's FIRST touch and (b) the
    immediately preceding touch ('direct' if the purchase opens its
    session) — the first-touch/last-touch comparison every growth team
    runs, and the canonical example of why attribution model choice
    changes budget decisions.

    Exactness: values in integer cents; sessionization is the proven
    lag+cumsum construction shared with path mining. Scale: two
    user-keyed windows (same shuffle — AQE reuses the partitioning),
    then bounded |types|-row aggregates either side of one outer
    join."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_start = F.when(
        gap_us.isNull() | (gap_us > _PATH_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        is_start.alias("is_start"),
    ).withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    t = s.select(
        "event_type",
        "vc",
        F.first("event_type").over(ws).alias("first_touch"),
        F.lag("event_type").over(ws).alias("prev_type"),
    )
    conv = t.filter(F.col("event_type") == "purchase").select(
        "first_touch",
        F.coalesce("prev_type", F.lit("direct")).alias("last_touch"),
        "vc",
    )
    ft = conv.groupBy(F.col("first_touch").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_first"),
        F.sum("vc").cast("bigint").alias("first_touch_cents"),
    )
    lt = conv.groupBy(F.col("last_touch").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_last"),
        F.sum("vc").cast("bigint").alias("last_touch_cents"),
    )
    return (
        ft.join(lt, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce("n_first", F.lit(0)).cast("bigint").alias("n_first"),
            F.coalesce("first_touch_cents", F.lit(0))
            .cast("bigint")
            .alias("first_touch_cents"),
            F.coalesce("n_last", F.lit(0)).cast("bigint").alias("n_last"),
            F.coalesce("last_touch_cents", F.lit(0))
            .cast("bigint")
            .alias("last_touch_cents"),
        )
    )


# --------------------------------------------------------------------------
# User-journey similarity: order-sensitive trigram cosine between users'
# event-type sequences — the join-friendly trajectory-similarity
# formulation (sequence shingles play the role of a trajectory's local
# reference segments; cf. the distributed trajectory top-k literature).
# --------------------------------------------------------------------------
_UJ_USERS = 50  # compare the first 50 user ids
_UJ_TOPK = 3


@query(
    "behavior_journey_similarity",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
      FROM events WHERE user_id < {_UJ_USERS} GROUP BY user_id),
    grams AS (
      SELECT user_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT user_id, unnest(list_transform(
          generate_series(1, len(s) - 2),
          i -> s[i] || '>' || s[i+1] || '>' || s[i+2])) AS g
        FROM seq) GROUP BY user_id, g),
    nrm AS (SELECT user_id, CAST(sum(c * c) AS BIGINT) AS n2
            FROM grams GROUP BY user_id),
    dots AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             CAST(sum(a.c * b.c) AS BIGINT) AS dp
      FROM grams a JOIN grams b
        ON a.g = b.g AND a.user_id < b.user_id
      GROUP BY 1, 2),
    scored AS (
      SELECT user_a, user_b,
             dp / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS cos_raw
      FROM dots JOIN nrm na ON na.user_id = user_a
                JOIN nrm nb ON nb.user_id = user_b)
    SELECT user_a, user_b, rank, round(cos_raw, 4) AS journey_cos
    FROM (SELECT user_a, user_b, cos_raw,
                 CAST(row_number() OVER (PARTITION BY user_a
                        ORDER BY round(cos_raw, 4) DESC, user_b) AS INTEGER)
                   AS rank
          FROM scored)
    WHERE rank <= {_UJ_TOPK}
    """,
)
def behavior_journey_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive user-journey similarity: each user's event-type
    sequence (ordered by ts, event_id) shingles into trigrams; cosine
    over trigram COUNT vectors ranks the top-{k} most similar journeys
    per user (user_id < {u}).  Unlike the co-activity graph (same hour)
    or the Markov matrix (aggregate transitions), this compares the
    SHAPE of each user's path — the trajectory-similarity primitive.

    Cross-engine determinism: dot products and squared norms are exact
    integers; the cosine divides identical doubles; ranking ties break
    on the ROUNDED score then user_b (the BM25 discipline).

    Scale: sequence assembly is one keyed shuffle (sort_array of
    (ts, event_id, type) structs — no global sort); pairs materialize
    only through the trigram inverted-index join, never user x user; a
    hot trigram (every user shares it) is the stop-word case and would
    be df-capped exactly like the TF-IDF path.
    """.format(k=_UJ_TOPK, u=_UJ_USERS)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < _UJ_USERS)
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", F.col("event_type").alias("t")))
            ),
            lambda s: s["t"],
        ).alias("s")
    )
    grams = (
        # journeys shorter than 3 events have no trigrams; without the
        # filter, sequence(1, size-2) COUNTS DOWN for size < 3 and emits
        # null grams the oracle never produces
        seq.filter(F.expr("size(s) >= 3"))
        .select(
            "user_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 2),"
                    " i -> concat(s[i-1], '>', s[i], '>', s[i+1]))"
                )
            ).alias("g"),
        )
        .groupBy("user_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nrm = grams.groupBy("user_id").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    a = grams.select(F.col("user_id").alias("user_a"), "g", F.col("c").alias("ca"))
    b = grams.select(F.col("user_id").alias("user_b"), "g", F.col("c").alias("cb"))
    dots = (
        a.join(b, "g")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dp"))
    )
    na = nrm.select(F.col("user_id").alias("user_a"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("user_id").alias("user_b"), F.col("n2").alias("nb2"))
    scored = (
        dots.join(F.broadcast(na), "user_a")
        .join(F.broadcast(nb), "user_b")
        .withColumn(
            "cos_raw",
            F.col("dp")
            / (
                F.sqrt(F.col("na2").cast("double"))
                * F.sqrt(F.col("nb2").cast("double"))
            ),
        )
    )
    w = W.partitionBy("user_a").orderBy(
        F.round("cos_raw", 4).desc(), F.col("user_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _UJ_TOPK)
        .select("user_a", "user_b", "rank", F.round("cos_raw", 4).alias("journey_cos"))
    )


# --------------------------------------------------------------------------
# Sequence-pattern matching over sessions (MATCH_RECOGNIZE lite): encode
# each session as a string of event-type initials and count sessions
# matching fixed regex patterns — row-pattern analytics without the
# MATCH_RECOGNIZE clause (patterns stay in the RE2/Java common subset).
# --------------------------------------------------------------------------
from .sessions import SESSION_GAP_MIN  # noqa: E402  (same gap as sessionization)

_SP_PATTERNS = [
    ("view_click_purchase", "v.*c.*p"),
    ("double_error", "ee"),
    ("login_start", "^l"),
]


@query(
    "events_pattern_sessions",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             substr(event_type, 1, 1) AS init,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT user_id, init, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    seqs AS (
      SELECT user_id, session_no,
             string_agg(init, '' ORDER BY ts, event_id) AS seq
      FROM numbered GROUP BY user_id, session_no),
    pats AS (SELECT * FROM (VALUES
      {", ".join(f"('{n}', '{p}')" for n, p in _SP_PATTERNS)})
      AS t(pattern_name, pat)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM seqs)
    SELECT p.pattern_name,
           CAST(sum(CASE WHEN regexp_matches(s.seq, p.pat)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           tot.n_sessions,
           round(sum(CASE WHEN regexp_matches(s.seq, p.pat)
                          THEN 1 ELSE 0 END) * 1.0 / tot.n_sessions, 6)
             AS match_share
    FROM seqs s CROSS JOIN pats p CROSS JOIN tot
    GROUP BY p.pattern_name, tot.n_sessions
    """,
)
def events_pattern_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern analytics (MATCH_RECOGNIZE lite): each session (the
    {gap}-minute-gap sessions proven equivalent to session_window in
    events_sessionization) becomes a string of event-type initials in
    (ts, event_id) order; fixed regex patterns — funnel order
    view..click..purchase, an immediate error repeat, login-opened
    sessions — are counted with their session share.  Patterns use only
    the RE2/Java common subset (no backrefs/lookaround) so both engines
    match identically.

    Scale: sessionization is one keyed shuffle; the session string is a
    bounded per-session reduction (sessions are minutes long — the
    string is small by construction); pattern counting is a conditional
    sum over |patterns| broadcast rows — one pass over sessions for
    the whole pattern battery.  This is how sequence mining stays
    declarative at 100 TB: encode once, regex many."""
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts",
                                "event_id",
                                F.substring("event_type", 1, 1).alias("i"),
                            )
                        )
                    ),
                    lambda s: s["i"],
                ),
            ).alias("seq")
        )
        .select("seq")
    )
    pats = spark.createDataFrame(
        list(_SP_PATTERNS), "pattern_name string, pat string"
    )
    tot = seqs.agg(F.count(F.lit(1)).alias("n_sessions"))
    matched = F.sum(
        F.when(F.expr("seq rlike pat"), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        seqs.crossJoin(F.broadcast(pats))
        .crossJoin(F.broadcast(tot))
        .groupBy("pattern_name", "n_sessions")
        .agg(
            matched.alias("n_matched"),
            F.round(matched * 1.0 / F.col("n_sessions"), 6).alias("match_share"),
        )
        .select("pattern_name", "n_matched", "n_sessions", "match_share")
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival: time-to-first-purchase (hours since a user's
# first event), right-censored at the corpus end for users who never
# purchase — the standard censored time-to-event estimator.  The
# cumulative product folds over the BOUNDED hour table as a sequential
# array fold — identical order in both engines, so the survival doubles
# match bit-for-bit (a window-product via exp(sum(log)) would
# reintroduce libm).
# --------------------------------------------------------------------------


@query(
    "events_kaplan_meier",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id),
    horizon AS (SELECT max(ts) AS tend FROM events),
    obs AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN CAST(floor(date_diff('second', t0, tp) / 3600.0)
                            AS BIGINT)
                  ELSE CAST(floor(date_diff('second', t0, horizon.tend)
                                  / 3600.0) AS BIGINT) END AS dur_h,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS converted
      FROM firsts, horizon),
    tallies AS (
      SELECT dur_h AS h, CAST(count(*) AS BIGINT) AS n_here,
             CAST(sum(converted) AS BIGINT) AS n_events
      FROM obs GROUP BY dur_h),
    risked AS (
      SELECT h, n_here, n_events,
             CAST(sum(n_here) OVER (ORDER BY h DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
      FROM tallies),
    curve AS (
      SELECT h, n_risk, n_events,
             list_reduce(
               list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(
                   (SELECT list(struct_pack(h := t2.h, n_risk := t2.n_risk,
                                            n_events := t2.n_events)
                            ORDER BY t2.h) FROM risked t2),
                   x -> CASE WHEN x.h <= risked.h
                             THEN 1.0 - CAST(x.n_events AS DOUBLE) / x.n_risk
                             ELSE 1.0 END)),
               (acc, f) -> acc * f) AS surv
      FROM risked)
    SELECT h AS hour, n_risk, n_events, round(surv, 6) AS survival
    FROM curve WHERE n_events > 0
    """,
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase: duration = hours from a
    user's first event to their first 'purchase'; users who never
    purchase are right-CENSORED at the corpus horizon (they leave the
    risk set without counting as an event — dropping them instead would
    bias conversion optimistically, which is the whole point of KM).
    S(t) = prod_{h<=t} (1 - events_h / at_risk_h), computed as a
    SEQUENTIAL fold over the sorted bounded hour table in both engines
    (identical association order -> identical doubles; exp(sum(log))
    would reintroduce libm ulp skew).

    Scale: per-user firsts are one groupBy with min() partials; the
    hour tally is bounded by the corpus span; the at-risk counts are a
    reverse cumulative sum and the fold both run over that bounded
    table, never the users.  Survival analysis of a 100 TB event log
    costs two aggregates.  Output rows: the KM step hours."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    horizon = ev.agg(F.max("ts").alias("tend"))
    dur = F.when(
        F.col("tp").isNotNull(),
        F.floor((F.unix_timestamp("tp") - F.unix_timestamp("t0")) / 3600.0),
    ).otherwise(
        F.floor((F.unix_timestamp("tend") - F.unix_timestamp("t0")) / 3600.0)
    )
    obs = firsts.crossJoin(F.broadcast(horizon)).select(
        dur.cast("long").alias("dur_h"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("converted"),
    )
    tallies = obs.groupBy(F.col("dur_h").alias("h")).agg(
        F.count(F.lit(1)).alias("n_here"), F.sum("converted").alias("n_events")
    )
    w = W.partitionBy(F.lit(0)).orderBy(F.col("h").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    risked = tallies.withColumn("n_risk", F.sum("n_here").over(w))
    factors = risked.agg(
        F.array_sort(F.collect_list(F.struct("h", "n_risk", "n_events"))).alias(
            "fs"
        )
    )
    curve = risked.crossJoin(F.broadcast(factors)).withColumn(
        "surv",
        F.expr(
            "aggregate(fs, CAST(1.0 AS DOUBLE),"
            " (acc, x) -> acc * CASE WHEN x.h <= h"
            " THEN 1.0 - CAST(x.n_events AS DOUBLE) / x.n_risk"
            " ELSE 1.0 END)"
        ),
    )
    return curve.filter(F.col("n_events") > 0).select(
        F.col("h").alias("hour"),
        "n_risk",
        "n_events",
        F.round("surv", 6).alias("survival"),
    )
