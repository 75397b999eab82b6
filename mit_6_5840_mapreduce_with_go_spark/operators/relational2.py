"""Advanced relational surface: join breadth (full outer / cross / range /
as-of), grouping sets, statistical aggregates, exact percentiles,
deterministic hash sampling, string/datetime function breadth, scalar
subqueries, boolean aggregates.

None of this exists in the reference (SURVEY.md §2.D: its only "query
API" is the Map/Reduce pair) — this is the Catalyst-native breadth a
user of a real analytics engine expects, each piece oracle-checked.

Scale notes: the as-of join is the classic event-enrichment pattern —
implemented as join + per-left-row top-1 window, which Spark executes as
one shuffle on the join key; the range self-join carries a coarse
bucket key (hour) so the theta condition only runs within hour-adjacent
pairs rather than as a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.stitch import PID, order_buckets, stitched_order
from ..registry import query
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "join_full_outer_nation_balance",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, round(sum(c_acctbal), 2) AS cust_total
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, round(sum(s_acctbal), 2) AS supp_total
               FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk) AS nationkey, cust_total, supp_total
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_total"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_total"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "cust_total", "supp_total"
    )


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r_name, n_name, (r_regionkey = n_regionkey) AS is_home
    FROM region CROSS JOIN nation
    """,
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit tiny cross join (5 x 25) — the one place a cartesian is fine
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home")
    )


@query(
    "range_join_error_context",
    oracle="""
    SELECT e.event_id,
           count(c.event_id) AS n_prior_events,
           round(coalesce(sum(c.value), 0), 4) AS prior_value
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: for every error event, aggregate the same user's
    events in the preceding hour. The equi-key (user_id) bounds the theta
    range condition, so the join shuffles on user_id and the time
    predicate evaluates only within a user's rows — no cartesian."""
    ev = _t(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"), F.col("user_id").alias("euid"), F.col("ts").alias("ets")
    )
    c = ev.select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"), F.col("value").alias("cval"),
    )
    joined = e.join(
        c,
        (F.col("cuid") == F.col("euid"))
        & (F.col("cts") >= F.col("ets") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") < F.col("ets")),
        "left",
    )
    return joined.groupBy(F.col("eid").alias("event_id")).agg(
        F.count("cid").alias("n_prior_events"),
        F.round(F.coalesce(F.sum("cval"), F.lit(0.0)), 4).alias("prior_value"),
    )


@query(
    "asof_join_last_order_before_event",
    oracle="""
    SELECT event_id, user_id, last_orderkey, last_orderdate FROM (
      SELECT e.event_id, e.user_id,
             o.o_orderkey AS last_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      WHERE e.event_id < 2000)
    WHERE rn = 1
    """,
)
def asof_join_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time enrichment): each event picks the most
    recent order of the same key at-or-before its timestamp. Join on the
    equi-key + inequality, then top-1 per left row — one shuffle on the
    key; at scale the inequality prunes via partition-level min/max when
    the right side is date-partitioned."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    orders = _t(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (orders.o_custkey == ev.user_id) & (orders.o_orderdate <= ev.ts),
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
    )


@query(
    "groupingsets_flag_status",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def groupingsets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS total_price
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "stats_price_moments",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sx,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)
                 * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx,
             sum(o_custkey) AS sy,
             sum(o_custkey * o_custkey) AS syy,
             sum(CAST(round(o_totalprice * 100) AS BIGINT) * o_custkey) AS sxy,
             min(o_totalprice) AS mn, max(o_totalprice) AS mx
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           round(sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                      / (n - 1)) / 100.0, 4) AS price_stddev,
           round((CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / (n - 1) / 10000.0, 4) AS price_var,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 4) AS price_cust_corr,
           round(mn, 2) AS price_min,
           round(mx, 2) AS price_max
    FROM s
    """,
)
def stats_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance/correlation of order prices per priority.

    Moments are accumulated as EXACT integer-cent sums (decimal — double
    partial sums change with partition count, so variance in the 4th
    decimal would depend on the plan), then finished with the same double
    formula the oracle uses — bit-identical regardless of parallelism."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(20,0)")
    cust = F.col("o_custkey").cast("decimal(20,0)")
    s = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(cents * cents).alias("sxx"),
        F.sum(cust).alias("sy"),
        F.sum(cust * cust).alias("syy"),
        F.sum(cents * cust).alias("sxy"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_cents = (sxx - sx * sx / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(
        "o_orderpriority",
        F.round(F.sqrt(var_cents) / 100.0, 4).alias("price_stddev"),
        F.round(var_cents / 10000.0, 4).alias("price_var"),
        F.round(corr, 4).alias("price_cust_corr"),
        F.round("mn", 2).alias("price_min"),
        F.round("mx", 2).alias("price_max"),
    )


@query(
    "percentile_prices_by_status",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_prices_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact continuous percentile (not approx_percentile) so both engines
    # compute the same interpolation
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@query(
    "sample_hash_orders",
    oracle="""
    SELECT count(*) AS n_sampled,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS sample_value
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 hash sample (md5 prefix) — unlike TABLESAMPLE,
    reproducible across engines and runs; the standard trick for stable
    data-pipeline sampling at scale."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            # integer-cent sum (q1/q5 recipe)
            F.round(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
                ).cast("double")
                / 100.0,
                2,
            ).alias("sample_value"),
        )
    )


@query(
    "scalar_string_breadth",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*')                  AS brand_padded,
           translate(p_name, 'ae', 'AE')           AS name_translated,
           levenshtein(p_brand, 'Brand#11')        AS brand_editdist,
           split_part(p_type, ' ', 1)              AS type_head,
           reverse(p_brand)                        AS brand_rev,
           repeat(left(p_name, 2), 2)              AS name_echo
    FROM part
    """,
)
def scalar_string_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.translate("p_name", "ae", "AE").alias("name_translated"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_editdist"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("name_echo"),
    )


@query(
    "scalar_datetime_breadth",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INTEGER)   AS order_quarter,
           CAST(week(o_orderdate) AS INTEGER)      AS order_week,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS order_doy,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    """,
)
def scalar_datetime_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("order_quarter"),
        F.weekofyear("o_orderdate").alias("order_week"),
        F.dayofyear("o_orderdate").alias("order_doy"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 90), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@query(
    "window_ntile_rank_lead",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER)  AS price_quartile,
           CAST(rank() OVER w AS BIGINT)     AS price_rank,
           CAST(dense_rank() OVER (ORDER BY o_orderpriority) AS BIGINT) AS priority_rank,
           lead(o_orderkey) OVER w           AS next_orderkey
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_rank_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking via the stitched two-pass (plans/stitch.py): an
    unpartitioned window would single-partition-sort the whole fact
    table at 100 TB.  Instead: range-partition on the ordering key,
    per-partition ranks/leads (P parallel sorts), then a P-row stats
    table supplies prefix offsets, the global row count for ntile's
    exact bucket arithmetic, and each partition's successor key for the
    boundary lead — all integer math, so the stitched result is
    row-identical to the single-window oracle.

    rank() == row_number here because the ordering key ends in the
    unique o_orderkey (no ties); dense_rank over the priority DOMAIN is
    a row_number over the distinct values (bounded: |priorities|),
    broadcast-joined back."""
    orders = _t(spark, sf_dir, "orders")
    okey = F.struct((-F.col("o_totalprice")).alias("p"), F.col("o_orderkey").alias("k"))
    base = order_buckets(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"), okey
    )
    wloc = W.partitionBy(PID).orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    local = base.withColumn("_lrn", F.row_number().over(wloc)).withColumn(
        "_llead", F.lead("o_orderkey").over(wloc)
    )
    # P-row stats: row count + first key (by the same order) per range
    # bucket; prefix sums / successor firsts stitch over those P rows.
    stats = base.groupBy(PID).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min_by("o_orderkey", okey).alias("_first_key"),
    )
    wpid = W.orderBy(PID)
    stitch = stats.select(
        F.col(PID),
        F.coalesce(
            F.sum("_cnt").over(wpid.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("_offset"),
        F.lead("_first_key").over(wpid).alias("_next_first"),
    ).crossJoin(F.broadcast(stats.agg(F.sum("_cnt").alias("_n"))))
    # dense_rank over a bounded domain: rank the distinct priorities
    # (the _stitch_dom_ alias asserts boundedness to the plan audit).
    prio = (
        orders.select(F.col("o_orderpriority").alias("_stitch_dom_priority"))
        .distinct()
        .withColumn(
            "priority_rank",
            F.row_number().over(W.orderBy("_stitch_dom_priority")).cast("long"),
        )
    )
    return (
        local.join(F.broadcast(stitch), PID)
        .join(
            F.broadcast(prio),
            F.col("o_orderpriority") == F.col("_stitch_dom_priority"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            "priority_rank",
            "_llead",
            "_next_first",
            "_n",
            (F.col("_lrn") + F.col("_offset")).alias("_rn"),
        )
        .select(
            "o_orderkey",
            # exact ntile(4): the first N%4 buckets get ceil(N/4) rows
            F.when(
                F.col("_rn") <= (F.col("_n") % 4) * (F.expr("_n div 4") + 1),
                F.expr("(_rn - 1) div (_n div 4 + 1) + 1"),
            )
            .otherwise(
                F.col("_n") % 4
                + F.expr("(_rn - (_n % 4) * (_n div 4 + 1) - 1) div (_n div 4) + 1")
            )
            .cast("int")
            .alias("price_quartile"),
            F.col("_rn").cast("long").alias("price_rank"),
            "priority_rank",
            # boundary lead: partition-last rows (local lead NULL) take the
            # next range partition's first key; the global last row stays NULL
            F.coalesce("_llead", "_next_first").alias("next_orderkey"),
        )
    )


@query(
    "bool_agg_discount_profile",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_low_discount,
           bool_or(l_discount = 0.0)   AS any_zero_discount,
           count(CASE WHEN l_discount = 0.0 THEN 1 END) AS n_zero_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bool_agg_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_discount"),
        F.bool_or(F.col("l_discount") == 0.0).alias("any_zero_discount"),
        F.count(F.when(F.col("l_discount") == 0.0, 1)).alias("n_zero_discount"),
    )


@query(
    "scalar_subquery_near_max",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_near_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scalar subquery against max (exact double — unlike avg, no
    # summation-order ambiguity at the comparison boundary)
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM sq_orders
        WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM sq_orders)
        """
    )


@query(
    "events_trailing_hour_stats",
    oracle="""
    SELECT event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing,
           round(avg(value) OVER w, 4)     AS avg_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def events_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (vs ROWS): trailing 1-hour count/avg per user —
    the moving-average shape. Spark's rangeBetween needs a numeric order
    key, so the frame runs over unix MICROseconds (matching the
    microsecond-precision timestamps; unix SECONDS truncates, silently
    widening the frame by up to 1 s at its trailing edge — caught at
    sf0.1 where an event sat inside the truncated bound but outside the
    exact one); DuckDB's INTERVAL RANGE frame is then identical."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.round(F.avg("value").over(w), 4).alias("avg_trailing"),
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, round(val, 4) AS val
    FROM (SELECT c_custkey,
                 c_acctbal            AS balance,
                 CAST(c_nationkey AS DOUBLE) AS nation,
                 CAST(length(c_name) AS DOUBLE) AS name_len
          FROM customer)
    UNPIVOT (val FOR metric IN (balance, nation, name_len))
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide metric columns to long (metric, val) rows —
    F.unpivot compiles to Expand (each input row emits k rows; no
    shuffle)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("balance"),
        F.col("c_nationkey").cast("double").alias("nation"),
        F.length("c_name").cast("double").alias("name_len"),
    )
    return (
        cust.unpivot("c_custkey", ["balance", "nation", "name_len"], "metric", "val")
        .select("c_custkey", "metric", F.round("val", 4).alias("val"))
    )


@query(
    "salted_user_event_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def salted_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the manual skew-mitigation pattern
    (AQE's skew-join split handles joins; salting handles skewed GROUP BY
    keys): phase 1 aggregates (key, salt) so a hot key's rows spread over
    N_SALT reducers; phase 2 merges the partials per key. Result is
    identical to the direct groupBy (the oracle), which is the point —
    the rewrite only changes the shuffle shape. Partial counts/sums are
    exact under re-aggregation (and partial doubles re-sum in a
    deterministic two-level order, so rounding at the end is stable)."""
    N_SALT = 16
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALT)))
    partial = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        # exact decimal partials: double re-summation order across the two
        # phases would differ from the oracle's single-phase sum
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("pv"), 4).cast("double").alias("total_value"),
    )


@query(
    "setop_multiset_lineflags",
    oracle="""
    SELECT l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F')
    """,
)
def setop_multiset_lineflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics: occurrences subtract, not
    vanish) — the counterpart of the distinct set ops in relational.py."""
    li = _t(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    f = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return n.exceptAll(f)


@query(
    "window_first_last_ignore_nulls",
    oracle="""
    SELECT event_id,
           first_value(big_val IGNORE NULLS) OVER w AS first_big,
           last_value(big_val IGNORE NULLS)  OVER w AS last_big
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN value > 100 THEN value END AS big_val
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with IGNORE NULLS over a full frame: each event
    sees its user's first and last 'big' (value>100) reading — the
    fill-forward/backward building block."""
    ev = _t(spark, sf_dir, "events")
    big = F.when(F.col("value") > 100, F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.withColumn("big_val", big).select(
        "event_id",
        F.first("big_val", ignorenulls=True).over(w).alias("first_big"),
        F.last("big_val", ignorenulls=True).over(w).alias("last_big"),
    )


@query(
    "posexplode_doc_tokens",
    oracle="""
    SELECT doc_id, pos, toks[pos] AS word FROM
      (SELECT doc_id, string_split(text, ' ') AS toks
       FROM documents WHERE doc_id < 50),
      unnest(generate_series(1, len(toks))) AS t(pos)
    """,
)
def posexplode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UDTF shape with ordinality): token + 1-based
    position per document — the tokenize-with-offsets primitive."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "sketch_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT event_id) AS exact_events,
           TRUE AS hll_users_ok,
           TRUE AS hll_events_ok,
           TRUE AS median_ok
    FROM events GROUP BY event_type
    """,
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: HyperLogLog distinct counts + t-digest-backed
    approx percentile per event type — the streaming/100 TB substitutes
    for exact distinct (unbounded state).

    Raw sketch estimates are engine-specific (Spark HLL++ vs DuckDB HLL
    disagree by design), so the hash-compared output carries the exact
    distinct counts plus booleans asserting each sketch landed inside its
    error bound (HLL: rsd-scaled; median: between the exact 0.45 and 0.55
    quantiles).  The oracle predicts every bound holds (TRUE); a sketch
    drifting out of bound therefore fails the driver's hash compare —
    a real cross-engine signal rather than a rows-only waiver."""
    ev = _t(spark, sf_dir, "events")
    # Two exact count-DISTINCTs inside one aggregate would trigger
    # RewriteDistinctAggregates' Expand — every event row shuffled 3x,
    # with the exact-percentile buffers riding along (the slowest sf1
    # registry row before this split, 109 s).  Instead: one 1x-data
    # aggregate for the sketches + percentile band, and each exact
    # distinct as its own two-level (dedup-then-count) aggregation with
    # map-side partial dedup; the per-type results are tiny and join
    # broadcast.
    base = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("approx_events"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx_median"),
        F.expr("percentile(value, array(0.45, 0.55))").alias("med_band"),
    )
    users = (
        ev.select(F.col("event_type").alias("et_u"), "user_id")
        .distinct()
        .groupBy("et_u")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    events = (
        ev.select(F.col("event_type").alias("et_e"), "event_id")
        .distinct()
        .groupBy("et_e")
        .agg(F.count(F.lit(1)).alias("exact_events"))
    )
    # null-safe join keys: groupBy keeps a NULL event_type group, and a
    # plain equi-join would silently drop it — eqNullSafe preserves the
    # single-aggregate semantics this split replaced
    agg = (
        base.join(
            F.broadcast(users), F.col("event_type").eqNullSafe(F.col("et_u"))
        )
        .drop("et_u")
        .join(
            F.broadcast(events), F.col("event_type").eqNullSafe(F.col("et_e"))
        )
        .drop("et_e")
    )
    users_tol = F.greatest(F.lit(2.0), 0.10 * F.col("exact_users"))
    events_tol = F.greatest(F.lit(2.0), 0.05 * F.col("exact_events"))
    return agg.select(
        "event_type",
        "exact_users",
        "exact_events",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= users_tol).alias(
            "hll_users_ok"
        ),
        (F.abs(F.col("approx_events") - F.col("exact_events")) <= events_tol).alias(
            "hll_events_ok"
        ),
        (
            (F.col("approx_median") >= F.col("med_band")[0])
            & (F.col("approx_median") <= F.col("med_band")[1])
        ).alias("median_ok"),
    )


@query(
    "array_agg_supplier_profile",
    oracle="""
    SELECT l_suppkey,
           string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
           strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
           strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship,
           count(*) AS n_lines
    FROM lineitem GROUP BY l_suppkey
    """,
)
def array_agg_supplier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "window_dist_rank_breadth",
    oracle="""
    SELECT c_mktsegment,
           c_custkey,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_dist_rank_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window breadth: percent_rank / cume_dist (rank-based,
    engine-exact rationals) and nth_value over the full partition frame.

    Scale shape: the ordering key (acctbal DESC, custkey) is a TOTAL
    order, so rank == row_number and the distribution functions reduce
    to rank arithmetic — percent_rank = (r-1)/(n-1), cume_dist = r/n,
    nth_value(2) = the group's r==2 row.  The rank comes from the
    GROUPED stitch (plans/stitch.py) instead of
    ``Window.partitionBy(c_mktsegment)``, which would put a fifth of
    every customer on ONE task (5 segments regardless of table size);
    n and the second pick are a map-side-combinable groupBy broadcast
    back."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    key = F.struct(
        (-F.col("c_acctbal")).alias("_nb"), F.col("c_custkey").alias("_ck")
    )
    ranked = stitched_order(
        cust, key, partition_by=["c_mktsegment"], rank_col="_r"
    )
    seg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("_r") == 2, F.col("c_custkey"))).alias(
            "second_richest"
        ),
    )
    return ranked.join(F.broadcast(seg), "c_mktsegment").select(
        "c_mktsegment",
        "c_custkey",
        F.round(
            F.when(
                F.col("_n") > 1,
                (F.col("_r") - 1) / (F.col("_n") - 1),
            ).otherwise(0.0),
            4,
        ).alias("pct_rank"),
        F.round(F.col("_r") / F.col("_n"), 4).alias("cume"),
        "second_richest",
    )


# Count-Min sketch: d x w counter matrix with universal integer hashing
# ((a*key + b) mod P mod w — same family as MinHash). Unlike the HLL/
# t-digest sketch above, every step is deterministic integer math both
# engines compute identically, so the sketch AND its estimates are fully
# oracle-checked. Point estimate = min over the d rows (classic CM
# overestimate bound: err <= eps*N with w = ceil(e/eps)).
CM_D = 4
CM_W = 64
_CM_PARAMS: list[tuple[int, int]] = []


def _cm_params() -> list[tuple[int, int]]:
    if not _CM_PARAMS:
        from ..functions.hashing import minhash_perm_params

        _CM_PARAMS.extend(minhash_perm_params(CM_D, seed=99))
    return _CM_PARAMS


def _cm_oracle() -> str:
    p = (1 << 61) - 1
    bucket = "(({a} * u.user_id + {b}) % {p}) % {w}"
    counter_rows = "\n      UNION ALL\n".join(
        f"      SELECT {j} AS row_id, {bucket.format(a=a, b=b, p=p, w=CM_W)} AS bucket,"
        f" count(*) AS cnt FROM events u GROUP BY 2"
        for j, (a, b) in enumerate(_cm_params())
    )
    est_terms = ", ".join(
        f"(SELECT cnt FROM counters c WHERE c.row_id = {j}"
        f" AND c.bucket = {bucket.format(a=a, b=b, p=p, w=CM_W)})"
        for j, (a, b) in enumerate(_cm_params())
    )
    return f"""
    WITH counters AS (
{counter_rows}),
    q AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    exact AS (SELECT user_id, count(*) AS exact_cnt FROM events
              WHERE user_id < 20 GROUP BY 1)
    SELECT u.user_id,
           least({est_terms}) AS cm_estimate,
           e.exact_cnt
    FROM q u JOIN exact e ON e.user_id = u.user_id
    """


@query("sketch_countmin_user_counts", oracle=_cm_oracle())
def sketch_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of per-user event counts, estimates for users
    < 20 alongside exact counts (the overestimate is visible and
    deterministic). Build = one groupBy per hash row over the bucketed
    key — at 100 TB the d x w counter matrix (256 cells here) is the
    fixed-size mergeable summary that replaces a full per-key count;
    rows merge by cell-wise addition across partitions/days."""
    p = (1 << 61) - 1
    ev = _t(spark, sf_dir, "events")
    counters = None
    for j, (a, b) in enumerate(_cm_params()):
        bucket = ((F.lit(a) * F.col("user_id") + F.lit(b)) % F.lit(p)) % F.lit(CM_W)
        c = ev.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("cnt"))
        c = c.withColumn("row_id", F.lit(j))
        counters = c if counters is None else counters.unionByName(c)
    q = ev.filter(F.col("user_id") < 20).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    est = q
    for j, (a, b) in enumerate(_cm_params()):
        bucket = ((F.lit(a) * F.col("user_id") + F.lit(b)) % F.lit(p)) % F.lit(CM_W)
        cj = counters.filter(F.col("row_id") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("cnt").alias(f"c{j}")
        )
        est = est.withColumn(f"b{j}", bucket).join(
            F.broadcast(cj), f"b{j}"
        )
    return est.select(
        "user_id",
        F.least(*[F.col(f"c{j}") for j in range(CM_D)]).alias("cm_estimate"),
        "exact_cnt",
    )


CM_JOIN_W = 4096  # join-size sketch width: sized to key cardinality
# (err <= (e/w)*Na*Nb — at w=64 the overestimate here is ~25x; at 4096
# collisions among the ~150 live keys are rare and the estimate lands
# within a few percent. The sizing rule IS the lesson.)


def _cms_join_oracle() -> str:
    p = (1 << 61) - 1
    bkt_o = "(({a} * o.o_custkey + {b}) % {p}) % {w}"
    bkt_e = "(({a} * e.user_id + {b}) % {p}) % {w}"
    ca = "\n      UNION ALL\n".join(
        f"      SELECT {j} AS row_id, {bkt_o.format(a=a, b=b, p=p, w=CM_JOIN_W)}"
        f" AS bucket, count(*) AS cnt FROM orders o GROUP BY 2"
        for j, (a, b) in enumerate(_cm_params())
    )
    cb = "\n      UNION ALL\n".join(
        f"      SELECT {j} AS row_id, {bkt_e.format(a=a, b=b, p=p, w=CM_JOIN_W)}"
        f" AS bucket, count(*) AS cnt FROM events e GROUP BY 2"
        for j, (a, b) in enumerate(_cm_params())
    )
    return f"""
    WITH ca AS (
{ca}),
    cb AS (
{cb}),
    ip AS (
      SELECT ca.row_id, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS est
      FROM ca JOIN cb ON cb.row_id = ca.row_id AND cb.bucket = ca.bucket
      GROUP BY 1),
    exact AS (
      SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS x
      FROM (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1) a
      JOIN (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1) b
        ON b.k = a.k)
    SELECT (SELECT x FROM exact) AS exact_join_size,
           (SELECT CAST(min(est) AS BIGINT) FROM ip) AS cms_estimate,
           round((SELECT min(est) FROM ip) * 1.0
                 / greatest((SELECT x FROM exact), 1), 4)
             AS overestimate_ratio
    """


@query("sketch_cms_join_size", oracle=_cms_join_oracle())
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by Count-Min inner product — the classic
    sketch-algebra identity a cost-based optimizer uses to size
    |orders ⋈ events| WITHOUT touching either table's rows at plan
    time: the inner product of the two sides' CM rows overestimates
    Σ_k cntA(k)·cntB(k); min over the d rows tightens it. The exact
    join size is computed alongside (the accuracy loop).

    Deterministic: same universal integer hashes as the Count-Min
    point-estimate op, so sketch cells, inner products, AND the exact
    side are integer-exact in both engines.

    Scale: each side compresses to a d x w counter matrix built by one
    map-side-combinable pass — the matrices are the only things joined;
    at 100 TB the optimizer keeps them as table statistics and never
    rescans. Width is sized to key cardinality (the inner-product bound
    err <= (e/w)*Na*Nb made w=64 overestimate ~25x here; w=4096 lands
    within a few percent — measured, and the sizing rule documented)."""
    p = (1 << 61) - 1
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")

    def counters(df: DataFrame, key: str) -> DataFrame:
        out = None
        for j, (a, b) in enumerate(_cm_params()):
            bucket = ((F.lit(a) * F.col(key) + F.lit(b)) % F.lit(p)) % F.lit(
                CM_JOIN_W
            )
            c = (
                df.groupBy(bucket.alias("bucket"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("row_id", F.lit(j))
            )
            out = c if out is None else out.unionByName(c)
        return out

    ca = counters(orders, "o_custkey")
    cb = counters(events, "user_id").select(
        "row_id", "bucket", F.col("cnt").alias("cnt_b")
    )
    ip = (
        ca.join(cb, ["row_id", "bucket"])
        .groupBy("row_id")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).cast("bigint").alias("est"))
    )
    est = ip.agg(F.min("est").cast("bigint").alias("cms_estimate"))
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    b = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    exact = a.join(b, "k").agg(
        F.coalesce(F.sum(F.col("c") * F.col("cb")), F.lit(0))
        .cast("bigint")
        .alias("exact_join_size")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "cms_estimate",
        F.round(
            F.col("cms_estimate")
            * 1.0
            / F.greatest(F.col("exact_join_size"), F.lit(1)),
            4,
        ).alias("overestimate_ratio"),
    )
