"""Market-basket association rules + temporally-split Markov next-event
evaluation — classic large-scale behavioral analytics.

No reference counterpart (SURVEY.md §2.D) — north-star additions:
- Association rules (Agrawal & Srikant's support/confidence/lift
  framework, public) over per-order brand baskets.
- The Markov evaluator closes the loop on `events_markov_transitions`:
  fit on the first half of time, score top-1 next-event accuracy on the
  second half — the train/test TEMPORAL split every behavioral model
  ships with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_AR_MIN_SUPPORT = 0.01  # pair support floor (fraction of orders)

_MK_SPLIT = "2024-01-16 00:00:00"  # temporal train/test boundary



def brand_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order distinct brand baskets — the shared input of the
    association rules here and the apriori triples in ivm.py (one
    definition so the downward-closure invariant holds across ops)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )


@query(
    "basket_association_rules",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders
          FROM baskets),
    item AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_item
             FROM baskets GROUP BY brand),
    pair AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2)
    SELECT brand_a, brand_b, n_pair,
           round(n_pair * 1.0 / n.n_orders, 6) AS support,
           round(n_pair * 1.0 / ia.n_item, 6) AS confidence,
           round(n_pair * 1.0 * n.n_orders / (ia.n_item * ib.n_item), 6)
             AS lift
    FROM pair
    JOIN item ia ON ia.brand = brand_a
    JOIN item ib ON ib.brand = brand_b
    CROSS JOIN n
    WHERE n_pair * 1.0 / n.n_orders >= {_AR_MIN_SUPPORT}
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-order brand baskets: for every brand
    pair with support >= {ms}, emit support, confidence(A->B) and lift.
    All three are exact-integer ratios, so both engines emit identical
    doubles.

    Scale shape: baskets come from one lineitem scan joined to the
    BROADCAST part dim (brand is 25 values — the basket vocabulary is
    bounded); pair generation is the order-keyed self-join (the
    inverted-index trick again — pairs only materialize within an
    order, never brand x brand x orders), and the (brand_a, brand_b)
    count collapses map-side to at most |brands|^2/2 rows.  The basket
    self-join is keyed on the order — with both sides bucketed by
    orderkey this is exchange-free; a degenerate giant basket would be
    capped the way LSH bucket sizes are (dedup.py MAX_BUCKET).
    """.format(ms=_AR_MIN_SUPPORT)
    baskets = brand_baskets(spark, sf_dir)
    n = baskets.agg(F.countDistinct("okey").alias("n_orders"))
    item = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("okey"), F.col("brand").alias("brand_b"))
    pair = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ia = item.select(F.col("brand").alias("brand_a"), F.col("n_item").alias("na"))
    ib = item.select(F.col("brand").alias("brand_b"), F.col("n_item").alias("nb"))
    return (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_pair") * 1.0 / F.col("n_orders") >= _AR_MIN_SUPPORT)
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            F.round(F.col("n_pair") * 1.0 / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") * 1.0 / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("n_pair") * 1.0 * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "eval_markov_next_event",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER w AS next_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    pairs AS (SELECT event_type AS prev_type, next_type, next_ts
              FROM seq WHERE next_type IS NOT NULL),
    train AS (
      SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS c
      FROM pairs WHERE next_ts <= TIMESTAMP '{_MK_SPLIT}'
      GROUP BY 1, 2),
    model AS (
      SELECT prev_type, next_type AS pred FROM (
        SELECT prev_type, next_type,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY c DESC, next_type) AS rn
        FROM train) WHERE rn = 1),
    test AS (SELECT prev_type, next_type FROM pairs
             WHERE next_ts > TIMESTAMP '{_MK_SPLIT}')
    SELECT t.prev_type, m.pred,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.next_type = m.pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN t.next_type = m.pred THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS top1_acc
    FROM test t JOIN model m ON m.prev_type = t.prev_type
    GROUP BY 1, 2
    """,
)
def eval_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 next-event-type accuracy of a first-order Markov model
    under a TEMPORAL split: transitions whose successor lands on or
    before {t} train the model (per-state argmax successor, ties
    alphabetical); later transitions are the held-out test set.  The
    per-state report (prediction, n_test, n_correct, exact accuracy
    ratio) is the eval table a behavioral model ships with.

    Scale: one keyed window (user_id) builds successor pairs — the same
    single shuffle sessionization uses; the model is a |states|^2
    aggregate argmax'd via hash-agg min(struct(-c, type)) (no window
    over data); scoring is a broadcast join of the |states|-row model
    onto the test pairs.  Nothing holds state proportional to events.
    """.format(t=_MK_SPLIT)
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    pairs = seq.filter(F.col("next_type").isNotNull()).select(
        F.col("event_type").alias("prev_type"), "next_type", "next_ts"
    )
    train = (
        pairs.filter(F.col("next_ts") <= F.lit(_MK_SPLIT).cast("timestamp"))
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model = (
        train.groupBy("prev_type")
        .agg(
            F.min(
                F.struct(
                    (-F.col("c")).alias("nc"), F.col("next_type").alias("pred")
                )
            ).alias("b")
        )
        .select("prev_type", F.col("b.pred").alias("pred"))
    )
    test = pairs.filter(F.col("next_ts") > F.lit(_MK_SPLIT).cast("timestamp"))
    hit = F.sum((F.col("next_type") == F.col("pred")).cast("long"))
    return (
        test.join(F.broadcast(model), "prev_type")
        .groupBy("prev_type", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            hit.alias("n_correct"),
            F.round(hit * 1.0 / F.count(F.lit(1)), 6).alias("top1_acc"),
        )
    )
