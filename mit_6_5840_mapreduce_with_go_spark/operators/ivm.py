"""Incremental view maintenance (IVM) for a join-aggregate view — the
O(delta) maintenance identity that keeps a 100 TB materialized view fresh
without recomputation, plus the apriori candidate-pruned frequent-triple
extension of the association-rules op.

No reference counterpart (SURVEY.md §2.D) — north-star additions:
- IVM for SUM/COUNT join views: d(V) = dA ⋈ B aggregated, V' = V + dV
  (the classic delta rule; joins with a static dim need only the delta
  side).  Complements the partition-scoped MERGE (sources/merge.py) and
  hour-scoped rollup (operators/rollup.py) with the JOIN-view case.
- Apriori (Agrawal & Srikant 1994, public): k-itemset candidates only
  from frequent (k-1)-itemsets — the pruning that keeps itemset mining
  feasible at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_IVM_DELTA_MOD = 10  # orders with o_orderkey % 10 == 0 arrive as the delta

_FT_MIN_SUPPORT = 0.003  # triple support floor (fraction of orders)


@query(
    "maintenance_ivm_join_view",
    oracle=f"""
    WITH j AS (
      SELECT o.o_orderkey, c.c_nationkey AS nationkey,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    before AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM j WHERE o_orderkey % {_IVM_DELTA_MOD} <> 0 GROUP BY 1),
    delta AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM j WHERE o_orderkey % {_IVM_DELTA_MOD} = 0 GROUP BY 1),
    merged AS (
      SELECT coalesce(b.nationkey, d.nationkey) AS nationkey,
             coalesce(b.n, 0) AS before_n,
             coalesce(d.n, 0) AS delta_n,
             coalesce(b.n, 0) + coalesce(d.n, 0) AS after_n,
             coalesce(b.total_cents, 0) + coalesce(d.total_cents, 0)
               AS after_cents
      FROM before b FULL OUTER JOIN delta d ON b.nationkey = d.nationkey),
    full_v AS (
      SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM j GROUP BY 1)
    SELECT m.nationkey,
           CAST(m.before_n AS BIGINT) AS before_n,
           CAST(m.delta_n AS BIGINT) AS delta_n,
           CAST(m.after_n AS BIGINT) AS after_n,
           CAST(m.after_cents AS BIGINT) AS after_cents,
           m.after_n = f.n AND m.after_cents = f.total_cents
             AS matches_full_recompute
    FROM merged m JOIN full_v f ON f.nationkey = m.nationkey
    """,
)
def maintenance_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the join-aggregate view "order revenue
    per customer nation": the delta batch (o_orderkey % {m} == 0) joins
    the static customer dim ALONE, aggregates to per-nation (n, cents),
    and merges additively into the stored view — the SUM/COUNT delta
    rule dV = dA ⋈ B.  Every row carries `matches_full_recompute`
    verifying the identity against the from-scratch view; amounts are
    integer cents so += is exact.

    Scale: the new work is O(delta) — the delta scan prunes on the key
    predicate, the dim join broadcasts, and the merge touches |nations|
    rows; the 100 TB fact table is NOT rescanned (here the before-view
    is recomputed only because the harness stores no state — in
    production it is the stored view, like the rollup op's dirty-hour
    refresh).  MIN/MAX would need the rollup's re-aggregation path;
    SUM/COUNT/AVG maintain additively as shown.
    """.format(m=_IVM_DELTA_MOD)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nationkey")
    )

    def view(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(cust), "o_custkey")
            .groupBy("nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("total_cents"),
            )
        )

    before = view(orders.filter(F.col("o_orderkey") % _IVM_DELTA_MOD != 0))
    delta = view(orders.filter(F.col("o_orderkey") % _IVM_DELTA_MOD == 0))
    b = before.select(
        "nationkey", F.col("n").alias("bn"), F.col("total_cents").alias("bc")
    )
    d = delta.select(
        "nationkey", F.col("n").alias("dn"), F.col("total_cents").alias("dc")
    )
    merged = (
        b.join(d, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("bn", F.lit(0)).alias("before_n"),
            F.coalesce("dn", F.lit(0)).alias("delta_n"),
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("after_n"),
            (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
                "after_cents"
            ),
        )
    )
    full_v = view(orders).select(
        "nationkey", F.col("n").alias("fn"), F.col("total_cents").alias("fc")
    )
    return merged.join(full_v, "nationkey").select(
        "nationkey",
        "before_n",
        "delta_n",
        "after_n",
        "after_cents",
        (
            (F.col("after_n") == F.col("fn"))
            & (F.col("after_cents") == F.col("fc"))
        ).alias("matches_full_recompute"),
    )


@query(
    "basket_frequent_triples",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders
          FROM baskets),
    pair AS (
      SELECT a.brand AS b1, b.brand AS b2,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2),
    freq_pair AS (
      SELECT b1, b2 FROM pair, n
      WHERE n_pair * 1.0 / n.n_orders >= {_FT_MIN_SUPPORT}),
    cand AS (
      -- apriori join step: (b1,b2) x (b1,b3) with b2<b3, kept only if
      -- the third edge (b2,b3) is also frequent
      SELECT p.b1, p.b2, q.b2 AS b3
      FROM freq_pair p JOIN freq_pair q
        ON p.b1 = q.b1 AND p.b2 < q.b2
      WHERE EXISTS (SELECT 1 FROM freq_pair r
                    WHERE r.b1 = p.b2 AND r.b2 = q.b2)),
    triple AS (
      SELECT c.b1, c.b2, c.b3, CAST(count(*) AS BIGINT) AS n_triple
      FROM cand c
      JOIN baskets x ON x.brand = c.b1
      JOIN baskets y ON y.okey = x.okey AND y.brand = c.b2
      JOIN baskets z ON z.okey = x.okey AND z.brand = c.b3
      GROUP BY 1, 2, 3)
    SELECT b1, b2, b3, n_triple,
           round(n_triple * 1.0 / n.n_orders, 6) AS support
    FROM triple, n
    WHERE n_triple * 1.0 / n.n_orders >= {_FT_MIN_SUPPORT}
    """,
)
def basket_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over per-order brand baskets via the apriori
    candidate join: triple candidates come ONLY from frequent pairs
    (all three edges must be frequent — the downward-closure prune),
    then one counting pass scores the survivors; support >=
    {ms}.

    Scale: this is why apriori works on 100 TB baskets — the counting
    join runs over |candidates| (pruned to a handful) x basket rows,
    never over all |brands|^3 combinations; the candidate generation is
    a self-join of the (tiny) frequent-pair list.  Exact-integer
    support ratios.
    """.format(ms=_FT_MIN_SUPPORT)
    from .market import brand_baskets

    # Eager localCheckpoint (r14, guide §3.3/§5): six consumers re-derive
    # the baskets subtree (n, both pair sides, x/y/z of the counting
    # join) — 63 Exchange nodes in the pre-r14 executed plan vs 13
    # after, measured 1.3x at sf0.1 (interleaved min-of-4).  Unlike the
    # persist() this comment used to warn against, checkpoint blocks
    # are released by the ContextCleaner when the DataFrame is GC'd —
    # nothing pins session-wide cache across full-registry sweeps.
    # Checkpointing freq_pair as well was measured SLOWER (its barrier
    # serializes stages AQE otherwise overlaps); baskets only.
    baskets = brand_baskets(spark, sf_dir).localCheckpoint()
    n = baskets.agg(F.countDistinct("okey").alias("n_orders"))
    a = baskets.select(F.col("okey"), F.col("brand").alias("b1"))
    b = baskets.select(F.col("okey"), F.col("brand").alias("b2"))
    pair = (
        a.join(b, "okey")
        .filter(F.col("b1") < F.col("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    freq_pair = (
        pair.crossJoin(F.broadcast(n))
        .filter(F.col("n_pair") * 1.0 / F.col("n_orders") >= _FT_MIN_SUPPORT)
        .select("b1", "b2")
    )
    p = freq_pair.select("b1", "b2")
    q = freq_pair.select(F.col("b1").alias("b1"), F.col("b2").alias("b3"))
    third = freq_pair.select(
        F.col("b1").alias("b2"), F.col("b2").alias("b3")
    )
    cand = (
        p.join(q, "b1")
        .filter(F.col("b2") < F.col("b3"))
        .join(third, ["b2", "b3"], "left_semi")
    )
    x = baskets.select("okey", F.col("brand").alias("b1"))
    y = baskets.select("okey", F.col("brand").alias("b2"))
    z = baskets.select("okey", F.col("brand").alias("b3"))
    # counting pass: enumerate WITHIN each order (brand baskets are
    # small, so the okey join fans out by basket size, not corpus
    # size), pruning each edge against the broadcast frequent-pair /
    # candidate sets as soon as it exists.  Joining candidates to the
    # basket table by brand first instead would fan every basket row
    # out by |cand|/|brands| BEFORE okey constrains anything —
    # measured 4x slower at sf1.
    xy = (
        x.join(y, "okey")
        .filter(F.col("b1") < F.col("b2"))
        .join(F.broadcast(freq_pair), ["b1", "b2"], "left_semi")
    )
    triple = (
        xy.join(z, "okey")
        .filter(F.col("b2") < F.col("b3"))
        .join(F.broadcast(cand), ["b1", "b2", "b3"], "left_semi")
        .groupBy("b1", "b2", "b3")
        .agg(F.count(F.lit(1)).alias("n_triple"))
    )
    return (
        triple.crossJoin(F.broadcast(n))
        .filter(F.col("n_triple") * 1.0 / F.col("n_orders") >= _FT_MIN_SUPPORT)
        .select(
            "b1",
            "b2",
            "b3",
            "n_triple",
            F.round(F.col("n_triple") * 1.0 / F.col("n_orders"), 6).alias("support"),
        )
    )


# --------------------------------------------------------------------------
# Aggregate view under retraction: the SUM/COUNT delta rule with DELETES
# (dV = +agg(inserts) - agg(deletes)), including the case IVM papers
# call out as the subtle one — a group whose count reaches zero must
# VANISH from the view, which plain additive merge gets wrong.  The
# insert-only join-view twin above handles dV = dA ⋈ B; this one closes
# the retraction half of the classic incremental-maintenance algebra.
# --------------------------------------------------------------------------
_IVM_INS_MOD = 10  # o_orderkey % 10 == 7 arrive as the insert batch
_IVM_DEL_MOD = 10  # o_orderkey % 10 == 3 are retracted
# this (status, priority) group is FULLY retracted (every base member
# deleted, inserts excluded) — it must disappear from the view
_IVM_GONE_STATUS = "F"
_IVM_GONE_PRIO = "1-URGENT"


@query(
    "maintenance_ivm_agg_retraction",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS prio,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    ins AS (
      SELECT * FROM o
      WHERE o_orderkey % {_IVM_INS_MOD} = 7
        AND NOT (status = '{_IVM_GONE_STATUS}' AND prio = '{_IVM_GONE_PRIO}')),
    base AS (
      SELECT * FROM o WHERE NOT (o_orderkey % {_IVM_INS_MOD} = 7
        AND NOT (status = '{_IVM_GONE_STATUS}' AND prio = '{_IVM_GONE_PRIO}'))),
    del_ AS (
      SELECT * FROM base
      WHERE (status = '{_IVM_GONE_STATUS}' AND prio = '{_IVM_GONE_PRIO}')
         OR o_orderkey % {_IVM_DEL_MOD} = 3),
    v_base AS (
      SELECT status, prio, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM base GROUP BY 1, 2),
    delta AS (
      SELECT status, prio, CAST(sum(sgn) AS BIGINT) AS dn,
             CAST(sum(sgn * cents) AS BIGINT) AS dcents
      FROM (SELECT status, prio, 1 AS sgn, cents FROM ins
            UNION ALL
            SELECT status, prio, -1, cents FROM del_)
      GROUP BY 1, 2),
    incr AS (
      SELECT coalesce(v.status, d.status) AS status,
             coalesce(v.prio, d.prio) AS prio,
             coalesce(v.n, 0) + coalesce(d.dn, 0) AS n,
             coalesce(v.total_cents, 0) + coalesce(d.dcents, 0) AS total_cents
      FROM v_base v FULL JOIN delta d
        ON d.status = v.status AND d.prio = v.prio),
    live AS (SELECT * FROM incr WHERE n > 0),
    recompute AS (
      SELECT status, prio, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM (SELECT * FROM base
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del_)
            UNION ALL SELECT * FROM ins)
      GROUP BY 1, 2)
    SELECT coalesce(l.status, r.status) AS status,
           coalesce(l.prio, r.prio) AS prio,
           coalesce(l.n, -1) AS n,
           coalesce(l.total_cents, -1) AS total_cents,
           (l.n IS NOT NULL AND r.n IS NOT NULL
            AND l.n = r.n AND l.total_cents = r.total_cents)
             AS matches_full_recompute
    FROM live l FULL JOIN recompute r
      ON r.status = l.status AND r.prio = l.prio
    """,
)
def maintenance_ivm_agg_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable aggregate view "orders per (status, priority)" under
    an insert batch AND a delete batch: the stored view merges signed
    delta aggregates (+1 inserts, -1 deletes, exact integer cents), and
    groups whose count reaches zero are dropped — one (status, priority)
    group is fully retracted by construction and must VANISH.  Every
    output row carries `matches_full_recompute` (full outer join, so a
    group present on only one side surfaces as false).

    Scale: deltas aggregate map-side before touching the view; the merge
    is a view-sized outer join on the group key — work scales with the
    delta and the view, never the base table.  AVG/stddev derive from
    (n, sum, sum-of-squares) the same way; MIN/MAX are NOT retractable
    this way and need the per-group heap or recompute (documented
    limitation of the algebra)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    gone = (F.col("status") == _IVM_GONE_STATUS) & (F.col("prio") == _IVM_GONE_PRIO)
    ins_pred = (F.col("o_orderkey") % _IVM_INS_MOD == 7) & ~gone
    ins = o.filter(ins_pred)
    base = o.filter(~ins_pred)
    del_ = base.filter(gone | (F.col("o_orderkey") % _IVM_DEL_MOD == 3))
    v_base = base.groupBy("status", "prio").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents")
    )
    delta = (
        ins.select("status", "prio", F.lit(1).alias("sgn"), "cents")
        .unionByName(del_.select("status", "prio", F.lit(-1).alias("sgn"), "cents"))
        .groupBy("status", "prio")
        .agg(
            F.sum("sgn").alias("dn"),
            F.sum(F.col("sgn") * F.col("cents")).alias("dcents"),
        )
    )
    live = (
        v_base.join(delta, ["status", "prio"], "full")
        .select(
            "status",
            "prio",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (
                F.coalesce("total_cents", F.lit(0)) + F.coalesce("dcents", F.lit(0))
            ).alias("total_cents"),
        )
        .filter(F.col("n") > 0)
    )
    recompute = (
        base.join(del_.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(ins)
        .groupBy("status", "prio")
        .agg(F.count(F.lit(1)).alias("rn"), F.sum("cents").alias("rcents"))
    )
    return (
        live.join(recompute, ["status", "prio"], "full")
        .select(
            "status",
            "prio",
            F.coalesce("n", F.lit(-1)).alias("n"),
            F.coalesce("total_cents", F.lit(-1)).alias("total_cents"),
            (
                F.col("n").isNotNull()
                & F.col("rn").isNotNull()
                & (F.col("n") == F.col("rn"))
                & (F.col("total_cents") == F.col("rcents"))
            ).alias("matches_full_recompute"),
        )
    )
