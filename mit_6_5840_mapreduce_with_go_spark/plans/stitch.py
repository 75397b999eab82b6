"""Stitched two-pass global ordering: the scale-safe replacement for an
UNPARTITIONED window over a fact table.

An empty ``Window.orderBy(...)`` compiles to ``Exchange SinglePartition``
+ one task sorting the WHOLE table — the classic 100 TB plan killer (the
plan audit's GWIN check in tools/audit_plans.py flags it).  The
equivalent distributed shape is the two-pass stitch used by every
external sorter:

1. Assign each row a RANGE-BUCKET id that is monotone in the ordering
   key — bucket i holds keys strictly below bucket i+1.
2. Per-bucket pass: a window PARTITIONED by the bucket id computes local
   row numbers / running aggregates — P parallel sorts of ~N/P rows,
   the same O(N log N) total work as the single sort.
3. Stitch pass: a P-row per-bucket stats table (counts, frontier
   values) — built with ``groupBy(PID)``, never by collecting data —
   gets prefix offsets / neighbor frontiers via a window over those P
   rows (bounded by the bucket count, not the data), then
   broadcast-joins back.

Why not ``repartitionByRange`` + ``spark_partition_id()``: Spark's
RangePartitioner re-SAMPLES its boundaries with a fresh seed on every
evaluation of the subtree, and the stitch necessarily consumes the
bucketed data twice (data pass + stats pass) — measured at sf0.01, two
evaluations disagreed on boundaries by hundreds of rows, silently
corrupting every downstream offset.  ``order_buckets`` instead derives
the cut points ONCE, at plan-build time, from a seed-pinned sample and
bakes them into the plan as literals, so the bucket id is a pure
deterministic function of the row and every consumer agrees by
construction.  A deployed engine would cache table-level range
statistics instead of re-sampling per query.

Build-time cost (documented, deliberate): ``order_buckets`` runs ONE
eager action when the plan is constructed — a fixed-size uniform
sample of ~100·P single-key rows (the same sketch size Spark's own
RangePartitioner collects), taken as the ``target`` smallest of n iid
``rand(seed)`` draws, which compiles to ``TakeOrderedAndProject``:
each task keeps a bounded top-K heap, the driver merges K rows, and no
pre-``count()`` scan is needed to size a fraction.  A deployed engine
amortizes this into cached table range statistics; in the one-shot
query form it is 1 extra bounded pass.

Bucket-stats aggregates are keyed by the ``_stitch_pid`` column and
bounded-domain ranking tables by ``_stitch_dom_*`` columns — naming
conventions the GWIN check in tools/audit_plans.py recognizes as
bounded-by-construction (P buckets / an explicitly asserted finite
domain) and waives.

No reference counterpart (the reference's sort is the in-memory
per-reduce-task ``sort.Sort`` in /root/reference/src/mr/worker.go:160 —
single-process by design); this is the Spark-native scale pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

PID = "_stitch_pid"

# Default stitch width.  At 100 TB this would be ~total_bytes /
# maxPartitionBytes (thousands); correctness is independent of P and of
# where the sampled cut points land, so the local[32] default just needs
# to exceed the test parallelism to prove the shape.
DEFAULT_PARTITIONS = 32

_SAMPLE_PER_BUCKET = 100  # driver-side sample rows per bucket (matches
# Spark's own rangeExchange.sampleSizePerPartition default)


def _lit_key(value: object) -> Column:
    """Literal for a sampled cut point; struct keys rebuild field names so
    the comparison resolves against the key expression's type."""
    fields = getattr(value, "__fields__", None)
    if fields is not None:  # a Row sampled from a struct key
        return F.struct(*[_lit_key(value[f]).alias(f) for f in fields])
    return F.lit(value)


def order_buckets(
    df: DataFrame,
    key: Column,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
    seed: int = 42,
) -> DataFrame:
    """Add ``PID``: a range-bucket id monotone in ascending ``key``
    (compose descending orders by negating/inverting inside ``key``).

    The cut points come from one seed-pinned sample pass collected at
    plan-build time (~100·P single-key rows — bounded regardless of
    table size) and enter the plan as literals, so PID is deterministic
    across every evaluation of the returned DataFrame's subtree.  The
    sample is FIXED-SIZE without a pre-count: the ``target`` rows with
    the smallest ``rand(seed)`` values form an exact uniform
    ``target``-subset (order statistics of iid uniforms), and
    ``orderBy(rand).limit(target)`` executes as per-task top-K heaps +
    a bounded driver merge (``TakeOrderedAndProject``), never a global
    sort — so plan construction costs ONE scan, not count + sample.
    Rows equal to a cut sort into the lower bucket; duplicate cuts just
    leave a bucket empty (harmless — the stitch window runs over the
    buckets actually present).

    The bucket id is ``size(filter(cuts, c -> key > c))`` over the
    literal cut array — one flat O(P) expression per row (a chained
    ``when`` would nest P-deep and blow codegen at the thousands of
    buckets a 100 TB run wants; a true O(log P) binary search is not
    expressible with built-ins, so the documented ceiling is P ≲ a few
    thousand, comfortably above any shuffle-partition count).

    NULL top-level keys are dropped from the SAMPLE (Python can't order
    None) and bucket into PID 0 by construction (`NULL > lit` is never
    true); struct keys must have non-null FIELDS — Python tuple
    comparison on a sampled Row raises on None.
    """
    target = _SAMPLE_PER_BUCKET * num_partitions
    sampled = sorted(
        r["_k"]
        for r in df.select(key.alias("_k"))
        .na.drop()
        .withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(target)
        .select("_k")
        .collect()
    )
    cuts: list[object] = []
    if sampled:
        step = len(sampled) / num_partitions
        seen: set[int] = set()
        for i in range(1, num_partitions):
            j = min(len(sampled) - 1, int(step * i))
            if j not in seen:
                seen.add(j)
                cuts.append(sampled[j])
    if not cuts:
        return df.withColumn(PID, F.lit(0))
    arr = F.array(*[_lit_key(c) for c in cuts])
    pid = F.size(F.filter(arr, lambda c: key > c))
    return df.withColumn(PID, pid)


def stitched_order(
    df: DataFrame,
    key: Column,
    *,
    partition_by: list[str] | tuple[str, ...] = (),
    rank_col: str | None = None,
    sum_cols: dict[str, str] | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
    seed: int = 42,
) -> DataFrame:
    """``row_number`` (``rank_col``) and/or INCLUSIVE running sums
    (``sum_cols``: source column -> output column) over ascending
    ``key`` order — per ``partition_by`` group if given, else globally —
    computed as the three-stage stitch instead of a single-partition (or
    single-group-per-task) window.

    ``partition_by`` is for LOW-cardinality group keys whose groups are
    each too big for one task (language, source, event type): a plain
    ``Window.partitionBy(lang)`` puts ALL of a language on one task —
    ~80% of a real web corpus for 'en'.  Buckets come from the composite
    (group, key) order, so each group spans contiguous buckets and the
    per-group offset is a window over the (P x |groups|)-row stats
    table, partitioned by the group key.  For HIGH-cardinality partition
    keys use a plain window — groups are small and the stitch's stats
    table would not be.

    ``key`` must be a TOTAL order within each group (no ties) for the
    rank to be deterministic — compose tie-breakers into a struct.  Each
    output running sum is ``sum(src) over ([partition by g] order by key
    rows unbounded preceding .. current)``; the rank is ``row_number()``
    widened to BIGINT (the per-bucket offset is a count).

    Plan: one P-way shuffle of the data (hash on PID [+ group]), one
    (P x |groups|)-row stats aggregate + offset window
    (``_stitch_pid``-keyed — GWIN-waived by convention), one broadcast
    join back.  Never a single-partition sort of the data.
    """
    sums = sum_cols or {}
    pcols = list(partition_by)
    bucket_key = (
        F.struct(
            *[F.col(c).alias(f"_g{i}") for i, c in enumerate(pcols)],
            key.alias("_k"),
        )
        if pcols
        else key
    )
    b = order_buckets(df, bucket_key, num_partitions=num_partitions, seed=seed)
    wloc = W.partitionBy(PID, *pcols).orderBy(key)
    wrun = wloc.rowsBetween(W.unboundedPreceding, 0)
    out = b.withColumn("_loc_rn", F.row_number().over(wloc))
    for src, dst in sums.items():
        out = out.withColumn(f"_loc_{dst}", F.sum(src).over(wrun))
    stats = b.groupBy(PID, *pcols).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(src).alias(f"_s_{dst}") for src, dst in sums.items()],
    )
    woff = (
        W.partitionBy(*pcols).orderBy(PID).rowsBetween(W.unboundedPreceding, -1)
        if pcols
        else W.orderBy(PID).rowsBetween(W.unboundedPreceding, -1)
    )
    offs = stats.select(
        PID,
        *pcols,
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off_n"),
        *[
            F.coalesce(F.sum(f"_s_{dst}").over(woff), F.lit(0)).alias(f"_off_{dst}")
            for dst in sums.values()
        ],
    )
    out = out.join(F.broadcast(offs), [PID, *pcols])
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("_off_n") + F.col("_loc_rn"))
    for dst in sums.values():
        out = out.withColumn(dst, F.col(f"_off_{dst}") + F.col(f"_loc_{dst}"))
    drop = [PID, "_loc_rn", "_off_n"]
    drop += [f"_loc_{d}" for d in sums.values()]
    drop += [f"_off_{d}" for d in sums.values()]
    return out.drop(*drop)
