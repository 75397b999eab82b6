"""Stitched two-pass global ordering: the scale-safe replacement for an
UNPARTITIONED window over a fact table.

An empty ``Window.orderBy(...)`` compiles to ``Exchange SinglePartition``
+ one task sorting the WHOLE table — the classic 100 TB plan killer (the
plan audit's GWIN check flags it).  The equivalent distributed shape is
the two-pass stitch used by every external sorter:

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
the cut points ONCE, at plan-build time, from a seed-pinned sample
(bounded to ~100·P single-key rows on the driver — the same sketch size
RangePartitioner itself collects) and bakes them into the plan as
literals, so the bucket id is a pure deterministic function of the row
and every consumer agrees by construction.  A deployed engine would
cache table-level range statistics instead of re-sampling per query.

Bucket-stats aggregates are keyed by the ``_stitch_pid`` column and
bounded-domain ranking tables by ``_stitch_dom_*`` columns — naming
conventions tools/audit_plans.py recognizes as bounded-by-construction
(P buckets / an explicitly asserted finite domain).

No reference counterpart (the reference's sort is the in-memory
per-reduce-task ``sort.Sort`` in /root/reference/src/mr/worker.go:160 —
single-process by design); this is the Spark-native scale pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    across every evaluation of the returned DataFrame's subtree.  Rows
    equal to a cut sort into the lower bucket; duplicate cuts just leave
    a bucket empty (harmless — the stitch window runs over the buckets
    actually present).
    """
    target = _SAMPLE_PER_BUCKET * num_partitions
    n = df.count()
    frac = 1.0 if n <= target else min(1.0, (1.05 * target) / n)
    sampled = sorted(
        r["_k"]
        for r in df.select(key.alias("_k")).sample(fraction=frac, seed=seed).collect()
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
    pid = F.lit(0)
    for c in cuts:
        pid = pid + F.when(key > _lit_key(c), 1).otherwise(0)
    return df.withColumn(PID, pid)
