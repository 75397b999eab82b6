"""PPJoin profiling + A/B harness (VERDICT r11 #7).

Measures (a) the candidate-count histogram per prefix token — where
the pair-generation work actually lives — and (b) a timed A/B of three
pipelines (parity-gated by exceptAll both ways before timing):

- ``ppjoin_pairs_legacy`` — the pre-round-12 exploded-row shape: df
  agg + join, row_number window ranking, join-based verification;
- ``ppjoin_pairs_arrayverify`` — array ordering AND array
  verification: join candidates to per-doc shingle arrays, count
  size(array_intersect);
- ``dedup2.ppjoin_pairs`` — the ADOPTED round-12 shape: array
  ordering/prefix (one s-keyed window for df, per-doc sorted arrays,
  posexplode(slice)) with JOIN-based verification.

Why the adopted shape: measured histograms show pair generation is
prefix-bounded (sf0.1: max fan-out 8, sum C(pf,2) = 122,289; sf1
adversarial corpus: max fan-out 86, sum C(pf,2) = 18,738,000 — 150x
the candidates for 10x the docs).  At sf0.1 array-verify wins
(6.5 vs 7.1 vs 8.9 s legacy) because candidates are few; at sf1 it
LOSES (57.8-113.6 s vs 55.4 s adopted vs 61.0 s legacy) and its decade
exponent crossed 1.0 (1.11): every candidate row carries TWO full
shingle arrays across the verify shuffles, so shuffle bytes scale with
candidates x array size, while join-verification's scale with actual
intersections.  The adopted hybrid is best at sf1 and within ~10% of
best at sf0.1 — the 100 TB-relevant choice.

Usage: python tools/profile_ppjoin.py [sf_dir] [--hist-only|--timings-only] [--cc]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.dedup import _shingles
from mit_6_5840_mapreduce_with_go_spark.operators.dedup2 import (
    _T_DEN,
    _T_NUM,
    _ppjoin_verify,
    cc_two_phase,
    ppjoin_pairs,
)
from mit_6_5840_mapreduce_with_go_spark.session import get_spark
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def exploded_shingles(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return _shingles(docs).select(
        "doc_id", "n_shingles", F.explode("shingles").alias("s")
    )


def ppjoin_pairs_legacy(sh):
    """The pre-round-12 exploded-row pipeline, verbatim: df agg + join,
    row_number window ranking, join-based verification."""
    df_tbl = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(df_tbl, "s").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("s").asc())
        ),
    )
    prefix_len = (
        F.col("n_shingles")
        - ((F.col("n_shingles") * _T_NUM + _T_DEN - 1) / _T_DEN).cast("long")
        + 1
    )
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        "doc_id", "s", "rn", "n_shingles"
    )
    x = prefix.select(
        F.col("doc_id").alias("a"),
        F.col("s"),
        F.col("rn").alias("px"),
        F.col("n_shingles").alias("nxa"),
    )
    y = prefix.select(
        F.col("doc_id").alias("b"),
        F.col("s"),
        F.col("rn").alias("py"),
        F.col("n_shingles").alias("nxb"),
    )
    cand = (
        x.join(y, "s")
        .filter(F.col("a") < F.col("b"))
        .filter(
            (_T_NUM * F.col("nxa") <= _T_DEN * F.col("nxb"))
            & (_T_NUM * F.col("nxb") <= _T_DEN * F.col("nxa"))
        )
        .withColumn(
            "ub",
            F.lit(1)
            + F.least(F.col("nxa") - F.col("px"), F.col("nxb") - F.col("py")),
        )
        .groupBy("a", "b", "nxa", "nxb")
        .agg(F.max("ub").alias("ub"))
        .filter(
            (_T_NUM + _T_DEN) * F.col("ub")
            >= _T_NUM * (F.col("nxa") + F.col("nxb"))
        )
        # r13: _ppjoin_verify now takes sizes ON the candidate rows
        .select("a", "b", F.col("nxa").alias("na"), F.col("nxb").alias("nb"))
    )
    return _ppjoin_verify(cand, sh)


def ppjoin_pairs_arrayverify(sh):
    """Array ordering + ARRAY verification (the variant that lost at
    sf1): candidates join to the per-doc arrays and verification is
    size(array_intersect(arr_a, arr_b)) — every candidate row carries
    two full shingle arrays across the verify shuffles."""
    with_df = sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("s")))
    ordered = (
        with_df.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "s"))).alias("ord"),
            F.first("n_shingles").alias("n"),
        )
        .select("doc_id", "n", F.expr("transform(ord, x -> x.s)").alias("arr"))
        .withColumn(
            "plen",
            (
                F.col("n")
                - ((F.col("n") * _T_NUM + _T_DEN - 1) / _T_DEN).cast("long")
                + 1
            ).cast("int"),
        )
    )
    prefix = ordered.select(
        "doc_id",
        "n",
        F.posexplode(F.expr("slice(arr, 1, plen)")).alias("p0", "s"),
    ).select("doc_id", "n", (F.col("p0") + 1).alias("px"), "s")
    x = prefix.select(
        F.col("doc_id").alias("a"), "s", "px", F.col("n").alias("nxa")
    )
    y = prefix.select(
        F.col("doc_id").alias("b"),
        "s",
        F.col("px").alias("py"),
        F.col("n").alias("nxb"),
    )
    cand = (
        x.join(y, "s")
        .filter(F.col("a") < F.col("b"))
        .filter(
            (_T_NUM * F.col("nxa") <= _T_DEN * F.col("nxb"))
            & (_T_NUM * F.col("nxb") <= _T_DEN * F.col("nxa"))
        )
        .withColumn(
            "ub",
            F.lit(1)
            + F.least(F.col("nxa") - F.col("px"), F.col("nxb") - F.col("py")),
        )
        .groupBy("a", "b", "nxa", "nxb")
        .agg(F.max("ub").alias("ub"))
        .filter(
            (_T_NUM + _T_DEN) * F.col("ub")
            >= _T_NUM * (F.col("nxa") + F.col("nxb"))
        )
        .select("a", "b")
    )
    arrs = ordered.select("doc_id", "arr", "n")
    out = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("a"),
                F.col("arr").alias("arr_a"),
                F.col("n").alias("na"),
            ),
            "a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("b"),
                F.col("arr").alias("arr_b"),
                F.col("n").alias("nb"),
            ),
            "b",
        )
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .filter(
            _T_DEN * F.col("inter")
            >= _T_NUM * (F.col("na") + F.col("nb") - F.col("inter"))
        )
    )
    return out.select(
        "a",
        "b",
        F.col("inter").cast("long").alias("inter"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.expr("1000000 * inter div (na + nb - inter)")
        .cast("long")
        .alias("jacc_micro"),
    )


def histogram(spark, sf_dir):
    sh = exploded_shingles(spark, sf_dir)
    with_df = sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("s")))
    plen = (
        F.col("n_shingles")
        - ((F.col("n_shingles") * _T_NUM + _T_DEN - 1) / _T_DEN).cast("long")
        + 1
    )
    prefix = with_df.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("s").asc())
        ),
    ).filter(F.col("rn") <= plen)
    pf = prefix.groupBy("s").agg(F.count(F.lit(1)).alias("pf"))
    print("== prefix-token frequency histogram (pf -> tokens) ==")
    for r in pf.groupBy("pf").count().orderBy("pf").collect():
        print(f"  pf={r['pf']:>4}  tokens={r['count']}")
    work = pf.agg(
        F.sum(F.col("pf") * (F.col("pf") - 1) / 2).alias("pairs"),
        F.count(F.lit(1)).alias("tokens"),
        F.max("pf").alias("max_pf"),
    ).collect()[0]
    print(
        f"raw candidate pairs sum C(pf,2): {int(work['pairs'])} over "
        f"{work['tokens']} prefix tokens, max pf {work['max_pf']}"
    )
    n_docs = sh.select("doc_id").distinct().count()
    print(f"docs with shingles: {n_docs}")


def timed(label, build, runs=2):
    ts = []
    for _ in range(runs):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts):.2f}s  samples {[round(t,2) for t in ts]}")
    return min(ts)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("ppjoin-profile")
    print(f"profiling at {sf_dir}")
    if "--timings-only" not in sys.argv:
        histogram(spark, sf_dir)
        if "--hist-only" in sys.argv:
            return
        sh = exploded_shingles(spark, sf_dir)
        # parity gate first: the A/B is meaningless if results differ
        legacy = ppjoin_pairs_legacy(sh)
        for label, fn in (
            ("adopted", ppjoin_pairs),
            ("arrayverify", ppjoin_pairs_arrayverify),
        ):
            other = fn(sh)
            diff = legacy.exceptAll(other).union(other.exceptAll(legacy)).count()
            print(f"parity {label} vs legacy (exceptAll both ways): {diff} rows differ")
            assert diff == 0
    timed(
        "legacy exploded-row ppjoin ",
        lambda: ppjoin_pairs_legacy(exploded_shingles(spark, sf_dir)),
    )
    timed(
        "adopted registered ppjoin  ",
        lambda: ppjoin_pairs(exploded_shingles(spark, sf_dir)),
    )
    timed(
        "array-verify variant       ",
        lambda: ppjoin_pairs_arrayverify(exploded_shingles(spark, sf_dir)),
    )
    if "--cc" in sys.argv:
        timed(
            "cc_two_phase over legacy   ",
            lambda: cc_two_phase(
                ppjoin_pairs_legacy(exploded_shingles(spark, sf_dir)).select("a", "b")
            ),
        )
        timed(
            "cc_two_phase over adopted  ",
            lambda: cc_two_phase(
                ppjoin_pairs(exploded_shingles(spark, sf_dir)).select("a", "b")
            ),
        )


if __name__ == "__main__":
    main()
