"""PPJoin profiling + A/B harness (VERDICT r11 #7).

Measures (a) the candidate-count histogram per prefix token — where the
pair-generation work actually lives — and (b) a timed A/B of the
pre-round-12 exploded-row PPJoin (kept here as ``ppjoin_pairs_legacy``
for reproduction) against the adopted array-based restructure
(``dedup2.ppjoin_pairs``):

- ORDER: per-doc array_sort(collect_list(struct(df, s))) instead of a
  row_number window over the exploded table;
- DF: one s-keyed window instead of agg + join (one exchange, not two);
- PREFIX: posexplode(slice(ordered, 1, p)) — only ~(1-t)*n elements
  per doc ever leave the doc row;
- VERIFY: size(array_intersect(arr_a, arr_b)) on the per-doc arrays —
  the exploded shingle table is never shuffled again (the legacy verify
  leg re-shuffled it twice and added a distinct for sizes).

Measured at sf0.1 (quiet host, two sessions): legacy 6.2-6.5 s vs
adopted 5.7-5.9 s on the PPJoin row; composed CC row 10.1-10.9 s vs
8.7-9.4 s.  Candidate histogram at sf0.1: max prefix-token fan-out 8,
sum C(pf,2) = 122,289 over 11,997 prefix tokens — pair generation is
NOT the bottleneck; the exploded-table plumbing was.

Usage: python tools/profile_ppjoin.py [sf_dir] [--hist-only]
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
        .select("a", "b")
    )
    return _ppjoin_verify(cand, sh)


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


def timed(label, build, runs=3):
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
    histogram(spark, sf_dir)
    if "--hist-only" in sys.argv:
        return
    sh = exploded_shingles(spark, sf_dir)
    # parity gate first: the A/B is meaningless if results differ
    legacy = ppjoin_pairs_legacy(sh)
    adopted = ppjoin_pairs(sh)
    diff = legacy.exceptAll(adopted).union(adopted.exceptAll(legacy)).count()
    print(f"parity (exceptAll both ways): {diff} rows differ")
    assert diff == 0
    timed(
        "legacy exploded-row ppjoin ",
        lambda: ppjoin_pairs_legacy(exploded_shingles(spark, sf_dir)),
    )
    timed(
        "adopted array ppjoin       ",
        lambda: ppjoin_pairs(exploded_shingles(spark, sf_dir)),
    )
    timed(
        "cc_two_phase over legacy   ",
        lambda: cc_two_phase(
            ppjoin_pairs_legacy(exploded_shingles(spark, sf_dir)).select("a", "b")
        ),
        runs=2,
    )
    timed(
        "cc_two_phase over adopted  ",
        lambda: cc_two_phase(
            ppjoin_pairs(exploded_shingles(spark, sf_dir)).select("a", "b")
        ),
        runs=2,
    )


if __name__ == "__main__":
    main()
