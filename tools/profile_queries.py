"""Per-query structural profile: wall seconds (noop sink, min-of-2),
job count, and executed-plan operator census (Exchange / broadcast /
join strategies / Python-boundary nodes) for bench HEADLINE queries or
an explicit list.

Usage:
    python tools/profile_queries.py [sf_dir] [query ...] 2>/dev/null

Prints one tab-separated line per query:
    name  sec_min  sec_first  jobs  exch  bexch  smj  shj  bhj  py  aqe_reuse
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

import __spark_entry__ as entrymod


def census(plan: str) -> dict[str, int]:
    return {
        "exch": len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobin", plan)),
        "bexch": plan.count("BroadcastExchange"),
        "reuse": plan.count("ReusedExchange"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
        "py": (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
            + plan.count("PythonMapInArrow")
        ),
        "aqeread": plan.count("AQEShuffleRead"),
    }


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    queries = entrymod.queries()
    # warm both execution paths like bench does
    for w in ("q1_pricing_summary", "mm_decode_frames"):
        queries[w](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(
        "name\tsec_min\tsec_first\tjobs\texch\tbexch\treuse\tsmj\tshj\tbhj\tbnl\tpy\taqeread",
        flush=True,
    )
    def _next_job_id() -> int:
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    for name in names:
        spark.catalog.clearCache()
        samples = []
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        # job count via the DAGScheduler nextJobId counter delta
        t0 = time.time()
        jid0 = _next_job_id()
        df2 = queries[name](spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        njobs = _next_job_id() - jid0
        plan = df2._jdf.queryExecution().executedPlan().toString()
        c = census(plan)
        print(
            f"{name}\t{min(samples):.2f}\t{samples[0]:.2f}\t{njobs}\t"
            f"{c['exch']}\t{c['bexch']}\t{c['reuse']}\t{c['smj']}\t{c['shj']}\t"
            f"{c['bhj']}\t{c['bnl']}\t{c['py']}\t{c['aqeread']}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
