"""Measured scaling curve: run the bench headline set at every testdata
SF and report per-query sf0.01 -> sf0.1 time ratios (data grows 10x).

A ratio well under 10 at these sizes means fixed per-query overhead
(planning, task launch) still dominates; what matters for the 100 TB
argument is that NO query grows super-linearly (ratio > ~10 would flag a
quadratic pair-explosion or a driver-side bottleneck).

Usage: python tools/scaling_curve.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

import __spark_entry__ as entrymod
from bench import HEADLINE

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    spark = get_spark("scaling_curve")
    queries = entrymod.queries()
    results: dict[str, dict[str, float]] = {q: {} for q in HEADLINE}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        # JVM/codegen warm-up, excluded from timings
        queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in HEADLINE:
            fn = queries[name]
            samples = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            results[name][sf] = round(min(samples), 3)

    report = {
        "sfs": SFS,
        "queries": results,
        "ratio_01_to_1": {
            q: round(r["0.1"] / r["0.01"], 2) if r.get("0.01") else None
            for q, r in results.items()
        },
    }
    superlinear = [q for q, v in report["ratio_01_to_1"].items() if v and v > 10]
    report["superlinear_queries"] = superlinear
    out = json.dumps(report, indent=1)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
