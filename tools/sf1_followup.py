"""One-off follow-up: measure queries missing from SCALING_CURVE.json's
sf1 section (e.g. registered after a long main run started) and merge
their rows in place.  Usage: python tools/sf1_followup.py name [name...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

import __spark_entry__ as entrymod
from tools import scaling_curve as sc


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: sf1_followup.py query [query...]")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING_CURVE.json")
    report = json.load(open(path))
    spark = get_spark("sf1_followup")
    queries = entrymod.queries()
    dirs = {
        "0.01": "/root/testdata/sf0.01",
        "0.1": "/root/testdata/sf0.1",
        "1": sc._sf1_dir(),
    }
    queries["q1_pricing_summary"](spark, dirs["0.01"]).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        times = {}
        for sf, d in dirs.items():
            samples = []
            for _ in range(2):
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            times[sf] = round(min(samples), 3)
        exp = round(math.log10(times["1"] / times["0.1"]), 2)
        report["sf1"]["queries"][name] = times
        report["sf1"]["growth_exponent_01_to_1"][name] = exp
        sl = report["sf1"]["superlinear_queries"]
        if exp > 1.0 and name not in sl:
            sl.append(name)
        elif exp <= 1.0 and name in sl:
            sl.remove(name)
        print(name, times, "exp", exp)
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("merged", len(names), "rows into", path)


if __name__ == "__main__":
    main()
