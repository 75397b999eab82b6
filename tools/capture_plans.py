"""Capture ``.explain("formatted")`` output for queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (the judge checks plan claims against these).

Usage:
    python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]

e.g. ``python tools/capture_plans.py r13 before /root/testdata/sf0.1 \
      dedup_cc_two_phase sim_tfidf_topk`` writes
``plans/r13/dedup_cc_two_phase_before.txt`` etc.  With no query names,
captures the full bench HEADLINE set.

Plan building alone executes no data jobs for most queries; iterative
queries (vocab_bpe_merges, mm_pca_power_iteration, cc rounds) run their
internal materialization jobs as part of constructing the DataFrame —
that is inherent to the query shape, not an artifact of this tool.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> int:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    queries = entrymod.queries()
    for name in names:
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
