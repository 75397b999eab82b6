"""Quiet-host follow-up: (re-)measure named queries' decade rows and
merge them into SCALING_CURVE.json in place, stamping per-row
PROVENANCE (VERDICT r10 #5) so a reader can tell a quiet measurement
from a shared-host upper bound.  Usage:

    python tools/sf1_followup.py name [name...]
    python tools/sf1_followup.py --slowest N   # top-N by current sf1 time

Refuses to stamp rows as quiet when the host is not (1-min loadavg
gate, bounded wait, same policy as bench.py).
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

_LOAD_QUIET = 1.0
# the 1-min average alone is gameable by a just-finished burst (same
# lesson as bench.py); the 5-min average must also be low to stamp quiet
_LOAD_QUIET_5MIN = 2.5
_LOAD_WAIT = 300
# a new sf1 sample more than this factor above the row's previously
# recorded sf1 time is a contamination suspect: take a third sample
# (round 12 caught a mid-sweep burst stamping a 0.9 s query at 35 s,
# exp 1.24 — a phantom superlinear entry)
_ANOMALY_FACTOR = 3.0


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return [0.0, 0.0, 0.0]


def _loadavg1() -> float:
    return _loadavg()[0]


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit("usage: sf1_followup.py name [name...] | --slowest N")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING_CURVE.json")
    report = json.load(open(path))
    if args[0] == "--slowest":
        n = int(args[1])
        names = [
            q
            for q, t in sorted(
                report["sf1"]["queries"].items(),
                key=lambda kv: -kv[1].get("1", 0.0),
            )
        ][:n]
        print("slowest", n, "sf1 rows:", names)
    else:
        names = args

    deadline = time.time() + _LOAD_WAIT
    load = _loadavg()
    while (
        load[0] > _LOAD_QUIET or load[1] > _LOAD_QUIET_5MIN
    ) and time.time() < deadline:
        print(
            f"host busy (loadavg {load[0]:.1f}/{load[1]:.1f}), waiting...",
            file=sys.stderr,
        )
        time.sleep(20)
        load = _loadavg()
    quiet = load[0] <= _LOAD_QUIET and load[1] <= _LOAD_QUIET_5MIN
    mode = "quiet" if quiet else f"contaminated(loadavg={load[0]:.1f}/{load[1]:.1f})"
    print(f"measuring under: {mode}")

    spark = get_spark("sf1_followup")
    queries = entrymod.queries()
    dirs = {
        "0.01": "/root/testdata/sf0.01",
        "0.1": "/root/testdata/sf0.1",
        "1": sc._sf1_dir(),
    }

    def _warm() -> None:
        queries["q1_pricing_summary"](spark, dirs["0.01"]).write.format(
            "noop"
        ).mode("overwrite").save()

    _warm()
    prov = report["sf1"].setdefault("provenance", {})
    for row_idx, name in enumerate(names):
        # SESSION AGING (round 13, measured): rows late in a shared
        # session run 2-3x slower than the same rows in a fresh one
        # (mm_decode_wav_stats 5.35 s aged vs 2.09 s fresh at sf1;
        # stream_frontier_final_state 9.99 s aged vs 2.53 s fresh at
        # sf0.01) — enough to poison canonical records UNDER the 3x
        # anomaly gate while carrying a quiet stamp.  Restart the
        # session every few rows so no measurement runs on an old one.
        if row_idx and row_idx % 4 == 0:
            spark.stop()
            spark = get_spark("sf1_followup")
            _warm()
        # a burst arriving MID-sweep invalidates the start-time quiet
        # stamp for the rows measured under it — but the sweep's OWN
        # 32-thread execution also drives the 1-min average past the
        # gate (round 13: a heavy-row chunk self-stamped contaminated
        # at loadavg 2.5 with zero external load).  Idle-waiting
        # separates the two cleanly: self-load DECAYS while we sit
        # idle (1-min time constant), an external burst does not — so
        # cool down (bounded) before each row and stamp contaminated
        # only if the host is still loud after the wait.
        row_deadline = time.time() + 180
        row_load = _loadavg()
        while row_load[0] > _LOAD_QUIET * 2 and time.time() < row_deadline:
            time.sleep(15)
            row_load = _loadavg()
        row_mode = mode
        if row_load[0] > _LOAD_QUIET * 2:
            row_mode = f"contaminated(loadavg={row_load[0]:.1f} mid-sweep)"
            print(
                f"{name}: host still loud after cooldown "
                f"(loadavg {row_load[0]:.1f}) — stamping contaminated",
                file=sys.stderr,
            )
        times = {}
        for sf, d in dirs.items():
            samples = []
            for _ in range(2):
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            prev = report["sf1"]["queries"].get(name, {}).get(sf)
            if (
                prev
                and min(samples) > _ANOMALY_FACTOR * prev
                and len(samples) < 3
            ):
                # contamination suspect: one more try for a clean min
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
                if min(samples) > _ANOMALY_FACTOR * prev:
                    row_mode = (
                        f"contaminated(>{_ANOMALY_FACTOR}x prior at sf{sf})"
                    )
                    print(
                        f"{name}: sf{sf} min {min(samples):.2f}s is "
                        f">{_ANOMALY_FACTOR}x the prior record {prev:.2f}s "
                        "after a retry — stamping contaminated",
                        file=sys.stderr,
                    )
            times[sf] = round(min(samples), 3)
        exp = round(math.log10(times["1"] / times["0.1"]), 2)
        if row_mode.startswith("contaminated") and name in report["sf1"]["queries"]:
            # ADVICE r12: a sample the guard itself stamped contaminated
            # must NOT overwrite the canonical record (it would become
            # the next sweep's anomaly baseline and could append a
            # phantom superlinear entry — the exact failure the guard
            # exists to prevent).  Park it under a quarantine key; the
            # canonical times/exponent/provenance stay as they were.
            report["sf1"].setdefault("quarantine", {})[name] = {
                "times": times,
                "growth_exponent_01_to_1": exp,
                "provenance": row_mode,
            }
            print(
                f"{name}: contaminated sample quarantined "
                f"(canonical record kept)", times, "exp", exp,
            )
        else:
            report["sf1"]["queries"][name] = times
            report["sf1"]["growth_exponent_01_to_1"][name] = exp
            prov[name] = row_mode
            report["sf1"].setdefault("quarantine", {}).pop(name, None)
            sl = report["sf1"]["superlinear_queries"]
            if exp > 1.0 and name not in sl:
                sl.append(name)
            elif exp <= 1.0 and name in sl:
                sl.remove(name)
            print(name, times, "exp", exp)
        # merge incrementally: a long sweep interrupted mid-way keeps
        # every completed row
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print("merged", len(names), "rows into", path)


if __name__ == "__main__":
    main()
