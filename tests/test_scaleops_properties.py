"""Property tests for the scale-ops planners: the compaction-binning and
range-partition-planning algorithms (as registered oracle SQL, evaluated
in DuckDB — fast per-example) must match pure-Python references on
arbitrary generated inputs. Cross-engine Spark==DuckDB equality is
already pinned by the oracle mirror; these pin the ALGORITHM."""

from __future__ import annotations

import collections
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_with_go_spark import registry
from mit_6_5840_mapreduce_with_go_spark.operators.scaleops import (  # noqa: F401
    _COMPACT_TARGET,
    _RANGE_BIN_WIDTH,
    _RANGE_N_PARTS,
)

registry.load_all()


def _compaction_py(files):
    """files: list of (source, doc_id, n_chars) with unique doc_ids."""
    by_source = collections.defaultdict(list)
    for s, d, n in files:
        by_source[s].append((d, n))
    out = {}
    for s, fs in by_source.items():
        fs.sort()
        cum = 0
        for d, n in fs:
            b = cum // _COMPACT_TARGET
            key = (s, b)
            if key not in out:
                out[key] = [0, 0, d, d]
            agg = out[key]
            agg[0] += 1
            agg[1] += n
            agg[2] = min(agg[2], d)
            agg[3] = max(agg[3], d)
            cum += n
    return out


FILES = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code"]),
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=1, max_value=60_000),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],
)


@settings(max_examples=25, deadline=None)
@given(FILES)
def test_compaction_bins_match_python(files):
    pdf = pd.DataFrame(
        [
            {"doc_id": d, "text": "", "lang": "en", "source": s, "n_chars": n}
            for s, d, n in files
        ]
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    got = {
        (r[0], r[1]): [r[2], r[3], r[4], r[5]]
        for r in con.sql(
            registry.ORACLES["maintenance_compaction_bins"]
        ).fetchall()
    }
    assert got == _compaction_py(files)


def _range_plan_py(prices):
    hist = collections.Counter(
        int(math.floor(p / _RANGE_BIN_WIDTH)) for p in prices
    )
    total = sum(hist.values())
    out = {}
    cum = 0
    for b in sorted(hist):
        part = (cum * _RANGE_N_PARTS) // total
        if part not in out:
            out[part] = [b, b, 0, 0]
        agg = out[part]
        agg[0] = min(agg[0], b)
        agg[1] = max(agg[1], b)
        agg[2] += hist[b]
        agg[3] += 1
        cum += hist[b]
    return out


PRICES = st.lists(
    st.floats(
        min_value=0.01,
        max_value=500_000.0,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=25, deadline=None)
@given(PRICES)
def test_range_partition_plan_matches_python(prices):
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(len(prices)),
            "o_totalprice": prices,
        }
    )
    con = duckdb.connect()
    con.register("orders", pdf)
    got = {
        r[0]: [r[1], r[2], r[3], r[4]]
        for r in con.sql(
            registry.ORACLES["layout_range_partition_plan"]
        ).fetchall()
    }
    want = _range_plan_py(prices)
    assert got == want
    # global invariants: full coverage, monotone non-overlapping ranges
    assert sum(v[2] for v in got.values()) == len(prices)
    parts = sorted(got)
    for a, b in zip(parts, parts[1:]):
        assert got[a][1] < got[b][0]
