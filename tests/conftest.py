from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# transformWithState needs google.protobuf for its Python<->JVM state
# protocol; this container ships none.  Activate the bridge to the
# system SDK's bundled pure-Python runtime (tests/_protobuf_vendor/
# README.md) ONLY when protobuf is otherwise missing — PYTHONPATH too,
# because the pb2 module is imported inside Python WORKERS, not just
# the driver, and workers inherit the env, not sys.path.
_PB_VENDOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_protobuf_vendor")
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    ):
        sys.path.insert(0, _PB_VENDOR)
        os.environ["PYTHONPATH"] = (
            _PB_VENDOR + os.pathsep + os.environ.get("PYTHONPATH", "")
        )

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def spark():
    # getOrCreate: one JVM for the whole suite (individual tests that need
    # special masters manage their own lifecycle and stop theirs after).
    return get_spark("tests", cores=8, shuffle_partitions=8)


@pytest.fixture()
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from mit_6_5840_mapreduce_with_go_spark.sources import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def assert_df_matches_oracle(df, con, sql: str, ndigits: int = 6) -> None:
    """Order-insensitive value compare, mirroring the driver's gate."""
    import math

    cols = sorted(df.columns)
    srows = [tuple(r[c] for c in cols) for r in df.collect()]
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    assert sorted(ocols) == cols, f"columns: spark={cols} oracle={sorted(ocols)}"
    order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = [tuple(r[i] for i in order) for r in cur.fetchall()]

    def norm(rows):
        out = []
        for row in rows:
            out.append(
                tuple(
                    ("NaN" if isinstance(v, float) and math.isnan(v) else
                     round(v, ndigits) if isinstance(v, float) else
                     str(v) if v is not None else None)
                    for v in row
                )
            )
        return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))

    s, o = norm(srows), norm(orows)
    assert len(s) == len(o), f"rowcount spark={len(s)} oracle={len(o)}"
    assert s == o
