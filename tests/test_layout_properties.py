"""Property tests for the Z-order expression generators (layout.py):
the SQL emitted by _zvalue_sql must compute the textbook Morton
interleave for arbitrary in-domain inputs (checked by evaluating the
generated SQL in DuckDB against a pure-Python reference), and bucketing
must respect Z-curve containment."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_with_go_spark.operators.layout import (
    Z_BITS,
    Z_BUCKET_SHIFT,
    _zvalue_sql,
)

DOMAIN = st.integers(min_value=0, max_value=(1 << Z_BITS) - 1)


def _morton_py(x: int, y: int, bits: int = Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(DOMAIN, DOMAIN), min_size=1, max_size=50))
def test_generated_sql_matches_python_morton(pairs):
    values = ", ".join(f"({x}, {y})" for x, y in pairs)
    rows = duckdb.sql(
        f"SELECT {_zvalue_sql('x', 'y')} FROM (VALUES {values}) t(x, y)"
    ).fetchall()
    assert [r[0] for r in rows] == [_morton_py(x, y) for x, y in pairs]


@settings(max_examples=40, deadline=None)
@given(DOMAIN, DOMAIN)
def test_zvalue_bijective(x, y):
    """De-interleaving the Morton code recovers (x, y) exactly."""
    z = _morton_py(x, y)
    xr = sum(((z >> (2 * i)) & 1) << i for i in range(Z_BITS))
    yr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
    assert (xr, yr) == (x, y)


@settings(max_examples=40, deadline=None)
@given(DOMAIN, DOMAIN)
def test_bucket_is_axis_aligned_quadrant(x, y):
    """A Z-bucket (z >> SHIFT) is a contiguous quadrant: perturbing the
    low SHIFT//2 bits of each coordinate never changes the bucket."""
    z = _morton_py(x, y)
    low = Z_BUCKET_SHIFT // 2
    x2 = (x & ~((1 << low) - 1)) | 0
    y2 = (y & ~((1 << low) - 1)) | 0
    assert _morton_py(x2, y2) >> Z_BUCKET_SHIFT == z >> Z_BUCKET_SHIFT
