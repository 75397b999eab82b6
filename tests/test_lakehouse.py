"""Lakehouse table formats (operators/lakehouse.py): the ORC tail-first
walk's validation and totality, the Delta replay's JVM-only plan and
fold semantics, the Iceberg census decode."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import lakehouse as L


def test_orc_roundtrip_and_validation():
    pay = L._orc_payload(11)
    m = L.decode_orc_footer(pay)
    assert m["n_stripes"] == 1 + 11 % 4
    assert m["n_types"] == 3 + 11 % 3
    # head magic
    with pytest.raises(ValueError, match="head magic"):
        L.decode_orc_footer(b"XXX" + pay[3:])
    # postscript magic
    bad = bytearray(pay)
    i = pay.rfind(b"ORC")  # the postscript copy (after the stripes)
    assert i > 3
    bad[i] = ord("X")
    with pytest.raises(ValueError):
        L.decode_orc_footer(bytes(bad))
    # non-NONE compression rejected
    stripes = [(10, 5, 5, 5)]
    good = L.encode_orc(stripes, [4])
    from mit_6_5840_mapreduce_with_go_spark.operators.tfrecord import (
        _pb_enc_varint,
        _pb_len,
        _pb_tag,
    )

    # rebuild with compression=1 (ZLIB)
    body_end = len(good) - 1 - good[-1]
    ps = (
        _pb_tag(1, 0)
        + _pb_enc_varint(0)  # will mismatch, but compression hits first? no:
        + _pb_tag(2, 0)
        + _pb_enc_varint(1)
        + _pb_len(8000, b"ORC")
    )
    with pytest.raises(ValueError, match="compression"):
        L.decode_orc_footer(good[:body_end] + ps + bytes([len(ps)]))


def test_orc_row_count_cross_validation():
    """A footer row count that disagrees with the stripe sum raises —
    the decoder checks the invariant, not just field presence."""
    pay = bytearray(L._orc_payload(4))  # 1 stripe, rows 544
    # flip a row-count byte inside the footer: rebuild instead, with a
    # corrupted total via direct encode
    from mit_6_5840_mapreduce_with_go_spark.operators import lakehouse

    stripes = [(100, 5, 5, 5), (200, 5, 5, 5)]
    good = lakehouse.encode_orc(stripes, [4, 7])
    assert lakehouse.decode_orc_footer(good)["n_rows"] == 300
    # tamper: encode with a wrong field-6 value by patching the tail
    # (the varint for 300 is 2 bytes: 0xAC 0x02)
    idx = good.rfind(b"\xac\x02")
    assert idx > 0
    bad = good[:idx] + b"\xad\x02" + good[idx + 2 :]
    with pytest.raises(ValueError, match="row count mismatch"):
        lakehouse.decode_orc_footer(bad)


@pytest.mark.parametrize("doc_id", [0, 3, 9, 22])
def test_orc_truncation_and_flip_total(doc_id):
    pay = L._orc_payload(doc_id)
    L.decode_orc_footer(pay)
    for ln in range(0, len(pay), 3):
        try:
            L.decode_orc_footer(pay[:ln])
        except ValueError:
            pass
    for pos in range(0, len(pay), 3):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                L.decode_orc_footer(bytes(mut))
            except ValueError:
                pass


def test_delta_replay_plan_is_python_free(spark):
    """The Delta log replay builds AND parses its JSON actions
    JVM-side: no Python eval nodes anywhere in the plan, and the fold
    is one shuffle keyed by (doc_id, path) plus the final rollup."""
    import re

    df = L.table_delta_log_replay(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}
    # closed forms: commit count and the add/remove bookkeeping
    for did, r in list(rows.items())[:50]:
        k = 2 + did % 4
        n_adds = sum(1 + (did + v) % 3 for v in range(k))
        assert r["n_commits"] == k
        assert r["n_actions"] == n_adds + (k - 1)
        assert r["n_live_files"] == n_adds - (k - 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"BatchEvalPython|ArrowEvalPython|PythonMapInArrow|MapInPandas", plan
    )


def test_iceberg_census_decode(spark):
    df = L.table_iceberg_manifest_census(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}
    for did, r in list(rows.items())[:50]:
        m = 2 + did % 4
        assert r["n_manifests"] == m
        assert r["latest_snapshot"] == 200 + did
        assert r["n_added_manifests"] == 1
        assert r["live_rows"] == r["added_sum"] - r["deleted_sum"]


def test_delta_time_travel_prefix_sums(spark):
    """Per-version live census equals the closed forms, versions are
    dense per table, and the final version matches the full replay."""
    import re

    df = L.table_delta_time_travel(spark, "/root/testdata/sf0.001")
    rows = {}
    for r in df.collect():
        rows.setdefault(r["doc_id"], {})[r["version"]] = r
    replay = {
        r["doc_id"]: r
        for r in L.table_delta_log_replay(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for did, byver in list(rows.items())[:40]:
        k = 2 + did % 4
        assert sorted(byver) == list(range(k))
        for v in range(k):
            n_live = sum(1 + (did + u) % 3 for u in range(v + 1)) - v
            assert byver[v]["n_live_files"] == n_live, (did, v)
        last = byver[k - 1]
        assert last["n_live_files"] == replay[did]["n_live_files"]
        assert last["live_rows"] == replay[did]["live_rows_sum"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"BatchEvalPython|ArrowEvalPython|PythonMapInArrow|MapInPandas", plan
    )
