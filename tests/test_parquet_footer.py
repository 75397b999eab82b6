"""Parquet footer walk (operators/parquet_footer.py): Thrift
compact-protocol parsing verified against real pyarrow-written files
(including the driver's own testdata), protocol edge cases, and the
totality contract."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import parquet_footer as P


def test_roundtrip_against_pyarrow_metadata():
    import io

    import pyarrow.parquet as pq

    for doc_id in (0, 1, 8, 99, 499):
        pay = P._parquet_payload(doc_id)
        got = P.decode_parquet_footer(pay)
        ref = pq.read_metadata(io.BytesIO(pay))
        assert got["num_rows"] == ref.num_rows
        assert got["n_row_groups"] == ref.num_row_groups
        assert len(got["columns"]) == ref.num_columns
        assert got["group_rows"] == [
            ref.row_group(i).num_rows for i in range(ref.num_row_groups)
        ]
        assert got["created_by"] == ref.created_by


def test_real_testdata_footer_matches_pyarrow():
    """The driver's own documents.parquet (written by whatever engine
    generated the testdata) must walk identically — cross-writer
    interop, not just our own pyarrow output."""
    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.001/documents.parquet"
    with open(path, "rb") as fh:
        pay = fh.read()
    got = P.decode_parquet_footer(pay)
    ref = pq.read_metadata(path)
    assert got["num_rows"] == ref.num_rows
    assert got["n_row_groups"] == ref.num_row_groups
    assert len(got["columns"]) == ref.num_columns
    assert sum(got["chunk_values"]) == ref.num_columns * ref.num_rows


def test_protocol_primitives():
    # zigzag
    assert P._zigzag(0) == 0
    assert P._zigzag(1) == -1
    assert P._zigzag(2) == 1
    assert P._zigzag(4294967294) == 2147483647
    # varint
    assert P._varint(b"\x00", 0) == (0, 1)
    assert P._varint(b"\xac\x02", 0) == (300, 2)
    with pytest.raises(ValueError, match="truncated varint"):
        P._varint(b"\x80", 0)
    with pytest.raises(ValueError, match="64 bits"):
        P._varint(b"\xff" * 11, 0)
    # short-form field header: (delta<<4)|type = 0x55 -> field 5, i32;
    # value zigzag(42) = 84
    buf = bytes([0x55, 0x54, 0x00])
    fields, end = P._read_struct(buf, 0)
    assert fields == {5: 42} and end == len(buf)
    # long-form header: delta-0 nibble with bare type, then zigzag
    # field id (16 -> 0x20)
    long_form = bytes([0x05, 0x20, 0x54, 0x00])
    fields, _ = P._read_struct(long_form, 0)
    assert fields == {16: 42}
    # list of i64: header (2<<4)|6, elements zigzag(1), zigzag(-2)
    lst, _ = P._read_value(bytes([0x26, 0x02, 0x03]), 0, P._CT_LIST, 0)
    assert lst == [1, -2]
    # bools are encoded in the field-header type nibble
    fields, _ = P._read_struct(bytes([0x11, 0x22, 0x00]), 0)
    assert fields == {1: True, 3: False}


def test_malformed_inputs_raise_valueerror():
    good = P._parquet_payload(3)
    with pytest.raises(ValueError, match="leading PAR1"):
        P.decode_parquet_footer(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="trailing PAR1"):
        P.decode_parquet_footer(good[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="shorter than"):
        P.decode_parquet_footer(b"PAR1PAR1")
    # footer length pointing outside the file
    bad = bytearray(good)
    struct.pack_into("<I", bad, len(bad) - 8, len(bad))
    with pytest.raises(ValueError):
        P.decode_parquet_footer(bytes(bad))
    # zero footer length
    struct.pack_into("<I", bad, len(bad) - 8, 0)
    with pytest.raises(ValueError, match="out of range"):
        P.decode_parquet_footer(bytes(bad))


def test_totality_truncation_and_field_overwrites():
    """Package decoder-totality contract: truncations and hostile
    2/4-byte overwrites anywhere in the file raise ValueError or
    succeed — never IndexError/struct.error/RecursionError.  (The
    footer length field makes most mutations land inside the Thrift
    walk, which is the point.)"""
    pay = P._parquet_payload(5)
    n = len(pay)
    for ln in range(0, n, 7):
        try:
            P.decode_parquet_footer(pay[:ln])
        except ValueError:
            pass
    for pos in range(0, n - 4 + 1, 3):
        for v in (0, 1, 0xFFFFFFFF, n, n - 1, 0x7FFFFFFF):
            mut = bytearray(pay)
            struct.pack_into("<I", mut, pos, v)
            try:
                P.decode_parquet_footer(bytes(mut))
            except ValueError:
                pass
