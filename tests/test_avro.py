"""Avro object-container reader (operators/avro_container.py):
spec-walk verification, zigzag/varint primitives, hostile inputs,
totality."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import avro_container as A


def test_zigzag_roundtrip():
    buf = b"".join(A._zz_encode(v) for v in (0, -1, 1, -2, 2, 300, -300, 2**40))
    i = 0
    out = []
    while i < len(buf):
        v, i = A._zz_decode(buf, i)
        out.append(v)
    assert out == [0, -1, 1, -2, 2, 300, -300, 2**40]


def test_container_roundtrip_and_blocks():
    fields = [("id", "long"), ("tag", "string"), ("x", "double")]
    recs = [(i, f"s{i}", i * 0.25) for i in range(10)]
    pay = A.encode_avro_container(fields, recs, records_per_block=4)
    m = A.decode_avro_container(pay)
    assert m["fields"] == fields
    assert m["records"] == recs
    assert m["n_blocks"] == 3  # 4 + 4 + 2


def test_schema_driven_not_hardcoded():
    """A different field layout decodes per ITS schema."""
    fields = [("a", "string"), ("b", "int")]
    pay = A.encode_avro_container(fields, [("x", 5), ("yy", -7)])
    m = A.decode_avro_container(pay)
    assert m["fields"] == fields and m["records"] == [("x", 5), ("yy", -7)]


def test_hostile_inputs():
    pay = A._avro_payload(3)
    with pytest.raises(ValueError, match="bad magic"):
        A.decode_avro_container(b"Obj\x02" + pay[4:])
    # corrupt the sync marker of the last block
    bad = bytearray(pay)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        A.decode_avro_container(bytes(bad))
    # unsupported codec
    deflate = A.encode_avro_container([("a", "long")], [(1,)])
    bad2 = deflate.replace(b"null", b"zstd")
    with pytest.raises(ValueError, match="codec|truncated|metadata"):
        A.decode_avro_container(bad2)
    # union / nested schema rejected
    nested = A.encode_avro_container([("a", "long")], [(1,)])
    nested = nested.replace(b'"type": "long"', b'"type": "junk"')
    with pytest.raises(ValueError):
        A.decode_avro_container(nested)


def test_payload_formulas():
    for doc_id in (0, 1, 2, 39, 499):
        m = A.decode_avro_container(A._avro_payload(doc_id))
        n = 30 + doc_id % 40
        assert m["n_records"] == n
        assert m["n_blocks"] == (1 if doc_id % 2 == 0 else 2)
        assert sum(r[0] for r in m["records"]) == sum(
            doc_id * 1000 + j for j in range(n)
        )


def test_totality():
    pay = A._avro_payload(7)
    A.decode_avro_container(pay)
    for ln in range(len(pay)):
        try:
            A.decode_avro_container(pay[:ln])
        except ValueError:
            pass
    for pos in range(0, len(pay), 2):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                A.decode_avro_container(bytes(mut))
            except ValueError:
                pass
