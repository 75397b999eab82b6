"""TFRecord + protobuf wire walk (operators/tfrecord.py): CRC32C
vectors, framing CRC enforcement, wire-format edges, tf.Example
packed/unpacked acceptance, totality."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import tfrecord as T


def test_crc32c_vectors():
    assert T.crc32c(b"123456789") == 0xE3069283  # published check value
    assert T.crc32c(b"") == 0
    assert T.crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 test vector


def test_framing_crcs_enforced():
    sh = T.encode_tfrecord([b"payload-one", b"two"])
    assert T.decode_tfrecord_frames(sh) == [b"payload-one", b"two"]
    # flip a payload byte: data CRC must catch it
    bad = bytearray(sh)
    bad[13] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        T.decode_tfrecord_frames(bytes(bad))
    # flip a length byte: length CRC must catch it BEFORE a wild read
    bad = bytearray(sh)
    bad[0] ^= 0x40
    with pytest.raises(ValueError, match="length CRC"):
        T.decode_tfrecord_frames(bytes(bad))
    with pytest.raises(ValueError, match="empty"):
        T.decode_tfrecord_frames(b"")


def test_proto_wire_walker():
    buf = (
        T._pb_tag(1, 0) + T._pb_enc_varint(300)
        + T._pb_len(2, b"abc")
        + T._pb_tag(3, 5) + struct.pack("<I", 7)
        + T._pb_tag(4, 1) + struct.pack("<Q", 9)
    )
    assert T.parse_proto(buf) == [
        (1, 0, 300), (2, 2, b"abc"), (3, 5, 7), (4, 1, 9)
    ]
    with pytest.raises(ValueError, match="field number 0"):
        T.parse_proto(b"\x00")
    with pytest.raises(ValueError, match="wire type"):
        T.parse_proto(T._pb_tag(1, 3))  # deprecated group
    with pytest.raises(ValueError, match="truncated varint"):
        T.parse_proto(b"\x80")


def test_tf_example_unpacked_int64_accepted():
    """Older writers emit repeated (unpacked) int64 values; the reader
    must accept both encodings."""
    packed = T.encode_tf_example({"a": [1, 2, 3]})
    # hand-build the unpacked variant: Int64List with three varint fields
    inner = b"".join(T._pb_tag(1, 0) + T._pb_enc_varint(v) for v in (1, 2, 3))
    flist = T._pb_len(3, inner)
    entry = T._pb_len(1, b"a") + T._pb_len(2, flist)
    unpacked = T._pb_len(1, T._pb_len(1, entry))
    assert T.decode_tf_example(packed) == T.decode_tf_example(unpacked)


def test_negative_int64_and_float_lists():
    got = T.decode_tf_example(
        T.encode_tf_example({"n": [-1, -(2**40)], "w": [0.25, -2.0]})
    )
    assert got["n"] == [-1, -(2**40)]
    assert got["w"] == [0.25, -2.0]


def test_payload_formulas():
    for doc_id in (0, 1, 2, 3, 499):
        exs = [
            T.decode_tf_example(f)
            for f in T.decode_tfrecord_frames(T._tfrecord_payload(doc_id))
        ]
        k = 2 + doc_id % 4
        assert len(exs) == k
        for r, e in enumerate(exs):
            assert e["id"] == [doc_id * 100 + r]
            assert len(e["tokens"]) == 5 + (doc_id + r) % 8
            assert e["text"] == f"doc{doc_id}r{r}".encode()


def test_totality():
    pay = T._tfrecord_payload(5)
    for ln in range(len(pay)):
        try:
            T.decode_tfrecord_frames(pay[:ln])
        except ValueError:
            pass
    for pos in range(len(pay)):
        for flip in (0x01, 0x80):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                frames = T.decode_tfrecord_frames(bytes(mut))
                for f in frames:
                    T.decode_tf_example(f)
            except ValueError:
                pass


def test_tfrecord_source_parity(spark):
    """File-source vs payload-column parity, and per-shard partition
    granularity (the warcfile discipline applied to training shards)."""
    from mit_6_5840_mapreduce_with_go_spark.sources import (
        read_tfrecord_source,
    )

    sf = "/root/testdata/sf0.001"
    d = T._tfrecord_shard_dir(sf)
    import glob
    import os

    files = sorted(glob.glob(os.path.join(d, "*.tfrecord")))
    assert len(files) == 8
    df = read_tfrecord_source(spark, os.path.join(d, "*.tfrecord"))
    assert df.rdd.getNumPartitions() == 8
    a = {
        r["doc_id"]: r.asDict()
        for r in T.mm_tfrecord_source_stats(spark, sf).collect()
    }
    b = {
        r["doc_id"]: r.asDict()
        for r in T.mm_decode_tfrecord_stats(spark, sf).collect()
    }
    assert a == b
