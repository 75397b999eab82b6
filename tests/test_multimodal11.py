"""EXIF / TIFF-IFD walk (JPEG APP1): both byte orders, inline vs
out-of-line values, malformed rejection, marker-stream APP1 location,
and the end-to-end query against the field formulas."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal11 as E


_FIELDS = [
    (0x0100, 4, 640),
    (0x0101, 4, 480),
    (0x010F, 2, "acme"),
    (0x0112, 3, 6),
    (0x011A, 5, (300, 7)),
    (0x0132, 2, "2026:01:05 12:00:00"),
]


def test_exif_roundtrip_both_byte_orders():
    for be in (False, True):
        app1 = E.encode_exif_app1(_FIELDS, big_endian=be)
        out = E.decode_exif(app1)
        assert out["byte_order"] == ("MM" if be else "II")
        t = out["tags"]
        assert t[0x0100] == 640 and t[0x0101] == 480
        assert t[0x010F] == "acme"
        assert t[0x0112] == 6
        assert t[0x011A] == (300, 7)
        assert t[0x0132] == "2026:01:05 12:00:00"


def test_exif_inline_values_are_left_justified():
    """A SHORT (2 bytes) in the 4-byte value field must read correctly
    under BOTH byte orders — the classic EXIF implementation bug."""
    for be in (False, True):
        app1 = E.encode_exif_app1([(0x0112, 3, 0x1234)], big_endian=be)
        assert E.decode_exif(app1)["tags"][0x0112] == 0x1234


def test_exif_in_jpeg_marker_stream():
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal3 import (
        encode_jpeg_gray,
    )

    jpeg = encode_jpeg_gray(16, 16, lambda bx, by: 50)
    app1 = E.encode_exif_app1(_FIELDS)
    spliced = E.splice_app1(jpeg, app1)
    assert E.exif_from_jpeg(spliced)["tags"][0x0112] == 6
    # the JPEG still decodes (APP1 is skipped by the image decoder)
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal3 import (
        decode_jpeg_gray,
    )

    assert decode_jpeg_gray(spliced)["width"] == 16
    with pytest.raises(ValueError, match="no Exif APP1"):
        E.exif_from_jpeg(jpeg)


def test_exif_rejects_malformed():
    good = E.encode_exif_app1(_FIELDS)
    with pytest.raises(ValueError, match="preamble"):
        E.decode_exif(b"JFIF\x00\x00" + good[6:])
    with pytest.raises(ValueError, match="byte order"):
        E.decode_exif(good[:6] + b"XX" + good[8:])
    with pytest.raises(ValueError, match="magic"):
        bad = bytearray(good)
        bad[8] ^= 0xFF
        E.decode_exif(bytes(bad))
    with pytest.raises(ValueError, match="truncated IFD"):
        E.decode_exif(good[:20])
    with pytest.raises(ValueError, match="out of bounds"):
        # out-of-line ASCII offset pointed past the end: truncate tail
        E.decode_exif(good[:-4])
    with pytest.raises(ValueError, match="zero denominator"):
        app1 = E.encode_exif_app1([(0x011A, 5, (300, 0))])
        E.decode_exif(app1)


def test_exif_query_consistency(spark):
    rows = E.mm_exif_orientation_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        d = r["doc_id"]
        assert r["byte_order"] == ("MM" if d % 2 else "II")
        assert r["orientation"] == 1 + d % 8
        assert r["exif_w"] == 100 + d % 900
        assert r["xres_micro"] == (72 + d % 100) * 1000000 // (1 + d % 3)


# --------------------------------------------------------------------------
# MP3 frame-header walk + ID3v2 skip (round 7; query joins the r8 window)
# --------------------------------------------------------------------------


def test_mp3_walk_roundtrip_and_vbr():
    pay = E.encode_mp3_stream([(9, 0), (11, 0), (9, 0)], id3_size=40)
    out = E.decode_mp3_frames(pay)
    assert out["n_frames"] == 3
    assert (out["kbps_min"], out["kbps_max"], out["is_vbr"]) == (128, 192, True)
    # exact integer duration: 3 frames of 1152 samples at 44100 Hz
    assert out["duration_us"] == 3 * (1152 * 1_000_000 // 44100)
    # CBR stream without a tag
    out = E.decode_mp3_frames(E.encode_mp3_stream([(14, 1)] * 5))
    assert out["n_frames"] == 5 and not out["is_vbr"]
    assert out["kbps_min"] == out["kbps_max"] == 320


def test_mp3_rejects_malformed():
    good = E.encode_mp3_stream([(9, 0), (9, 0)])
    with pytest.raises(ValueError, match="lost frame sync"):
        E.decode_mp3_frames(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated frame"):
        E.decode_mp3_frames(good[:-1])
    with pytest.raises(ValueError, match="no MP3 frames"):
        E.decode_mp3_frames(E.encode_mp3_stream([(9, 0)], id3_size=8)[:18])
    with pytest.raises(ValueError, match="ID3v2 tag extends"):
        bad = bytearray(E.encode_mp3_stream([(9, 0)], id3_size=8))
        bad[6:10] = b"\x7f\x7f\x7f\x7f"  # inflate the syncsafe size
        E.decode_mp3_frames(bytes(bad))
    with pytest.raises(ValueError, match="bitrate index"):
        bad = bytearray(good)
        bad[2] = (bad[2] & 0x0F) | 0xF0  # bitrate index 15
        E.decode_mp3_frames(bytes(bad))
    with pytest.raises(ValueError, match="reserved samplerate"):
        bad = bytearray(good)
        bad[2] |= 0x0C  # samplerate index 3
        E.decode_mp3_frames(bytes(bad))
    with pytest.raises(ValueError, match="Layer III"):
        bad = bytearray(good)
        bad[1] ^= 0x02  # layer bits
        E.decode_mp3_frames(bytes(bad))


# --------------------------------------------------------------------------
# FLAC STREAMINFO walk (round 7; query joins the r8 window)
# --------------------------------------------------------------------------


def test_flac_streaminfo_roundtrip():
    pay = E.encode_flac_streaminfo(
        sample_rate=44100, channels=2, bits_per_sample=16,
        total_samples=44100 * 7, md5=bytes(range(16)),
        extra_blocks=[(4, b"vendor\x00tag"), (1, b"\x00" * 10)],
    )
    out = E.decode_flac_streaminfo(pay)
    assert out["sample_rate"] == 44100 and out["channels"] == 2
    assert out["bits_per_sample"] == 16
    assert out["total_samples"] == 44100 * 7
    assert out["duration_us"] == 7_000_000
    assert out["md5"] == bytes(range(16))
    assert out["n_blocks"] == 3
    # odd field values exercise the bit boundaries
    out = E.decode_flac_streaminfo(E.encode_flac_streaminfo(
        sample_rate=(1 << 20) - 1, channels=8, bits_per_sample=32,
        total_samples=(1 << 36) - 1,
    ))
    assert out["sample_rate"] == (1 << 20) - 1
    assert out["channels"] == 8 and out["bits_per_sample"] == 32
    assert out["total_samples"] == (1 << 36) - 1


def test_flac_rejects_malformed():
    good = E.encode_flac_streaminfo(
        sample_rate=48000, channels=1, bits_per_sample=24, total_samples=480,
    )
    with pytest.raises(ValueError, match="bad magic"):
        E.decode_flac_streaminfo(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated metadata block"):
        E.decode_flac_streaminfo(good[:-1])
    with pytest.raises(ValueError, match="no STREAMINFO"):
        pay = b"fLaC" + bytes([0x80 | 4, 0, 0, 2]) + b"ab"
        E.decode_flac_streaminfo(pay)
    with pytest.raises(ValueError, match="STREAMINFO is"):
        bad = bytearray(good)
        bad[7] = 33  # shrink the declared length
        E.decode_flac_streaminfo(bytes(bad))
    with pytest.raises(ValueError, match="type 127"):
        bad = bytearray(good)
        bad[4] = 127
        E.decode_flac_streaminfo(bytes(bad))
