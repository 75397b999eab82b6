"""Audio/animation metadata queries (multimodal12): payload synthesis
matches the planting formulas the oracles re-derive, and the decode
stage recovers them exactly."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal12 as M
from mit_6_5840_mapreduce_with_go_spark.operators.multimodal6 import (
    decode_gif_frames,
)
from mit_6_5840_mapreduce_with_go_spark.operators.multimodal11 import (
    _MP3_BITRATES,
    _MP3_SAMPLERATES,
    decode_flac_streaminfo,
    decode_mp3_frames,
)


def test_mp3_payload_formulas():
    for doc_id in (0, 1, 2, 3, 7, 13, 100, 499):
        p = M._mp3_payload(doc_id)
        m = decode_mp3_frames(p)
        n = 3 + doc_id % 6
        sr = _MP3_SAMPLERATES[doc_id % 3]
        kbps = [_MP3_BITRATES[1 + (doc_id + k) % 14] for k in range(n)]
        assert m["n_frames"] == n
        assert m["duration_us"] == n * (1152 * 1_000_000 // sr)
        assert (m["kbps_min"], m["kbps_max"]) == (min(kbps), max(kbps))
        assert m["is_vbr"] == (len(set(kbps)) > 1)
        assert (p[:3] == b"ID3") == (doc_id % 4 != 0)


def test_flac_payload_formulas():
    for doc_id in (0, 1, 2, 6, 7, 41, 499):
        m = decode_flac_streaminfo(M._flac_payload(doc_id))
        sr = M._FLAC_RATES[doc_id % 7]
        total = 1 + (doc_id * 977) % 10_000_000
        assert m["sample_rate"] == sr
        assert m["channels"] == 1 + doc_id % 8
        assert m["bits_per_sample"] == 16 + 8 * (doc_id % 2)
        assert m["total_samples"] == total
        assert m["duration_us"] == total * 1_000_000 // sr
        assert m["n_blocks"] == 1 + doc_id % 3


def test_gif_anim_payload_formulas():
    reds = [r for r, _, _ in M._GIF_PALETTE]
    for doc_id in (0, 1, 4, 11, 499):
        m = decode_gif_frames(M._gif_anim_payload(doc_id))
        w, h = 8 + doc_id % 5, 6 + doc_id % 3
        nf = 2 + doc_id % 4
        delays = [5 + (doc_id + f) % 10 for f in range(nf)]
        expected_red = sum(
            reds[(x + y + doc_id + f) % 4]
            for f in range(nf)
            for y in range(h)
            for x in range(w)
        )
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, nf)
        assert m["delays_cs"] == delays
        assert m["duration_cs"] == sum(delays)
        assert sum(m["sum_r_frames"]) == expected_red


def test_id3v2_roundtrip_and_edges():
    import pytest

    frames = [("TIT2", "Héllo wörld"), ("TRCK", "7"), ("TXXX", "x" * 300)]
    tag = M.encode_id3v2(frames)
    got = M.decode_id3_frames(tag)
    assert got["frames"] == dict(frames)
    assert got["n_frames"] == 3
    # padding after frames is legal and stops the walk
    padded = bytearray(tag)
    n = got["tag_size"] + 64
    ss = [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    padded[6:10] = bytes(ss)
    padded += bytes(64)
    assert M.decode_id3_frames(bytes(padded))["frames"] == dict(frames)
    # v2.3 plain big-endian frame sizes
    v23 = bytearray(tag)
    v23[3] = 3
    body = bytearray(tag[10:])
    i = 0
    while i < len(body):
        fsize = (
            (body[i + 4] << 21) | (body[i + 5] << 14)
            | (body[i + 6] << 7) | body[i + 7]
        )
        body[i + 4 : i + 8] = fsize.to_bytes(4, "big")
        i += 10 + fsize
    v23 = bytes(v23[:10]) + bytes(body)
    assert M.decode_id3_frames(v23)["frames"] == dict(frames)
    # latin-1 text frames (encoding byte 0)
    lat = M.encode_id3v2([("TIT2", "plain")])
    lat = bytearray(lat)
    lat[20] = 0  # first frame's encoding byte: 10 hdr + 10 frame hdr
    assert M.decode_id3_frames(bytes(lat))["frames"] == {"TIT2": "plain"}
    # hostile cases
    with pytest.raises(ValueError, match="not an ID3v2"):
        M.decode_id3_frames(b"XXX" + tag[3:])
    with pytest.raises(ValueError, match="unsupported ID3v2.5"):
        bad = bytearray(tag); bad[3] = 5; M.decode_id3_frames(bytes(bad))
    with pytest.raises(ValueError, match="frame id"):
        bad = bytearray(tag); bad[10:14] = b"ti~2"; M.decode_id3_frames(bytes(bad))
    with pytest.raises(ValueError, match="invalid frame id"):
        M.encode_id3v2([("ti!2", "x")])


def test_id3_mp3_payload_formulas():
    for doc_id in (0, 1, 7, 19, 499):
        p = M._id3_mp3_payload(doc_id)
        tag = M.decode_id3_frames(p)
        f = tag["frames"]
        assert f["TIT2"] == f"Title {doc_id}"
        assert f["TPE1"] == f"artist{doc_id % 20}"
        assert f["TALB"] == f"album{doc_id % 7}"
        assert int(f["TRCK"]) == 1 + doc_id % 12
        audio = decode_mp3_frames(p)
        assert audio["n_frames"] == 2 + doc_id % 5


def test_id3v2_unsync_and_footer_flags_rejected():
    """Unsynchronisation (0x80) shifts every frame boundary and a
    footer (0x10) changes the tag extent; both must raise rather than
    silently misparse (experimental 0x20 is parse-neutral: accepted)."""
    import pytest

    tag = bytearray(M.encode_id3v2([("TIT2", "x")]))
    for flag in (0x80, 0x10, 0x40):
        bad = bytearray(tag)
        bad[5] |= flag
        with pytest.raises(ValueError):
            M.decode_id3_frames(bytes(bad))
    ok = bytearray(tag)
    ok[5] |= 0x20
    assert M.decode_id3_frames(bytes(ok))["frames"] == {"TIT2": "x"}
