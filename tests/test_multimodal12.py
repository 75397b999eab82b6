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
