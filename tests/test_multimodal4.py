"""WAV + Y4M codecs: real RIFF/YUV4MPEG2 parsing round-trips the
encoders, frame sampling keeps the right frames, malformed payloads
are rejected, and the end-to-end queries match their definitions."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal4 as M


def test_wav_roundtrip_stats():
    fn = lambda i: ((i * 257) % 65536) - 32768  # noqa: E731
    out = M.decode_wav(M.encode_wav(1000, fn))
    want = [fn(i) for i in range(1000)]
    assert out["n_channels"] == 1
    assert out["sample_rate"] == 16000
    assert out["n_samples"] == 1000
    assert out["sum_amp"] == sum(want)
    assert out["energy"] == sum(w * w for w in want)
    assert out["min_amp"] == min(want)
    assert out["max_amp"] == max(want)


def test_wav_odd_sized_sibling_chunk_is_word_aligned():
    # RIFF pads odd-length chunks with one byte; a reader that forgets
    # the pad mis-frames every later chunk. Splice an odd LIST chunk in.
    good = M.encode_wav(100, lambda i: i)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    patched = good[:12] + odd + good[12:]
    patched = (
        b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    )
    out = M.decode_wav(patched)
    assert out["n_samples"] == 100


def test_wav_rejects_malformed():
    good = M.encode_wav(10, lambda i: 0)
    # shorter than the 12-byte RIFF/WAVE header: contractual ValueError,
    # never a raw struct.error leaking out of the parser
    for n in (0, 4, 11):
        with pytest.raises(ValueError, match="truncated"):
            M.decode_wav(good[:n])
    # fmt chunk too short for the 16-byte PCM header
    fmt_at = good.find(b"fmt ")
    bad = bytearray(good[: fmt_at + 8])
    import struct as _st
    _st.pack_into("<I", bad, fmt_at + 4, 4)
    bad += good[fmt_at + 8 : fmt_at + 12] + good[fmt_at + 8 + 16 :]
    _st.pack_into("<I", bad, 4, len(bad) - 8)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        M.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="size mismatch"):
        M.decode_wav(good[:-2])
    # float PCM (format tag 3) rejected
    bad = bytearray(good)
    fmt_at = good.find(b"fmt ") + 8
    bad[fmt_at] = 3
    with pytest.raises(ValueError, match="format tag"):
        M.decode_wav(bytes(bad))
    # 8-bit rejected
    bad = bytearray(good)
    bad[fmt_at + 14] = 8
    with pytest.raises(ValueError, match="bit depth"):
        M.decode_wav(bytes(bad))


def test_y4m_frame_sampling_strides():
    fn = lambda f, x, y: (f * 10 + x + y) % 256  # noqa: E731
    pay = M.encode_y4m(8, 6, 7, fn)
    assert [fr["frame_idx"] for fr in M.decode_y4m_sampled(pay, 1)] == list(range(7))
    assert [fr["frame_idx"] for fr in M.decode_y4m_sampled(pay, 2)] == [0, 2, 4, 6]
    assert [fr["frame_idx"] for fr in M.decode_y4m_sampled(pay, 3)] == [0, 3, 6]
    for fr in M.decode_y4m_sampled(pay, 3):
        want = [fn(fr["frame_idx"], x, y) for y in range(6) for x in range(8)]
        assert fr["sum_y"] == sum(want)


def test_y4m_rejects_malformed():
    pay = M.encode_y4m(8, 6, 3, lambda f, x, y: 0)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        M.decode_y4m_sampled(b"RIFF" + pay, 1)
    with pytest.raises(ValueError, match="truncated frame"):
        M.decode_y4m_sampled(pay[:-10], 1)
    with pytest.raises(ValueError, match="colorspace"):
        M.decode_y4m_sampled(pay.replace(b"C420", b"C444", 1), 1)
    with pytest.raises(ValueError, match="FRAME marker"):
        M.decode_y4m_sampled(pay.replace(b"FRAME", b"FRAKE", 1), 1)
    with pytest.raises(ValueError, match="even"):
        M.encode_y4m(7, 6, 1, lambda f, x, y: 0)


def test_decode_wav_stats_consistency(spark):
    rows = M.mm_decode_wav_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:10]:
        d = r["doc_id"]
        n = 800 + (d % 5) * 160
        want = [((d * 31 + i * 17) % 65536) - 32768 for i in range(n)]
        assert r["n_samples"] == n
        assert r["sum_amp"] == sum(want)
        assert r["energy"] == sum(w * w for w in want)


def test_video_frame_sample_consistency(spark):
    rows = M.mm_video_frame_sample(spark, "/root/testdata/sf0.001").collect()
    assert rows
    bydoc: dict[int, list] = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(r)
    for d, rs in list(bydoc.items())[:10]:
        nf = 4 + d % 5
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))


# -- shot boundaries -------------------------------------------------------


def test_y4m_frame_hists_match_planes():
    fn = lambda f, x, y: (f * 40 + x * 3 + y) % 256  # noqa: E731
    pay = M.encode_y4m(8, 6, 4, fn)
    hists = M.decode_y4m_frame_hists(pay)
    assert len(hists) == 4
    for fr in hists:
        want = [0] * 16
        for y in range(6):
            for x in range(8):
                want[fn(fr["frame_idx"], x, y) // 16] += 1
        assert fr["hist"] == want
        assert sum(fr["hist"]) == 48


def test_shot_luma_separation():
    # the planted-corpus property the threshold depends on: within-shot
    # L1 stays far below the cut L1 for every doc in a wide sweep
    def hist(d, f):
        h = [0] * 16
        for y in range(16):
            for x in range(16):
                h[M._shot_luma(d, f, x, y) // 16] += 1
        return h

    for d in range(0, 200, 7):
        nf = 6 + d % 7
        prev = hist(d, 0)
        for f in range(1, nf):
            cur = hist(d, f)
            l1 = sum(abs(a - b) for a, b in zip(cur, prev))
            if f % M._SHOT_LEN == 0:
                assert l1 > M._SHOT_L1_THRESHOLD, (d, f, l1)
            else:
                assert l1 <= M._SHOT_L1_THRESHOLD, (d, f, l1)
            prev = cur


def test_video_shot_boundaries_consistency(spark):
    rows = M.mm_video_shot_boundaries(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:200]:
        assert r["is_boundary"] == (r["frame_idx"] % M._SHOT_LEN == 0)


def test_video_keyframes_one_per_shot(spark):
    rows = M.mm_video_keyframes(spark, "/root/testdata/sf0.001").collect()
    assert rows
    bydoc: dict[int, list] = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(r)
    for d, rs in list(bydoc.items())[:15]:
        nf = 6 + d % 7
        n_shots = (nf + M._SHOT_LEN - 1) // M._SHOT_LEN
        assert sorted(r["shot_id"] for r in rs) == list(range(n_shots))
        for r in rs:
            # the keyframe lives inside its shot's frame range
            assert r["keyframe_idx"] // M._SHOT_LEN == r["shot_id"]


def test_vad_energy_separation():
    # the planted corpus's invariant: window energy cleanly classifies
    for d in range(0, 150, 11):
        for w in range(M._VAD_WINDOWS):
            e = sum(
                M._vad_sample(d, i) ** 2
                for i in range(w * M._VAD_WIN, (w + 1) * M._VAD_WIN)
            )
            assert (e > M._VAD_ENERGY_THRESHOLD) == M._vad_active(d, w), (d, w, e)


def test_audio_vad_segments(spark):
    rows = M.mm_audio_vad_segments(spark, "/root/testdata/sf0.001").collect()
    assert rows
    bydoc: dict[int, list] = {}
    for r in rows:
        bydoc.setdefault(r["doc_id"], []).append(r)
    for d, rs in list(bydoc.items())[:15]:
        rs = sorted(rs, key=lambda r: r["seg_id"])
        # segments tile the clip: contiguous, alternating, gap-free
        assert rs[0]["start_window"] == 0
        assert rs[-1]["end_window"] == M._VAD_WINDOWS - 1
        for a, b in zip(rs, rs[1:]):
            assert b["start_window"] == a["end_window"] + 1
            assert b["is_speech"] != a["is_speech"]
