"""QOI codec: full op-set round trip (RUN/INDEX/DIFF/LUMA/RGB), hash
index behavior, wraparound arithmetic, malformed-stream rejection."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal7 as M


def _pay(d):
    w, h = 16 + 8 * (d % 2), 12 + 4 * (d % 3)
    return M.encode_qoi(w, h, lambda x, y: M._qoi_pixel(d, x, y)), w, h


def _ops(pay):
    data = pay[14:-8]
    ops = {"RGB": 0, "INDEX": 0, "DIFF": 0, "LUMA": 0, "RUN": 0}
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFE:
            ops["RGB"] += 1
            i += 4
        elif b == 0xFF:
            i += 5
        else:
            tag = b >> 6
            key = ("INDEX", "DIFF", "LUMA", "RUN")[tag]
            ops[key] += 1
            i += 2 if tag == 2 else 1
    return ops


@pytest.mark.parametrize("d", [0, 1, 2, 5, 77, 404])
def test_qoi_roundtrip(d):
    pay, w, h = _pay(d)
    o = M.decode_qoi(pay)
    sr = sg = sb = wr = 0
    mn, mx = 255, 0
    for p in range(w * h):
        r, g, b = M._qoi_pixel(d, p % w, p // w)
        sr += r
        sg += g
        sb += b
        wr += r * p
        mn = min(mn, r, g, b)
        mx = max(mx, r, g, b)
    assert (o["sum_r"], o["sum_g"], o["sum_b"], o["wsum_r"]) == (sr, sg, sb, wr)
    assert (o["min_rgb"], o["max_rgb"]) == (mn, mx)


def test_qoi_corpus_exercises_every_op():
    pay, _, _ = _pay(7)
    ops = _ops(pay)
    for k in ("RGB", "INDEX", "DIFF", "LUMA", "RUN"):
        assert ops[k] > 0, ops
    # and it genuinely compresses
    assert len(pay) < 24 * 16 * 3


def test_qoi_wraparound_diff():
    # deltas crossing 0/255 must wrap (spec: channels are unsigned with
    # wraparound); pixel 254 -> 255 -> 0 -> 1 is a chain of +1 DIFFs
    vals = [254, 255, 0, 1]
    pay = M.encode_qoi(4, 1, lambda x, y: (vals[x], vals[x], vals[x]))
    o = M.decode_qoi(pay)
    assert o["sum_r"] == sum(vals)
    ops = _ops(pay)
    assert ops["DIFF"] >= 3


def test_qoi_long_run_splits_at_62():
    # a 200-pixel constant image needs ceil((200-1)/62) RUN ops after
    # the first literal
    pay = M.encode_qoi(200, 1, lambda x, y: (9, 9, 9))
    assert _ops(pay)["RUN"] == 4  # 61-px cap x3 + remainder
    assert M.decode_qoi(pay)["sum_r"] == 200 * 9


def test_qoi_rejects_malformed():
    pay, _, _ = _pay(3)
    # shorter than header + end marker: contractual ValueError, never a
    # raw struct.error/IndexError leaking out of the parser
    for n in (0, 3, 13, 21):
        with pytest.raises(ValueError, match="truncated"):
            M.decode_qoi(pay[:n])
    with pytest.raises(ValueError, match="magic"):
        M.decode_qoi(b"qoix" + pay[4:])
    with pytest.raises(ValueError, match="end marker"):
        M.decode_qoi(pay[:-1])
    with pytest.raises(ValueError, match="channel"):
        bad = bytearray(pay)
        bad[12] = 7
        M.decode_qoi(bytes(bad))
    # shrunken declared geometry: the op stream no longer fits the
    # pixel count (either a RUN overruns it, or literal ops trail)
    bad = bytearray(pay)
    struct.pack_into(">I", bad, 4, 1)  # width = 1
    with pytest.raises(ValueError, match="overrun|trailing"):
        M.decode_qoi(bytes(bad))
    # grown declared geometry: the stream ends before the pixel count
    bad = bytearray(pay)
    struct.pack_into(">I", bad, 8, 1000)  # height = 1000
    with pytest.raises(ValueError, match="ends before"):
        M.decode_qoi(bytes(bad))


def test_decode_qoi_stats_consistency(spark):
    rows = M.mm_decode_qoi_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:15]:
        d = r["doc_id"]
        w, h = 16 + 8 * (d % 2), 12 + 4 * (d % 3)
        sr = sum(M._qoi_pixel(d, p % w, p // w)[0] for p in range(w * h))
        assert r["sum_r"] == sr
