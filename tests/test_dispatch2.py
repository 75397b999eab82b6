"""Universal container dispatcher (operators/dispatch2.py): every
format identified, the no-magic proofs hold, garbage quarantines."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import dispatch2 as D


def test_all_ten_formats_identified():
    for doc_id in range(20):  # two full cycles of the 10 formats
        want = D._FORMATS[doc_id % 10]
        got = D.decode_container_auto(D._auto_container_payload(doc_id))
        assert got["format"] == want, (doc_id, got, want)
        assert got["n_items"] >= 1


def test_no_magic_proofs():
    """TFRecord is identified by its masked-CRC proof, safetensors by
    the JSON-header heuristic — and corrupting exactly the proof byte
    demotes them to quarantine, never a misroute."""
    tfr = bytearray(D._auto_container_payload(6))  # tfrecord slot
    assert D.decode_container_auto(bytes(tfr))["format"] == "tfrecord"
    tfr[9] ^= 0xFF  # break the length CRC
    with pytest.raises(ValueError, match="unrecognized"):
        D.decode_container_auto(bytes(tfr))
    st = bytearray(D._auto_container_payload(8))  # safetensors slot
    assert D.decode_container_auto(bytes(st))["format"] == "safetensors"
    st[8] = ord("[")  # header no longer a JSON object
    with pytest.raises(ValueError, match="unrecognized"):
        D.decode_container_auto(bytes(st))


def test_npz_vs_zip_distinction():
    assert D.decode_container_auto(D._auto_container_payload(7))["format"] == "npz"
    assert D.decode_container_auto(D._auto_container_payload(1))["format"] == "zip"


def test_garbage_quarantines():
    state = 0x9E3779B97F4A7C15
    for _ in range(300):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        n = state % 80
        buf = bytearray()
        s = state
        for _ in range(n):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            buf.append(s >> 56)
        try:
            out = D.decode_container_auto(bytes(buf))
            assert isinstance(out, dict) and "format" in out
        except ValueError:
            pass
