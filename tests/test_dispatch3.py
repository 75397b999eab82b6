"""Total triage (operators/dispatch3.py): all twenty formats routed to
the right family/decoder, the tier order never shadows a real format,
and the dispatcher is total under truncation/flip/garbage."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import dispatch3 as D3


def test_all_twenty_one_formats_routed():
    for doc_id in range(42):  # two full cycles
        want = D3._ANY_KINDS[doc_id % 21]
        got = D3.decode_any_auto(D3._any_payload(doc_id))
        assert got["format"] == want, (doc_id, got, want)
        fam = (
            "container"
            if doc_id % 21 < 11
            else ("media" if doc_id % 21 < 18 else "audio")
        )
        assert got["family"] == fam
        assert got["n_items"] >= 1


def test_mp3_proof_not_magic():
    """MP3 has no magic: a payload opening with the 0xFF sync byte but
    an invalid frame header quarantines (never reported as mp3)."""
    p = bytearray(D3._any_payload(18))  # mp3 slot
    assert D3.decode_any_auto(bytes(p))["format"] == "mp3"
    bad = bytes([0xFF, 0xFB, 0xFF, 0xC4]) + bytes(16)  # bad bitrate idx
    with pytest.raises(ValueError):
        D3.decode_any_auto(bad)


def test_id3_before_mp3_and_flac_magic():
    assert D3.decode_any_auto(D3._any_payload(20))["format"] == "id3"
    assert D3.decode_any_auto(D3._any_payload(19))["format"] == "flac"
    # an ID3-opening stream must not be reported as raw mp3
    got = D3.decode_any_auto(D3._any_payload(41))
    assert got == {"family": "audio", "format": "id3", "n_items": 4}


@pytest.mark.parametrize("kind_idx", range(21))
def test_truncation_total(kind_idx):
    """Every truncation of every format's payload either decodes or
    raises ValueError — nothing else (sampled stride for suite speed;
    the per-format exhaustive sweeps run in test_decoder_robustness)."""
    pay = D3._any_payload(kind_idx)
    D3.decode_any_auto(pay)
    for ln in range(0, len(pay), 7):
        try:
            D3.decode_any_auto(pay[:ln])
        except ValueError:
            pass


@pytest.mark.parametrize("kind_idx", range(21))
def test_byte_flip_total(kind_idx):
    pay = D3._any_payload(kind_idx)
    for pos in range(0, len(pay), 5):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                D3.decode_any_auto(bytes(mut))
            except ValueError:
                pass


def test_garbage_quarantines_totally():
    state = 0xA076_1D64_78BD_642F
    for _ in range(400):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        n = state % 96
        buf = bytearray()
        s = state
        for _ in range(n):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            buf.append((s >> 33) & 0xFF)
        try:
            m = D3.decode_any_auto(bytes(buf))
            assert set(m) == {"family", "format", "n_items"}
        except ValueError:
            pass


def test_quarantine_census_errors_as_data(spark):
    """Every 7th payload is provably garbage: the census emits a
    quarantine ROW for it (never a task failure), and good rows carry
    the same family/format the clean dispatch reports."""
    from mit_6_5840_mapreduce_with_go_spark.operators.dispatch3 import (
        mm_any_auto_quarantine_stats,
    )

    rows = {
        r["doc_id"]: r
        for r in mm_any_auto_quarantine_stats(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for did, r in rows.items():
        if did % 7 == 3:
            assert r["family"] == "quarantine" and r["ok"] == 0
            assert r["n_items"] == 0
        else:
            assert r["ok"] == 1 and r["n_items"] >= 1
            assert r["fmt"] == D3._ANY_KINDS[did % 21]
