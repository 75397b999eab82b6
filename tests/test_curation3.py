"""Invariant tests for curation tranche 3 (curation3.py): segment-level
paragraph dedup, context-window chunking, the linear quality classifier,
and the snapshot diff.  Cross-engine value parity is covered by the
oracle mirror; these assert semantic invariants and non-vacuity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.curation3 import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    N_BUCKETS,
    SEG_WORDS,
    _W_ADD,
    _W_MOD,
    _W_MUL,
    _W_SHIFT,
    maintenance_snapshot_diff,
    pipeline_chunk_documents,
    pipeline_paragraph_dedup,
    text_quality_classifier_linear,
)
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def _doc_texts(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }


def test_paragraph_dedup_totals_and_reassembly(spark, sf_dir):
    rows = pipeline_paragraph_dedup(spark, sf_dir).collect()
    texts = _doc_texts(spark, sf_dir)
    assert len(rows) == len(texts), "every document must report a row"
    # total kept segments == number of distinct segment texts corpus-wide
    distinct_segs = set()
    for text in texts.values():
        ws = text.split(" ")
        for s in range(0, len(ws), SEG_WORDS):
            distinct_segs.add(" ".join(ws[s : s + SEG_WORDS]))
    assert sum(r["n_kept"] for r in rows) == len(distinct_segs)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_segs"]
        assert abs(r["retained_ratio"] - r["n_kept"] / r["n_segs"]) < 1e-3
        # a fully-retained doc reassembles to exactly its original text
        if r["n_kept"] == r["n_segs"]:
            orig = hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()
            assert r["dedup_md5"] == orig
    # non-vacuity: the synthetic corpus repeats segments across docs
    assert any(r["n_kept"] < r["n_segs"] for r in rows)


def test_paragraph_dedup_canonical_is_first_occurrence(spark, sf_dir):
    """The document holding a segment's canonical copy is the lowest
    (doc_id, position) occurrence — recompute on the driver and compare
    per-doc kept counts."""
    texts = _doc_texts(spark, sf_dir)
    canon: dict[str, tuple[int, int]] = {}
    segs_by_doc: dict[int, list[str]] = {}
    for doc_id in sorted(texts):
        ws = texts[doc_id].split(" ")
        segs = [
            " ".join(ws[s : s + SEG_WORDS]) for s in range(0, len(ws), SEG_WORDS)
        ]
        segs_by_doc[doc_id] = segs
        for i, seg in enumerate(segs):
            canon.setdefault(seg, (doc_id, i))
    expected_kept = {
        doc_id: sum(
            1 for i, seg in enumerate(segs) if canon[seg] == (doc_id, i)
        )
        for doc_id, segs in segs_by_doc.items()
    }
    got = {
        r["doc_id"]: r["n_kept"]
        for r in pipeline_paragraph_dedup(spark, sf_dir).collect()
    }
    assert got == expected_kept


def test_chunking_covers_every_token_with_overlap(spark, sf_dir):
    rows = pipeline_chunk_documents(spark, sf_dir).collect()
    texts = _doc_texts(spark, sf_dir)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        n = len(texts[doc_id].split(" "))
        chunks.sort(key=lambda r: r["chunk_idx"])
        # chunk count matches the window/stride formula
        expect = 1 if n <= CHUNK_WORDS else 1 + -(-(n - CHUNK_WORDS) // CHUNK_STRIDE)
        assert len(chunks) == expect
        assert [c["chunk_idx"] for c in chunks] == list(range(expect))
        # full chunks are window-sized; the tail covers the last token
        for c in chunks[:-1]:
            assert c["n_tokens"] == CHUNK_WORDS
        last = chunks[-1]
        assert last["chunk_idx"] * CHUNK_STRIDE + last["n_tokens"] == n
        # recompute one chunk's md5 on the driver
        ws = texts[doc_id].split(" ")
        k = last["chunk_idx"]
        seg = " ".join(ws[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_WORDS])
        assert last["chunk_md5"] == hashlib.md5(seg.encode()).hexdigest()


def test_classifier_matches_pure_python_forward_pass(spark, sf_dir):
    rows = text_quality_classifier_linear(spark, sf_dir).collect()
    texts = _doc_texts(spark, sf_dir)

    def charfold(t: str) -> int:
        h = 7
        for ch in t if t else "\x00":
            h = (h * 31 + (ord(ch) if t else 0)) % 4294967296
        return h

    def weight(t: str) -> int:
        b = charfold(t) % N_BUCKETS
        return (b * _W_MUL + _W_ADD) % _W_MOD - _W_SHIFT

    for r in rows:
        logit = sum(weight(t) for t in texts[r["doc_id"]].split(" "))
        assert r["logit_micros"] == logit
        assert r["keep_label"] == (logit > 0)
    # non-vacuity: a fixed pseudo-weight table must split the corpus
    labels = {r["keep_label"] for r in rows}
    assert labels == {True, False}


def test_snapshot_diff_classes_partition_users(spark, sf_dir):
    rows = maintenance_snapshot_diff(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["user_id"] not in seen, "one row per user"
        seen.add(r["user_id"])
        if r["change_type"] == "insert":
            assert r["old_n_events"] == 0 and r["new_n_events"] > 0
        elif r["change_type"] == "delete":
            assert r["new_n_events"] == 0 and r["old_n_events"] > 0
            assert r["value_micros_delta"] <= 0
        elif r["change_type"] == "unchanged":
            assert r["old_n_events"] == r["new_n_events"]
            assert r["value_micros_delta"] == 0
        else:
            assert r["change_type"] == "changed"
            assert r["old_n_events"] > 0 and r["new_n_events"] > 0
