"""Invariant tests for BPE merge learning (operators/vocab.py): the
merge table must match a plain-Python BPE trainer run on the same word
distribution, and the token-count curve must shrink by exactly the
merged-pair count at each step."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.vocab import (
    _BPE_BOUND,
    vocab_bpe_merges,
)

SF = "/root/testdata/sf0.001"


def _python_bpe(word_counts: dict[str, int], steps: int):
    """Reference BPE trainer: leftmost-nonoverlapping pair fusion."""
    seqs = {w: tuple(w) for w in word_counts}
    merges = []
    for _ in range(steps):
        pc: collections.Counter = collections.Counter()
        for w, syms in seqs.items():
            cnt = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += cnt
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        new_seqs = {}
        for w, syms in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
        tokens = sum(word_counts[w] * len(s) for w, s in seqs.items())
        merges.append((a, b, n, tokens))
    return merges


def test_bpe_matches_python_trainer(spark):
    rows = vocab_bpe_merges(spark, SF).orderBy("step").collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < _BPE_BOUND)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    wc = {r["w"]: r["count"] for r in docs}
    want = _python_bpe(wc, 3)
    assert len(rows) == 3
    for r, (a, b, n, tokens) in zip(rows, want):
        assert (r["sym_a"], r["sym_b"], r["pair_count"]) == (a, b, n)
        assert r["corpus_tokens_after"] == tokens
    # each fusion removes exactly pair_count symbols (leftmost
    # non-overlap counts ARE the fused occurrences)
    base = sum(wc[w] * len(w) for w in wc)
    prev = base
    for r in rows:
        # fused occurrences <= pair count seen before the merge, and the
        # curve is consistent: tokens_after = tokens_before - n_fused
        n_fused = prev - r["corpus_tokens_after"]
        assert 0 < n_fused <= r["pair_count"]
        prev = r["corpus_tokens_after"]


def test_bpe_apply_consistent_with_merges(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators.vocab import (
        vocab_bpe_apply,
    )

    rows = vocab_bpe_apply(spark, SF).collect()
    assert rows
    for r in rows:
        # fusing never grows a word and at best halves it per merge step
        assert r["tokens_after"] <= r["tokens_before"]
        assert r["tokens_after"] >= r["n_words"]  # >= one symbol per word
        assert 0 < r["compression"] <= 1.0
    # corpus-wide: the doc-level accounting must reproduce the learning
    # chain's corpus_tokens_after on the shared slice
    import pyspark.sql.functions as F

    from mit_6_5840_mapreduce_with_go_spark.operators.vocab import (
        _BPE_BOUND,
        vocab_bpe_merges,
    )

    final_total = (
        vocab_bpe_merges(spark, SF)
        .orderBy("step")
        .collect()[-1]["corpus_tokens_after"]
    )
    # recompute over the full learning slice (the report slice is a
    # subset, so compare totals on the same bound)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < _BPE_BOUND)
    )
    # apply's vocab covers every word in the slice: summing n_after over
    # all word instances equals the chain's corpus total
    from mit_6_5840_mapreduce_with_go_spark.operators.vocab import _learn

    state, _ = _learn(spark, f"{SF}")
    vocab = state.select(
        "w", (F.size(F.split("seq", "\x1f")) - F.lit(2)).alias("n_after")
    )
    total = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .join(vocab, "w")
        .agg(F.sum("n_after"))
        .first()[0]
    )
    assert total == final_total


def test_bpe_roundtrip_lossless(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.vocab import (
        vocab_bpe_roundtrip,
    )

    r = vocab_bpe_roundtrip(spark, sf_dir).collect()[0]
    assert r["all_lossless"] is True
    assert r["n_corrupted"] == 0
    assert r["n_lossless"] == r["n_vocab_words"] > 0
    # 3 merges can grow a symbol to at most 4 chars (1+1 -> 2 -> 3 -> 4)
    assert 2 <= r["max_symbol_len"] <= 4
    assert r["n_symbols"] > 0
