"""Differential tests for the generic MapReduce surface — mirrors the
reference's test strategy (src/main/test-mr.sh): distributed output must
equal the sequential oracle's (mrsequential.go), compared as sorted line
sets (test-mr.sh:103-110)."""

from __future__ import annotations

from pyspark import SparkContext

from mit_6_5840_mapreduce_with_go_spark.mapreduce import (
    fnv32a,
    run_mapreduce,
    run_mapreduce_sequential,
)
from mit_6_5840_mapreduce_with_go_spark.mapreduce.engine import run_mapreduce_to_dir
from mit_6_5840_mapreduce_with_go_spark.mapreduce.apps import (
    documents_as_files,
    early_exit_map,
    early_exit_reduce,
    indexer_map,
    indexer_reduce,
    jobcount_map,
    jobcount_reduce,
    nocrash_map,
    nocrash_reduce,
    tokenize,
    wc_combine,
    wc_map,
    wc_reduce,
)

FILES = [
    ("doc-a", "the quick brown fox the fox"),
    ("doc-b", "jumps over the lazy dog"),
    ("doc-c", "the dog barks. The fox runs!"),
    ("doc-d", ""),
]


def test_tokenize_parity():
    # case-sensitive, unicode letters only (src/mrapps/wc.go:19-24)
    assert tokenize("The fox-dog ran 42 laps; héllo_wörld") == [
        "The", "fox", "dog", "ran", "laps", "héllo", "wörld",
    ]


def test_wc_differential(spark):
    got = run_mapreduce(spark, wc_map, wc_reduce, FILES)
    want = run_mapreduce_sequential(wc_map, wc_reduce, FILES)
    assert got == want
    assert "the 4" in got  # case-sensitive: 'The' counted separately
    assert "The 1" in got


def test_wc_combine_fast_path_same_output(spark):
    slow = run_mapreduce(spark, wc_map, wc_reduce, FILES)
    fast = run_mapreduce(spark, wc_map, wc_reduce, FILES, combine_fn=wc_combine)
    assert fast == slow


def test_indexer_differential(spark):
    got = run_mapreduce(spark, indexer_map, indexer_reduce, FILES)
    want = run_mapreduce_sequential(indexer_map, indexer_reduce, FILES)
    assert got == want
    # 'fox' appears in doc-a and doc-c exactly once each (dedup per doc)
    assert "fox 2 doc-a,doc-c" in got


def test_nocrash_differential(spark):
    got = run_mapreduce(spark, nocrash_map, nocrash_reduce, FILES)
    want = run_mapreduce_sequential(nocrash_map, nocrash_reduce, FILES)
    assert got == want
    assert any(line.startswith("d xyzzy") for line in got)


def test_early_exit_differential(spark):
    got = run_mapreduce(spark, early_exit_map, early_exit_reduce, FILES)
    want = run_mapreduce_sequential(early_exit_map, early_exit_reduce, FILES)
    assert got == want


def test_jobcount_exactly_once(spark):
    """jobcount parity (src/mrapps/jobcount.go + test-mr.sh:213-221): with
    no failures each map task runs exactly once — counted via accumulator
    instead of the reference's pid marker files."""
    sc: SparkContext = spark.sparkContext
    acc = sc.accumulator(0)

    def counting_map(f: str, c: str):
        acc.add(1)
        return jobcount_map(f, c)

    out = run_mapreduce(spark, counting_map, jobcount_reduce, FILES)
    assert acc.value == len(FILES)
    assert out == [f"a {len(FILES)}"]


def test_parallelism_probe(spark):
    """mtiming/rtiming analog: the job must actually run with >= 2
    concurrent task slots (reference asserts >= 2 workers alive,
    src/mrapps/mtiming.go)."""
    assert spark.sparkContext.defaultParallelism >= 2
    dist = spark.sparkContext.parallelize(range(100), 8).map(
        lambda _: __import__("pyspark").TaskContext.get().partitionId()
    ).distinct().count()
    assert dist >= 2


def test_fnv32a_golden():
    # FNV-32a reference vectors (public: RFC draft / fnv.h test suite)
    assert fnv32a("") == 2166136261 & 0x7FFFFFFF
    h = 2166136261
    for b in b"a":
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    assert fnv32a("a") == h & 0x7FFFFFFF


def test_to_dir_output_matches_collect(spark, tmp_path):
    """Distributed text-file output == in-memory lines (sorted-set
    compare, the test-mr.sh contract); files land under nReduce parts."""
    out = str(tmp_path / "mr-out")
    run_mapreduce_to_dir(spark, wc_map, wc_reduce, FILES, out)
    from_files = sorted(
        line
        for p in __import__("pathlib").Path(out).glob("part-*")
        for line in p.read_text().splitlines()
    )
    assert from_files == run_mapreduce(spark, wc_map, wc_reduce, FILES)


def test_randomized_corpus_differential(spark):
    """Seeded random corpus (mixed case, unicode letters, punctuation,
    digits, empty docs): distributed output == sequential oracle for all
    three data apps — the test-mr-many.sh flake-sweep analog, determinized."""
    import random

    rng = random.Random(1234)
    vocab = ["Alpha", "beta", "Gamma", "δέλτα", "epsilon-7", "zeta_9", "η", "THE", "the"]
    seps = [" ", "  ", ", ", ".\n", "42", "_", "--"]
    files = []
    for i in range(24):
        n = rng.randint(0, 60)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(seps))
        files.append((f"rnd-{i}", "".join(parts)))
    for map_fn, reduce_fn in [
        (wc_map, wc_reduce),
        (indexer_map, indexer_reduce),
        (nocrash_map, nocrash_reduce),
    ]:
        got = run_mapreduce(spark, map_fn, reduce_fn, files)
        want = run_mapreduce_sequential(map_fn, reduce_fn, files)
        assert got == want


def test_on_documents_corpus(spark, sf_dir):
    """wc over the real documents corpus: distributed == sequential."""
    files = documents_as_files(spark, sf_dir, limit=50)
    got = run_mapreduce(spark, wc_map, wc_reduce, files)
    want = run_mapreduce_sequential(wc_map, wc_reduce, files)
    assert got == want and len(got) > 10


def test_gutenberg_corpus_differential(spark):
    """wc + indexer on the reference's OWN input corpus — the 8 Project
    Gutenberg books that src/main/test-mr.sh:87-96 feeds to every MapReduce
    correctness run (pg-*.txt, ~3.3 MB of real mixed-case/punctuated text).
    Distributed output must equal the sequential oracle as a sorted line
    set (the test-mr.sh:103-110 compare), closing the last tokenizer-parity
    doubt that synthetic corpora can't: real-text unicode and punctuation
    edge cases."""
    import pathlib

    books = sorted(pathlib.Path("/root/reference/src/main").glob("pg-*.txt"))
    assert len(books) == 8, "reference Gutenberg corpus not found"
    files = [(p.name, p.read_text(encoding="utf-8")) for p in books]

    got_wc = run_mapreduce(spark, wc_map, wc_reduce, files)
    want_wc = run_mapreduce_sequential(wc_map, wc_reduce, files)
    assert got_wc == want_wc
    # Real-text sanity: a large vocabulary, and 'the' is the usual top word.
    assert len(got_wc) > 10_000
    the = [line for line in got_wc if line.startswith("the ")]
    assert len(the) == 1 and int(the[0].split()[1]) > 10_000

    got_ix = run_mapreduce(spark, indexer_map, indexer_reduce, files)
    want_ix = run_mapreduce_sequential(indexer_map, indexer_reduce, files)
    assert got_ix == want_ix
    # 'the' appears in all 8 books.
    the_ix = [line for line in got_ix if line.startswith("the ")]
    assert len(the_ix) == 1 and the_ix[0].split()[1] == "8"
