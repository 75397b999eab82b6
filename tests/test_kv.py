"""Versioned-KV semantics: the CAS transition (models1/kv.go:49-67
semantics), shard routing parity, rebalance invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.functions.hashing import (
    fnv32a_py,
    key2shard_col,
    key2shard_py,
)
from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
    kv_cas_replay,
    kv_last_writer_wins,
    rebalance,
)


def test_cas_version_counts_add_up(spark, sf_dir):
    rows = kv_cas_replay(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_ok"] + r["n_errversion"] for r in rows) == ev
    for r in rows:
        # version == number of successful puts (kvraft_test.go:149-153)
        assert r["version"] == r["n_ok"]


def test_cas_single_key_fold():
    """Pure transition check: expected-version matches apply in order;
    mismatches reject (ErrVersion) without touching state."""
    version, value, applied = 0, None, []
    ops = [(0, "a"), (0, "b"), (1, "c"), (5, "d"), (2, "e")]
    for expected, v in ops:
        if expected == version:
            value, version = v, version + 1
            applied.append(v)
    assert applied == ["a", "c", "e"] and version == 3 and value == "e"


def test_last_writer_version_equals_op_count(spark, sf_dir):
    rows = kv_last_writer_wins(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["version"] for r in rows) == ev


def test_shard_col_matches_python(spark):
    keys = [str(i) for i in range(0, 500, 7)] + ["", "42", "999999"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r["key"]: r["shard"]
        for r in df.select("key", key2shard_col(F.col("key")).alias("shard")).collect()
    }
    for k in keys:
        assert got[k] == key2shard_py(k), k


def test_fnv32a_distributes():
    shards = [fnv32a_py(str(i)) % 12 for i in range(1000)]
    assert len(set(shards)) == 12


def test_rebalance_invariant():
    # max load <= min load + 1 after rebalance, all shards assigned
    shards = [None] * 12
    out = rebalance(shards, [1, 2, 3])
    loads = [out.count(g) for g in (1, 2, 3)]
    assert sorted(loads) == [4, 4, 4]
    # join a 4th group: rebalance moves shards, invariant holds
    out2 = rebalance(out, [1, 2, 3, 4])
    loads2 = [out2.count(g) for g in (1, 2, 3, 4)]
    assert max(loads2) <= min(loads2) + 1 and sum(loads2) == 12
    # leave: group 1 gone, its shards redistribute
    out3 = rebalance(out2, [2, 3, 4])
    loads3 = [out3.count(g) for g in (2, 3, 4)]
    assert max(loads3) <= min(loads3) + 1 and sum(loads3) == 12
    assert 1 not in out3


def test_rebalance_deterministic():
    shards = [1, 1, 1, 1, 1, 1, 2, 2, 2, None, None, None]
    assert rebalance(shards, [1, 2, 3]) == rebalance(shards, [1, 2, 3])
