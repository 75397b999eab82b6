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


# --------------------------------------------------------------------------
# C7 config changes: ShardConfig.join/leave property tests mirroring the
# reference's JoinBalance/LeaveBalance contract (shardcfg.go:155-221).
# --------------------------------------------------------------------------
def _balance_ok(cfg):
    loads = [cfg.shards.count(g) for g in cfg.groups]
    return (not cfg.groups) or max(loads) <= min(loads) + 1


def test_shardcfg_join_leave_example():
    from mit_6_5840_mapreduce_with_go_spark.operators.kv import ShardConfig

    cfg = ShardConfig()
    assert cfg.join_balance({1: ["s1a", "s1b"]})
    assert cfg.num == 1 and set(cfg.shards) == {1}
    assert cfg.join_balance({2: ["s2a"], 3: ["s3a"]})
    assert cfg.num == 2 and _balance_ok(cfg)
    # re-join is rejected without a num bump or state change
    before = (cfg.num, list(cfg.shards), dict(cfg.groups))
    assert not cfg.join_balance({2: ["other"]})
    assert (cfg.num, cfg.shards, cfg.groups) == before
    # server overlap across groups is a hard error
    import pytest

    with pytest.raises(ValueError):
        cfg.join({9: ["s1a"]})
    # leave of an absent gid is rejected; a real leave bumps num once
    assert not cfg.leave_balance([42])
    assert cfg.leave_balance([1, 2])
    assert cfg.num == 3 and set(cfg.shards) == {3} and _balance_ok(cfg)
    # last group leaves -> all shards unassigned (gid 0)
    assert cfg.leave_balance([3])
    assert set(cfg.shards) == {0}


def test_shardcfg_property_random_churn():
    """Random join/leave churn: after every accepted *_balance op the
    reference's invariants hold — balance max<=min+1, all shards owned by
    live groups, config number bumps exactly once per accepted change and
    never otherwise (monotonic history)."""
    import random

    from mit_6_5840_mapreduce_with_go_spark.operators.kv import ShardConfig

    rng = random.Random(65840)
    for _trial in range(25):
        cfg = ShardConfig()
        next_gid = 1
        for _step in range(30):
            num_before = cfg.num
            if cfg.groups and rng.random() < 0.4:
                gone = rng.sample(sorted(cfg.groups), rng.randint(1, len(cfg.groups)))
                assert cfg.leave_balance(gone)
                assert cfg.num == num_before + 1
                assert not cfg.leave_balance(gone)  # double-leave rejected
                assert cfg.num == num_before + 1
            else:
                gids = list(range(next_gid, next_gid + rng.randint(1, 3)))
                next_gid += len(gids)
                assert cfg.join_balance({g: [f"srv-{g}-{i}" for i in range(2)] for g in gids})
                assert cfg.num == num_before + 1
            assert _balance_ok(cfg)
            if cfg.groups:
                assert set(cfg.shards) <= set(cfg.groups)
                # every live group owns at least one shard when groups <= shards
                if len(cfg.groups) <= len(cfg.shards):
                    assert set(cfg.shards) == set(cfg.groups)
            else:
                assert set(cfg.shards) == {0}


# --------------------------------------------------------------------------
# C8 shard migration: Freeze/Install/DeleteShard protocol properties
# (shardrpc.go:8-37, server.go:49-66 contracts).
# --------------------------------------------------------------------------
def test_shard_migration_basic_and_frozen_writes():
    from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
        ShardGroup,
        migrate_shard,
    )

    src, dst = ShardGroup(1, set(range(12))), ShardGroup(2)
    keys = [str(i) for i in range(200)]
    for k in keys:
        assert src.put(k, f"v{k}", 0) == "OK"
    shard = src._shard(keys[0])
    # freeze rejects writes mid-migration
    snap, err = src.freeze_shard(shard, 1)
    assert err == "OK" and len(snap) > 0
    frozen_key = next(iter(snap))
    assert src.put(frozen_key, "x", 1) == "ErrWrongGroup"
    assert src.get(frozen_key)[2] == "ErrWrongGroup"
    # complete the migration (re-freeze at same num is idempotent)
    assert migrate_shard(src, dst, shard, 1) == "OK"
    # every key readable from exactly one group, values intact
    for k in keys:
        vs, vr, es = src.get(k)
        vd, _, ed = dst.get(k)
        assert (es == "OK") != (ed == "OK")
        assert (vs if es == "OK" else vd) == f"v{k}"
    # stale replays are rejected without state change
    assert src.freeze_shard(shard, 0) == (None, "ErrStale")
    assert dst.delete_shard(shard, 0) == "ErrStale"
    assert dst.get(frozen_key)[2] == "OK"


def test_shard_migration_random_churn_conserves_keys():
    """Random migrations between 3 groups with interleaved CAS writes and
    stale-replay attacks: no key is ever lost or duplicated, versions
    only advance, and every accepted write happened on the sole owner."""
    import random

    from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
        ShardGroup,
        migrate_shard,
    )

    rng = random.Random(65840)
    groups = {1: ShardGroup(1, set(range(12))), 2: ShardGroup(2), 3: ShardGroup(3)}
    owner = {sh: 1 for sh in range(12)}
    keys = [str(i) for i in range(300)]
    expected: dict[str, tuple[str, int]] = {}
    for k in keys:
        assert groups[1].put(k, "v0", 0) == "OK"
        expected[k] = ("v0", 1)
    num = 0
    for _ in range(120):
        if rng.random() < 0.5:
            # migrate a random shard to a random other group
            sh = rng.randrange(12)
            src = groups[owner[sh]]
            dst = groups[rng.choice([g for g in groups if g != owner[sh]])]
            num += 1
            assert migrate_shard(src, dst, sh, num) == "OK"
            owner[sh] = dst.gid
            # stale replay of an older migration must be a no-op
            assert src.freeze_shard(sh, num - 1) == (None, "ErrStale")
        else:
            k = rng.choice(keys)
            g = groups[owner[groups[1]._shard(k)]]
            val, ver = expected[k]
            newv = f"v{rng.randrange(1000)}"
            assert g.put(k, newv, ver) == "OK"
            assert g.put(k, "conflict", ver) == "ErrVersion"  # CAS holds
            expected[k] = (newv, ver + 1)
    for k, (val, ver) in expected.items():
        owners = [g for g in groups.values() if g.get(k)[2] == "OK"]
        assert len(owners) == 1
        assert owners[0].get(k) == (val, ver, "OK")


def test_consistent_hash_movement_contrast(spark, sf_dir):
    """Growing 12 -> 13 shards: mod-N must remap ~(1 - 1/13) of keys;
    the ring only the keys inside the new shard's arcs (a small
    fraction, and strictly fewer than mod)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
        kv_consistent_hash_movement,
    )

    rows = {r["strategy"]: r for r in kv_consistent_hash_movement(spark, sf_dir).collect()}
    mod, ring = rows["mod"], rows["ring"]
    assert mod["n_keys"] == ring["n_keys"] > 0
    assert abs(mod["moved_frac"] - (1 - 1 / 13)) < 0.02
    assert 0 < ring["n_moved"] < mod["n_moved"]
    assert ring["moved_frac"] < 0.15


def test_ring_assignment_matches_python_model(spark, sf_dir):
    """The Spark hash-agg argmin ring lookup equals the direct python
    successor search for every key (spot population)."""
    from mit_6_5840_mapreduce_with_go_spark.functions.hashing import fnv32a_py
    from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
        _RING_N_NEW,
        _ring_points,
    )

    ring = _ring_points(_RING_N_NEW)

    def owner(h):
        return min(ring, key=lambda sp: ((sp[1] - h) % 2**32, sp[1], sp[0]))[0]

    # distance formulation == successor-with-wraparound formulation
    pts = sorted(ring, key=lambda sp: (sp[1], sp[0]))
    for h in [0, 1, 2**31, 2**32 - 1] + [fnv32a_py(str(k)) for k in range(50)]:
        succ = next((sp for sp in pts if sp[1] >= h), pts[0])
        assert owner(h) == succ[0]
