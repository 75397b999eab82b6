"""Versioned-KV semantics (reference Labs 2-5 declared surface) as batch
deterministic replay over the ``events`` table.

Reference model — a key maps to (value, version); ``Put(key, value, ver)``
applies iff ``ver`` equals the key's current version (version 0 creates),
then bumps version by 1; mismatches return ErrVersion (semantics fixed by
src/kvsrv1/server.go:34-44 doc contract and the linearizability model
src/models1/kv.go:49-67; version==numOps invariant per
src/kvraft1/kvraft_test.go:149-153).

Batch translation: an ops log ordered by (ts, event_id) per key, folded
through the CAS transition. Raft/labrpc are NOT ported — a deterministic
total order per key replaces consensus, which is the idiomatic
batch-engine answer (SURVEY.md §1.3).

Scale notes: the fold is applyInPandas over groupBy(key) — one shuffle on
the key, per-key state is O(1), per-key op lists are bounded by per-user
event counts (heavily skewed keys would get AQE skew-split; the fold
itself is streaming-friendly and moves to applyInPandasWithState in
streaming/kv_state.py). The last-writer and shard queries are pure
window/expression plans, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import key2shard_col
from ..registry import query
from ..sources import load_table


def _ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpret events as a KV ops log: key=user_id, value=event_id,
    client-supplied expected version = event_id % 4 (deterministic, so
    both engines derive the identical op stream)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
        (F.col("event_id") % 4).alias("expected"),
        "ts",
        "event_id",
    )


CAS_ORACLE = """
WITH RECURSIVE numbered AS (
  SELECT CAST(user_id AS VARCHAR) AS key,
         CAST(event_id AS VARCHAR) AS value,
         event_id % 4 AS expected,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fold AS (
  SELECT key, 0 AS rn, CAST(NULL AS VARCHAR) AS value, CAST(0 AS BIGINT) AS version,
         CAST(0 AS BIGINT) AS n_ok, CAST(0 AS BIGINT) AS n_errversion
  FROM (SELECT DISTINCT key FROM numbered)
  UNION ALL
  SELECT f.key, f.rn + 1,
         CASE WHEN n.expected = f.version THEN n.value ELSE f.value END,
         CASE WHEN n.expected = f.version THEN f.version + 1 ELSE f.version END,
         f.n_ok + CASE WHEN n.expected = f.version THEN 1 ELSE 0 END,
         f.n_errversion + CASE WHEN n.expected = f.version THEN 0 ELSE 1 END
  FROM fold f JOIN numbered n ON n.key = f.key AND n.rn = f.rn + 1
)
SELECT key, value, version, n_ok, n_errversion
FROM fold
WHERE rn = (SELECT count(*) FROM numbered n2 WHERE n2.key = fold.key)
"""


@query("kv_cas_replay", oracle=CAS_ORACLE)
def kv_cas_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CAS fold per key — the models1/kv.go-style state transition
    applied over the deterministic op order. ErrVersion ops leave state
    unchanged and are counted (the batch analog of the error reply).

    Implementation: gather each key's ops into a time-sorted struct array
    and fold it with a JVM-side ``F.aggregate`` (struct accumulator) —
    the same gather-all shape as the MapReduce reduce contract, with no
    Python/Arrow boundary (an earlier applyInPandas version cost ~3s at
    sf0.1 just in worker+Arrow overhead; this runs in ~0.5s). Per-key op
    lists are bounded by per-user event counts; a pathological hot key
    would stream through applyInPandasWithState instead
    (streaming/kv_state.py)."""
    ops = _ops(spark, sf_dir)
    gathered = ops.groupBy("key").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "expected", "value"))
        ).alias("oplist")
    )
    init = F.struct(
        F.lit(None).cast("string").alias("value"),
        F.lit(0).cast("long").alias("version"),
        F.lit(0).cast("long").alias("n_ok"),
        F.lit(0).cast("long").alias("n_errversion"),
    )

    def step(acc, op):
        applied = F.struct(
            op["value"].alias("value"),
            (acc["version"] + 1).alias("version"),
            (acc["n_ok"] + 1).alias("n_ok"),
            acc["n_errversion"].alias("n_errversion"),
        )
        rejected = F.struct(
            acc["value"].alias("value"),
            acc["version"].alias("version"),
            acc["n_ok"].alias("n_ok"),
            (acc["n_errversion"] + 1).alias("n_errversion"),
        )
        return F.when(op["expected"] == acc["version"], applied).otherwise(rejected)

    return gathered.select(
        "key", F.aggregate("oplist", init, step).alias("st")
    ).select("key", "st.value", "st.version", "st.n_ok", "st.n_errversion")


@query(
    "kv_last_writer_wins",
    oracle="""
    SELECT key, value, version FROM (
      SELECT CAST(user_id AS VARCHAR) AS key,
             CAST(event_id AS VARCHAR) AS value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS version
      FROM events)
    WHERE rn = 1
    """,
)
def kv_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unconditional-put replay: every put succeeds in (ts, event_id)
    order, so final value = last write and version = op count (the
    version==numOps invariant, kvraft_test.go:149-153). Pure window plan —
    no Python, one shuffle."""
    ops = _ops(spark, sf_dir)
    w = W.partitionBy("key").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .withColumn("version", F.count(F.lit(1)).over(W.partitionBy("key")))
        .filter(F.col("rn") == 1)
        .select("key", "value", "version")
    )


@query(
    "kv_shard_distribution",
    oracle="""
    SELECT shard, count(*) AS n_keys FROM (
      SELECT (list_reduce(
                list_prepend(CAST(2166136261 AS BIGINT),
                             list_transform(string_split(key, ''),
                                            c -> CAST(ord(c) AS BIGINT))),
                (h, b) -> (xor(h, b) * 16777619) % 4294967296)) % 12 AS shard
      FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events))
    GROUP BY shard
    """,
)
def kv_shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key2Shard parity: FNV-32a % 12 (shardcfg.go:29-34) as a JVM-side
    expression fold, grouped into the per-shard key census the shard
    controller's balance logic consumes."""
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("key")).distinct()
    return (
        keys.select(key2shard_col(F.col("key")).alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


@query(
    "kv_get_lookup",
    oracle="""
    WITH state AS (
      SELECT key, value, version FROM (
        SELECT CAST(user_id AS VARCHAR) AS key,
               CAST(event_id AS VARCHAR) AS value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS version
        FROM events)
      WHERE rn = 1),
    req AS (SELECT * FROM (VALUES ('1'), ('7'), ('42'), ('no-such-key')) r(key))
    SELECT req.key AS key, state.value AS value,
           coalesce(state.version, 0) AS version,
           CASE WHEN state.key IS NULL THEN 'ErrNoKey' ELSE 'OK' END AS err
    FROM req LEFT JOIN state ON req.key = state.key
    """,
)
def kv_get_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Get(key) -> (value, version, err) point lookups against the
    replayed store: present keys return OK, absent keys ErrNoKey with
    version 0 (rpc.go:31-39 error algebra). Batch form of the clerk's
    read path; the requested-keys side broadcasts."""
    state = kv_last_writer_wins(spark, sf_dir)
    req = spark.createDataFrame(
        [("1",), ("7",), ("42",), ("no-such-key",)], "key string"
    )
    s = state.select(
        F.col("key").alias("skey"), "value", F.col("version").alias("sversion")
    )
    return (
        F.broadcast(req)
        .join(s, req.key == s.skey, "left")
        .select(
            "key",
            "value",
            F.coalesce("sversion", F.lit(0)).alias("version"),
            F.when(F.col("skey").isNull(), "ErrNoKey").otherwise("OK").alias("err"),
        )
    )


# --------------------------------------------------------------------------
# Shard config management (reference: shardcfg.go Rebalance/Join/Leave) —
# cluster-control logic, not a query; pure functions, property-tested.
# --------------------------------------------------------------------------
def rebalance(shards: list[int | None], groups: list[int]) -> list[int]:
    """Greedy shard rebalance to the reference's declared invariant:
    max load ≤ min load + 1, unassigned shards to the least-loaded group
    (semantics per src/shardkv1/shardcfg/shardcfg.go:122-154; implemented
    from the spec, not the code). ``shards[i]`` is the owning group id or
    None; ``groups`` is the live group list. Deterministic: ties break by
    lowest group id."""
    if not groups:
        raise ValueError("no groups")
    live = sorted(set(groups))
    load: dict[int, list[int]] = {g: [] for g in live}
    unassigned: list[int] = []
    for i, g in enumerate(shards):
        if g in load:
            load[g].append(i)
        else:
            unassigned.append(i)

    def least() -> int:
        return min(live, key=lambda g: (len(load[g]), g))

    def most() -> int:
        return max(live, key=lambda g: (len(load[g]), -g))

    for i in unassigned:
        load[least()].append(i)
    while len(load[most()]) > len(load[least()]) + 1:
        src, dst = most(), least()
        load[dst].append(load[src].pop(0))
    out: list[int] = [0] * len(shards)
    for g, idxs in load.items():
        for i in idxs:
            out[i] = g
    return out


class ShardConfig:
    """Numbered shard-to-group configuration with ``join``/``leave``
    config changes — the C7 control-plane surface (semantics per
    src/shardkv1/shardcfg/shardcfg.go:155-221, re-expressed from the
    spec: Join rejects a re-joining gid and server overlap with existing
    groups, Leave rejects an absent gid, every accepted change bumps
    ``num`` by exactly one, and the *_balance variants then call
    ``rebalance``).  Pure driver-side metadata — the data motion it
    implies is the Spark repartition exercised by kv_shard_distribution."""

    NSHARDS = 12  # shardcfg.go NShards

    def __init__(self, nshards: int = NSHARDS) -> None:
        self.num = 0
        self.groups: dict[int, list[str]] = {}
        # gid 0 = unassigned (the reference's zero group).
        self.shards: list[int] = [0] * nshards

    def join(self, servers: dict[int, list[str]]) -> bool:
        """Add new groups; False on re-join, ValueError on a server
        appearing in two groups (the reference's Fatalf)."""
        changed = False
        for gid, srvs in servers.items():
            if gid in self.groups:
                return False
            for xgid, xsrvs in self.groups.items():
                overlap = set(xsrvs) & set(srvs)
                if overlap:
                    raise ValueError(
                        f"join({gid}) puts server {sorted(overlap)[0]!r} "
                        f"in groups {xgid} and {gid}"
                    )
            self.groups[gid] = list(srvs)
            changed = True
        if not changed:
            raise ValueError("join with no groups")
        self.num += 1
        return True

    def leave(self, gids: list[int]) -> bool:
        changed = False
        for gid in gids:
            if gid not in self.groups:
                return False
            del self.groups[gid]
            changed = True
        if not changed:
            raise ValueError("leave with no groups")
        self.num += 1
        return True

    def _rebalance(self) -> None:
        if not self.groups:
            self.shards = [0] * len(self.shards)
            return
        self.shards = rebalance(self.shards, sorted(self.groups))

    def join_balance(self, servers: dict[int, list[str]]) -> bool:
        if not self.join(servers):
            return False
        self._rebalance()
        return True

    def leave_balance(self, gids: list[int]) -> bool:
        if not self.leave(gids):
            return False
        self._rebalance()
        return True

    def gid_servers(self, shard: int) -> tuple[int, list[str]]:
        gid = self.shards[shard]
        return gid, self.groups.get(gid, [])


class ShardGroup:
    """One replica group's shard store with the C8 migration protocol —
    Freeze/Install/DeleteShard (semantics per
    src/shardkv1/shardgrp/shardrpc/shardrpc.go:8-37 and the handler
    contracts in src/shardkv1/shardgrp/server.go:49-66, re-expressed from
    the spec): every migration RPC carries the config Num; a group
    rejects RPCs staler than the newest Num it has seen for that shard
    (the at-most-once guard across config changes), a frozen shard
    rejects Get/Put with ErrWrongGroup, and Freeze is idempotent at the
    same Num (the controller may retry).

    Control-plane twin of the Spark data motion: at scale each "shard" is
    a partition of the versioned-KV table and freeze/install/delete are
    metadata operations over partitioned storage (the bytes never visit a
    driver) — kv_shard_distribution + the partition-scoped MERGE tests
    cover that path; this class pins the protocol's rejection rules."""

    def __init__(self, gid: int, owned: set[int] | None = None) -> None:
        self.gid = gid
        self.state: dict[str, tuple[str, int]] = {}
        self.owned: set[int] = set(owned or ())
        self.frozen: set[int] = set()
        self.num_seen: dict[int, int] = {}

    def _shard(self, key: str) -> int:
        from ..functions.hashing import key2shard_py

        return key2shard_py(key)

    # -- client ops ------------------------------------------------------
    def get(self, key: str) -> tuple[str | None, int, str]:
        sh = self._shard(key)
        if sh not in self.owned or sh in self.frozen:
            return None, 0, "ErrWrongGroup"
        if key not in self.state:
            return None, 0, "ErrNoKey"
        value, version = self.state[key]
        return value, version, "OK"

    def put(self, key: str, value: str, version: int) -> str:
        sh = self._shard(key)
        if sh not in self.owned or sh in self.frozen:
            return "ErrWrongGroup"
        cur = self.state.get(key)
        if cur is None:
            if version != 0:
                return "ErrNoKey"
            self.state[key] = (value, 1)
            return "OK"
        if version != cur[1]:
            return "ErrVersion"
        self.state[key] = (value, cur[1] + 1)
        return "OK"

    # -- migration RPCs --------------------------------------------------
    def freeze_shard(self, shard: int, num: int) -> tuple[dict | None, str]:
        if num < self.num_seen.get(shard, 0):
            return None, "ErrStale"
        self.num_seen[shard] = num
        if shard not in self.owned:
            return None, "ErrWrongGroup"
        self.frozen.add(shard)
        snap = {k: v for k, v in self.state.items() if self._shard(k) == shard}
        return snap, "OK"

    def install_shard(self, shard: int, state: dict, num: int) -> str:
        if num < self.num_seen.get(shard, 0):
            return "ErrStale"
        self.num_seen[shard] = num
        self.state.update(state)
        self.owned.add(shard)
        self.frozen.discard(shard)
        return "OK"

    def delete_shard(self, shard: int, num: int) -> str:
        if num < self.num_seen.get(shard, 0):
            return "ErrStale"
        self.num_seen[shard] = num
        self.state = {
            k: v for k, v in self.state.items() if self._shard(k) != shard
        }
        self.owned.discard(shard)
        self.frozen.discard(shard)
        return "OK"


def migrate_shard(src: ShardGroup, dst: ShardGroup, shard: int, num: int) -> str:
    """Controller-side migration (the shardctrler's ChangeConfigTo step,
    src/shardkv1/shardgrp/client.go:31-44 call order): freeze at the
    source, install at the destination, delete at the source.  Each leg
    is individually retry-safe (stale Nums rejected), so a crashed
    controller can re-run the whole sequence."""
    snap, err = src.freeze_shard(shard, num)
    if err != "OK":
        return err
    err = dst.install_shard(shard, snap, num)
    if err != "OK":
        return err
    return src.delete_shard(shard, num)


# --------------------------------------------------------------------------
# Consistent-hash ring vs mod-N routing under a shard-count change — the
# quantified version of WHY the reference freezes/installs/deletes whole
# shards on reconfiguration (shardcfg.go's fixed NShards sidesteps this;
# a system that changed N directly would reshuffle nearly every key under
# mod-N, while a ring moves ~1/(N+1) of them).
# --------------------------------------------------------------------------
_RING_N_OLD = 12
_RING_N_NEW = 13
_RING_VNODES = 8


def _ring_points(n_shards: int) -> list[tuple[int, int]]:
    """(shard_id, ring_point) for n_shards x VNODES virtual nodes; points
    are FNV-32a of the vnode label, so the first N_OLD shards' points are
    IDENTICAL in both epochs — the property that bounds movement."""
    from ..functions.hashing import fnv32a_py

    return [
        (sid, fnv32a_py(f"s{sid}r{j}"))
        for sid in range(n_shards)
        for j in range(_RING_VNODES)
    ]


def _ring_movement_oracle() -> str:
    def values(points):
        return ", ".join(f"({sid}, {p})" for sid, p in points)

    ring_cte = """
    {name} AS (
      SELECT key, sid FROM (
        SELECT k.key, r.sid,
               row_number() OVER (PARTITION BY k.key
                 ORDER BY (r.point - k.h + 4294967296) % 4294967296,
                          r.point, r.sid) AS rn
        FROM keys k CROSS JOIN {ring} r)
      WHERE rn = 1)"""
    return f"""
    WITH keys AS (
      SELECT key,
             list_reduce(
               list_prepend(CAST(2166136261 AS BIGINT),
                            list_transform(string_split(key, ''),
                                           c -> CAST(ord(c) AS BIGINT))),
               (h, b) -> (xor(h, b) * 16777619) % 4294967296) AS h
      FROM (SELECT DISTINCT CAST(event_id AS VARCHAR) AS key FROM events)),
    ring_old(sid, point) AS (VALUES {values(_ring_points(_RING_N_OLD))}),
    ring_new(sid, point) AS (VALUES {values(_ring_points(_RING_N_NEW))}),
    {ring_cte.format(name="asg_old", ring="ring_old")},
    {ring_cte.format(name="asg_new", ring="ring_new")},
    ring_stat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN o.sid <> n.sid THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved
      FROM asg_old o JOIN asg_new n ON n.key = o.key),
    mod_stat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN h % {_RING_N_OLD} <> h % {_RING_N_NEW}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      FROM keys)
    SELECT 'mod' AS strategy, n_keys, n_moved,
           round(n_moved * 1.0 / n_keys, 4) AS moved_frac FROM mod_stat
    UNION ALL
    SELECT 'ring', n_keys, n_moved,
           round(n_moved * 1.0 / n_keys, 4) FROM ring_stat
    """


@query("kv_consistent_hash_movement", oracle=_ring_movement_oracle())
def kv_consistent_hash_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key movement when the shard count grows {o} -> {n}, mod-N routing
    vs a consistent-hash ring ({v} virtual nodes per shard, FNV-32a
    points): mod-N remaps ~(1 - 1/N) of all keys, the ring only the keys
    whose forward-distance successor changed (~1/(N+1)) — measured
    exactly on the engine's own key population.

    Ring lookup is formulated without wraparound special-casing: the
    owner of key h is its SUCCESSOR on the ring — the smallest point
    >= h, wrapping to the globally smallest point — looked up in a
    sorted literal array per row (r13 optimization, guide §2.3/§2.4:
    the previous keys x ring crossJoin blew every key up 104x and paid
    a hash-agg argmin re-exchange for the same answer; the array
    lookup is pure map-side projection, so the only exchange left is
    the key distinct).
    """.format(o=_RING_N_OLD, n=_RING_N_NEW, v=_RING_VNODES)
    from ..functions.hashing import fnv32a_col

    # event_id keys: the larger population (vs ~150 user ids, whose
    # short-numeric-string FNV hashes cluster enough that the new
    # shard's 8 ring arcs can catch zero of them)
    keys = (
        load_table(spark, sf_dir, "events")
        .select(F.col("event_id").cast("string").alias("key"))
        .distinct()
        .select("key", fnv32a_col(F.col("key")).alias("h"))
    )

    # The old epoch's points are a strict subset of the new epoch's
    # (shards 0..N_OLD-1 keep their vnodes), so both owners come from
    # the same point population filtered two ways.  All ring points
    # are distinct (asserted below), so for a fixed key the successor
    # point alone identifies the owner; each point is encoded as
    # point*256 + sid (sid < 256), which keeps the array a primitive
    # long array and makes `enc >= h*256` exactly `point >= h`, so one
    # sorted array serves both the successor search and sid recovery.
    points = _ring_points(_RING_N_NEW)
    assert len({p for _, p in points}) == len(points)
    # the *256 encoding reserves 8 bits for the shard id — a wider
    # shard count needs a wider encoding (and a larger literal array
    # would eventually warrant a broadcast lookup table instead)
    assert _RING_N_NEW < 256, "sid must fit the 8-bit point*256+sid encoding"

    def _enc_sorted(pred):
        return sorted(p * 256 + sid for sid, p in points if pred(sid))

    enc_new = _enc_sorted(lambda s: True)
    enc_old = _enc_sorted(lambda s: s < _RING_N_OLD)

    def _owner(enc):
        arr = F.array(*[F.lit(v) for v in enc])
        succ = F.try_element_at(
            F.filter(arr, lambda x: x >= F.col("h") * 256), F.lit(1)
        )
        return F.coalesce(succ, F.lit(enc[0])) % 256

    assigned = keys.select(
        "key",
        _owner(enc_old).cast("int").alias("sid_old"),
        _owner(enc_new).cast("int").alias("sid_new"),
    )
    moved = F.sum(F.when(F.col("sid_old") != F.col("sid_new"), 1).otherwise(0))
    ring_stat = assigned.agg(
        F.count(F.lit(1)).alias("n_keys"),
        moved.cast("long").alias("n_moved"),
    ).select(
        F.lit("ring").alias("strategy"), "n_keys", "n_moved",
        F.round(F.col("n_moved") * 1.0 / F.col("n_keys"), 4).alias("moved_frac"),
    )
    mod_moved = F.sum(
        F.when(F.col("h") % _RING_N_OLD != F.col("h") % _RING_N_NEW, 1).otherwise(0)
    )
    mod_stat = keys.agg(
        F.count(F.lit(1)).alias("n_keys"),
        mod_moved.cast("long").alias("n_moved"),
    ).select(
        F.lit("mod").alias("strategy"), "n_keys", "n_moved",
        F.round(F.col("n_moved") * 1.0 / F.col("n_keys"), 4).alias("moved_frac"),
    )
    return mod_stat.unionByName(ring_stat)
