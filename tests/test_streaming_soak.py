"""Rate-source soak (VERDICT r9 #7): the CAS, space-saving
heavy-hitter, and first-seen dedup operators run CONCURRENTLY from one
session against a live rate source for ~1 minute (the stream==batch
equality suites elsewhere use tiny file micro-batches).  Asserts:

- state-store rows stay bounded by the key space for every query (the
  100 TB/day property: state ~ keys, not ~ input);
- each operator's final state equals its batch/replica twin computed
  over EXACTLY the prefix the query committed.  Prefix lengths are
  derived from the operators' own cumulative counters (CAS: per-key
  op totals are monotone, so max-per-key aggregation of the update-mode
  sink is exact; space-saving: every arrival nets +1 to its bucket's
  counter sum, so the final tables sum to the arrivals), not from
  progress events — no stop()-vs-progress race, and the rate source
  feeds contiguous value ranges so a committed prefix is [0, M).

~60s wall-clock by design (a soak, not a unit test)."""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.streaming.heavy_hitters import (
    CAPACITY,
    N_BUCKETS,
    heavy_hitters_stream,
    spacesaving_reference,
)
from mit_6_5840_mapreduce_with_go_spark.streaming.kv_state import kv_cas_stream

_K = 120  # distinct users; > CAPACITY*N_BUCKETS so eviction is constant
_RPS = 2000
_SOAK_SEC = 60


def _rate_events(spark):
    """Events-shaped stream from the rate source: value v becomes
    (event_id=v, user_id=v%K, ts=us(v)) — deterministic, so batch twins
    replay any committed prefix exactly."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", _RPS)
        .option("numPartitions", 4)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.pmod(F.col("value"), F.lit(_K)).alias("user_id"),
            F.timestamp_micros(F.col("value")).alias("ts"),
            F.lit("soak").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
    )


def _cas_replica(m: int) -> dict[str, tuple]:
    st: dict[str, list] = {}
    for v in range(m):
        key = str(v % _K)
        s = st.setdefault(key, [None, 0, 0, 0])  # value, version, ok, err
        if v % 4 == s[1]:
            s[0], s[1], s[2] = str(v), s[1] + 1, s[2] + 1
        else:
            s[3] += 1
    return {k: tuple(v) for k, v in st.items()}


def test_soak_concurrent_stateful_operators(spark, tmp_path):
    # hh sink: keep only the LAST emission per bucket (each emission is
    # that bucket's full cumulative table) — driver-side, tiny rows
    hh_tables: dict[int, dict[int, tuple[int, int]]] = {}
    hh_lock = threading.Lock()

    def hh_sink(batch_df, batch_id):
        rows = batch_df.collect()
        by_bucket: dict[int, dict[int, tuple[int, int]]] = {}
        for r in rows:
            by_bucket.setdefault(r["bucket"], {})[r["key"]] = (
                r["count"],
                r["err"],
            )
        with hh_lock:
            hh_tables.update(by_bucket)

    queries = {}
    try:
        # 2s triggers: a soak wants steady sustained batches, not the
        # hundreds of 50ms micro-batches the default trigger produces
        queries["cas"] = (
            kv_cas_stream(_rate_events(spark))
            .writeStream.format("memory")
            .queryName("soak_cas")
            .outputMode("update")
            .trigger(processingTime="2 seconds")
            .start()
        )
        queries["hh"] = (
            heavy_hitters_stream(_rate_events(spark))
            .writeStream.foreachBatch(hh_sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
            .trigger(processingTime="2 seconds")
            .start()
        )
        queries["dedup"] = (
            _rate_events(spark)
            .dropDuplicates(["user_id"])
            .writeStream.format("memory")
            .queryName("soak_dedup")
            .outputMode("append")
            .trigger(processingTime="2 seconds")
            .start()
        )
        deadline = time.time() + _SOAK_SEC
        while time.time() < deadline:
            for name, q in queries.items():
                assert q.isActive, (name, q.exception())
            time.sleep(2)
        # state-size bound per query, from the engine's own accounting:
        # rows ~ keys, never ~ input
        bounds = {"cas": _K, "hh": N_BUCKETS, "dedup": _K}
        for name, q in queries.items():
            prog = q.lastProgress
            assert prog is not None, f"{name}: no batch committed in soak"
            ops = prog["stateOperators"]
            assert ops, name
            rows_total = ops[0]["numRowsTotal"]
            assert 0 < rows_total <= bounds[name], (name, rows_total)
    finally:
        for q in queries.values():
            q.stop()

    # --- CAS final state == plain-Python fold over the committed prefix.
    # Per-key counters are monotone cumulative, and a key absent from a
    # later batch had no ops in it, so max-per-key over the update-mode
    # sink IS the final state; their op sums give the exact prefix M.
    cas_rows = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in spark.table("soak_cas")
        .groupBy("key")
        .agg(
            F.max_by("value", F.col("version")).alias("value"),
            F.max("version").alias("version"),
            F.max("n_ok").alias("n_ok"),
            F.max("n_errversion").alias("n_errversion"),
        )
        .collect()
    }
    assert len(cas_rows) == _K
    m_cas = sum(v[2] + v[3] for v in cas_rows.values())
    assert m_cas >= _RPS * _SOAK_SEC // 4, "soak processed too little to be a soak"
    assert cas_rows == _cas_replica(m_cas)

    # --- heavy hitters: final per-bucket tables == space-saving replica
    # over the hh query's own committed prefix (sum of final counters ==
    # arrivals, since every arrival nets exactly +1 to its bucket's sum)
    with hh_lock:
        final = {
            b * 10**9 + k: ce
            for b, tbl in hh_tables.items()
            for k, ce in tbl.items()
        }
        m_hh = sum(c for tbl in hh_tables.values() for c, _ in tbl.values())
    assert m_hh >= _RPS * _SOAK_SEC // 4
    ref = spacesaving_reference(
        [((u % _K) % N_BUCKETS, u % _K) for u in range(m_hh)]
    )
    assert final == ref
    for b in range(N_BUCKETS):
        assert len(hh_tables.get(b, {})) <= CAPACITY

    # --- dedup: first-seen per user == values 0..K-1 exactly (every
    # user's first event lands in the first K values by construction)
    ded = {r["user_id"]: r["event_id"] for r in spark.table("soak_dedup").collect()}
    assert ded == {u: u for u in range(_K)}
