"""Property tests for the client-side KV semantics model (the executable
spec for rpc.go's error algebra, client.go's retry/ErrMaybe contract, and
the CAS lock) — mirrors the reference's kvtest-style randomized client
workloads with hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_with_go_spark.operators.kv_client import (
    ERR_MAYBE,
    ERR_NO_KEY,
    ERR_VERSION,
    OK,
    Lock,
    LossyClerk,
    VersionedKV,
)


def test_basic_error_algebra():
    kv = VersionedKV()
    assert kv.get("k") == (None, 0, ERR_NO_KEY)
    assert kv.put("k", "v1", 0) == OK
    assert kv.get("k") == ("v1", 1, OK)
    # version-0 create on an EXISTING key is a version mismatch
    # (server.go:40-44: ErrVersion when versions differ; ErrNoKey is only
    # for nonzero-version puts to absent keys)
    assert kv.put("k", "v2", 0) == ERR_VERSION
    assert kv.put("k", "v2", 2) == ERR_VERSION
    assert kv.put("k", "v2", 1) == OK
    assert kv.get("k") == ("v2", 2, OK)
    assert kv.put("other", "x", 5) == ERR_NO_KEY  # nonzero version, absent


@given(st.lists(st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 6)), max_size=40))
@settings(max_examples=200, deadline=None)
def test_version_equals_successful_puts(ops):
    """Invariant from kvraft_test.go:149-153: a key's version equals the
    number of puts that returned OK."""
    kv = VersionedKV()
    ok_counts: dict[str, int] = {"a": 0, "b": 0}
    for key, version in ops:
        if kv.put(key, f"v{version}", version) == OK:
            ok_counts[key] += 1
    for key, n_ok in ok_counts.items():
        _, version, err = kv.get(key)
        assert version == n_ok
        assert err == (OK if n_ok else ERR_NO_KEY)


@given(st.lists(st.booleans(), max_size=20))
@settings(max_examples=200, deadline=None)
def test_lossy_clerk_errmaybe_only_on_resend(drops):
    """client.go:37-46: retried Put that hits ErrVersion reports ErrMaybe
    (the dropped attempt may have applied); a first-try ErrVersion stays
    ErrVersion; OK always means applied exactly once effectively."""
    server = VersionedKV()
    clerk = LossyClerk(server, drop_pattern=drops)
    got = clerk.put("k", "v", 0)
    value, version, _ = server.get("k")
    if got == OK:
        assert (value, version) == ("v", 1)
    elif got == ERR_MAYBE:
        # ambiguous outcome is only reported when the op actually applied
        # under a dropped reply and the resend saw ErrVersion
        assert (value, version) == ("v", 1)
    else:
        raise AssertionError(f"unexpected first-put result {got}")


def test_errmaybe_surfaces_on_dropped_reply():
    server = VersionedKV()
    clerk = LossyClerk(server, drop_pattern=[True])  # first reply lost
    assert clerk.put("k", "v", 0) == ERR_MAYBE
    assert server.get("k") == ("v", 1, OK)


def test_first_try_errversion_is_not_maybe():
    server = VersionedKV()
    server.put("k", "v0", 0)
    clerk = LossyClerk(server, drop_pattern=[])
    assert clerk.put("k", "v1", 99) == ERR_VERSION


def test_lock_mutual_exclusion():
    server = VersionedKV()
    l1 = Lock(LossyClerk(server), "lk", "client-1")
    l2 = Lock(LossyClerk(server), "lk", "client-2")
    assert l1.try_acquire()
    assert not l2.try_acquire()  # held by client-1
    assert l1.try_acquire()  # re-entrant for the holder
    assert not l2.release()  # non-holder cannot release
    assert l1.release()
    assert l2.try_acquire()  # free again
    assert l2.release()


def test_lock_acquire_with_lossy_network():
    server = VersionedKV()
    lock = Lock(LossyClerk(server, drop_pattern=[False, True]), "lk", "c1")
    assert lock.try_acquire()  # ErrMaybe path resolves via re-read
    assert server.get("lk")[0] == "c1"
