"""Porcupine-lite gate: concurrent LossyClerk histories must be
linearizable under the versioned-KV model; deliberately illegal
histories must be rejected.

Mirrors the reference's porcupine check over concurrent clerk histories
(/root/reference/src/kvtest1/porcupine.go:86-140) with the labrpc-style
lossy channel (10%-ish reply drops → ErrMaybe ambiguity,
/root/reference/src/labrpc/labrpc.go:241-252)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_with_go_spark.operators.kv_client import (
    ERR_MAYBE,
    ERR_NO_KEY,
    ERR_VERSION,
    OK,
    VersionedKV,
)
from mit_6_5840_mapreduce_with_go_spark.operators.linearizability import (
    Op,
    check_linearizable,
)


def _client_script(cid: int, keys: list[str], n_rounds: int):
    """Generator clerk: read the key, then CAS at the observed version
    (the read-modify-write loop that makes interleavings conflict)."""
    for r in range(n_rounds):
        key = keys[(cid + r) % len(keys)]
        _val, ver, _err = yield ("get", key)
        yield ("put", key, f"c{cid}r{r}", ver)


def simulate(
    seed: int,
    n_clients: int = 3,
    keys: tuple[str, ...] = ("a", "b"),
    n_rounds: int = 4,
    drop_prob: float = 0.25,
    max_steps: int | None = None,
) -> list[Op]:
    """Micro-step interleaving of concurrent clerks over ONE sequential
    VersionedKV with a lossy reply channel.  Each server application is
    atomic at a distinct clock tick inside the op's [call, ret] window,
    so the produced history is linearizable by construction — with
    genuine ErrMaybe ambiguity when a put's reply drops and the resend
    sees ErrVersion.  ``max_steps`` cuts the run mid-flight, leaving
    pending ops (ret=None), porcupine's incomplete-history case."""
    rng = random.Random(seed)
    server = VersionedKV()
    clock = 0
    history: list[Op] = []
    gens = {c: _client_script(c, list(keys), n_rounds) for c in range(n_clients)}
    intents = {}
    for c, g in gens.items():
        intents[c] = g.send(None)
    # in-flight op state per client: (intent, call, first_attempt)
    inflight: dict[int, tuple] = {}
    steps = 0
    while intents or inflight:
        if max_steps is not None and steps >= max_steps:
            break
        steps += 1
        active = list(set(intents) | set(inflight))
        c = rng.choice(active)
        if c not in inflight:
            inflight[c] = (intents.pop(c), clock, True)
            clock += 1
            continue
        intent, call, first = inflight[c]
        kind = intent[0]
        # one atomic server application
        if kind == "get":
            reply = server.get(intent[1])
        else:
            reply = server.put(intent[1], intent[2], intent[3])
        clock += 1
        if rng.random() < drop_prob:  # reply lost; op stays in flight
            inflight[c] = (intent, call, False)
            continue
        if kind == "put" and reply == ERR_VERSION and not first:
            reply = ERR_MAYBE
        ret = clock
        clock += 1
        del inflight[c]
        out = tuple(reply) if kind == "get" else (reply,)
        history.append(Op(client=c, inp=intent, out=out, call=call, ret=ret))
        try:
            intents[c] = gens[c].send(reply)
        except StopIteration:
            pass
    # anything still in flight is pending: call seen, reply never observed
    for c, (intent, call, _first) in inflight.items():
        history.append(Op(client=c, inp=intent, out=None, call=call, ret=None))
    return history


@settings(deadline=None, max_examples=30)
@given(st.integers(min_value=0, max_value=10_000))
def test_simulated_concurrent_histories_are_accepted(seed):
    assert check_linearizable(simulate(seed))


@settings(deadline=None, max_examples=15)
@given(st.integers(min_value=0, max_value=10_000))
def test_heavy_drop_histories_are_accepted(seed):
    # labrpc-ish worst case: half the replies vanish → ErrMaybe everywhere
    assert check_linearizable(simulate(seed, drop_prob=0.5))


@settings(deadline=None, max_examples=15)
@given(st.integers(min_value=0, max_value=10_000))
def test_truncated_histories_with_pending_ops_are_accepted(seed):
    assert check_linearizable(simulate(seed, max_steps=25))


def test_sequential_history_accepted():
    server = VersionedKV()
    hist, t = [], 0
    for i in range(5):
        err = server.put("k", f"v{i}", i)
        hist.append(Op(0, ("put", "k", f"v{i}", i), (err,), t, t + 1))
        t += 2
        val, ver, err = server.get("k")
        hist.append(Op(0, ("get", "k"), (val, ver, err), t, t + 1))
        t += 2
    assert check_linearizable(hist)


def test_stale_read_rejected():
    hist = [
        Op(0, ("put", "k", "a", 0), (OK,), 0, 1),
        Op(1, ("get", "k"), (None, 0, ERR_NO_KEY), 2, 3),
    ]
    assert not check_linearizable(hist)


def test_double_create_both_ok_rejected():
    # concurrent version-0 puts cannot BOTH return OK
    hist = [
        Op(0, ("put", "k", "x", 0), (OK,), 0, 3),
        Op(1, ("put", "k", "y", 0), (OK,), 1, 4),
    ]
    assert not check_linearizable(hist)


def test_wrong_version_read_rejected():
    hist = [
        Op(0, ("put", "k", "a", 0), (OK,), 0, 1),
        Op(1, ("get", "k"), ("a", 2, OK), 2, 3),
    ]
    assert not check_linearizable(hist)


def test_errmaybe_applied_branch_accepted():
    # reply-dropped create: the server DID apply it; the read must see it
    hist = [
        Op(0, ("put", "k", "x", 0), (ERR_MAYBE,), 0, 1),
        Op(1, ("get", "k"), ("x", 1, OK), 2, 3),
    ]
    assert check_linearizable(hist)


def test_errmaybe_applied_branch_enforced():
    # ...and a read claiming it did NOT apply is illegal: with version 0
    # matching the initial state, ErrMaybe can only linearize as applied
    hist = [
        Op(0, ("put", "k", "x", 0), (ERR_MAYBE,), 0, 1),
        Op(1, ("get", "k"), (None, 0, ERR_NO_KEY), 2, 3),
    ]
    assert not check_linearizable(hist)


def test_errmaybe_not_applied_branch_accepted():
    # a racing create took version 0 first; the ErrMaybe put never landed
    hist = [
        Op(0, ("put", "k", "y", 0), (OK,), 0, 1),
        Op(1, ("put", "k", "x", 0), (ERR_MAYBE,), 2, 3),
        Op(2, ("get", "k"), ("y", 1, OK), 4, 5),
    ]
    assert check_linearizable(hist)


def test_pending_put_may_or_may_not_apply():
    # crashed client: its create is pending — both observations are legal
    applied = [
        Op(0, ("put", "k", "x", 0), None, 0, None),
        Op(1, ("get", "k"), ("x", 1, OK), 2, 3),
    ]
    absent = [
        Op(0, ("put", "k", "x", 0), None, 0, None),
        Op(1, ("get", "k"), (None, 0, ERR_NO_KEY), 2, 3),
    ]
    assert check_linearizable(applied)
    assert check_linearizable(absent)


def test_real_time_order_is_enforced_across_clients():
    # put completed before a later put started; versions force an order
    # that contradicts real time → illegal
    hist = [
        Op(0, ("put", "k", "a", 0), (OK,), 0, 1),
        Op(1, ("put", "k", "b", 1), (OK,), 2, 3),
        Op(2, ("get", "k"), ("a", 1, OK), 4, 5),
    ]
    assert not check_linearizable(hist)
