"""Porcupine-lite: a linearizability checker for concurrent versioned-KV
histories — the test-harness analog of the reference's porcupine gate.

The reference checks every concurrent clerk history against a per-key
step model with the porcupine checker
(/root/reference/src/kvtest1/porcupine.go:86-140, model
/root/reference/src/models1/kv.go:26-80).  This module re-implements the
two pieces the repo needs, in plain Python:

- :data:`KV_MODEL` — the versioned-KV step model, matching the repo's
  clerk semantics (operators/kv_client.py): Get observes exactly the
  current (value, version) or ErrNoKey on a missing key; Put applies iff
  the version matches (version 0 creates), and an ``ErrMaybe`` outcome is
  legal in BOTH the applied and the not-applied branch — the search
  decides which linearization point (if any) makes the history legal,
  exactly like the reference model's ErrMaybe handling
  (models1/kv.go:55-63).
- :func:`check_linearizable` — the Wing & Gong search porcupine uses:
  partition by key (linearizability is per-object; models1/kv.go:27-46),
  then DFS over linearization orders where the next op must be minimal
  (no other remaining op returned before it was called), memoizing
  visited (done-set, state) pairs.

Pending operations (``ret is None`` — the client never observed a reply,
e.g. it crashed mid-call) may be linearized at any point after their
call or omitted entirely, and a pending put may take either the applied
or not-applied branch — porcupine's treatment of incomplete history.

This is a test harness, not a Spark operator: histories come from
concurrent ``LossyClerk`` simulations (tests/test_linearizability.py),
sized so the exponential worst case never bites (per-key concurrency in
the tests is small; the memoized search is linear-ish on the
mostly-sequential histories the simulator produces).
"""

from __future__ import annotations

from dataclasses import dataclass

OK = "OK"
ERR_NO_KEY = "ErrNoKey"
ERR_VERSION = "ErrVersion"
ERR_MAYBE = "ErrMaybe"

# per-key model state: (value, version); a missing key is (None, 0)
_INIT = (None, 0)


@dataclass(frozen=True)
class Op:
    """One client operation with its real-time window.

    ``inp``:  ("get", key) or ("put", key, value, version)
    ``out``:  get → (value, version, err); put → (err,); None if pending
    ``call``/``ret``: monotonically comparable timestamps; ``ret`` is
    None for a pending op (call observed, reply never seen).
    """

    client: int
    inp: tuple
    out: tuple | None
    call: int
    ret: int | None


def _step(state: tuple, op: Op) -> list[tuple]:
    """All legal successor states for linearizing ``op`` at ``state``
    (empty list = illegal here).  Mirrors models1/kv.go Step, extended
    with the ErrNoKey arm our server distinguishes from ErrVersion."""
    value, version = state
    kind = op.inp[0]
    if kind == "get":
        if op.out is None:  # pending read observes nothing
            return [state]
        expected = (None, 0, ERR_NO_KEY) if value is None else (value, version, OK)
        return [state] if tuple(op.out) == expected else []
    # put
    _, _key, pval, pver = op.inp
    matches = (pver == 0) if value is None else (pver == version)
    applied = (pval, (version if value is not None else 0) + 1)
    if op.out is None:
        # pending put: either branch may have happened server-side
        return [applied, state] if matches else [state]
    (err,) = tuple(op.out)
    if matches:
        return [applied] if err in (OK, ERR_MAYBE) else []
    miss_err = ERR_NO_KEY if value is None else ERR_VERSION
    return [state] if err in (miss_err, ERR_MAYBE) else []


def _check_partition(ops: list[Op]) -> bool:
    """Wing & Gong DFS over one key's history."""
    n = len(ops)
    completed_mask = 0
    for i, op in enumerate(ops):
        if op.ret is not None:
            completed_mask |= 1 << i
    start = (0, _INIT)
    seen = {start}
    stack = [start]
    while stack:
        mask, state = stack.pop()
        if mask & completed_mask == completed_mask:
            return True
        remaining = [i for i in range(n) if not mask & (1 << i)]
        # the next linearized op must be minimal: no other remaining op
        # returned before it was called (pending ops never constrain)
        first_ret = min(
            (ops[i].ret for i in remaining if ops[i].ret is not None),
            default=None,
        )
        for i in remaining:
            if first_ret is not None and ops[i].call > first_ret:
                continue
            for ns in _step(state, ops[i]):
                node = (mask | (1 << i), ns)
                if node not in seen:
                    seen.add(node)
                    stack.append(node)
    return False


def check_linearizable(history: list[Op]) -> bool:
    """True iff ``history`` has a linearization legal under the
    versioned-KV model.  Partitioned per key (models1/kv.go:27-46)."""
    by_key: dict[str, list[Op]] = {}
    for op in history:
        by_key.setdefault(op.inp[1], []).append(op)
    return all(_check_partition(ops) for ops in by_key.values())
