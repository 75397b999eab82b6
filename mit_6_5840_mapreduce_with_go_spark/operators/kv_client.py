"""Client-side versioned-KV semantics: the error algebra, retry protocol,
and the CAS-derived lock — the reference's declared Lab 2 surface
re-expressed as pure, property-testable Python.

Semantics fixed by the reference's specs (implemented from the doc
contracts, not the code — the handlers are unimplemented skeletons):
- error algebra OK | ErrNoKey | ErrVersion (server) + ErrMaybe (client):
  src/kvsrv1/rpc/rpc.go:5-17
- Put(key, value, version): apply iff version matches; version 0
  creates: src/kvsrv1/server.go:34-44 doc comments
- retry protocol: client retries forever on network failure; an
  ErrVersion on a RESEND surfaces as ErrMaybe (the first attempt may
  have been applied — outcome ambiguous): src/kvsrv1/client.go:37-46
- lock: mutual exclusion from CAS alone, lock-holder identity in the
  value: src/kvsrv1/lock/lock.go:21-33 shape

These model objects are the executable spec the batch replay
(operators/kv.py) and streaming state machine (streaming/kv_state.py)
are tested against.
"""

from __future__ import annotations

from dataclasses import dataclass, field

OK = "OK"
ERR_NO_KEY = "ErrNoKey"
ERR_VERSION = "ErrVersion"
ERR_MAYBE = "ErrMaybe"


@dataclass
class VersionedKV:
    """Single-node versioned KV server model: key -> (value, version)."""

    data: dict[str, tuple[str, int]] = field(default_factory=dict)

    def get(self, key: str) -> tuple[str | None, int, str]:
        if key not in self.data:
            return None, 0, ERR_NO_KEY
        value, version = self.data[key]
        return value, version, OK

    def put(self, key: str, value: str, version: int) -> str:
        if key not in self.data:
            if version == 0:
                self.data[key] = (value, 1)
                return OK
            return ERR_NO_KEY
        _, cur = self.data[key]
        if version != cur:
            return ERR_VERSION
        self.data[key] = (value, cur + 1)
        return OK


@dataclass
class LossyClerk:
    """Client retry protocol over a lossy request/reply channel.

    ``drop_pattern`` is a deterministic schedule: drop_pattern[i] True
    means the i-th network send loses the REPLY (the request may still
    have been applied — exactly the ambiguity ErrMaybe encodes)."""

    server: VersionedKV
    drop_pattern: list[bool] = field(default_factory=list)
    _sends: int = 0

    def _lossy_call(self, fn, *args):
        dropped = self._sends < len(self.drop_pattern) and self.drop_pattern[self._sends]
        self._sends += 1
        result = fn(*args)  # server always processes; only the reply drops
        return None if dropped else result

    def get(self, key: str) -> tuple[str | None, int, str]:
        while True:
            reply = self._lossy_call(self.server.get, key)
            if reply is not None:
                return reply  # Get is read-only: plain retry, no ambiguity

    def put(self, key: str, value: str, version: int) -> str:
        first_attempt = True
        while True:
            reply = self._lossy_call(self.server.put, key, value, version)
            if reply is None:
                first_attempt = False
                continue
            if reply == ERR_VERSION and not first_attempt:
                # the lost attempt may have applied this exact put —
                # outcome unknowable (client.go:37-46 contract)
                return ERR_MAYBE
            return reply


@dataclass
class Lock:
    """Mutual exclusion from CAS alone (lock.go:21-33 shape): the lock
    key's value holds the owner id; acquire spins on create-or-check."""

    clerk: LossyClerk | VersionedKV
    lock_key: str
    client_id: str

    def _put_owns(self, version: int) -> bool:
        """CAS-put our id at ``version``; on ErrMaybe re-read to learn
        whether the ambiguous attempt actually installed us."""
        got = self.clerk.put(self.lock_key, self.client_id, version)
        if got == OK:
            return True
        if got == ERR_MAYBE:
            value, _, _ = self.clerk.get(self.lock_key)
            return value == self.client_id
        return False

    def try_acquire(self) -> bool:
        value, version, err = self.clerk.get(self.lock_key)
        if err == ERR_NO_KEY:
            return self._put_owns(0)
        if value == "":  # released
            return self._put_owns(version)
        return value == self.client_id  # re-entrant: already held by us

    def release(self) -> bool:
        value, version, err = self.clerk.get(self.lock_key)
        if err != OK or value != self.client_id:
            return False
        return self.clerk.put(self.lock_key, "", version) in (OK, ERR_MAYBE)
