"""File-backed fake of the JetStream client-adapter API the NATS
connector uses (see sources/nats_jetstream.py for the adapter protocol
and its real nats-py implementation).

JetStream model mirrored: a *stream* persists messages published to its
bound *subjects*; every stored message gets a dense monotonically
increasing stream sequence number; messages can be fetched by sequence
(the replay primitive the connector builds offsets on).
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager


class FakeJetStream:
    """Minimal file-backed JetStream server + adapter in one object."""

    def __init__(self, path: str):
        self.path = path
        if not os.path.exists(path):
            self._write({"streams": {}})

    @contextmanager
    def _locked(self):
        lock = open(self.path + ".lock", "w")
        try:
            fcntl.flock(lock, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
            lock.close()

    def _read(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"streams": {}}

    def _write(self, state: dict):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    # -- admin ----------------------------------------------------------
    def add_stream(self, name: str, subjects: list[str]):
        with self._locked():
            state = self._read()
            state["streams"].setdefault(
                name, {"subjects": subjects, "messages": [], "last_seq": 0})
            self._write(state)

    @staticmethod
    def _matches(pattern: str, subject: str) -> bool:
        """NATS subject matching: '.'-separated tokens, '*' = one token,
        '>' = rest."""
        pt, st = pattern.split("."), subject.split(".")
        for i, tok in enumerate(pt):
            if tok == ">":
                return True
            if i >= len(st) or (tok != "*" and tok != st[i]):
                return False
        return len(pt) == len(st)

    # -- adapter protocol ----------------------------------------------
    def publish(self, subject: str, payload: bytes):
        data = payload.decode("utf-8") if isinstance(payload, bytes) else str(payload)
        with self._locked():
            state = self._read()
            for s in state["streams"].values():
                if any(self._matches(p, subject) for p in s["subjects"]):
                    s["last_seq"] += 1
                    s["messages"].append([s["last_seq"], subject, data])
                    self._write(state)
                    return s["last_seq"]
            raise ValueError(f"no stream bound to subject {subject!r}")

    def last_sequence(self, stream: str) -> int:
        s = self._read()["streams"].get(stream)
        if s is None:
            raise ValueError(f"stream not found: {stream}")
        return s["last_seq"]

    def fetch_range(self, stream: str, start_exclusive: int,
                    end_inclusive: int):
        s = self._read()["streams"].get(stream, {"messages": []})
        for seq, subject, data in s["messages"]:
            if start_exclusive < seq <= end_inclusive:
                yield seq, subject, data.encode("utf-8")

    def close(self):
        pass


def fake_nats_factory(options: dict) -> FakeJetStream:
    path = options.get("fakepath") or options.get("fakePath")
    if not path:
        raise ValueError("fake_nats_factory requires option 'fakePath'")
    return FakeJetStream(path)
