"""File-backed fake of the Pulsar client-adapter API the connector uses
(see sources/pulsar.py for the adapter protocol and its real
pulsar-client implementation).

Pulsar model mirrored: a *topic* is an append-only message log; every
message gets a MessageId that totally orders the topic; a Reader can be
positioned at any MessageId and read forward (the replay primitive the
connector builds offsets on). The fake serializes MessageIds as
``"<ledger>:<entry>"`` strings with a single ledger.
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager


def _mid(entry: int) -> str:
    return f"0:{entry}"


def _entry(mid: str) -> int:
    return int(mid.split(":")[1])


EARLIEST = "0:-1"


class FakePulsarClient:
    def __init__(self, path: str):
        self.path = path
        if not os.path.exists(path):
            self._write({"topics": {}})

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
            return {"topics": {}}

    def _write(self, state: dict):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    # -- adapter protocol ----------------------------------------------
    def publish(self, topic: str, payload: bytes, key: str | None = None) -> str:
        data = payload.decode("utf-8") if isinstance(payload, bytes) else str(payload)
        with self._locked():
            state = self._read()
            t = state["topics"].setdefault(topic, {"messages": []})
            entry = len(t["messages"])
            t["messages"].append([_mid(entry), key, data])
            self._write(state)
            return _mid(entry)

    def last_message_id(self, topic: str) -> str:
        msgs = self._read()["topics"].get(topic, {"messages": []})["messages"]
        return _mid(len(msgs) - 1) if msgs else EARLIEST

    def read_range(self, topic: str, start_exclusive: str, end_inclusive: str):
        lo, hi = _entry(start_exclusive), _entry(end_inclusive)
        msgs = self._read()["topics"].get(topic, {"messages": []})["messages"]
        for mid, key, data in msgs:
            e = _entry(mid)
            if lo < e <= hi:
                yield mid, key, data.encode("utf-8")

    @staticmethod
    def compare_ids(a: str, b: str) -> int:
        return (_entry(a) > _entry(b)) - (_entry(a) < _entry(b))

    def close(self):
        pass


def fake_pulsar_factory(options: dict) -> FakePulsarClient:
    path = options.get("fakepath") or options.get("fakePath")
    if not path:
        raise ValueError("fake_pulsar_factory requires option 'fakePath'")
    return FakePulsarClient(path)
