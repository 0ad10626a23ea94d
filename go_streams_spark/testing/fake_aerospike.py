"""File-backed fake of the Aerospike client-adapter API the connector
uses (see sources/aerospike.py for the protocol and its real
``aerospike`` client implementation).

Aerospike model mirrored: records live in a (namespace, set) keyed by a
user key; each record is a bin map plus metadata including the
last-update time (the CDC cursor the reference's polling source filters
on, aerospike/aerospike.go:104-124).
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager


class FakeAerospike:
    def __init__(self, path: str):
        self.path = path
        if not os.path.exists(path):
            self._write({"records": {}, "clock": 0})

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
            return {"records": {}, "clock": 0}

    def _write(self, state: dict):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    @staticmethod
    def _rkey(namespace: str, set_name: str, key: str) -> str:
        return f"{namespace}|{set_name}|{key}"

    # -- adapter protocol ----------------------------------------------
    def put_batch(self, namespace: str, set_name: str,
                  records: list[tuple[str, dict]]):
        """One batched write call (the BatchOperate analogue,
        aerospike/aerospike.go:317-332)."""
        with self._locked():
            state = self._read()
            state["clock"] += 1
            now = state["clock"]
            for key, bins in records:
                state["records"][self._rkey(namespace, set_name, key)] = {
                    "bins": dict(bins), "last_update": now}
            self._write(state)

    def scan(self, namespace: str, set_name: str, since_update: int = 0):
        """Full-set scan, optionally filtered by last-update > cursor
        (ExpLastUpdate, aerospike/aerospike.go:104-124)."""
        prefix = f"{namespace}|{set_name}|"
        for rkey, rec in self._read()["records"].items():
            if rkey.startswith(prefix) and rec["last_update"] > since_update:
                yield rkey[len(prefix):], dict(rec["bins"]), rec["last_update"]

    def max_last_update(self, namespace: str, set_name: str) -> int:
        prefix = f"{namespace}|{set_name}|"
        return max((rec["last_update"]
                    for rkey, rec in self._read()["records"].items()
                    if rkey.startswith(prefix)), default=0)

    def close(self):
        pass


def fake_aerospike_factory(options: dict) -> FakeAerospike:
    path = options.get("fakepath") or options.get("fakePath")
    if not path:
        raise ValueError("fake_aerospike_factory requires option 'fakePath'")
    return FakeAerospike(path)
