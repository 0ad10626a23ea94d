"""WebSocket source/sink as a Spark Python Data Source.

Reference semantics being reproduced (websocket/web_socket.go):

- ``Source`` (web_socket.go:33,65-95): dial the URL, read frames,
  emit ``Message{MsgType, Payload}``.
- ``Sink`` (web_socket.go:120,152-180): write each element as a frame
  with a configurable message type (Text/Binary).

Spark-first shape: a WebSocket has no server-side replay — a frame not
read while connected is gone, so the source is **at-most-once**, like
the reference. The faithful Spark construct is a driver-side reader
(``SimpleDataSourceStreamReader``): connect once, drain pending frames
each trigger, keep a bounded in-memory tail so an uncommitted
micro-batch can be replayed within the process lifetime (the same shape
as the Redis Pub/Sub source). This is a control-plane/low-throughput
source by construction; high-throughput ingestion belongs on a
replayable log (Kafka/JetStream/Redis streams).

Adapter protocol (injected via ``clientFactory``): ``connect(url)``
returning a connection with ``recv(timeout) -> (msg_type, bytes) |
None``, ``send(payload, msg_type)``, ``close()``. The default adapter
uses the real ``websockets`` sync client; tests inject the file-backed
FakeWebSocketServer.
"""

from __future__ import annotations

import importlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

WEBSOCKET_SOURCE_NAME = "gss_websocket"
WEBSOCKET_SCHEMA = "msg_type int, payload binary"

TEXT_MESSAGE = 1
BINARY_MESSAGE = 2


class WebsocketsAdapter:
    """Real adapter over the ``websockets`` sync client."""

    def __init__(self, options: dict):
        try:
            from websockets.sync import client  # noqa: F401
        except ImportError as e:  # pragma: no cover - depends on env
            raise ImportError(
                "WebSocket connector requires the 'websockets' library "
                "(pip install websockets), or pass clientFactory pointing at "
                "a compatible adapter builder") from e

    def connect(self, url: str):
        from websockets.sync import client

        class _Conn:
            def __init__(self):
                self._ws = client.connect(url)

            def recv(self, timeout: float = 0.0):
                try:
                    frame = self._ws.recv(timeout=timeout)
                except TimeoutError:
                    return None
                if isinstance(frame, str):
                    return TEXT_MESSAGE, frame.encode("utf-8")
                return BINARY_MESSAGE, bytes(frame)

            def send(self, payload: bytes, msg_type: int = TEXT_MESSAGE):
                if msg_type == TEXT_MESSAGE:
                    self._ws.send(payload.decode("utf-8", "replace"))
                else:
                    self._ws.send(payload)

            def close(self):
                self._ws.close()

        return _Conn()


def resolve_adapter_factory(options: dict):
    spec = options.get("clientfactory")
    if spec:
        mod, _, fn = spec.partition(":")
        return getattr(importlib.import_module(mod), fn)
    return WebsocketsAdapter


def _url(options: dict) -> str:
    u = options.get("url")
    if not u:
        raise ValueError("WebSocket connector requires option 'url'")
    return u


class WebSocketStreamReader(SimpleDataSourceStreamReader):
    """Driver-side frame reader; offsets count frames consumed since
    connect. Committed prefix is trimmed; uncommitted ranges replay from
    the in-memory tail; across restarts delivery is at-most-once."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.url = _url(self.options)
        self._conn = None
        self._buffer: list[tuple] = []
        self._base = 0

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_conn"] = None
        return state

    def _c(self):
        if self._conn is None:
            self._conn = resolve_adapter_factory(
                self.options)(self.options).connect(self.url)
        return self._conn

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _drain(self):
        conn = self._c()
        while True:
            frame = conn.recv(timeout=0.01)
            if frame is None:
                break
            self._buffer.append(frame)

    def read(self, start: dict):
        self._drain()
        lo = max(start["n"] - self._base, 0)
        rows = self._buffer[lo:]
        return iter(rows), {"n": self._base + len(self._buffer)}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = max(start["n"] - self._base, 0)
        hi = end["n"] - self._base
        return iter(self._buffer[lo:hi])

    def commit(self, end: dict):
        keep = end["n"] - self._base
        if keep > 0:
            self._buffer = self._buffer[keep:]
            self._base = end["n"]


class _FrameCommit(WriterCommitMessage):
    def __init__(self, rows: int):
        self.rows = rows


class WebSocketStreamWriter(DataSourceStreamWriter):
    """Frame writer (web_socket.go:152-180): each row's ``payload`` is
    sent as one frame; ``msg_type`` column (or ``messageType`` option)
    selects Text(1)/Binary(2)."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.url = _url(self.options)
        self.default_type = int(self.options.get(
            "messagetype", str(TEXT_MESSAGE)))

    def write(self, iterator):
        conn = resolve_adapter_factory(self.options)(self.options).connect(self.url)
        n = 0
        try:
            for row in iterator:
                d = row.asDict()
                payload = d.get("payload", d.get("value", d.get("data")))
                if payload is None:
                    payload = b""
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                elif isinstance(payload, (bytearray, memoryview)):
                    payload = bytes(payload)
                conn.send(payload, int(d.get("msg_type") or self.default_type))
                n += 1
        finally:
            conn.close()
        return _FrameCommit(n)

    def commit(self, messages, batchId):
        pass

    def abort(self, messages, batchId):
        pass


class WebSocketDataSource(DataSource):
    """``format("gss_websocket")`` — options: ``url``, ``messageType``
    (sink default frame type), ``clientFactory`` injection hook."""

    @classmethod
    def name(cls):
        return WEBSOCKET_SOURCE_NAME

    def schema(self):
        return WEBSOCKET_SCHEMA

    def simpleStreamReader(self, schema):
        return WebSocketStreamReader(self.options)

    def streamWriter(self, schema, overwrite):
        return WebSocketStreamWriter(self.options)


def register_websocket_source(spark) -> str:
    spark.dataSource.register(WebSocketDataSource)
    return WEBSOCKET_SOURCE_NAME
