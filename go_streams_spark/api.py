"""Fluent pipeline API: ``Source.via(Flow).via(Flow).to(Sink)``.

Mirrors the reference composition surface (reugn/go-streams
``streams.go:25-60``: Source one-output, Flow in+out, Sink one-input,
``Via``/``To`` wiring) but is **lazy**: a pipeline is a composed chain of
DataFrame -> DataFrame functions; nothing executes until a Sink action or
``.to_df()`` consumer forces it. Where the reference spawns a goroutine per
operator and pushes elements over channels (``flow/util.go:11-19``), here
Catalyst fuses the chain into whole-stage-codegen stages and the shuffle
boundaries are the only "channels".
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame


class Flow:
    """A lazy DataFrame transform, composable with ``via``.

    Reference analogue: ``streams.Flow`` (``streams.go:36-46``).
    """

    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str = "flow"):
        self.fn = fn
        self.name = name

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def via(self, other: "Flow") -> "Flow":
        return Flow(lambda df: other(self.fn(df)), name=f"{self.name}->{other.name}")

    def __repr__(self) -> str:  # pragma: no cover
        return f"Flow({self.name})"


class Source:
    """A pipeline head: wraps a DataFrame (batch or streaming).

    Reference analogue: ``streams.Source`` (``streams.go:25-30``); its
    ``Via`` pump (``flow/util.go:11-19``) becomes lazy composition.
    """

    def __init__(self, df: DataFrame, name: str = "source"):
        self._df = df
        self.name = name

    @classmethod
    def from_df(cls, df: DataFrame, name: str = "source") -> "Source":
        return cls(df, name)

    def via(self, flow: Flow) -> "Source":
        return Source(flow(self._df), name=f"{self.name}->{flow.name}")

    def to_df(self) -> DataFrame:
        return self._df

    def to(self, sink: "Sink"):
        """Terminal: run the sink action. Blocks like ``AwaitCompletion()``
        (``streams.go:52-60``) — for streaming sinks this starts the query
        and returns the StreamingQuery handle."""
        return sink(self._df)

    # convenience pass-throughs so pipelines read naturally
    def explain(self, mode: str = "formatted"):
        return self._df.explain(mode)


class Sink:
    """A terminal action on a DataFrame.

    Reference analogue: ``streams.Sink`` (``streams.go:52-60``).
    """

    def __init__(self, fn: Callable[[DataFrame], object], name: str = "sink"):
        self.fn = fn
        self.name = name

    def __call__(self, df: DataFrame):
        return self.fn(df)


def pipeline(df: DataFrame, *flows: Flow) -> DataFrame:
    """Functional shorthand: apply flows in order, return the final DF."""
    for f in flows:
        df = f(df)
    return df
