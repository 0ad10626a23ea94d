"""Structured Streaming layer: stream sources/sinks and custom stateful
operators (running fold/reduce, count-or-time batch) that have no
built-in Spark equivalent."""

from .io import (file_stream_source, rate_source, memory_sink, console_sink,
                 noop_sink, foreach_batch_sink, with_bounded_retry)
from .stateful import (running_fold_stream, count_or_time_batch_stream,
                       running_sum_stream_tws)

__all__ = [
    "file_stream_source", "rate_source", "memory_sink", "console_sink",
    "noop_sink", "foreach_batch_sink", "with_bounded_retry",
    "running_fold_stream", "count_or_time_batch_stream",
]
