"""Operator inventory (SURVEY.md §2) — Spark-first implementations."""

from .core import Map, FlatMap, Filter, PassThrough, Flatten
from .aggregate import running_reduce, running_fold, running_fold_py, final_reduce
from .batch import batch_by_count, batch_by_time, collect_batches
from .windows import tumbling_window, sliding_window, session_window, keyed
from .topology import split, fan_out, round_robin, merge, zip_with, cpu_widen
from .throttle import throttle_options, discard_over_quota

__all__ = [
    "Map", "FlatMap", "Filter", "PassThrough", "Flatten",
    "running_reduce", "running_fold", "running_fold_py", "final_reduce",
    "batch_by_count", "batch_by_time", "collect_batches",
    "tumbling_window", "sliding_window", "session_window", "keyed",
    "split", "fan_out", "round_robin", "merge", "zip_with", "cpu_widen",
    "throttle_options", "discard_over_quota",
]
from .topology import distributed_ordinal, zip_with_distributed  # noqa: E402
__all__ += ["distributed_ordinal", "zip_with_distributed"]
from .joins import asof_join  # noqa: E402
__all__ += ["asof_join"]
from .aggregate import salted_agg  # noqa: E402
__all__ += ["salted_agg"]
from .joins import interval_join  # noqa: E402
__all__ += ["interval_join"]
from .layout import zorder_sorted, zorder_key  # noqa: E402
__all__ += ["zorder_sorted", "zorder_key"]
