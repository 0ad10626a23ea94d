"""Physical-plan inspection helpers: the ".explain and iterate" loop as
code. Used by tests to pin plan shape (pushdown reached the scan, joins
broadcast, shuffle counts) so perf regressions fail CI, not prod."""

from .inspect import (
    explain_str, pushed_filters, read_schema_columns,
    count_exchanges, has_broadcast_join, wholestage_codegen_spans,
    execution_metrics, exchange_report,
)
from .caching import pin_scope, release_tracked, track_persist

__all__ = [
    "explain_str", "pushed_filters", "read_schema_columns",
    "count_exchanges", "has_broadcast_join", "wholestage_codegen_spans",
    "execution_metrics", "exchange_report", "track_persist",
    "release_tracked", "pin_scope",
]
