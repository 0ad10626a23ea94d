"""Batch sinks (SURVEY §2.4): file writers, collectors, discard."""

from .files import (
    text_sink, json_sink, csv_sink, parquet_sink, noop_sink_batch,
    stdout_sink, collect_sink, bucketed_table_sink, orc_sink, xml_sink,
)

__all__ = [
    "text_sink", "json_sink", "csv_sink", "parquet_sink", "noop_sink_batch",
    "stdout_sink", "collect_sink", "bucketed_table_sink", "orc_sink",
    "xml_sink",
]
