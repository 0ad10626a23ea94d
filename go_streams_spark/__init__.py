"""go_streams_spark — PySpark-native engine with the query and
data-processing capabilities of reugn/go-streams, re-expressed Spark-first
(DataFrame / SQL / Catalyst / Structured Streaming).

Pipeline surface mirrors the reference (``Source.via(Flow).to(Sink)``,
``streams.go:25-60``) as a thin fluent layer over lazy DataFrame
transforms; the operator inventory lives in ``operators`` (SURVEY.md §2),
training-data-pipeline ops in ``functions``.
"""

from .api import Flow, Source, Sink, pipeline
from .session import get_spark, load_tables, register_views

__all__ = ["Flow", "Source", "Sink", "pipeline", "get_spark", "load_tables",
           "register_views"]
__version__ = "0.2.0"
