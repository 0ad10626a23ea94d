"""Physical plan inspection (text-level, stable across Spark 3.5/4.x
formatted-explain output)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read per scan (ReadSchema) — column pruning
    check: a 2-column projection must not read 16 columns."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.
    BroadcastExchange is excluded — it moves only the small side."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"(?<!Broadcast)Exchange ", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans (`*(N)` markers in the simple
    plan) — fewer, wider spans mean fewer pipeline breakers."""
    plan = explain_str(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
