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


def execution_metrics(df) -> dict:
    """Aggregate runtime metrics from an EXECUTED DataFrame's physical
    plan: rows output/scanned, shuffle bytes written/read, spill bytes,
    files read. Run an action on ``df`` first (collect/count/noop write
    on the same instance), then call this — the numbers are what the
    perf docs cite (shuffle volume is THE scale currency).

    Walks the adaptive plan (AdaptiveSparkPlan -> executedPlan,
    QueryStage -> plan, ReusedExchange -> child) and sums named metric
    counters by key."""
    node = df._jdf.queryExecution().executedPlan()
    totals: dict[str, int] = {}

    def unwrap(n):
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            return n.executedPlan()
        if "QueryStage" in name:
            return n.plan()
        return None

    def walk(n):
        u = unwrap(n)
        if u is not None:
            walk(u)
            return
        m = n.metrics()
        it = m.keysIterator()
        while it.hasNext():
            k = it.next()
            try:
                v = m.apply(k).value()
            except Exception:
                continue
            totals[k] = totals.get(k, 0) + int(v)
        for i in range(n.children().size()):
            walk(n.children().apply(i))

    walk(node)
    interesting = {
        "numOutputRows": "rows_output",
        "shuffleBytesWritten": "shuffle_bytes_written",
        "localBytesRead": "shuffle_local_bytes_read",
        "remoteBytesRead": "shuffle_remote_bytes_read",
        "spillSize": "spill_bytes",
        "numFiles": "files_read",
        "filesSize": "file_bytes",
    }
    out = {alias: totals[k] for k, alias in interesting.items() if k in totals}
    out["all_metrics"] = totals
    return out


def single_partition_exchange_rows(df) -> list[int]:
    """Rows entering each SinglePartition shuffle Exchange of an
    EXECUTED DataFrame (run an action on the same instance first).

    This is the scale audit for "WindowExec: No Partition Defined"
    warnings: a SinglePartition exchange is fine when its input is
    k-bounded (top-k per partition via WindowGroupLimit/TakeOrdered) or
    grid-sized (per-partition counts, hour grids) and fatal when it is
    data-sized. The returned list lets tests assert the bound instead
    of trusting a code comment. ReusedExchange nodes are skipped (their
    rows are counted at the original exchange)."""
    out: list[int] = []

    def walk(n):
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(n.executedPlan())
            return
        if "QueryStage" in name:
            walk(n.plan())
            return
        if name == "Exchange" and \
                n.outputPartitioning().toString() == "SinglePartition":
            m = n.metrics()
            try:
                out.append(int(m.apply("shuffleRecordsWritten").value()))
            except Exception:
                out.append(-1)  # metric missing: flag, don't hide
        for i in range(n.children().size()):
            walk(n.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def nested_loop_build_rows(df) -> list[int]:
    """Rows on the BUILD (broadcast) side of each BroadcastNestedLoopJoin
    in an EXECUTED DataFrame's plan, plus a -1 sentinel for any
    CartesianProduct. A nested-loop join is fine when the broadcast side
    is scalar metadata (a bounds row, a vocab count) and fatal when it
    is data-sized; this reads the actual broadcast row count so tests
    can assert the bound."""
    out: list[int] = []

    def walk(n):
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(n.executedPlan())
            return
        if "QueryStage" in name:
            walk(n.plan())
            return
        if name == "CartesianProduct":
            out.append(-1)
        if name == "BroadcastNestedLoopJoin":
            # the build side is a BroadcastExchange somewhere below one
            # child, usually wrapped in InputAdapter/BroadcastQueryStage
            def find_bx(m):
                mn = m.nodeName()
                if "QueryStage" in mn:
                    return find_bx(m.plan())
                if mn == "BroadcastExchange":
                    return m
                if mn == "ReusedExchange":
                    # a broadcast shared by two consumers (e.g. one
                    # scalar bounds row cross-joined twice) plans the
                    # second use as a leaf ReusedExchange — follow it
                    # to the original exchange for the row metric
                    try:
                        return find_bx(m.child())
                    except Exception:
                        return None
                for j in range(m.children().size()):
                    r = find_bx(m.children().apply(j))
                    if r is not None:
                        return r
                return None

            try:
                build_right = "BuildRight" in n.buildSide().toString()
            except Exception:
                build_right = True
            child = n.children().apply(1 if build_right else 0)
            bx = find_bx(child)
            if bx is None:
                out.append(-1)  # undetected build side: flag, don't hide
            else:
                try:
                    out.append(int(
                        bx.metrics().apply("numOutputRows").value()))
                except Exception:
                    out.append(-1)
        for i in range(n.children().size()):
            walk(n.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def exchange_report(df: DataFrame) -> list[dict]:
    """One entry per shuffle Exchange in the physical plan: the
    partitioning kind (hash / range / single / round-robin), the key
    expressions, and the declared partition count — the "where does
    this job shuffle, and on what" explainer behind every shuffle-
    minimization decision in SCALE.md. BroadcastExchange is excluded
    (it moves only the small side).

    Parsed from the simple plan text (stable across Spark 3.x/4.x:
    `Exchange <kind>(<args>)`); cached-subtree ECHOES inside
    InMemoryRelation definitions are skipped, so entries reflect work
    the query itself schedules, not the cache's build recipe.
    """
    plan = explain_str(df, "simple")
    out = []
    in_cache_echo = False
    for line in plan.splitlines():
        # InMemoryRelation prints its build plan indented beneath it;
        # everything until the next top-level node is an echo
        if "InMemoryRelation" in line:
            in_cache_echo = True
            cache_indent = len(line) - len(line.lstrip())
            continue
        if in_cache_echo:
            indent = len(line) - len(line.lstrip())
            if line.strip() and indent <= cache_indent:
                in_cache_echo = False
            else:
                continue
        # paren group optional: 'Exchange SinglePartition, ...' has no
        # argument list and must still report kind="SinglePartition"
        m = re.search(
            r"(?<!Broadcast)Exchange (\w+)(?:\((.*?)\))?(?:,|\s|$)", line)
        if not m:
            continue
        kind, args = m.group(1), m.group(2) or ""
        nparts = None
        tail = re.search(r"(\d+)\s*$", args)
        if tail:
            nparts = int(tail.group(1))
        keys = [k.split("#")[0].strip()
                for k in re.findall(r"(\w+)#\d+", args)]
        out.append({"kind": kind, "keys": keys, "partitions": nparts,
                    "raw": args})
    return out
