"""Complex-event-processing over event streams, the declarative way:
sessionize -> per-session ordered symbol string -> regular-expression
pattern matching. This is the MATCH_RECOGNIZE / Flink-CEP capability
class re-expressed as two window passes plus per-row regex work — no
NFA interpreter, no per-event state machine, and the whole plan is
JVM Column expressions (zero Python).

Scale shape: one shuffle on the user key that both window passes reuse,
then per-session bounded collect_list (sessions are minutes long; the
symbol string is session-length, never corpus-length). Pattern matching
is a per-row regexp over those bounded strings — embarrassingly
parallel. At 100 TB the cost is the one user-grain shuffle, same class
as sessionization itself.

Determinism: event order inside a session is (ts, tiebreaker)-sorted in
both engines; regex semantics are pinned to the Java/RE2 COMMON subset
(build-time rejection of lookaround/backreferences, which RE2 — and
therefore the DuckDB oracle — does not support). Matches are the
standard leftmost, non-overlapping, greedy sweep in both engines.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Pattern constructs valid in Java regex but absent from RE2 — using
#: any of them would silently diverge from the DuckDB oracle (and from
#: any RE2-based engine a user cross-checks against), so reject loudly.
_NON_RE2 = (
    (re.compile(r"\(\?=|\(\?!|\(\?<=|\(\?<!"), "lookaround"),
    (re.compile(r"\\[1-9]"), "backreference"),
    (re.compile(r"\(\?>"), "atomic group"),
    # (?<!\\) so an ESCAPED quantifier char before '+' (e.g. r"\++",
    # a repeated literal plus) is not misread as possessive
    (re.compile(r"(?<!\\)[*+}?]\+"), "possessive quantifier"),
)


def validate_pattern(pattern: str) -> str:
    """Reject regex constructs outside the Java∩RE2 subset and
    syntax errors, at build time (loud-failure contract)."""
    if not pattern:
        raise ValueError("pattern must be a non-empty regex")
    for rx, name in _NON_RE2:
        if rx.search(pattern):
            raise ValueError(
                f"pattern uses {name}, which RE2 engines do not support; "
                "CEP patterns are restricted to the portable regex subset")
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"invalid regex: {e}") from e
    return pattern


def validate_symbols(symbols: dict[str, str]) -> dict[str, str]:
    """Each event type maps to ONE character and no two types share
    one (a shared symbol would silently alias distinct events)."""
    if not symbols:
        raise ValueError("symbols must map at least one event type")
    for t, s in symbols.items():
        if not isinstance(s, str) or len(s) != 1:
            raise ValueError(f"symbol for {t!r} must be a single char, "
                             f"got {s!r}")
    if len(set(symbols.values())) != len(symbols):
        raise ValueError("symbols must be distinct per event type")
    return symbols


def sessionize(df: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", tiebreak_col: str = "event_id",
               gap_seconds: int = 1800) -> DataFrame:
    """Inactivity-gap sessionization (lag-islands): adds an integer
    ``sid`` per user session. One shuffle on the user key; the second
    window pass reuses the same partitioning (no extra exchange)."""
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    brk = F.when(F.lag(ts_col).over(w).isNull()
                 | ((sec - F.lag(sec).over(w)) > gap_seconds),
                 1).otherwise(0)
    return (df.withColumn("__brk", brk)
            .withColumn("sid", F.sum("__brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__brk"))


def symbol_expr(type_col: str | Column,
                symbols: dict[str, str],
                default_symbol: str = "x") -> Column:
    """CASE chain mapping event types to single-char symbols (insertion
    order of ``symbols``; unmapped types get ``default_symbol``)."""
    validate_symbols(symbols)
    if len(default_symbol) != 1:
        raise ValueError("default_symbol must be a single char")
    c = F.col(type_col) if isinstance(type_col, str) else type_col
    expr = F.lit(default_symbol)
    for t, s in reversed(list(symbols.items())):
        expr = F.when(c == t, F.lit(s)).otherwise(expr)
    return expr


def event_pattern_matches(df: DataFrame, *, pattern: str,
                          symbols: dict[str, str],
                          user_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type",
                          tiebreak_col: str = "event_id",
                          gap_seconds: int = 1800,
                          default_symbol: str = "x",
                          keep_unmatched: bool = False) -> DataFrame:
    """CEP over sessions: returns one row per session with its ordered
    symbol sequence, the number of (leftmost, non-overlapping) pattern
    matches, and the first matched substring — filtered to matched
    sessions unless ``keep_unmatched``.

    Output: (user_col, sid, seq, n_matches, first_match).
    """
    validate_pattern(pattern)
    s = sessionize(df, user_col=user_col, ts_col=ts_col,
                   tiebreak_col=tiebreak_col, gap_seconds=gap_seconds)
    sym = symbol_expr(type_col, symbols, default_symbol)
    seq = (s.withColumn("__sym", sym)
           .groupBy(user_col, "sid")
           .agg(F.concat_ws("", F.transform(
               F.array_sort(F.collect_list(
                   F.struct(ts_col, tiebreak_col, "__sym"))),
               lambda x: x["__sym"])).alias("seq")))
    hits = F.regexp_extract_all("seq", F.lit(pattern), 0)
    out = seq.select(
        user_col, "sid", "seq",
        F.size(hits).cast("long").alias("n_matches"),
        F.coalesce(F.get(hits, 0), F.lit("")).alias("first_match"))
    if keep_unmatched:
        return out
    return out.where(F.col("n_matches") > 0)
