"""Stateless core flows: Map, FlatMap, Filter, PassThrough, Flatten.

Reference semantics (reugn/go-streams):
  - Map      1->1 transform              (``flow/map.go:11,38,89-106``)
  - FlatMap  1->0..N, in order           (``flow/flat_map.go:11,38,89-109``)
  - Filter   keep where predicate true   (``flow/filter.go:11,42,93-112``)
  - PassThrough identity                 (``flow/pass_through.go:21,63-68``)
  - Flatten  []T -> T                    (``flow/util.go:175-179``)

Spark-first mapping: these are pure Catalyst projections/filters — they stay
inside whole-stage codegen with predicate pushdown and column pruning intact.
Arbitrary Python callables are supported but routed through Arrow-vectorized
pandas UDFs (the reference's ``parallelism`` knob maps to partition count;
like the reference with parallelism>1, ordering is not preserved across
partitions — ``flow/map.go:34-35``).
"""

from __future__ import annotations

from typing import Callable, Mapping, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..api import Flow

Expr = Union[Column, str, Mapping[str, Union[Column, str]], Callable]


def _to_col(e: Union[Column, str]) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


def _maybe_repartition(df: DataFrame, parallelism: int | None) -> DataFrame:
    # Reference worker-pool parallelism (flow/map.go:38) == partition count.
    # Only explicit requests repartition (a shuffle); default trusts the
    # upstream partitioning, which is what you want at 100 TB.
    return df.repartition(parallelism) if parallelism else df


def _check_parallelism(parallelism: int | None) -> None:
    # reference constructors panic on non-positive parallelism
    # (flow/map.go:42-44 and every *_InvalidArguments test)
    if parallelism is not None and parallelism < 1:
        raise ValueError("parallelism must be positive")


def Map(expr: Expr, *, output: str = "value", column: str = "value",
        return_type: str = "string", parallelism: int | None = None) -> Flow:
    """1->1 element transform.

    - ``Column``/SQL string  -> JVM-side projection (preferred; codegen'd)
    - ``Mapping[name, expr]`` -> multi-column projection (element == row)
    - Python callable        -> Arrow pandas UDF over ``column``
    """
    _check_parallelism(parallelism)
    if callable(expr) and not isinstance(expr, Column):
        fn = expr

        @pandas_udf(return_type)
        def _map_udf(s: pd.Series) -> pd.Series:
            return s.map(fn)

        return Flow(lambda df: _maybe_repartition(df, parallelism)
                    .withColumn(output, _map_udf(F.col(column))), name="map")

    if isinstance(expr, Mapping):
        cols = [_to_col(c).alias(n) for n, c in expr.items()]
        return Flow(lambda df: _maybe_repartition(df, parallelism).select(*cols), name="map")

    col = _to_col(expr)
    return Flow(lambda df: _maybe_repartition(df, parallelism)
                .select(col.alias(output)), name="map")


def FlatMap(expr: Expr, *, output: str = "value", column: str = "value",
            return_type: str = "array<string>", parallelism: int | None = None) -> Flow:
    """1->0..N: expression must produce an array; each item becomes a row.

    Matches reference in-order item emission (``flow/flat_map.go:96-104``)
    within a partition; ``explode`` drops empty arrays (0-output case).
    """
    _check_parallelism(parallelism)
    if callable(expr) and not isinstance(expr, Column):
        fn = expr

        @pandas_udf(return_type)
        def _fm_udf(s: pd.Series) -> pd.Series:
            return s.map(lambda v: list(fn(v)))

        return Flow(lambda df: _maybe_repartition(df, parallelism)
                    .select(F.explode(_fm_udf(F.col(column))).alias(output)), name="flat_map")

    col = _to_col(expr)
    return Flow(lambda df: _maybe_repartition(df, parallelism)
                .select(F.explode(col).alias(output)), name="flat_map")


def Filter(pred: Expr, *, column: str = "value", parallelism: int | None = None) -> Flow:
    """Keep rows where predicate holds (``flow/filter.go:93-112``).

    Column/SQL predicates push down to the scan; Python callables are
    wrapped in a boolean pandas UDF (no pushdown — prefer expressions).
    """
    _check_parallelism(parallelism)
    if callable(pred) and not isinstance(pred, Column):
        fn = pred

        @pandas_udf("boolean")
        def _pred_udf(s: pd.Series) -> pd.Series:
            return s.map(lambda v: bool(fn(v)))

        return Flow(lambda df: _maybe_repartition(df, parallelism)
                    .filter(_pred_udf(F.col(column))), name="filter")

    cond = pred if isinstance(pred, Column) else F.expr(pred)
    return Flow(lambda df: _maybe_repartition(df, parallelism).filter(cond), name="filter")


def PassThrough() -> Flow:
    """Identity (``flow/pass_through.go:63-68``)."""
    return Flow(lambda df: df, name="pass_through")


def Flatten(column: str = "value", *, output: str = "value",
            parallelism: int | None = None) -> Flow:
    """[]T -> T, inverse of Batch/windows (``flow/util.go:175-179``)."""
    _check_parallelism(parallelism)
    return Flow(lambda df: _maybe_repartition(df, parallelism)
                .select(F.explode(F.col(column)).alias(output)), name="flatten")
