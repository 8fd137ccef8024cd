"""Portable vector math over array<float> embedding columns.

Everything is a sequential left fold (``F.aggregate`` in Spark,
``list_reduce`` in DuckDB) over element products, so the double-precision
result is **bit-identical** across engines (verified on testdata) -- no
rounding tolerance needed in the oracle comparison.

All expressions are JVM-side built-ins (whole-stage codegen); no Python
touches the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return arr.cast("array<double>")


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|), computed in the exact operation order the
    SQL fragments below replicate."""
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB fragments (same fold order; dim is the embedding length) --------


def sql_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1,{dim}),"
        f" i -> {a}[i]*{b}[i]), (x,y) -> x+y)"
    )


def sql_norm(a: str, dim: int = 64) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return f"{sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)})"
