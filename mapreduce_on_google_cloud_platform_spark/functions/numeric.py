"""Loud-fail numeric emission helpers.

ADVICE r9: Spark's non-ANSI ``decimal(38,0) -> bigint`` cast returns NULL
on overflow instead of failing, while DuckDB's ``HUGEINT -> BIGINT`` cast
errors loudly -- so past a query's documented magnitude bound the
production output would silently null while only oracle-checked runs
noticed.  ``checked_bigint`` closes that asymmetry in-plan: the value is
range-checked in DECIMAL(38,0) *before* the narrowing cast and the task
fails with a message naming the column, exactly like the DuckDB side.

The guard costs one comparison per OUTPUT row (these sites are all
small post-aggregate emissions), nothing in the hot loops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"
INT64_MAX = (1 << 63) - 1


def checked_bigint(col: Column, what: str = "value") -> Column:
    """Emit an exact DECIMAL(38,0) expression as BIGINT, raising in-plan
    (instead of silently nulling) if the value exceeds the int64 range."""
    dec = col.cast(_DEC)
    return (
        F.when(
            F.abs(dec) > F.lit(INT64_MAX).cast(_DEC),
            F.raise_error(
                F.concat(F.lit(f"{what} overflows BIGINT: "), dec.cast("string"))
            ).cast(_DEC),
        )
        .otherwise(dec)
        .cast("bigint")
    )
