"""Registry-wide numeric-representation lint.

Round 5 shipped three driver-hash failures whose values were identical as
Python objects but whose REPRESENTATIONS differed (uncast DuckDB HUGEINT
sums; unrounded emitted doubles).  This lint makes that defect class
unshippable: for every oracle-checked query it aligns the Spark output
schema with the DuckDB-inferred oracle output types WITHOUT executing
either plan, so it runs fast enough to be un-skippable.

Value-level round-stability of doubles is NOT enforced here:
``tests.oracle.assert_doubles_round_stable`` is an opt-in TARGETED audit
(some queries deliberately emit unrounded doubles -- e.g. single exact
integer divisions where round() itself is implementation-divergent).
Run-to-run value stability is instead enforced end-to-end by
``tools/sweep.py --stability`` (every plan executed under two shuffle
layouts, bit-identical output required).
"""

from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_SMOKE
from .oracle import assert_types_aligned, duck_type_to_spark, oracle_output_types

ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_types_align_with_spark_schema(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    o_cols, o_types = oracle_output_types(ORACLES[name], SF_SMOKE)
    assert sorted(df.columns) == sorted(o_cols), (
        f"column mismatch: spark={sorted(df.columns)} oracle={sorted(o_cols)}"
    )
    assert_types_aligned(
        df.columns, [t for _, t in df.dtypes], o_cols, o_types
    )


def test_duck_type_mapping_covers_registry():
    """Every DuckDB output type across all oracles maps to a known Spark
    tag -- an unknown type would silently weaken the alignment check."""
    seen_unknown = []
    for name in ORACLE_NAMES:
        _, o_types = oracle_output_types(ORACLES[name], SF_SMOKE)
        for t in o_types:
            tag = duck_type_to_spark(t)
            if tag.startswith("!unknown"):
                seen_unknown.append((name, t))
    assert not seen_unknown, f"unmapped DuckDB types: {seen_unknown}"
