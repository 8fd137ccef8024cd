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


ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_schema_is_hash_safe(spark, name):
    """Round-9 guard (VERDICT r8 #2): NO declared query may emit a
    decimal or float32 output column.  ``duckdb.sql(...).df()`` decays
    DECIMAL(38,0) to float64 while Spark surfaces decimal.Decimal, so
    the driver's representation-sensitive hash reds on bit-identical
    values -- exactly 7/7 of the r8 driver reds emitted a decimal column
    and 0/43 greens did.  Oracle-checked queries are guarded inside
    ``assert_types_aligned`` (test above); this covers the rows-only
    remainder, so the ban spans the full registry."""
    from .oracle import assert_hash_safe_types

    df = QUERIES[name](spark, SF_SMOKE)
    assert_hash_safe_types(df.columns, [t for _, t in df.dtypes], "spark")


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


# --- canonical result digests (round 8, VERDICT r7 #2) ----------------------


def test_canonical_digest_normalizations():
    """The digest must be invariant to row order, column order, -0.0 vs
    +0.0, NaN bit patterns, and Decimal trailing zeros -- and sensitive
    to any single-cell value change."""
    import math
    from decimal import Decimal

    from .oracle import canonical_digest

    base = canonical_digest(["a", "b"], [(1, 2.5), (3, -0.0)])
    assert base == canonical_digest(["a", "b"], [(3, -0.0), (1, 2.5)])
    assert base == canonical_digest(["b", "a"], [(2.5, 1), (-0.0, 3)])
    assert base == canonical_digest(["a", "b"], [(1, 2.5), (3, 0.0)])
    assert base != canonical_digest(["a", "b"], [(1, 2.5), (3, 1e-300)])
    assert base != canonical_digest(["a", "b"], [(1, 2.5), (4, 0.0)])
    # duplicate rows are counted (multiset, not set)
    assert canonical_digest(["a"], [(1,), (1,)]) != canonical_digest(
        ["a"], [(1,)]
    )
    # NaN canonical; float NaN == Decimal NaN is NOT required, but any
    # two float NaNs are
    n1 = canonical_digest(["x"], [(float("nan"),)])
    n2 = canonical_digest(["x"], [(math.nan,)])
    assert n1["digest"] == n2["digest"]
    # Decimal canonical form: value equality, not representation
    d1 = canonical_digest(["x"], [(Decimal("1.50"),)])
    d2 = canonical_digest(["x"], [(Decimal("1.5"),)])
    d3 = canonical_digest(["x"], [(Decimal("150e-2"),)])
    assert d1["digest"] == d2["digest"] == d3["digest"]
    assert canonical_digest(["x"], [(Decimal("-0"),)])["digest"] == (
        canonical_digest(["x"], [(Decimal("0.00"),)])["digest"]
    )
    # int vs float vs Decimal of the same value are DISTINCT (the driver
    # hash is representation-sensitive; the digest must be too)
    assert (
        canonical_digest(["x"], [(1,)])["digest"]
        != canonical_digest(["x"], [(1.0,)])["digest"]
        != canonical_digest(["x"], [(Decimal(1),)])["digest"]
    )


def test_canonical_digest_framing_is_collision_free():
    """ADVICE r8: the pre-round-9 encoder joined variable-length
    payloads with a bare separator, so distinct results could digest
    identically.  The length-prefixed framing must distinguish every
    one of the verified collision pairs."""
    from .oracle import canonical_digest

    def dg(cols, rows):
        return canonical_digest(cols, rows)["digest"]

    assert dg(["c1", "c2"], [("a\x1fSb", "c")]) != dg(
        ["c1", "c2"], [("a", "b\x1fSc")]
    )
    assert dg(["x"], [(["a\x1fSb"],)]) != dg(["x"], [(["a", "b"],)])
    # dict keys containing the old '=' / separator bytes
    assert dg(["x"], [({"a=1": "b"},)]) != dg(["x"], [({"a": "1=b"},)])
    assert dg(["x"], [({"a\x1fK1b": "c"},)]) != dg(["x"], [({"a": "c"}, )])
    # adjacent-cell bleed: (ab, c) vs (a, bc)
    assert dg(["c1", "c2"], [("ab", "c")]) != dg(["c1", "c2"], [("a", "bc")])


def test_canonical_digest_buckets_localize():
    """Bucket breakdown: total row count is conserved, and changing one
    row perturbs exactly the bucket(s) holding that row's digest."""
    from .oracle import canonical_digest

    rows = [(i, f"s{i}") for i in range(500)]
    d = canonical_digest(["k", "v"], rows)
    assert d["n_rows"] == 500
    assert sum(n for n, _ in d["buckets"].values()) == 500
    mutated = list(rows)
    mutated[123] = (123, "CHANGED")
    d2 = canonical_digest(["k", "v"], mutated)
    changed = {
        b
        for b in set(d["buckets"]) | set(d2["buckets"])
        if d["buckets"].get(b) != d2["buckets"].get(b)
    }
    assert 1 <= len(changed) <= 2  # old row's bucket out, new row's in


def test_canonical_digest_nested_and_temporal_types():
    """Arrays, structs-as-dicts, dates, timestamps and bytes all encode
    deterministically."""
    import datetime as dt

    from .oracle import canonical_digest

    rows = [
        (
            [1, 2, 3],
            {"k": 1.5},
            dt.date(2026, 8, 15),
            dt.datetime(2026, 8, 15, 12, 0, 0),
            b"\x00\xff",
        )
    ]
    a = canonical_digest(["arr", "m", "d", "ts", "b"], rows)
    b = canonical_digest(["arr", "m", "d", "ts", "b"], list(rows))
    assert a == b
    rows2 = [([1, 2, 4], *rows[0][1:])]
    assert a != canonical_digest(["arr", "m", "d", "ts", "b"], rows2)


# --- cross-engine integer->double cast discipline (round 9, ADVICE r8) ------


def test_exact_int_to_double_casts_are_correctly_rounded(spark):
    """Round-9 numeric contract behind the BIGINT/STRING output rules.

    DuckDB's direct DECIMAL(38,0)->DOUBLE cast is NOT correctly rounded
    for magnitudes >= 2^63 (measured 180/2000 random wide ints 1 ulp
    off vs the true nearest double), so no oracle may cast a >= 2^63
    decimal to double directly.  The two conversion paths the repo DOES
    rely on must stay correctly rounded, i.e. bit-equal to CPython's
    exact int->float conversion:

    * DuckDB BIGINT -> DOUBLE (welch/ks/auc variance terms: the exact
      numerators are emitted as BIGINT and every double derives from
      the BIGINT, never the decimal);
    * DuckDB VARCHAR -> DOUBLE, i.e. strtod (the dist2_q family: the
      exact integer is emitted as a canonical string and the readable
      distance derives from the parsed string);
    * Spark DECIMAL(38,0) -> DOUBLE (the Spark side of the same
      queries; BigDecimal's conversion is correctly rounded at any
      magnitude, verified here well past 2^64).
    """
    import random

    import duckdb

    import pyspark.sql.functions as F

    rng = random.Random(0xC0FFEE)
    wide = [rng.getrandbits(bits) | (1 << (bits - 1))
            for bits in (53, 60, 63, 64, 66, 70, 75) for _ in range(40)]
    con = duckdb.connect()
    for x in wide:
        if x < 2 ** 63:  # BIGINT territory
            (b,) = con.sql(f"SELECT CAST({x} AS DOUBLE)").fetchone()
            assert b == float(x), f"duckdb BIGINT->DOUBLE mis-rounds {x}"
        (v,) = con.sql(f"SELECT CAST('{x}' AS DOUBLE)").fetchone()
        assert v == float(x), f"duckdb VARCHAR->DOUBLE mis-rounds {x}"
    con.close()
    df = spark.createDataFrame([(str(x),) for x in wide], "s string")
    rows = df.select(
        "s", F.col("s").cast("decimal(38,0)").cast("double").alias("d")
    ).collect()
    for r in rows:
        assert r.d == float(int(r.s)), f"spark decimal->double mis-rounds {r.s}"


def test_oracle_pandas_fetch_representations_are_hash_safe():
    """Mirror the driver's ACTUAL oracle fetch channel: every oracle is
    executed through ``duckdb.sql(...).df()`` (pandas) at smoke scale and
    its fetched dtypes must land in the proven-green representation
    classes (int/float64/bool/str/datetime/bytes).  This is the channel
    the schema-level alignment check cannot see directly -- DECIMAL
    columns pass DuckDB's type system but decay to float64 here (the
    r7+r8 driver-red class), and a future type that maps cleanly in
    ``duck_type_to_spark`` yet mangles through pandas would surface
    first in this test."""
    import duckdb

    from mapreduce_on_google_cloud_platform_spark.sources import TABLES

    allowed_dtypes = {
        "int8", "int16", "int32", "int64", "uint8", "float64", "bool",
        "object", "datetime64[us]", "datetime64[ns]",
        "datetime64[us, UTC]", "datetime64[ns, UTC]",
    }
    allowed_cells = {"str", "bytes", "date", "NoneType", "list", "dict",
                     "ndarray"}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    bad = []
    for name in ORACLE_NAMES:
        df = con.sql(ORACLES[name]).df()
        for c in df.columns:
            dt = str(df[c].dtype)
            if dt not in allowed_dtypes:
                bad.append(f"{name}.{c}: dtype {dt}")
            elif dt == "object" and len(df):
                cell = df[c].dropna()
                if len(cell):
                    tname = type(cell.iloc[0]).__name__
                    if tname not in allowed_cells:
                        bad.append(f"{name}.{c}: object cell {tname}")
    con.close()
    assert not bad, (
        "oracle columns decay through the driver's pandas fetch:\n  "
        + "\n  ".join(bad)
    )


def test_checked_bigint_guard(spark):
    """ADVICE r9: BIGINT emissions from exact DECIMAL(38,0) numerators
    must fail loudly past int64, never silently null (the DuckDB-side
    HUGEINT->BIGINT cast already errors loudly; this restores symmetry)."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.functions.numeric import (
        INT64_MAX,
        checked_bigint,
    )

    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal(INT64_MAX),), (Decimal(-INT64_MAX),), (None,)],
        "v decimal(38,0)",
    )
    vals = sorted(
        (r[0] for r in df.select(checked_bigint(F.col("v"), "v")).collect()),
        key=lambda x: (x is None, x),
    )
    assert vals == [-INT64_MAX, INT64_MAX, None]

    over = spark.createDataFrame([(Decimal(INT64_MAX + 1),)], "v decimal(38,0)")
    with pytest.raises(Exception, match="overflows BIGINT"):
        over.select(checked_bigint(F.col("v"), "v")).collect()
