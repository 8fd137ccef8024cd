"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet tables,
then asserts row-count + column-name + order-insensitive value equality.
Strict value equality here is a superset of any hash comparison the driver
performs: if these pass, the driver's hash matches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from mapreduce_on_google_cloud_platform_spark.sources import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact comparison -- queries themselves are responsible for making
        # doubles bit-stable across engines (decimal-exact sums / rounding)
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, *, max_diff_show: int = 5):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    sm = _multiset(s_cols, s_rows)
    om = _multiset(o_cols, o_rows)
    if sm != om:
        only_s = [k for k in sm if sm[k] != om.get(k, 0)][:max_diff_show]
        only_o = [k for k in om if om[k] != sm.get(k, 0)][:max_diff_show]
        raise AssertionError(
            "value mismatch\n"
            f"  spark-only (sample): {only_s}\n"
            f"  oracle-only (sample): {only_o}"
        )
