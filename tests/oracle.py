"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet tables,
then asserts row-count + column-name + order-insensitive value equality,
PLUS two representation checks the round-5 driver proved necessary (its
value hash is representation-sensitive -- it sees int width, Decimal vs
float, and float bit patterns, not just Python-object equality):

* **type alignment** -- every output column's DuckDB type must map to the
  Spark column's type.  An uncast ``sum()`` in an oracle yields HUGEINT,
  which has no Spark counterpart (and decays to float64 through pandas),
  so it is always an error here.
* **bit-exact float comparison** -- ``_canon`` no longer collapses
  Decimal to float; doubles compare bit-exact.  A single IEEE op over
  exact inputs (a ratio of two ints) is deterministic cross-engine, so
  unrounded single-division ratios are fine; anything built from
  libm calls or order-dependent double sums must follow the repo's
  decimal-lift + ``round(<=9 dp)`` discipline on BOTH engines or it will
  (correctly) fail here.  ``assert_doubles_round_stable`` exists for
  targeted audits of that discipline.

Round 5 shipped three driver-hash failures that the previous, laxer
comparator (HUGEINT->int, Decimal->float canonicalization) could not see;
the type-alignment check fails on all three.  The residual gap vs the
driver is Spark RUN-TO-RUN nondeterminism (shuffle-order float sums),
audited by ``tools/sweep.py --stability`` which executes every plan twice
under different shuffle partitioning and requires bit-identical output.
"""

from __future__ import annotations

import hashlib
import math
import re
import struct
from datetime import date, datetime
from decimal import Decimal

import duckdb

from mapreduce_on_google_cloud_platform_spark.sources import TABLES

# DuckDB scalar type -> Spark simpleString tag.  Tags starting with "!"
# have no Spark counterpart and always fail alignment (the point: they
# also decay lossily through the driver's pandas/Arrow fetch).
_DUCK_SCALAR = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "!hugeint (uncast sum()? add CAST(... AS BIGINT))",
    "UTINYINT": "!utinyint",
    "USMALLINT": "!usmallint",
    "UINTEGER": "!uinteger",
    "UBIGINT": "!ubigint",
    "UHUGEINT": "!uhugeint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    # DuckDB TIMESTAMP is timezone-naive; both Spark flavors fetch as the
    # same naive datetime (driver-green precedent: q18_large_orders r1,
    # merge_upsert_orders r2-r4).
    "TIMESTAMP": "timestamp_ntz",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}

_EQUIVALENT = {("timestamp", "timestamp_ntz"), ("timestamp_ntz", "timestamp")}


def _split_top(s: str) -> list[str]:
    """Split on commas not nested inside (), [] or quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def duck_type_to_spark(t: str) -> str:
    """Map a DuckDB type string to the Spark simpleString it must equal."""
    t = str(t).strip()
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if t.startswith("STRUCT(") and t.endswith(")"):
        fields = []
        for f in _split_top(t[len("STRUCT(") : -1]):
            name, ft = f.split(" ", 1)
            fields.append(f"{name.strip(chr(34))}:{duck_type_to_spark(ft)}")
        return "struct<" + ",".join(fields) + ">"
    if t.startswith("MAP(") and t.endswith(")"):
        k, v = _split_top(t[len("MAP(") : -1])
        return f"map<{duck_type_to_spark(k)},{duck_type_to_spark(v)}>"
    if t in _DUCK_SCALAR:
        return _DUCK_SCALAR[t]
    return f"!unknown-duckdb-type:{t}"


def oracle_output_types(sql: str, sf_dir: str) -> tuple[list[str], list[str]]:
    """Column names + DuckDB type strings for an oracle, without fetching."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        rel = con.sql(sql)
        return list(rel.columns), [str(x) for x in rel.types]
    finally:
        con.close()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(x) for x in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, types, rows


# Output types that decay through the driver's pandas fetch even when
# both engines agree on them.  Round-5 lesson: HUGEINT (no Spark
# counterpart).  Round-7/8 lesson: DECIMAL -- ``duckdb.sql(...).df()``
# converts DECIMAL(38,0) to float64 (lossily past 2^53) while Spark
# surfaces decimal.Decimal, so the driver's representation-sensitive
# hash reds on bit-identical values; 7/7 of the r8 driver reds emitted a
# decimal column and 0/43 greens did.  FLOAT (float32) is banned for the
# same reason doubles must be bit-disciplined: pandas widens it to
# float64 with garbage low bits.  Emit BIGINT for bounded exact
# integers, the canonical STRING for unbounded ones, DOUBLE for reals.
_HASH_UNSAFE = ("decimal", "float")


def assert_hash_safe_types(cols: list[str], dtypes: list[str], side: str) -> None:
    """Hard-fail output columns whose type decays through pandas fetch."""
    bad = [
        f"  {c}: {side}={t}"
        for c, t in zip(cols, dtypes)
        for tag in _HASH_UNSAFE
        if tag in t.lower()
    ]
    if bad:
        raise AssertionError(
            "driver-hash-unsafe output type (decimal decays to float64 "
            "through the driver's pandas fetch of the DuckDB oracle -- "
            "the r7+r8 red class; float32 widens with garbage bits).  "
            "Cast to BIGINT (bounded ints), STRING (unbounded ints) or "
            "DOUBLE (reals) on BOTH engines:\n" + "\n".join(bad)
        )


def assert_types_aligned(
    s_cols: list[str],
    s_dtypes: list[str],
    o_cols: list[str],
    o_types: list[str],
) -> None:
    assert_hash_safe_types(s_cols, s_dtypes, "spark")
    assert_hash_safe_types(
        o_cols, [duck_type_to_spark(t) for t in o_types], "oracle"
    )
    s_map = dict(zip(s_cols, s_dtypes))
    o_map = {c: duck_type_to_spark(t) for c, t in zip(o_cols, o_types)}
    bad = []
    for c in sorted(s_map):
        st, ot = s_map[c], o_map.get(c)
        if ot is not None and st != ot and (st, ot) not in _EQUIVALENT:
            bad.append(f"  {c}: spark={st} oracle={ot}")
    if bad:
        raise AssertionError(
            "oracle/spark type misalignment (driver hash is "
            "representation-sensitive):\n" + "\n".join(bad)
        )


def _round_stable(v: float) -> bool:
    if math.isnan(v) or math.isinf(v):
        return True
    # 9 dp: the repo's coarsest deliberate precision (rrf_score rounds to
    # 9); anything finer than its own round() is already stable at 9.
    return round(v, 9) == v


def assert_doubles_round_stable(
    spark_df, s_rows, *, unrounded_ok: frozenset[str] = frozenset()
) -> None:
    float_idx = [
        i
        for i, f in enumerate(spark_df.schema.fields)
        if f.dataType.typeName() in ("double", "float")
        and f.name not in unrounded_ok
    ]
    if not float_idx:
        return
    for r in s_rows:
        for i in float_idx:
            v = r[i]
            if v is not None and not _round_stable(v):
                name = spark_df.schema.fields[i].name
                raise AssertionError(
                    f"column {name!r} emits unrounded double {v!r}: "
                    "cross-engine doubles are not bit-reproducible; round "
                    "to <= 9 dp on both engines or list the column in "
                    "unrounded_ok with a bit-stability argument"
                )


def _canon(v):
    """Canonicalize a cell value for cross-engine comparison.

    Deliberately does NOT collapse Decimal to float or widen/narrow ints:
    type alignment is asserted separately, so here like compares with like.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # Decimal('1.50') == Decimal('1.5') and hashes equal: safe as-is.
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
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


# ---------------------------------------------------------------------------
# Canonical result digests (round 8, VERDICT r7 item #2).
#
# Round 7 produced a driver hash-mismatch (pca_gram_stats) that could not
# be reproduced locally: the repo had no record of WHAT result it shipped,
# so the divergence channel (engine build? representation? instability?)
# stayed unprovable.  ``canonical_digest`` fixes that: a deterministic
# digest of a result multiset, with floats as IEEE-754 bit patterns
# (-0.0 collapsed to +0.0, every NaN to the canonical quiet NaN),
# Decimals in canonical sign/digits/exponent form (Decimal('1.50') ==
# Decimal('1.5') digest-equal), rows sorted by their encoded bytes so
# shuffle order is irrelevant.  Besides the whole-result digest it emits
# a 256-bucket breakdown (rows bucketed by the first byte of their row
# digest): two artifacts that disagree localize the divergence to
# specific buckets, whose member rows a local re-run can then enumerate
# -- cell-level diffing without committing full result sets.
# tools/sweep.py --digest writes one artifact per sweep with engine
# versions; the committed tools/digests_r{N}_*.json is the reference the
# next driver red is diffed against.
# ---------------------------------------------------------------------------

_QNAN = struct.pack(">Q", 0x7FF8000000000000)


def _lp(tag: bytes, payload: bytes) -> bytes:
    """Length-prefixed frame: variable-length payloads are framed as
    ``tag len ':' payload`` so concatenations cannot collide (ADVICE r8:
    a bare separator join let ("a\\x1fSb","c") and ("a","b\\x1fSc")
    encode identically, defeating the digest's purpose)."""
    return tag + str(len(payload)).encode() + b":" + payload


def _enc(v) -> bytes:
    """Encode one cell to canonical, SELF-DELIMITING tagged bytes."""
    if v is None:
        return b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"B1" if v else b"B0"
    if isinstance(v, int):
        return _lp(b"I", str(v).encode())
    if isinstance(v, float):
        if math.isnan(v):
            return b"F" + _QNAN
        if v == 0.0:
            v = 0.0  # collapse -0.0 and +0.0 to one bit pattern
        return b"F" + struct.pack(">d", v)
    if isinstance(v, Decimal):
        if v.is_nan():
            return b"F" + _QNAN
        sign, digits, exp = v.as_tuple()
        d = list(digits)
        while len(d) > 1 and d[-1] == 0:  # strip trailing zeros into exp
            d.pop()
            exp += 1
        if d == [0]:
            sign, exp = 0, 0  # all zeros (incl. -0) encode identically
        body = ("-" if sign else "") + "".join(map(str, d)) + "e" + str(exp)
        return _lp(b"D", body.encode())
    if isinstance(v, (datetime, date)):
        return _lp(b"T", v.isoformat().encode())
    if isinstance(v, str):
        return _lp(b"S", v.encode("utf-8"))
    if isinstance(v, (bytes, bytearray)):
        return _lp(b"Y", bytes(v))
    if isinstance(v, (list, tuple)):
        # each element is self-delimiting, so plain concatenation is
        # unambiguous; the outer frame pins the element-byte total
        return _lp(b"L", b"".join(_enc(x) for x in v))
    if isinstance(v, dict):
        items = sorted(
            (_lp(b"K", str(k).encode()), _enc(x)) for k, x in v.items()
        )
        return _lp(b"M", b"".join(k + e for k, e in items))
    raise TypeError(f"canonical_digest: unsupported cell type {type(v)!r}")


# Digest-encoding epoch (ADVICE r9): the round-9 length-prefix fix changed
# every digest, so artifacts written before it ("v1", implicit) are NOT
# comparable to later ones even for bit-identical results.  Stamp the
# epoch into every digest artifact so cross-round diffs can detect
# incomparable encodings instead of reading them as regressions.
DIGEST_ENCODING = "v2-length-prefixed"


def canonical_digest(cols, rows) -> dict:
    """Whole-result digest + 256-bucket breakdown for divergence triage."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    header = "|".join(cols[i] for i in order).encode()
    row_digs = sorted(
        hashlib.sha256(
            header + b"\x1d" + b"\x1f".join(_enc(r[i]) for i in order)
        ).digest()
        for r in rows
    )
    total = hashlib.sha256(header)
    bucket_n: dict[int, int] = {}
    bucket_h: dict[int, "hashlib._Hash"] = {}
    for dgst in row_digs:
        total.update(dgst)
        b = dgst[0]
        bucket_n[b] = bucket_n.get(b, 0) + 1
        if b not in bucket_h:
            bucket_h[b] = hashlib.sha256()
        bucket_h[b].update(dgst)
    return {
        "digest": total.hexdigest(),
        "n_rows": len(rows),
        "buckets": {
            f"{b:02x}": [bucket_n[b], bucket_h[b].hexdigest()[:16]]
            for b in sorted(bucket_n)
        },
    }


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def assert_matches_oracle(
    spark_df,
    oracle_sql: str,
    sf_dir: str,
    *,
    max_diff_show: int = 5,
    digest_sink: dict | None = None,
):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_types, o_rows = run_oracle(oracle_sql, sf_dir)
    if digest_sink is not None:  # rows already in hand: digest for free
        digest_sink["spark"] = canonical_digest(s_cols, s_rows)
        digest_sink["oracle"] = canonical_digest(o_cols, o_rows)

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert_types_aligned(s_cols, [t for _, t in spark_df.dtypes], o_cols, o_types)
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
