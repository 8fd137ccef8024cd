#!/usr/bin/env python3
"""Driver-mimic sweep: run EVERY declared query against its DuckDB oracle.

Mirrors what the round driver does with ``__spark_entry__``: smoke-run
``entry()``, then for each ``queries()`` entry execute the Spark plan and
the oracle SQL side by side at the given scale factor and compare exactly
(row count + column names + order-insensitive values); rows-only entries
(no oracle) are executed and counted.  Exit code 1 if anything fails.

Usage:  python tools/sweep.py [sf_dir]      (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    from tests.oracle import assert_matches_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert entry_mod.entry(spark).count() > 0, "entry() smoke failed"

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures: list[str] = []
    for i, name in enumerate(sorted(queries), 1):
        try:
            if name in oracles:
                assert_matches_oracle(queries[name](spark, sf_dir), oracles[name], sf_dir)
                status = "OK"
            else:
                n = len(queries[name](spark, sf_dir).collect())
                status = f"OK rows-only ({n} rows)"
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            status = f"FAIL {str(exc)[:160]}"
        print(f"[{i}/{len(queries)}] {status:<24} {name}", flush=True)
        spark.catalog.clearCache()

    print(f"\nsweep: {len(queries) - len(failures)}/{len(queries)} passed at {sf_dir}")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
