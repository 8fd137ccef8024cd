#!/usr/bin/env python3
"""Driver-mimic sweep: run EVERY declared query against its DuckDB oracle.

Mirrors what the round driver does with ``__spark_entry__``: smoke-run
``entry()``, then for each ``queries()`` entry execute the Spark plan and
the oracle SQL side by side at the given scale factor and compare exactly
(row count + column names + order-insensitive values); rows-only entries
(no oracle) are executed and counted.  Exit code 1 if anything fails.

With ``--stability``, additionally executes every Spark plan a second
time under a different ``spark.sql.shuffle.partitions`` and requires the
two results to be BIT-identical (order-insensitive).  This audits the one
failure mode the oracle comparison cannot see: run-to-run nondeterminism
from shuffle-order-dependent double aggregation -- exactly what makes a
locally-green query fail the driver's representation-sensitive hash.

With ``--digest out.json``, additionally writes a canonical result
digest per query (tests/oracle.py::canonical_digest -- rows sorted,
floats as IEEE bit patterns, NaN/-0.0 normalized, Decimals canonical,
256-bucket breakdown) for BOTH the Spark result and the DuckDB oracle
result, plus the engine versions used.  The committed artifact is the
reference a later driver hash-mismatch is diffed against: digest drift
vs the committed file means the repo's own output moved; identical
digests prove the divergence is outside the repo (engine build /
driver-side representation), and the bucket diff localizes WHICH rows
differ without committing full result sets.  (VERDICT r7 item #2.)

Usage:  python tools/sweep.py [--stability] [--stability-only]
                              [--only a,b,c] [--oracle-skip a,b,c]
                              [--digest out.json] [sf_dir]
        (default sf_dir /root/testdata/sf0.01; --only restricts to the
        named queries, --only @window to the driver PRIORITY_WINDOW;
        --stability-only runs ONLY the two-layout bit-identity check,
        skipping the DuckDB oracle comparison -- the mode for large
        scale factors where a recursive/self-join oracle SQL is itself
        intractable even though the Spark plan is fine;
        --oracle-skip does the same PER QUERY, for running the oracle
        on the tractable subset while the named intractable oracles
        (measured, e.g. the WITH RECURSIVE connected-components SQL
        exceeds 10 min at sf0.1) fall back to the stability-only check)
"""

from __future__ import annotations

import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def _assert_run_stable(spark, fn, sf_dir: str) -> None:
    """Run the plan under two shuffle layouts; outputs must be identical."""
    from tests.oracle import _multiset

    df1 = fn(spark, sf_dir)
    cols = df1.columns
    rows1 = [tuple(r) for r in df1.collect()]
    spark.catalog.clearCache()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        rows2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    m1, m2 = _multiset(cols, rows1), _multiset(cols, rows2)
    if m1 != m2:
        d1 = [k for k in m1 if m1[k] != m2.get(k, 0)][:3]
        d2 = [k for k in m2 if m2[k] != m1.get(k, 0)][:3]
        raise AssertionError(
            "NOT run-stable across shuffle layouts (driver-hash hazard)\n"
            f"  layout-A-only (sample): {d1}\n  layout-B-only (sample): {d2}"
        )


def main() -> int:
    argv = sys.argv[1:]
    stability_only = "--stability-only" in argv
    argv = [a for a in argv if a != "--stability-only"]
    stability = "--stability" in argv or stability_only
    digest_out: str | None = None
    if "--digest" in argv:
        i = argv.index("--digest")
        digest_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    oracle_skip: set[str] = set()
    if "--oracle-skip" in argv:
        i = argv.index("--oracle-skip")
        oracle_skip = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        spec = argv[i + 1]
        if spec == "@window":
            from mapreduce_on_google_cloud_platform_spark.plans.registry import PRIORITY_WINDOW

            only = set(PRIORITY_WINDOW)
        else:
            only = set(spec.split(","))
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--stability"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    from tests.oracle import assert_matches_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the default 1g driver accumulates broadcast refs over a
        # 300+-query sweep and OOMs mid-run (measured at sf0.1, query
        # 150); match the production session factory's headroom
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    assert entry_mod.entry(spark).count() > 0, "entry() smoke failed"

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # a typo'd --oracle-skip name must fail loudly, not silently no-op
    unknown_skip = oracle_skip - set(queries)
    assert not unknown_skip, (
        f"--oracle-skip names not registered: {sorted(unknown_skip)}"
    )
    if only is not None:
        unknown = only - set(queries)
        assert not unknown, f"--only names not registered: {sorted(unknown)}"
        queries = {n: f for n, f in queries.items() if n in only}
    import time as _time

    failures: list[str] = []
    digests: dict[str, dict] = {}
    for i, name in enumerate(sorted(queries), 1):
        t0 = _time.perf_counter()
        try:
            if stability_only or name in oracle_skip:
                if stability:
                    # the stability block below executes the plan twice
                    status = "OK (oracle skipped)"
                else:
                    # without --stability there is no later execution:
                    # run the plan rows-only so a skip can never print
                    # OK for a query that was not run at all
                    n = len(queries[name](spark, sf_dir).collect())
                    status = f"OK rows-only ({n} rows, oracle skipped)"
            elif name in oracles:
                sink: dict | None = {} if digest_out is not None else None
                assert_matches_oracle(
                    queries[name](spark, sf_dir),
                    oracles[name],
                    sf_dir,
                    digest_sink=sink,
                )
                if sink is not None:
                    digests[name] = sink
                status = "OK"
            else:
                df = queries[name](spark, sf_dir)
                rows = df.collect()
                if digest_out is not None:
                    from tests.oracle import canonical_digest

                    digests[name] = {
                        "spark": canonical_digest(
                            df.columns, [tuple(r) for r in rows]
                        )
                    }
                n = len(rows)
                status = f"OK rows-only ({n} rows)"
            if stability:
                spark.catalog.clearCache()
                _assert_run_stable(spark, queries[name], sf_dir)
                status += " stable"
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            status = f"FAIL {str(exc)[:160]}"
        dt = _time.perf_counter() - t0
        print(
            f"[{i}/{len(queries)}] {status:<24} {name} ({dt:.1f}s)",
            flush=True,
        )
        spark.catalog.clearCache()

    if digest_out is not None:
        import json
        import platform

        import duckdb
        import pyspark

        from tests.oracle import DIGEST_ENCODING

        artifact = {
            "sf_dir": sf_dir,
            "encoding": DIGEST_ENCODING,
            "engines": {
                "pyspark": pyspark.__version__,
                "duckdb": duckdb.__version__,
                "python": platform.python_version(),
            },
            "queries": digests,
        }
        with open(digest_out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"digests: {len(digests)} queries -> {digest_out}")

    print(f"\nsweep: {len(queries) - len(failures)}/{len(queries)} passed at {sf_dir}")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
