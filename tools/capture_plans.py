#!/usr/bin/env python3
"""Capture .explain("formatted") for declared queries to plans/r12/.

Usage: python tools/capture_plans.py [--suffix before|after] [--only a,b,c]
                                     [sf_dir]

Writes plans/r12/<query>_<suffix>.txt plus a one-line-per-query summary
(plans/r12/_summary_<suffix>.tsv) of plan-shape metrics: Exchange count,
join strategies, Python-eval nodes, scan count -- the triage table the
optimization round works from (guide SS1.1: read the plan before touching
the code).
"""

from __future__ import annotations

import os
import re
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    suffix = "before"
    only = None
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        del argv[i : i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.session import get_spark
    from mapreduce_on_google_cloud_platform_spark.sources.index_store import (
        build_all_indexes,
    )

    import bench

    names = [n for n in bench.HEADLINE if only is None or n in only]

    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    build_all_indexes(spark, sf_dir)
    spark.catalog.clearCache()

    summary_rows = []
    for k, name in enumerate(names):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"[{k + 1}/{len(names)}] ERROR {name}: {e}")
            summary_rows.append((name, "ERROR", str(e)[:120]))
            spark.catalog.clearCache()
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_exch = len(re.findall(r"\bExchange\b", plan))
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        join_counts = [
            (j, len(re.findall(j, plan)))
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
        ]
        joins = "+".join(f"{j}:{c}" for j, c in join_counts if c)
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan))
        n_scan = len(re.findall(r"Scan parquet|Scan text", plan))
        n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
        n_sort = len(re.findall(r"^\s*\(\d+\) Sort\b", plan, re.M))
        n_win = len(re.findall(r"\bWindow\b", plan))
        summary_rows.append(
            (
                name,
                f"exch={n_exch}(reused={n_reuse})",
                f"joins={joins or '-'}",
                f"py={n_py}",
                f"scans={n_scan}",
                f"agg={n_agg}",
                f"sort={n_sort}",
                f"win={n_win}",
                f"plan_lines={plan.count(chr(10))}",
            )
        )
        print(f"[{k + 1}/{len(names)}] {name} exch={n_exch} joins={joins or '-'} py={n_py}")
        spark.catalog.clearCache()

    with open(os.path.join(out_dir, f"_summary_{suffix}.tsv"), "w") as f:
        for row in summary_rows:
            f.write("\t".join(row) + "\n")
    print(f"wrote {len(summary_rows)} plans to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
