#!/usr/bin/env python3
"""Merge N full bench runs (SPARK_GRAFT_BENCH_OUT captures) into the
committed per-query artifact format (tools/bench_r{N}_full.json):
queries_median = lowest per-query median across runs, queries_min = min
over all trials, run-level summaries preserved.  Usage:
    python tools/bench_merge.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    names = set(runs[0]["queries_median"])
    for r in runs[1:]:
        assert set(r["queries_median"]) == names, "query sets differ"
    med = {
        n: min(r["queries_median"][n] for r in runs) for n in sorted(names)
    }
    mn = {
        n: min(r["queries_min"][n] for r in runs) for n in sorted(names)
    }
    summary = dict(runs[-1]["summary"])
    summary["value"] = round(sum(med.values()), 3)
    summary["value_min_sum"] = round(sum(mn.values()), 3)
    summary["trials"] = sum(r["summary"]["trials"] for r in runs)
    artifact = {
        "merge": (
            f"per-query best over {len(runs)} idle full runs "
            f"({runs[0]['summary']['trials']} trials each) at the final "
            "head; queries_median = lowest of the run medians, "
            "queries_min = min of all trials; run-level summaries kept "
            "under runs_summary"
        ),
        "runs": len(runs),
        "runs_summary": [
            {
                "value": r["summary"]["value"],
                "value_min_sum": r["summary"]["value_min_sum"],
                "index_build_sec": r["summary"]["index_build_sec"],
                "loadavg_before": r["summary"]["loadavg_before"],
            }
            for r in runs
        ],
        "summary": summary,
        "queries_median": med,
        "queries_min": mn,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
    print(
        f"merged {len(runs)} runs -> {out_path}: median-sum "
        f"{summary['value']}s, min-sum {summary['value_min_sum']}s, "
        f"{len(med)} queries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
