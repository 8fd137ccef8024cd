#!/usr/bin/env python3
"""Diff two canonical-digest artifacts (tools/sweep.py --digest output).

The triage tool for a driver hash-mismatch (VERDICT r7 #2): re-run
``tools/sweep.py --digest fresh.json --only <red_query>`` at HEAD, then

    python tools/digest_diff.py tools/digests_r08_sf0.01.json fresh.json

* identical digests  -> the repo's output did NOT move; the divergence
  is outside the repo (driver engine build / representation detail) --
  compare the recorded engine versions printed below.
* different digests  -> the repo's own output moved; the bucket diff
  names the 1-byte digest prefixes of the changed rows, which a local
  re-run can enumerate (filter rows whose sha256 row digest starts with
  that byte) for cell-level comparison.

Exit code 1 if any shared query's digest differs.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    print(f"A engines: {a.get('engines')}  sf={a.get('sf_dir')}")
    print(f"B engines: {b.get('engines')}  sf={b.get('sf_dir')}")
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    if only_a:
        print(f"only in A ({len(only_a)}): {only_a[:10]}")
    if only_b:
        print(f"only in B ({len(only_b)}): {only_b[:10]}")
    bad = 0
    for name in shared:
        for side in ("spark", "oracle"):
            da, db = qa[name].get(side), qb[name].get(side)
            if da is None or db is None:
                continue
            if da["digest"] == db["digest"]:
                continue
            bad += 1
            print(f"\nDIVERGED {name} [{side}]:")
            print(f"  rows A={da['n_rows']} B={db['n_rows']}")
            ba, bb = da["buckets"], db["buckets"]
            diff = [
                k
                for k in sorted(set(ba) | set(bb))
                if ba.get(k) != bb.get(k)
            ]
            for k in diff[:16]:
                print(
                    f"  bucket {k}: A={ba.get(k)} B={bb.get(k)}"
                )
            if len(diff) > 16:
                print(f"  ... {len(diff) - 16} more divergent buckets")
    print(
        f"\n{len(shared)} shared queries, {bad} divergent "
        f"({len(only_a)} only-A, {len(only_b)} only-B)"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
