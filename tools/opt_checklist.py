#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r12.md per-query checklist from the round's
baseline and final bench artifacts (best-min seconds, delta, action)."""

import json
import sys

TOUCHED = {
    "winnowing_fingerprints": "rewritten: scalar lead-window k-grams + persist",
    "multimodal_simhash_neardup": "rewritten: scalar shingles, inline bit sig (join removed), salted band join, re-spread scan",
    "poisson_bootstrap_ci": "CASE-chain weights + re-spread scan",
    "fellegi_sunter_weights": "bounded levenshtein + length prefilter + block re-spread",
    "part_entity_clusters": "inherits fuzzy_part_name_pairs levenshtein fixes",
    "char_trigram_lang_profile": "scalar position-explode trigrams",
    "nb_langid_confusion": "re-spread doc scan + persist trigram stream",
    "item_item_cofilter_topk": "persist 3-consumer capped incidence",
    "simhash_near_pairs": "salted band self-join (shared helper)",
    "simhash_band_width_audit": "salted band self-join x5 geometries",
    "dedup_clusters": "inherits salted simhash_near_pairs",
    "dedup_exact": "(unchanged)",
    "ann_ivf_residual_pq_topk": "index-build phase now owns residual index cold build",
}


def main() -> int:
    base = json.load(open("tools/bench_r12_opt_baseline.json"))
    fin = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "tools/bench_r12_opt_final.json"))
    bm, fm = base["queries_min"], fin["queries_min"]
    rows = []
    for name in fm:
        b, f = bm.get(name), fm[name]
        d = (f - b) if b is not None else None
        rows.append((name, b, f, d))
    rows.sort(key=lambda r: (r[3] if r[3] is not None else 0))
    print(f"baseline min-sum {sum(bm.values()):.1f}s ({len(bm)} q); "
          f"final min-sum {sum(fm.values()):.1f}s ({len(fm)} q)")
    print()
    print("| query | before (s) | after (s) | delta | action |")
    print("|---|---|---|---|---|")
    for name, b, f, d in rows:
        action = TOUCHED.get(name, "examined; left alone" if (d or 0) > -0.5 else "improved indirectly")
        print(f"| {name} | {b if b is not None else '-'} | {f} | "
              f"{f'{d:+.2f}' if d is not None else '-'} | {action} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
