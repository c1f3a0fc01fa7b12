#!/usr/bin/env python3
"""Fold a definitive clean pair into BASELINE_BANDS.json.

Band protocol (BASELINE.md): a query's band at an SF is the per-query
MIN across that round's clean full-suite pairs — the warmest honest
reading. New gates enter at their first pair-min; existing gates only
ever tighten (a slower pair never loosens a band, it just has to stay
inside 2x of the recorded one).

Usage: update_bands.py <pair_json> <sf_key>   # e.g. sf0.1 / sf1.0
Queries failed in BOTH passes are skipped (time-to-exception is not a
band). Prints each change; writes BASELINE_BANDS.json in place.
"""
import json
import sys


def main() -> None:
    pair_path, sf = sys.argv[1], sys.argv[2]
    with open(pair_path) as f:
        pair = json.load(f)
    with open("BASELINE_BANDS.json") as f:
        bands = json.load(f)
    failed = set(pair.get("failed", []))
    both_failed = {
        q for q in failed
        if q in pair.get("queries_s1", {}) and q in pair.get("queries_s2", {})
        # failed[] lists either-pass failures; a query is unmeasurable
        # only if no pass succeeded, which pair-min can't express alone.
        # Conservatively skip anything flagged at all.
    }
    cur = bands.setdefault(sf, {})
    added, tightened = 0, 0
    for q, v in sorted(pair["queries"].items()):
        if q in both_failed:
            print(f"skip {q}: in failed[]")
            continue
        old = cur.get(q)
        if old is None:
            cur[q] = round(v, 4)
            added += 1
            print(f"new  {q}: {v:.3f}")
        elif v < old:
            cur[q] = round(v, 4)
            tightened += 1
            print(f"min  {q}: {old:.3f} -> {v:.3f}")
    with open("BASELINE_BANDS.json", "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"== {sf}: {added} new bands, {tightened} tightened, "
          f"{len(cur)} total")


if __name__ == "__main__":
    main()
