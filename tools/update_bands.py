#!/usr/bin/env python3
"""Fold a definitive clean pair into BASELINE_BANDS.json.

Band protocol (BASELINE.md): a query's band at an SF is the per-query
MIN across that round's clean FULL-SUITE pairs — the warmest honest
reading. New gates enter at their first pair-min; existing gates only
ever tighten (a slower pair never loosens a band, it just has to stay
inside 2x of the recorded one).

Usage: update_bands.py <pair_json> <sf_key> [--force]
Guards: a SUBSET pair (SPARK_GRAFT_ONLY diagnosis run) must never fold
— its warmer cache deflates times and the min-only rule would lock the
over-tight band in forever. The script refuses any pair covering less
than 90% of the recorded band set unless --force is given (legitimate
only for a first-ever band set). Queries flagged in failed[] are
skipped (a time-to-exception is not a band).
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: update_bands.py <pair_json> <sf_key> [--force]")
    pair_path, sf = sys.argv[1], sys.argv[2]
    force = "--force" in sys.argv[3:]
    with open(pair_path) as f:
        pair = json.load(f)
    with open("BASELINE_BANDS.json") as f:
        bands = json.load(f)
    flagged = set(pair.get("failed", []))
    if sf not in bands and not force:
        sys.exit(f"unknown SF key '{sf}' (have: {sorted(bands)}) — a "
                 "typo here would silently seed a bogus band section; "
                 "pass --force to create a genuinely new SF.")
    cur = bands.setdefault(sf, {})
    if cur and len(pair["queries"]) < 0.9 * len(cur) and not force:
        sys.exit(
            f"refusing to fold: pair covers {len(pair['queries'])} "
            f"queries but {sf} has {len(cur)} recorded bands — this "
            "looks like a SPARK_GRAFT_ONLY subset run (warmer cache, "
            "deflated times; min-only folding would over-tighten "
            "forever). Bands update only from full-suite pairs; pass "
            "--force only for a first-ever band set.")
    added, tightened = 0, 0
    for q, v in sorted(pair["queries"].items()):
        if q in flagged:
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
