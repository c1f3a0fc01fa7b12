#!/usr/bin/env python3
"""Two-sample pair-min bench protocol (BASELINE.md): given two
back-to-back graft.Bench JSON lines, emit per-query pair-min as the
band set and flag queries whose pair-min exceeds RATIO x a reference
band file (a previous pair-min JSON). Usage:
  bench_pair.py s1.json s2.json [ref.json [ratio]]
Writes the pair-min JSON to stdout line 1, human report after.
"""
import json, sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    # "value" is required: a queries-only JSON is not a Bench sample
    return d["queries"], d["value"], d.get("failed", [])


def main():
    s1p, s2p = sys.argv[1], sys.argv[2]
    refp = sys.argv[3] if len(sys.argv) > 3 else None
    ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    q1, t1, f1 = load(s1p)
    q2, t2, f2 = load(s2p)
    failed = sorted(set(f1) | set(f2))
    if failed:
        print(f"FAILURES present: s1={f1} s2={f2} — these queries are "
              f"EXCLUDED from the band set (a time-to-exception is not "
              f"a band)", file=sys.stderr)
    common = sorted((set(q1) & set(q2)) - set(failed))
    only = sorted(set(q1) ^ set(q2))
    if only:
        print(f"WARNING: queries not in both samples: {only}",
              file=sys.stderr)
    pm = {k: min(q1[k], q2[k]) for k in common}
    out = {"metric": "pair_min_total", "value": sum(pm.values()),
           "unit": "sec", "queries": pm,
           "samples": [t1, t2], "failed": failed, "n": len(pm)}
    print(json.dumps(out))
    print(f"# samples {t1:.1f} / {t2:.1f} s; pair-min total "
          f"{sum(pm.values()):.1f} s over {len(pm)} queries",
          file=sys.stderr)
    if refp:
        with open(refp) as f:
            ref = json.load(f)["queries"]
        offenders = []
        for k in common:
            if k in ref and ref[k] > 0 and pm[k] > ratio * ref[k]:
                offenders.append((pm[k] / ref[k], k, ref[k], pm[k]))
        offenders.sort(reverse=True)
        if offenders:
            print(f"# {len(offenders)} queries above {ratio}x their "
                  f"reference band:", file=sys.stderr)
            for r, k, rv, pv in offenders:
                print(f"#   {k}: {rv:.2f} -> {pv:.2f} s ({r:.1f}x)",
                      file=sys.stderr)
        else:
            print(f"# no query above {ratio}x its reference band "
                  f"({sum(1 for k in common if k in ref)} compared)",
                  file=sys.stderr)
        import statistics
        ratios = [pm[k] / ref[k] for k in common if k in ref and ref[k] > 0]
        if ratios:
            print(f"# median ratio vs ref: "
                  f"{statistics.median(ratios):.2f}, max "
                  f"{max(ratios):.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
