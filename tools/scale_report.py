#!/usr/bin/env python3
"""Full-suite sf0.1 -> sf1.0 scaling report (driver-side tooling).

Joins graft.ScaleCpu artifacts and prints per-query cpu factors
(cpu-seconds are the load-immune metric; wall factors shown for
context), sorted by factor descending, plus a bucketed summary.

Each side accepts MULTIPLE artifacts (comma-separated): the per-query
MIN across runs is used, the same discipline as Bench's multi-pass
per-query MIN — a co-tenant burst inflates one run's cpu by up to
~6x (measured: q84 16.2 -> 2.7 cpu-s across two runs of the same
binary on the same data), and min-of-runs is the least-contaminated
estimate of true work.

Usage: python3 tools/scale_report.py sf01.json[,sf01b.json] \
           sf10.json[,sf10b.json]
"""
import json
import sys


def load(paths):
    merged = {}
    for p in paths.split(","):
        for q, v in json.load(open(p))["queries"].items():
            if q in merged:
                merged[q] = {k: min(merged[q][k], v[k]) for k in ("wall", "cpu")}
            else:
                merged[q] = dict(v)
    return merged


def main(base_path, scaled_path):
    base = load(base_path)
    scaled = load(scaled_path)
    rows = []
    for q in sorted(base):
        if q not in scaled:
            print(f"MISSING at scale: {q}")
            continue
        b, s = base[q], scaled[q]
        # sub-0.05 cpu-s bases are scheduler noise; floor to keep factors honest
        bc = max(b["cpu"], 0.05)
        rows.append((s["cpu"] / bc, q, b["cpu"], s["cpu"],
                     s["wall"] / max(b["wall"], 0.05)))
    rows.sort(reverse=True)
    print(f"{'query':30s} {'cpu0.1':>8s} {'cpu1.0':>8s} {'cpu x':>7s} {'wall x':>7s}")
    for f, q, bc, sc, wf in rows:
        print(f"{q:30s} {bc:8.2f} {sc:8.2f} {f:7.1f} {wf:7.1f}")
    buckets = [(0, 3, "strongly sublinear (<3x)"),
               (3, 7, "sublinear (3-7x)"),
               (7, 12, "~linear (7-12x)"),
               (12, 1e9, "SUPERLINEAR (>12x) - explain each")]
    print("\nbuckets (cpu factor at 10x data):")
    for lo, hi, label in buckets:
        qs = [q for f, q, *_ in rows if lo <= f < hi]
        print(f"  {label}: {len(qs)}")
        if lo >= 12:
            for q in qs:
                print(f"    {q}")
    tb = sum(r[2] for r in rows)
    ts = sum(r[3] for r in rows)
    print(f"\nsuite totals: cpu {tb:.1f} -> {ts:.1f} s ({ts / tb:.2f}x at 10x data)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
