#!/usr/bin/env python3
"""r19 SCALING update, part 2: SCALING_r19 rows carried VERBATIM for
unchanged queries; the eight late-r19 queries (q304 DoReMi mixture, q305
repetition allocation, q306 DP release, q307 leakage-safe cluster split,
q308 DP sums, q309 pass@k, q310 BT leaderboard, q311 DP histogram) take per-side MIN across the provided
ScaleCpu artifacts (progress-seeded subset runs with per-query warmup
executions, the established min-merge discipline).

Usage: python3 tools/merge_scaling_r19b.py sf01a.json,sf01b.json,... \
           sf10a.json,sf10b.json,...

Idempotent: the provenance sentence replaces any prior r19b sentence.
"""
import json
import sys

TARGETS = [
    "q304_doremi_mixture", "q305_repetition_alloc", "q306_dp_release",
    "q307_cluster_split", "q308_dp_sums", "q309_pass_at_k",
    "q310_bt_leaderboard", "q311_dp_histogram",
]

NOTE = ("; the eight late-r19 queries (q304 DoReMi mixture, q305 "
        "repetition allocation, q306 DP release, q307 leakage-safe "
        "cluster split, q308 DP sums, q309 pass@k, q310 BT leaderboard, "
        "q311 DP histogram) "
        "measured by "
        "tools/merge_scaling_r19b.py progress-seeded subset ScaleCpu "
        "runs - three runs per side, per-query warmup execution, "
        "per-query MIN, like contexts on both sides; two q306/q307 "
        "sf1.0 artifacts that had incidentally measured q308 "
        "ballast-warmed (the binary grew the query between subset runs) "
        "were excluded from q308's min - they had no like-context "
        "sf0.1 counterpart (the r17 dupClusters lesson)")


def load(paths):
    merged = {}
    for p in paths.split(","):
        for q, v in json.load(open(p))["queries"].items():
            if v["cpu"] == 0.0 and v["wall"] == 0.0:
                continue  # progress-seeded skip rows
            if q in merged:
                merged[q] = {k: min(merged[q][k], v[k]) for k in ("wall", "cpu")}
            else:
                merged[q] = dict(v)
    return merged


def main(p01, p10):
    base = json.load(open("SCALING_r19.json"))
    b, s = load(p01), load(p10)
    out = dict(base)
    qs = dict(base["queries"])
    for q in TARGETS:
        if q not in b or q not in s:
            print(f"WARNING: {q} missing from one side, skipped")
            continue
        qs[q] = {
            "cpu_sf01": round(b[q]["cpu"], 2),
            "cpu_sf10": round(s[q]["cpu"], 2),
            "cpu_factor": round(s[q]["cpu"] / b[q]["cpu"], 2)
            if b[q]["cpu"] > 0 else None,
            "wall_factor": round(s[q]["wall"] / b[q]["wall"], 2)
            if b[q]["wall"] > 0 else None,
        }
    out["queries"] = qs
    method = (base["method"].split("; the six late-r19 queries")[0]
              .split("; the seven late-r19 queries")[0]
              .split("; the eight late-r19 queries")[0])
    out["method"] = method + NOTE
    factors = [v["cpu_factor"] for v in qs.values()
               if isinstance(v, dict) and v.get("cpu_factor")]
    out["suite_cpu_factor_mean"] = round(sum(factors) / len(factors), 2)
    out["n_queries"] = len(qs)
    with open("SCALING_r19.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote SCALING_r19.json: {len(qs)} queries, "
          f"mean cpu factor {out['suite_cpu_factor_mean']}")
    for q in TARGETS:
        if q in qs:
            print(f"  {q}: {qs[q]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
