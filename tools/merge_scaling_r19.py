#!/usr/bin/env python3
"""r19 SCALING update: SCALING_r18 rows carried VERBATIM for unchanged
queries; the r19-new query (q302 erasure-execution oracle) and the
r19-changed queries (q163 under the qm-grid-floor clamp, q298 under the
single-window rank+lag pairing, q288/q290/q300 under the unified
foldWaves skeleton - a code-structure refactor with identical plans,
re-measured anyway) take per-side MIN across all provided ScaleCpu
artifacts (progress-seeded subset runs with per-query warmup
executions, the established min-merge discipline).

Usage: python3 tools/merge_scaling_r19.py sf01a.json,sf01b.json,... \
           sf10a.json,sf10b.json,...

Idempotent: the provenance sentence replaces any prior r19 sentence.
"""
import json
import sys

TARGETS = [
    "q163_kl_mixture", "q288_evolving_admission", "q290_embed_evolving",
    "q298_prefix_schedule", "q300_media_evolving", "q302_erasure_forget",
    "q303_governance_certificate",
]

NOTE = ("; the r19 queries (q302/q303 new - the erasure-execution and "
        "governance-certificate oracles; "
        "q163 re-measured under the qm-grid-floor clamp, q298 under the "
        "single-window rank+lag pairing, q288/q290/q300 under the "
        "unified foldWaves skeleton - identical plans, re-measured "
        "anyway) measured by tools/merge_scaling_r19.py progress-seeded "
        "subset ScaleCpu runs - three-plus runs per side, per-query "
        "warmup execution, per-query MIN; q303 rows are from the FINAL "
        "r19 binary (vacuum-wired pack phase + recursive audit), two "
        "cold single-query runs per side - LIKE contexts, the honest "
        "factor basis")


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
    base = json.load(open("SCALING_r18.json"))
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
    method = base["method"].split("; the r19 queries")[0]
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
