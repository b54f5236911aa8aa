#!/usr/bin/env python3
"""r18 SCALING update: SCALING_r17 rows carried VERBATIM for unchanged
queries; the r18-new queries (q298-q301) and the r18-changed queries
(q163 micro-grid-first KL term, q290 doc-carrying embed index) take
per-side MIN across all provided ScaleCpu artifacts (progress-seeded
subset runs with per-query warmup executions, the established min-merge
discipline); q74/q297 are RE-MEASURED for the r17 verdict's dupClusters
investigation (DupProbe decomposition: edges grow exactly 10x with the
corpus, pair-build cpu 3.55x, CC-loop cpu 1.62x - the family is
edge-linear, no quadratic term; the r17 8.04x/7.35x factors were
fixed-overhead amortization asymmetry between subset contexts, not
candidate growth).

Usage: python3 tools/merge_scaling_r18.py sf01a.json,sf01b.json,... \
           sf10a.json,sf10b.json,...

Idempotent: the provenance sentence replaces any prior r18 sentence
instead of accumulating (the r16 ADVICE lesson).
"""
import json
import sys

TARGETS = [
    "q163_kl_mixture", "q290_embed_evolving",
    "q298_prefix_schedule", "q299_takedown_repack",
    "q300_media_evolving", "q301_ml_curate_funnel",
    "q74_dup_clusters", "q297_soft_dedup",
]

NOTE = ("; the r18 queries (q298-q301 new; q163 re-measured under the "
        "micro-grid-first KL term, q290 under the doc-carrying embed "
        "index, q74/q297 re-measured for the dupClusters investigation "
        "- DupProbe shows edges grow exactly 10x, pair-build cpu 3.55x, "
        "CC-loop cpu 1.62x: edge-linear, no quadratic term) measured by "
        "tools/merge_scaling_r18.py progress-seeded subset ScaleCpu runs "
        "- three runs per side, per-query warmup execution, per-query MIN")


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
    base = json.load(open("SCALING_r17.json"))
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
    # replace any prior r18 sentence (idempotent re-merge)
    method = base["method"].split("; the r18 queries")[0]
    out["method"] = method + NOTE
    factors = [v["cpu_factor"] for v in qs.values()
               if isinstance(v, dict) and v.get("cpu_factor")]
    out["suite_cpu_factor_mean"] = round(sum(factors) / len(factors), 2)
    out["n_queries"] = len(qs)
    with open("SCALING_r18.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote SCALING_r18.json: {len(qs)} queries, "
          f"mean cpu factor {out['suite_cpu_factor_mean']}")
    for q in TARGETS:
        if q in qs:
            print(f"  {q}: {qs[q]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
