#!/usr/bin/env python3
"""r17 SCALING update: SCALING_r16 rows carried VERBATIM for unchanged
queries; the r17-new queries (q294-q297) and the r17-changed queries
(q169/q175 deferred-persist gram memo, q288 single-checkpoint wave fold,
q291 empty-retrieval plant) take per-side MIN across all provided
ScaleCpu artifacts (progress-seeded subset runs with per-query warmup
executions, the established min-merge discipline).

Usage: python3 tools/merge_scaling_r17.py sf01a.json,sf01b.json,... \
           sf10a.json,sf10b.json,...

Idempotent: the provenance sentence replaces any prior r17 sentence
instead of accumulating (the r16 ADVICE lesson).
"""
import json
import sys

TARGETS = [
    "q169_lm_quality_5gram", "q175_lm_5gram_pruned",
    "q288_evolving_admission", "q291_retrieval_eval",
    "q294_margin_index", "q295_moore_lewis",
    "q296_takedown_audit", "q297_soft_dedup",
]

NOTE = ("; the r17 queries (q294-q297 new; q169/q175 re-measured under "
        "the deferred-persist gram memo, q288 under the single-checkpoint "
        "wave fold, q291 with the empty-retrieval plant) measured by "
        "tools/merge_scaling_r17.py progress-seeded subset ScaleCpu runs "
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
    base = json.load(open("SCALING_r16.json"))
    b, s = load(p01), load(p10)
    out = dict(base)
    qs = dict(base["queries"])
    for q in TARGETS:
        bc, sc = b[q], s[q]
        qs[q] = {
            "cpu_sf01": round(bc["cpu"], 2),
            "cpu_sf10": round(sc["cpu"], 2),
            "cpu_factor": round(sc["cpu"] / max(bc["cpu"], 0.05), 2),
            "wall_factor": round(sc["wall"] / max(bc["wall"], 0.05), 2),
        }
    suite01 = suite10 = 0.0
    for q, v in qs.items():
        suite01 += v["cpu_sf01"]
        suite10 += v["cpu_sf10"]
    out["queries"] = dict(sorted(qs.items()))
    out["suite_cpu_sf01"] = round(suite01, 1)
    out["suite_cpu_sf10"] = round(suite10, 1)
    out["suite_factor"] = round(suite10 / suite01, 2)
    base_method = base["method"]
    marker = "; the r17 queries ("
    if marker in base_method:
        base_method = base_method[:base_method.index(marker)]
    out["method"] = base_method + NOTE
    json.dump(out, open("SCALING_r17.json", "w"), indent=1)
    for q in TARGETS:
        print(q, qs[q])
    print("suite:", out["suite_cpu_sf01"], "->", out["suite_cpu_sf10"],
          "factor", out["suite_factor"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
