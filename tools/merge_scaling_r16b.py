#!/usr/bin/env python3
"""Second-half r16 SCALING update: SCALING_r16.json rows carried VERBATIM
for everything already measured; the late-r16 queries (q286-q293) take
per-side MIN across all provided ScaleCpu artifacts (three subset runs per
side with per-query warmup executions, the established min-merge
discipline; q288's rows are post-rewrite — the materialize-once signature
fix — so only post-fix artifacts may be passed for it).

Usage: python3 tools/merge_scaling_r16b.py sf01a.json,sf01b.json,... \
           sf10a.json,sf10b.json,...
"""
import json
import sys

TARGETS = [
    "q286_preference_rank", "q287_threshold_sweep",
    "q288_evolving_admission", "q289_margin_mining",
    "q290_embed_evolving", "q291_retrieval_eval", "q292_pad_waste",
    "q293_prefix_cache",
]


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
    # idempotent: re-running the merge must not re-append the provenance
    # sentence (the committed artifact once accumulated it three times)
    note_marker = "the late-r16 queries (q286-q293) measured by"
    base_method = base["method"]
    if note_marker in base_method:
        base_method = base_method[:base_method.index("; " + note_marker)]
    out["method"] = (base_method +
        "; the late-r16 queries (q286-q293) measured by "
        "tools/merge_scaling_r16b.py under the same ScaleCpu harness - "
        "three subset runs per side (per-query warmup execution, light "
        "ballast queries first for JIT warmth), per-query MIN per side; "
        "q288 rows are post-rewrite (materialize-once signatures, id-only "
        "checkpoints); q289 measures the bounded shard-pair kernel "
        "(the marginMine contract - unsharded sides are quadratic by "
        "construction, measured 9 -> 1090 cpu-s)")
    json.dump(out, open("SCALING_r16.json", "w"), indent=1)
    for q in TARGETS:
        print(q, qs[q])
    print("suite:", out["suite_cpu_sf01"], "->", out["suite_cpu_sf10"],
          "factor", out["suite_factor"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
