#!/usr/bin/env python3
"""Build SCALING_r15.json: SCALING_r14 rows carried VERBATIM for unchanged
queries; the ten r15-new/changed queries (q43 mean-of-ratios rewrite,
q268/q274/q275 walk-memo + hash-join edge restriction, q272's previously
missing row, q276/q277/q278/q279/q280 new) take per-side MIN across all
r15 ScaleCpu artifacts (subset runs + one full-suite pass per SF, the
r13/r14 discipline).

Usage: python3 tools/merge_scaling_r15.py sf01a.json,sf01b.json,...  \
           sf10a.json,sf10b.json,...
"""
import json
import sys

TARGETS = [
    "q43_quality", "q268_semantic_pack", "q272_epoch_expansion",
    "q274_pack_coherence", "q275_semantic_pack_offsets",
    "q276_sft_pack_mask", "q277_release_merge", "q278_topic_drift",
    "q279_pack_efficiency", "q280_text_admission",
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
    r14 = json.load(open("SCALING_r14.json"))
    b, s = load(p01), load(p10)
    out = dict(r14)
    qs = dict(r14["queries"])
    suite01 = suite10 = 0.0
    for q in TARGETS:
        bc, sc = b[q], s[q]
        qs[q] = {
            "cpu_sf01": round(bc["cpu"], 2),
            "cpu_sf10": round(sc["cpu"], 2),
            "cpu_factor": round(sc["cpu"] / max(bc["cpu"], 0.05), 2),
            "wall_factor": round(sc["wall"] / max(bc["wall"], 0.05), 2),
        }
    for q, v in qs.items():
        suite01 += v["cpu_sf01"]
        suite10 += v["cpu_sf10"]
    out["queries"] = dict(sorted(qs.items()))
    out["suite_cpu_sf01"] = round(suite01, 1)
    out["suite_cpu_sf10"] = round(suite10, 1)
    out["suite_factor"] = round(suite10 / suite01, 2)
    out["method"] = (
        "SCALING_r14 carried verbatim for unchanged queries; the ten "
        "r15-new/changed queries (q43 mean-of-ratios rewrite, q268/q274/"
        "q275 walk-memo + hash-join edge restriction, q272's missing row, "
        "q276/q277/q278/q279/q280 new) measured under the identical graft.ScaleCpu "
        "harness - multiple runs per side including one full-suite pass "
        "per SF (fully JIT-warmed, the context the r13/r14 rows were "
        "measured in), per-query MIN per side")
    json.dump(out, open("SCALING_r15.json", "w"), indent=1)
    for q in TARGETS:
        print(q, qs[q])
    print("suite:", out["suite_cpu_sf01"], "->", out["suite_cpu_sf10"],
          "factor", out["suite_factor"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
