#!/usr/bin/env python3
"""Build SCALING_r16.json: SCALING_r15 rows carried VERBATIM for unchanged
queries; the ten r16-new/changed queries (q139 null-rate-delta exact
rational, q169/q175/q185/q276 touched by the gram-table memo / n_tok
guard, q281/q282/q283/q284/q285 new) take per-side MIN across all r16
ScaleCpu artifacts (subset runs + one full-suite pass per SF, the
r13-r15 discipline).

Usage: python3 tools/merge_scaling_r16.py sf01a.json,sf01b.json,...  \
           sf10a.json,sf10b.json,...
"""
import json
import sys

TARGETS = [
    "q139_profile_diff", "q169_lm_quality_5gram", "q175_lm_5gram_pruned",
    "q185_ccnet_head", "q276_sft_pack_mask", "q281_sft_multiturn_mask",
    "q282_interleaved_pack", "q283_epoch_reshuffle",
    "q284_drift_stream_monitor", "q285_multiepoch_stream",
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
    r15 = json.load(open("SCALING_r15.json"))
    b, s = load(p01), load(p10)
    out = dict(r15)
    qs = dict(r15["queries"])
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
        "SCALING_r15 carried verbatim for unchanged queries; the ten "
        "r16-new/changed queries (q139 exact-rational null-rate delta, "
        "q169/q175/q185/q276 touched by the gram-table memo + n_tok guard, "
        "q281/q282/q283/q284/q285 new) measured under the identical "
        "graft.ScaleCpu harness - multiple runs per side including one "
        "full-suite pass per SF (fully JIT-warmed, the context the "
        "r13-r15 rows were measured in), per-query MIN per side")
    json.dump(out, open("SCALING_r16.json", "w"), indent=1)
    for q in TARGETS:
        print(q, qs[q])
    print("suite:", out["suite_cpu_sf01"], "->", out["suite_cpu_sf10"],
          "factor", out["suite_factor"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
