#!/usr/bin/env python3
"""Assemble the canonical scale artifacts from a 10x/20x Bench pair.

Usage: python3 tools/scale_artifacts.py <detail10.json> <detail20.json> \
           [recall10_dir] [recall20_dir]

- copies the per-sf detail files over BENCH_SCALE10_FULL.json /
  BENCH_SCALE20_FULL.json;
- computes the 20x/10x wall ratio RAW and CANARY-NORMALIZED
  (VERDICT r17 #5: the raw headline mixed a load-1.27 window with a
  load-1.43 one; ratio_norm = (t20/t10) / (canary20/canary10)) and
  stamps both into BOTH artifacts;
- if recall dirs are given (graft.Verify output dirs containing
  q_fpband_recall*.parquet), embeds the recall rows so the
  production-cap recall at scale is a committed number
  (VERDICT r17 #2), plus the truth-pair counts whose 20x/10x ratio is
  the fixture-linearity check (VERDICT r17 #3).

Dev-only tool - not part of the library (pandas is driver-side).
"""
import glob
import json
import sys

import pandas as pd


def read_recall(vdir: str) -> dict:
    out = {}
    for name in ("q_fpband_recall", "q_fpband_recall_prod"):
        files = glob.glob(f"{vdir}/{name}/*.parquet")
        if not files:
            continue
        df = pd.concat(pd.read_parquet(f) for f in files)
        r = df.iloc[0]
        out[name] = {
            "n_true_pairs": int(r["n_true_pairs"]),
            "n_found": int(r["n_found"]),
            "recall_pm": int(r["recall_pm"]),
        }
    return out


def read_mergesize(vdir: str) -> dict:
    """Stream-cluster merge-graph size at this fixture (VERDICT r18 #6):
    makes the driver union-find cap a measured margin in the scale
    artifacts, not a guess."""
    files = glob.glob(f"{vdir}/q_streamcluster_mergesize/*.parquet")
    if not files:
        return {}
    r = pd.concat(pd.read_parquet(f) for f in files).iloc[0]
    return {
        "max_merge_pairs": int(r["max_merge_pairs"]),
        "n_batches_with_merges": int(r["n_batches_with_merges"]),
        "cap": int(r["cap"]),
        "cap_headroom": round(int(r["cap"]) / max(1, int(r["max_merge_pairs"])), 1),
    }


def main() -> None:
    d10_path, d20_path = sys.argv[1], sys.argv[2]
    d10 = json.load(open(d10_path))
    d20 = json.load(open(d20_path))
    for name, d in (("10x", d10), ("20x", d20)):
        if d.get("unadjudicated"):
            sys.exit(f"{name} run is flagged unadjudicated - not a citable "
                     "scale artifact; re-run on a quiet window")
        if d.get("basis") != "toRdd":
            sys.exit(f"{name} run has basis {d.get('basis')!r} - cross-basis")
    raw = d20["value"] / d10["value"]
    cratio = d20["canary_med"] / d10["canary_med"]
    norm = raw / cratio
    for d in (d10, d20):
        d["wall_ratio_raw"] = round(raw, 4)
        d["wall_ratio_normalized"] = round(norm, 4)
        d["wall_ratio_canaries"] = [d10["canary_med"], d20["canary_med"]]
    if len(sys.argv) > 3:
        d10["fpband_recall"] = read_recall(sys.argv[3])
        ms10 = read_mergesize(sys.argv[3])
        if ms10:
            d10["streamcluster_merge_graph"] = ms10
    if len(sys.argv) > 4:
        d20["fpband_recall"] = read_recall(sys.argv[4])
        ms20 = read_mergesize(sys.argv[4])
        if ms20:
            d20["streamcluster_merge_graph"] = ms20
        t10 = d10.get("fpband_recall", {}).get("q_fpband_recall_prod", {})
        t20 = d20["fpband_recall"].get("q_fpband_recall_prod", {})
        if t10.get("n_true_pairs") and t20.get("n_true_pairs"):
            d20["true_pair_growth_20x_over_10x"] = round(
                t20["n_true_pairs"] / t10["n_true_pairs"], 3)
    json.dump(d10, open("BENCH_SCALE10_FULL.json", "w"))
    json.dump(d20, open("BENCH_SCALE20_FULL.json", "w"))
    print(f"raw wall ratio {raw:.3f}, canary ratio {cratio:.3f}, "
          f"normalized {norm:.3f}")
    for name, d in (("10x", d10), ("20x", d20)):
        print(name, "total", round(d["value"], 1), "load", d["load_ratio"],
              "recall:", d.get("fpband_recall"),
              "mergesize:", d.get("streamcluster_merge_graph"))
    print("growth:", d20.get("true_pair_growth_20x_over_10x"))


if __name__ == "__main__":
    main()
