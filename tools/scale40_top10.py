#!/usr/bin/env python3
"""Assemble BENCH_SCALE40_TOP10.json — the third scale point (VERDICT
r19 #3): a 40x subset run of the 10 slowest queries from the committed
20x artifact, giving superlinear terms (stream state, band joins,
iterative graph passes) a third point before any 100x claim.

Usage: python3 tools/scale40_top10.py <detail40.json> [verify40_dir]

- reads the 40x subset detail (the Bench *_LAST file for the 40x
  fixture) plus the committed BENCH_SCALE10_FULL.json /
  BENCH_SCALE20_FULL.json per-query medians;
- emits per-query t10/t20/t40 and the CANARY-NORMALIZED step ratios
  (r17 #5 discipline: ratio / (canary_hi/canary_lo)) — for linear
  scaling the normalized 40/20 step sits near 2.0, like the 20/10 one;
- if a 40x graft.Verify dir is given, embeds the production-cap recall
  rows (fpband + textband) and the stream-cluster merge-graph margin so
  "zero cap overflows at 40x" is a committed number.

Dev-only tool - not part of the library (pandas is driver-side).
"""
import glob
import json
import sys

import pandas as pd


def read_row(vdir: str, name: str, cols) -> dict:
    files = glob.glob(f"{vdir}/{name}/*.parquet")
    if not files:
        return {}
    r = pd.concat(pd.read_parquet(f) for f in files).iloc[0]
    return {c: int(r[c]) for c in cols}


def main() -> None:
    d40 = json.load(open(sys.argv[1]))
    if d40.get("unadjudicated"):
        sys.exit("40x run is flagged unadjudicated - re-run on a quiet window")
    if d40.get("basis") != "toRdd":
        sys.exit(f"40x run has basis {d40.get('basis')!r} - cross-basis")
    d10 = json.load(open("BENCH_SCALE10_FULL.json"))
    d20 = json.load(open("BENCH_SCALE20_FULL.json"))
    c10, c20, c40 = (d["canary_med"] for d in (d10, d20, d40))
    per = {}
    for q, t40 in sorted(d40["queries"].items()):
        t10, t20 = d10["queries"].get(q), d20["queries"].get(q)
        row = {"t10": t10, "t20": t20, "t40": round(t40, 3)}
        if t10 and t20:
            row["step_20_over_10_norm"] = round((t20 / t10) / (c20 / c10), 3)
        if t20:
            row["step_40_over_20_norm"] = round((t40 / t20) / (c40 / c20), 3)
        per[q] = row
    out = {
        "metric": "scale40_top10_wall",
        "value": d40["value"],
        "unit": "sec",
        "basis": d40["basis"],
        "passes": d40["passes"],
        "sf_dir": "40x copies of sf0.1 (graft.tools.Scale10, 40 distinct bijections)",
        "canary_med": [c10, c20, c40],
        "load_ratio": d40.get("load_ratio"),
        "queries": per,
        "note": ("all three points (10x/20x FULL-suite artifacts, this "
                 "40x subset) run the same current code, including the "
                 "r20 production caps on the band joins and the r20 "
                 "vec_idot q_random_projection shape; the recall rows "
                 "below price exactly what the caps dropped at 40x."),
    }
    if len(sys.argv) > 2:
        vdir = sys.argv[2]
        out["fpband_recall_prod"] = read_row(vdir, "q_fpband_recall_prod",
            ["n_true_pairs", "n_found", "recall_pm"])
        out["textband_recall_prod"] = read_row(vdir, "q_textband_recall_prod",
            ["n_true_pairs", "n_found", "recall_pm",
             "n_cand_plain", "n_cand_capped"])
        ms = read_row(vdir, "q_streamcluster_mergesize",
            ["max_merge_pairs", "n_batches_with_merges", "cap"])
        if ms:
            ms["cap_headroom"] = round(ms["cap"] / max(1, ms["max_merge_pairs"]), 1)
            out["streamcluster_merge_graph"] = ms
    json.dump(out, open("BENCH_SCALE40_TOP10.json", "w"), indent=1)
    for q, row in per.items():
        print(q, row)
    print("recall:", out.get("fpband_recall_prod"), out.get("textband_recall_prod"))
    print("mergesize:", out.get("streamcluster_merge_graph"))


if __name__ == "__main__":
    main()
