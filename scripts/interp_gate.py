"""Gate the headline interpolation mode on the full-budget quality A/B.

Reads results/interp_fullbudget/ab_summary.json (written by
scripts/interp_fullbudget_ab.py) and reports, per metric, the
trilinear-vs-candidate mean delta against seed noise. The decision rule
(VERDICT r2 item 1): a faster candidate mode ships as the headline only
if it is not WORSE than trilinear outside seed noise on any metric;
otherwise bench.py / __graft_entry__ must flip to trilinear.

"Outside seed noise": |mean_t - mean_c| > max(std_t, std_c) with 3
seeds per mode (a coarse two-sigma-ish screen appropriate for n=3 —
the same granularity the round-1 verdict applied to the 2-seed A/B).
All metrics are lower-is-better (error metrics + DoA degrees).

Usage: python scripts/interp_gate.py [summary.json] [--candidate MODE]
       python scripts/interp_gate.py --logs --candidate MODE \
           [--seeds 0,1,2]     # build the table from per-run
                               # results/interp_fullbudget/logs/
                               # {mode}_s{seed}/result.json files
Exit code 0 = candidate headline stands, 1 = flip to trilinear.
"""

import argparse
import json
import math
import os
import sys

import numpy as np

LOGS = os.path.join("results", "interp_fullbudget", "logs")


def table_from_logs(modes, seeds, seq=None):
    table = {}
    for mode in modes:
        rows = []
        for seed in seeds:
            name = f"{mode.replace(':', '')}_s{seed}"
            if seq:  # C50-valid T=seq protocol (VERDICT r4 item 5)
                name += f"_T{seq}"
            path = os.path.join(LOGS, name, "result.json")
            with open(path) as f:
                rows.append(json.load(f)["summary"])
        table[mode] = {
            k: (float(np.mean([r[k] for r in rows])),
                float(np.std([r[k] for r in rows])))
            for k in rows[0]
        }
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("summary", nargs="?",
                    default="results/interp_fullbudget/ab_summary.json")
    ap.add_argument("--candidate", default="simplex")
    ap.add_argument("--logs", action="store_true",
                    help="aggregate per-run result.json files instead of "
                         "reading a summary")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--seq", type=int, default=None,
                    help="with --logs: read the _T{seq} runs (1600 = the "
                         "C50-valid protocol, all 7 metrics finite)")
    args = ap.parse_args()
    cand = args.candidate

    if args.logs:
        table = table_from_logs(
            ["trilinear", cand], [int(s) for s in args.seeds.split(",")],
            seq=args.seq,
        )
    else:
        with open(args.summary) as f:
            table = json.load(f)["table"]
    keys = sorted(table["trilinear"])
    flip = []
    print(f"{'metric':14s} {'trilinear':>18s} {cand:>18s}  verdict")
    for k in keys:
        t_m, t_s = table["trilinear"][k]
        s_m, s_s = table[cand][k]
        if any(math.isnan(v) for v in (t_m, s_m)):
            verdict = "undefined (NaN)"
        else:
            noise = max(t_s, s_s)
            delta = s_m - t_m  # >0: candidate worse (all lower-is-better)
            if abs(delta) <= noise:
                verdict = f"within noise (d={delta:+.3g} <= {noise:.3g})"
            elif delta > 0:
                verdict = f"{cand.upper()} WORSE (d={delta:+.3g} > {noise:.3g})"
                flip.append(k)
            else:
                verdict = f"{cand} better (d={delta:+.3g})"
        print(f"{k:14s} {t_m:9.4g} ±{t_s:7.3g} {s_m:9.4g} ±{s_s:7.3g}  {verdict}")

    if flip:
        print(f"\nGATE: flip headline to TRILINEAR — {cand} worse outside "
              f"seed noise on: {', '.join(flip)}")
        return 1
    print(f"\nGATE: {cand} headline stands (no metric worse outside seed "
          "noise)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
