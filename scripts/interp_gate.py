"""Gate the headline interpolation mode on the full-budget quality A/B.

Reads results/interp_fullbudget/ab_summary.json (written by
scripts/interp_fullbudget_ab.py) and reports, per metric, the
trilinear-vs-simplex mean delta against seed noise. The decision rule
(VERDICT r2 item 1): the simplex headline stands only if simplex is not
WORSE than trilinear outside seed noise on any metric; otherwise
bench.py / __graft_entry__ must flip to trilinear.

"Outside seed noise": |mean_t - mean_s| > max(std_t, std_s) with 3
seeds per mode (a coarse two-sigma-ish screen appropriate for n=3 —
the same granularity the round-1 verdict applied to the 2-seed A/B).
All metrics are lower-is-better (error metrics + DoA degrees).

Usage: python scripts/interp_gate.py [ab_summary.json]
Exit code 0 = simplex headline stands, 1 = flip to trilinear.
"""

import json
import math
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else (
    "results/interp_fullbudget/ab_summary.json"
)


def main():
    with open(PATH) as f:
        summary = json.load(f)
    table = summary["table"]
    keys = sorted(table["trilinear"])
    flip = []
    print(f"{'metric':14s} {'trilinear':>18s} {'simplex':>18s}  verdict")
    for k in keys:
        t_m, t_s = table["trilinear"][k]
        s_m, s_s = table["simplex"][k]
        if any(math.isnan(v) for v in (t_m, s_m)):
            verdict = "undefined (NaN)"
        else:
            noise = max(t_s, s_s)
            delta = s_m - t_m  # >0: simplex worse (all lower-is-better)
            if abs(delta) <= noise:
                verdict = f"within noise (d={delta:+.3g} <= {noise:.3g})"
            elif delta > 0:
                verdict = f"SIMPLEX WORSE (d={delta:+.3g} > {noise:.3g})"
                flip.append(k)
            else:
                verdict = f"simplex better (d={delta:+.3g})"
        print(f"{k:14s} {t_m:9.4g} ±{t_s:7.3g} {s_m:9.4g} ±{s_s:7.3g}  {verdict}")

    if flip:
        print(f"\nGATE: flip headline to TRILINEAR — simplex worse outside "
              f"seed noise on: {', '.join(flip)}")
        return 1
    print("\nGATE: simplex headline stands (no metric worse outside seed noise)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
