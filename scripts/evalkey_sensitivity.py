"""Validation-metric sensitivity to the eval direction key (VERDICT r3
weak #8).

The runner renders validation with a FIXED spherical-direction key
(train/runner.py:render_dataset, eval_seed=1234) for reproducible
curves; the reference draws a fresh random azimuth offset on every
forward (reference/renderer.py:148-150 — no eval switch). This script
quantifies what that choice is worth: it loads a committed full-budget
checkpoint (results/interp_fullbudget/logs/trilinear_s0), renders the
test split under N different direction keys, and reports the per-metric
spread — the key-choice noise floor to compare against the
trilinear-vs-simplex deltas the headline gate acts on.

Runs on CPU. Usage: python scripts/evalkey_sensitivity.py [n_keys=8]
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import interp_fullbudget_ab as fullbudget  # noqa: E402
from avr_tpu.metrics import metric_cal  # noqa: E402
from avr_tpu.train.runner import METRIC_KEYS, AVRRunner  # noqa: E402

NAMES = dict(zip(METRIC_KEYS, ("angle_error", "amp_error", "env_error",
                               "t60_error", "c50_error", "edt_error",
                               "multi_stft")))


def metrics_for_seed(runner, seed: int) -> dict:
    pred, ori = runner.render_dataset(runner.test_data, eval_seed=seed)
    ori_t = np.fft.irfft(ori, axis=-1)
    pred_t = np.fft.irfft(pred, axis=-1)
    per = [
        metric_cal(ori_t[i : i + 1], pred_t[i : i + 1], fs=fullbudget.FS)
        for i in range(len(pred_t))
    ]
    return {
        k: float(np.nanmean([getattr(m, NAMES[k]) for m in per]))
        for k in METRIC_KEYS
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n_keys", nargs="?", type=int, default=8)
    ap.add_argument("--run", default="hybrid4_s0",
                    help="A/B run name under results/interp_fullbudget/logs "
                         "with a populated ckpts/ dir")
    ap.add_argument("--interp", default="hybrid:4")
    args = ap.parse_args()
    n_keys = args.n_keys
    logdir = os.path.join("results", "interp_fullbudget", "logs")
    data_dir = os.path.join("results", "interp_fullbudget", "data")
    assert os.path.isdir(os.path.join(logdir, args.run, "ckpts")), (
        f"{args.run}: no ckpts dir"
    )
    cfg = fullbudget.make_cfg(logdir, args.run, args.interp, 40_000, 0)
    cfg.train.load_ckpt = True
    runner = AVRRunner(cfg, data_dir)
    assert int(runner.state.step) > 0, "checkpoint did not load"
    print(f"checkpoint at step {int(runner.state.step)}", flush=True)

    rows = {}
    for i in range(n_keys):
        seed = 1234 if i == 0 else 17 + i  # first row = the shipped key
        rows[seed] = metrics_for_seed(runner, seed)
        print(f"seed {seed:5d}: " + " ".join(
            f"{k}:{v:.4f}" for k, v in rows[seed].items()), flush=True)

    report = {}
    print(f"\n{'metric':12s} {'fixed(1234)':>12s} {'mean':>10s} {'std':>10s} "
          f"{'range':>10s}")
    for k in METRIC_KEYS:
        vals = np.asarray([rows[s][k] for s in rows])
        report[k] = {
            "fixed": rows[1234][k],
            "mean": float(np.nanmean(vals)),
            "std": float(np.nanstd(vals)),
            "range": float(np.nanmax(vals) - np.nanmin(vals)),
        }
        r = report[k]
        print(f"{k:12s} {r['fixed']:12.5g} {r['mean']:10.5g} "
              f"{r['std']:10.3g} {r['range']:10.3g}")

    out = os.path.join("results", "interp_fullbudget", "evalkey_sensitivity.json")
    with open(out, "w") as f:
        json.dump({"n_keys": n_keys, "rows": rows, "report": report}, f, indent=1)
    print(f"\n-> {out}", flush=True)


if __name__ == "__main__":
    main()
