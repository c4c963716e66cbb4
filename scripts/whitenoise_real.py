"""Run the whitenoise long + bandpass DoA pipelines on a REAL checkpoint.

VERDICT r2 item 5: the pipelines were fixture-tested only; this drives
them on an actual trained model's val npz (a full-budget quality-A/B
run, results/interp_fullbudget/logs/<run>/val_result/val_iter*.npz) with
caps OFF (full-signal windows), both framings, ranked summary CSVs —
the reference's whitenoise_long_doa.py / whitenoise_bandpass_doa.py
workflow (configs: reference/whitenoise_config/*.yml).

Long framing runs the reference's whitenoise_long_config.yml grid
verbatim (100 s noise, 4 STFT conditions, T_use 16..512). The bandpass
framing runs a stated SUBSET of the reference grid (2 bands x 2 noise
lengths x 2 segmentations x 1 overlap x 2 STFT = 16 conditions vs the
reference's 5,040) — grid size is a config choice there, not a cap; the
per-condition evaluation is complete.

Usage: python scripts/whitenoise_real.py [run_logdir] (CPU-only; DoA is
host-side numpy). Resume-safe via the per-condition pickle cache.
"""

import glob
import os
import re
import sys

sys.path.insert(0, ".")

from avr_tpu.eval.whitenoise import WhitenoiseConfig, run_whitenoise_eval  # noqa: E402

ROOT = os.path.join("results", "whitenoise")
FS = 16000


def latest_val_npz(run_logdir: str) -> str:
    files = glob.glob(os.path.join(run_logdir, "val_result", "val_iter*.npz"))
    if not files:
        raise SystemExit(f"no val_iter*.npz under {run_logdir}/val_result")
    return max(files, key=lambda p: int(re.findall(r"\d+", os.path.basename(p))[0]))


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        "results", "interp_fullbudget", "logs", "simplex_s0"
    )
    npz = latest_val_npz(run)
    # per-checkpoint output tree: the per-condition pickle cache keys do
    # not include the npz path, so each checkpoint needs its own outdir
    outroot = os.path.join(ROOT, os.path.basename(os.path.normpath(run)))
    print(f"checkpoint npz: {npz} -> {outroot}", flush=True)

    # ---- long framing: the reference whitenoise_long_config.yml grid
    long_cfg = WhitenoiseConfig(
        npz=npz, outdir=os.path.join(outroot, "long"), fs=FS, seeds=[0],
        long_noise_seconds=100.0,
        stft_grid=[
            {"nfft": 512, "hop": 256, "win": "hann"},
            {"nfft": 512, "hop": 256, "win": "none"},
            {"nfft": 1024, "hop": 512, "win": "hann"},
            {"nfft": 1024, "hop": 512, "win": "none"},
        ],
        T_use_list=[16, 32, 64, 128, 256, 512],
    )
    df = run_whitenoise_eval(long_cfg)
    print(f"[long] {len(df)} conditions -> {long_cfg.outdir}/summary_ranked.csv",
          flush=True)
    print(df.head(5).to_string(), flush=True)

    # ---- bandpass framing: stated subset of the reference grid
    bp_cfg = WhitenoiseConfig(
        npz=npz, outdir=os.path.join(outroot, "bandpass"), fs=FS, seeds=[0],
        bands_hz=[(500.0, 6000.0), (1000.0, 4000.0)],
        band_names=["bp_0p5_6k", "bp_1_4k"],
        noise_seconds_list=[1.0, 2.0],
        segments_ms=[100.0, 200.0],
        overlap_factors=[0.5],
        stft_grid=[
            {"nfft": 256, "hop": 128, "win": "hann"},
            {"nfft": 512, "hop": 256, "win": "hann"},
        ],
    )
    df = run_whitenoise_eval(bp_cfg)
    print(f"[bandpass] {len(df)} conditions -> {bp_cfg.outdir}/summary_ranked.csv",
          flush=True)
    print(df.head(5).to_string(), flush=True)


if __name__ == "__main__":
    main()
