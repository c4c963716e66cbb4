"""FULL-BUDGET trilinear-vs-simplex training A/B on the synthetic array.

The round-1 quality evidence for the simplex headline mode was a 1,500
iteration 2-seed A/B — too thin to hang a perf number on (VERDICT r1
Weak #3). This script runs the real protocol:

  * dataset: synthetic 8-mic-array Real_env rooms (the DoA-capable
    workload the fork's HPO optimizes, reference/optuna_avr_runner.py);
  * training: the reference protocol — Adam + cosine, full criterion
    incl. the DAS regression term, group-8 sampling, periodic val-npz
    dumps (reference/avr_runner.py:219-302);
  * budget: 40k iterations at batch 8 = the reference's 80k-iteration
    RAF budget under its own batch-size scaling rule (iteration budgets
    scale inversely with batch size, optuna_avr_runner.py:48-54; RAF
    trains 80k at batch 4, config_files/avr_raf_furnished.yml:44);
  * modes × seeds: {trilinear, simplex} × {0, 1, 2};
  * report: per-checkpoint 7-metric validation + the HPO objective
    (min over checkpoints of mean NormMUSIC pred-vs-gt DoA error,
    optuna_avr_runner.py:113-124).

Run on the TPU chip: `python scripts/interp_fullbudget_ab.py [iters]
[--seeds 0,1,2] [--calibrate]`. Resume-safe: finished runs leave a
result.json and are skipped on restart. Results land in
results/interp_fullbudget/.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from avr_tpu.config import AVRConfig, EncodingConfig, MLPConfig, PathConfig, TrainConfig
from avr_tpu.data import synthetic
from avr_tpu.hpo.runner import doa_objective_from_logdir
from avr_tpu.train.runner import AVRRunner

ROOT = os.path.join("results", "interp_fullbudget")
FS = 16000
SEQ = 800  # 50 ms IRs: enough reflections for DoA in a 6x5x3 room
# NOTE: at SEQ=800 the C50 metric is NaN by construction (the late-energy
# window beyond 50 ms is empty, reference/utils/metric.py:60-72). Use
# --seq 1600 (100 ms) for C50-valid runs (VERDICT r3 item 4): datasets
# land in data_s{seq}/ and runs in logs under a _T{seq} suffix.


def make_cfg(logdir: str, name: str, interp: str, iters: int, seed: int,
             seq: int = SEQ) -> AVRConfig:
    """The demo synthetic-array config (configs/avr_synthetic_array_fast
    .yml) scaled so a step is ~tens of ms — SAME scale for both modes."""
    cfg = AVRConfig()
    cfg.path = PathConfig(expname=name, dataset_type="Real_env", logdir=logdir)
    rc = cfg.render
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [6.0, 5.0, 3.0]
    rc.near, rc.far = 0.0, 4.0
    rc.n_samples, rc.n_azi, rc.n_ele = 24, 16, 8
    rc.speed, rc.fs, rc.pathloss = 343.8, FS, 1.5
    cfg.model.signal_output_dim = seq
    ch = cfg.model.channel_embed
    ch.is_embed = True
    ch.connection_type = "add"
    ch.ch_num = 8
    ch.is_sigma_encoder = True
    ch.is_signal_network = True
    ch.emb_dim_sigma_encoder = ch.emb_dim_signal_network = 16
    enc = EncodingConfig(
        n_levels=12, n_features_per_level=2, log2_hashmap_size=16,
        base_resolution=8, interpolation=interp,
    )
    cfg.model.pos_encoding_sigma = enc
    cfg.model.dir_encoding_sig = enc
    cfg.model.tx_encoding_sig = enc
    cfg.model.sigma_encoder_network = MLPConfig(n_neurons=128, n_hidden_layers=2)
    cfg.model.sigma_decoder_network = MLPConfig(n_neurons=128, n_hidden_layers=1)
    cfg.model.signal_network = MLPConfig(n_neurons=256, n_hidden_layers=2)
    cfg.train = TrainConfig(
        lr=1e-3, eta_min=1e-4, T_max=iters, total_iterations=iters,
        batch_size=8, save_freq=max(iters // 2, 1), val_freq=max(iters // 10, 1),
        log_freq=max(iters // 40, 1), steps_per_call=10, seed=seed,
        das_reg_loss_weight=10.0,
    )
    cfg.train.extra["group_sampling"] = True
    return cfg


def ensure_dataset(data_dir: str, seq: int = SEQ) -> None:
    if os.path.exists(os.path.join(data_dir, "train_test_split.pkl")):
        return
    room = synthetic.RoomSpec(size=(6.0, 5.0, 3.0), max_order=3, fs=FS, seq_len=seq)
    synthetic.write_real_env_dataset(data_dir, room, n_groups=16, seed=7)
    print(f"dataset: 16 groups (T={seq}) -> {data_dir}", flush=True)


def run_one(interp: str, seed: int, iters: int, data_dir: str,
            seq: int = SEQ) -> dict:
    name = f"{interp.replace(':', '')}_s{seed}" + (f"_T{seq}" if seq != SEQ else "")
    logdir = os.path.join(ROOT, "logs")
    result_path = os.path.join(logdir, name, "result.json")
    if os.path.exists(result_path):
        with open(result_path) as f:
            res = json.load(f)
        print(f"[{name}] cached: {json.dumps(res['summary'])}", flush=True)
        return res

    cfg = make_cfg(logdir, name, interp, iters, seed, seq=seq)
    runner = AVRRunner(cfg, data_dir)
    t0 = time.time()
    runner.train()
    train_s = time.time() - t0
    final_metrics = runner.validate(iters)

    # per-checkpoint DoA objective (min over checkpoints of mean
    # NormMUSIC pred-vs-gt error — the fork's HPO objective) + curve
    exp_dir = os.path.join(logdir, name)
    doa_min, curve = doa_objective_from_logdir(exp_dir, FS, return_curve=True)

    res = {
        "interp": interp, "seed": seed, "iters": iters,
        "train_seconds": train_s,
        "ms_per_step": 1e3 * train_s / iters,
        "summary": {**{k: float(v) for k, v in final_metrics.items()},
                    "doa_min_deg": float(doa_min)},
        "doa_curve": curve,
    }
    with open(result_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[{name}] {train_s:.0f}s ({res['ms_per_step']:.1f} ms/step) "
          f"{json.dumps(res['summary'])}", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("iters", nargs="?", type=int, default=40_000)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--modes", default="trilinear,simplex",
                    help="comma-separated interpolation specs (e.g. "
                         "'trilinear,hybrid:4,levels:ttttssssssss')")
    ap.add_argument("--calibrate", action="store_true",
                    help="300-iter step-time probe per mode, then exit")
    ap.add_argument("--summary", default="ab_summary.json",
                    help="summary filename under results/interp_fullbudget/")
    ap.add_argument("--seq", type=int, default=SEQ,
                    help="IR length in samples (1600 = C50-valid 100 ms)")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    modes = args.modes.split(",")

    os.makedirs(os.path.join(ROOT, "logs"), exist_ok=True)
    data_dir = os.path.join(
        ROOT, "data" if args.seq == SEQ else f"data_s{args.seq}"
    )
    ensure_dataset(data_dir, seq=args.seq)

    if args.calibrate:
        for interp in modes:
            res = run_one(interp, 99, 300, data_dir, seq=args.seq)
            print(f"CALIBRATE {interp}: {res['ms_per_step']:.1f} ms/step "
                  "(incl. compile)", flush=True)
        return

    results = []
    for seed in seeds:
        for interp in modes:
            results.append(
                run_one(interp, seed, args.iters, data_dir, seq=args.seq)
            )

    # ---- report --------------------------------------------------------
    keys = sorted(results[0]["summary"])
    print("\n==== per-metric mean ± std over seeds ====", flush=True)
    table = {}
    for interp in modes:
        rows = [r["summary"] for r in results if r["interp"] == interp]
        table[interp] = {
            k: (float(np.mean([r[k] for r in rows])),
                float(np.std([r[k] for r in rows]))) for k in keys
        }
    hdr = f"{'metric':16s}" + "".join(f" {m:>22s}" for m in modes)
    print(hdr, flush=True)
    for k in keys:
        row = f"{k:16s}"
        for m in modes:
            mm, ms = table[m][k]
            row += f" {mm:12.5g} ±{ms:8.3g}"
        print(row, flush=True)
    out_path = os.path.join(ROOT, args.summary)
    with open(out_path, "w") as f:
        json.dump({"iters": args.iters, "seeds": seeds, "modes": modes,
                   "table": table, "runs": results}, f, indent=1)
    print(f"\nsummary -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
