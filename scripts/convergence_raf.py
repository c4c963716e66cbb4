"""Reference-budget convergence run (VERDICT r4 item 4).

The reference trains RAF-Furnished for 80,000 iterations at batch 4
(reference/config_files/avr_raf_furnished.yml:44); every quality claim
so far rests on 40k-iteration gates. This script runs the FULL
reference budget on the RAF-Furnished-shaped flagship (complex variant,
650 rays x 32 samples, 1600-dim IR @ 16 kHz => all 7 reference metrics
finite, C50 included) against a synthetic image-source RAF dataset
whose test split is circular 8-mic arrays, so the final report carries
the NormMUSIC DoA error next to the waveform metrics.

Resume-safe: checkpoints land in results/convergence_raf/logs; rerunning
resumes from the latest checkpoint (cfg.train.load_ckpt).

Run ON THE CHIP (~2.3 h at the measured 104 ms/step):
    python scripts/convergence_raf.py [iters=80000]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from __graft_entry__ import _flagship_config
from avr_tpu.data import synthetic

ROOT = os.path.join("results", "convergence_raf")
FS = 16000
SEQ = 1600  # 100 ms: C50's late-energy window (>50 ms) is non-empty


def ensure_dataset(data_dir: str) -> None:
    if os.path.exists(os.path.join(data_dir, "train")):
        return
    room = synthetic.RoomSpec(
        size=(6.0, 5.0, 3.0), absorption=0.35, max_order=3, fs=FS, seq_len=SEQ
    )
    synthetic.write_raf_array_dataset(
        data_dir, room, n_train=480, n_test_groups=6, seed=11
    )
    print(f"dataset: 480 train + 6x8 test -> {data_dir}", flush=True)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    data_dir = os.path.join(ROOT, "data")
    ensure_dataset(data_dir)

    from avr_tpu.config import PathConfig
    from avr_tpu.hpo.runner import doa_objective_from_logdir
    from avr_tpu.train.runner import AVRRunner

    cfg = _flagship_config()
    cfg.path = PathConfig(
        expname="raf80k", dataset_type="RAF", logdir=os.path.join(ROOT, "logs")
    )
    # synthetic room bounds (6x5x3 m) instead of the +-12 m RAF hall
    cfg.render.xyz_min, cfg.render.xyz_max = [0.0] * 3, [6.0, 5.0, 3.0]
    cfg.render.near, cfg.render.far = 0.0, 4.0
    tc = cfg.train
    tc.total_iterations = iters
    tc.T_max = iters  # cosine over the actual budget
    tc.lr, tc.eta_min = 5e-4, 5e-5
    tc.batch_size = 4  # the reference RAF budget is 80k AT BATCH 4
    tc.save_freq = 10_000
    tc.val_freq = 8_000
    tc.log_freq = 500
    tc.steps_per_call = 10
    tc.load_ckpt = True  # resume-safe

    runner = AVRRunner(cfg, data_dir)
    t0 = time.time()
    start_step = int(runner.state.step)
    runner.train()
    train_s = time.time() - t0
    final = runner.validate(iters)

    exp_dir = os.path.join(ROOT, "logs", "raf80k")
    doa_min, curve = doa_objective_from_logdir(exp_dir, FS, return_curve=True)

    summary = {
        "iters": iters,
        "batch_size": tc.batch_size,
        "seq_len": SEQ,
        "resumed_from": start_step,
        "train_seconds_this_session": train_s,
        "ms_per_step": 1e3 * train_s / max(iters - start_step, 1),
        "final_metrics": {k: float(v) for k, v in final.items()},
        "doa_min_deg": doa_min,
        "doa_curve": curve,
    }
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
