"""Training-quality A/B: bf16 vs fp32 interpolation arithmetic.

The level-major encode path runs the hash-grid interpolation (weight
multiply + K-sum) in the compute dtype (bf16 in production); the
point-major path keeps it fp32. This trains the SAME synthetic shoebox
dataset with identical hyper-parameters under both layouts (simplex
interpolation, the production mode) and prints validation metrics.
Run on the TPU: `python scripts/interp_prec_quality.py [iters]`.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from avr_tpu.config import AVRConfig, EncodingConfig, MLPConfig, PathConfig, TrainConfig
from avr_tpu.data import synthetic
from avr_tpu.train.runner import AVRRunner


def make_cfg(logdir: str, name: str, iters: int, seed: int = 0) -> AVRConfig:
    cfg = AVRConfig()
    cfg.path = PathConfig(expname=name, dataset_type="Simu", logdir=logdir)
    rc = cfg.render
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [6.0, 5.0, 3.0]
    rc.near, rc.far = 0.0, 4.0
    rc.n_samples, rc.n_azi, rc.n_ele = 24, 16, 8
    rc.speed, rc.fs, rc.pathloss = 343.8, 8000, 0.5
    cfg.model.signal_output_dim = 512
    enc = EncodingConfig(
        n_levels=12, log2_hashmap_size=15, base_resolution=4,
        per_level_scale=1.5, interpolation="simplex",
    )
    cfg.model.pos_encoding_sigma = enc
    cfg.model.dir_encoding_sig = enc
    cfg.model.tx_encoding_sig = enc
    cfg.model.sigma_encoder_network = MLPConfig(n_neurons=64, n_hidden_layers=2)
    cfg.model.sigma_decoder_network = MLPConfig(n_neurons=64, n_hidden_layers=1)
    cfg.model.signal_network = MLPConfig(n_neurons=128, n_hidden_layers=2)
    cfg.train = TrainConfig(
        lr=5e-3, eta_min=5e-4, T_max=iters, total_iterations=iters,
        batch_size=8, save_freq=10 * iters, val_freq=10 * iters,
        log_freq=max(1, iters // 10), steps_per_call=10, seed=seed,
    )
    return cfg


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    data_dir = tempfile.mkdtemp(prefix="interp_prec_data_")
    log_root = tempfile.mkdtemp(prefix="interp_prec_logs_")
    room = synthetic.RoomSpec(
        size=(6.0, 5.0, 3.0), max_order=3, fs=8000, seq_len=512
    )
    synthetic.write_simu_dataset(data_dir, room, n=220)
    print(f"dataset: 220 IRs, {iters} iters each variant", flush=True)

    results = {}
    for name, layout in (("bf16_interp", "level"), ("fp32_interp", "point")):
        os.environ["AVR_TPU_ENCODE_LAYOUT"] = layout
        cfg = make_cfg(log_root, name, iters, seed)
        runner = AVRRunner(cfg, data_dir)
        runner.train()
        m = runner.validate(iters)
        results[name] = m
        print(f"[{name}] " + " ".join(f"{k}={v:.4g}" for k, v in m.items()),
              flush=True)

    keys = sorted(set(results["bf16_interp"]) & set(results["fp32_interp"]))
    print("\nmetric            bf16_interp    fp32_interp", flush=True)
    for k in keys:
        print(f"{k:16s} {results['bf16_interp'][k]:12.5g} "
              f"{results['fp32_interp'][k]:12.5g}", flush=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    print(f"logs in {log_root}", flush=True)


if __name__ == "__main__":
    main()
