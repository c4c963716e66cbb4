"""Measure checkpoint-save blocking time on the train loop (VERDICT r3
item 6: the loop must not block >10 ms on save at steady state).

Builds the flagship-scale train state (RAF complex field, ~tens of MB of
tables) through AVRRunner on a synthetic dataset, then times:

  * save_checkpoint()            — async: hot-loop cost per save
  * save_checkpoint(wait=True)   — the old synchronous behaviour
  * back-to-back async saves     — orbax's internal serialization cost
    when a save lands while the previous is still committing

Run: python scripts/ckpt_async_probe.py [cpu|axon]
"""

import os
import sys
import time

platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from avr_tpu.config import AVRConfig, EncodingConfig, PathConfig  # noqa: E402
from avr_tpu.data import synthetic  # noqa: E402
from avr_tpu.train.runner import AVRRunner  # noqa: E402


def main():
    root = "/tmp/ckpt_async_probe"
    data_dir = os.path.join(root, "data")
    if not os.path.exists(os.path.join(data_dir, "train_test_split.pkl")):
        room = synthetic.RoomSpec(size=(6.0, 5.0, 3.0), max_order=2, fs=16000,
                                  seq_len=400)
        synthetic.write_real_env_dataset(data_dir, room, n_groups=4, seed=3)

    cfg = AVRConfig()
    cfg.path = PathConfig(expname="probe", dataset_type="Real_env",
                          logdir=os.path.join(root, "logs"))
    cfg.render.n_samples, cfg.render.n_azi, cfg.render.n_ele = 8, 8, 4
    cfg.render.fs, cfg.render.xyz_min, cfg.render.xyz_max = (
        16000, [0.0] * 3, [6.0, 5.0, 3.0])
    cfg.model.signal_output_dim = 400
    # flagship-scale tables: 20 levels, 2^18 rows -> ~21 MB/table fp32
    enc = EncodingConfig(n_levels=20, n_features_per_level=2,
                         log2_hashmap_size=18, base_resolution=16)
    cfg.model.pos_encoding_sigma = enc
    cfg.model.dir_encoding_sig = enc
    cfg.model.tx_encoding_sig = enc
    cfg.train.total_iterations = 1
    cfg.train.batch_size = 2

    runner = AVRRunner(cfg, data_dir)
    n_bytes = sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(runner.state)
    )
    print(f"state size: {n_bytes / 1e6:.1f} MB", flush=True)

    # warm up one save (directory creation, thread spin-up)
    runner.save_checkpoint(wait=True)

    for label, wait in (("async", False), ("sync", True)):
        ts = []
        for i in range(3):
            runner.state = runner.state._replace(step=runner.state.step + 1)
            t0 = time.perf_counter()
            runner.save_checkpoint(wait=wait)
            ts.append(1e3 * (time.perf_counter() - t0))
            runner._ckpt_mgr.wait_until_finished()
        print(f"{label:6s} save call: {min(ts):8.1f} ms (min of 3: "
              f"{', '.join(f'{t:.1f}' for t in ts)})", flush=True)

    # back-to-back async saves (previous still committing)
    runner.state = runner.state._replace(step=runner.state.step + 1)
    runner.save_checkpoint()
    runner.state = runner.state._replace(step=runner.state.step + 1)
    t0 = time.perf_counter()
    runner.save_checkpoint()
    print(f"async save while previous in flight: "
          f"{1e3 * (time.perf_counter() - t0):8.1f} ms", flush=True)
    runner._ckpt_mgr.wait_until_finished()

    ok = runner.load_checkpoint()
    print(f"restore ok={ok} at step {int(runner.state.step)}", flush=True)


if __name__ == "__main__":
    main()
