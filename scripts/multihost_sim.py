"""Two-process multi-host training + eval simulation on CPU.

Exercises the REAL multi-host code path — `initialize_multihost`
(jax.distributed, the reference's `dist.init_process_group` analog,
avr_runner_ddp.py:37-46), the global (data, ray) mesh spanning both
processes, `MeshPlan.shard_batch`'s make_array_from_process_local_data
branch (incl. the explicit global_shape that keeps the global batch at
the configured size), and the multi-host EVAL path:
`AVRRunner.validate` → `render_dataset` → `process_allgather`
(train/runner.py — reference/avr_runner_ddp.py's rank-0 eval analog).
None of these are reachable from single-process virtual-mesh tests.

Each process hosts 4 virtual CPU devices → an 8-device global mesh; both
feed the same seed-synchronized batch and must agree on the loss AND the
validation metrics — and the loss must equal a single-process run of the
same global batch (catching silent batch duplication/resharding bugs).

Usage: python scripts/multihost_sim.py            # launcher, spawns ranks
       python scripts/multihost_sim.py rank <i>   # internal
       python scripts/multihost_sim.py ref        # internal (1-process)
"""

import os
import subprocess
import sys

PORT = 12357


def _setup_jax(n_local: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    return jax


def _train_step_loss(jax, plan):
    """One full sharded train step on the given mesh plan; returns loss."""
    import numpy as np

    from __graft_entry__ import _flagship_config
    from avr_tpu.losses import CriterionConfig
    from avr_tpu.models import field as field_lib
    from avr_tpu.render.common import make_consts
    from avr_tpu.train.state import init_state, make_train_step

    cfg = _flagship_config(small=True)
    bs = 8
    cfg.train.batch_size = bs
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)
    state = init_state(jax.random.PRNGKey(0), fst, cfg.train)
    if plan is not None:
        state = plan.shard_state(state)  # avoid step-2 resharding recompile

    rng = np.random.default_rng(0)  # seed-synchronized across ranks
    F = cfg.model.signal_output_dim // 2 + 1
    batch_np = {
        "wave": rng.normal(size=(bs, F, 2)).astype(np.float32) * 1e-2,
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (bs, 1)),
    }
    batch = plan.shard_batch(batch_np)
    state, bundle = step_fn(state, batch, jax.random.PRNGKey(1))
    assert batch["wave"].shape[0] == bs, (
        f"global batch changed size: {batch['wave'].shape[0]} != {bs}"
    )
    return float(jax.device_get(bundle.total)), plan


def _tiny_cfg(log_dir: str, expname: str = "mh_val"):
    from avr_tpu.config import AVRConfig, EncodingConfig, MLPConfig, PathConfig, TrainConfig

    cfg = AVRConfig()
    cfg.path = PathConfig(expname=expname, dataset_type="Simu", logdir=log_dir)
    rc = cfg.render
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [6.0, 5.0, 3.0]
    rc.near, rc.far = 0.0, 3.0
    rc.n_samples, rc.n_azi, rc.n_ele = 4, 6, 3
    rc.speed, rc.fs, rc.pathloss = 343.8, 2000, 0.5
    cfg.model.signal_output_dim = 128
    enc = EncodingConfig(n_levels=4, log2_hashmap_size=8, base_resolution=4)
    cfg.model.pos_encoding_sigma = enc
    cfg.model.dir_encoding_sig = enc
    cfg.model.tx_encoding_sig = enc
    cfg.model.sigma_encoder_network = MLPConfig(n_neurons=32, n_hidden_layers=2)
    cfg.model.sigma_decoder_network = MLPConfig(n_neurons=32, n_hidden_layers=1)
    cfg.model.signal_network = MLPConfig(n_neurons=32, n_hidden_layers=2)
    cfg.train = TrainConfig(
        lr=1e-3, eta_min=1e-4, T_max=10, total_iterations=10,
        batch_size=8, save_freq=1000, val_freq=1000, log_freq=5, seed=0,
    )
    return cfg


CKPT_SHARED_LOG = "/tmp/mh_ckpt_shared_logs"  # launcher pre-cleans


def _ckpt_leg(jax, plan, rank: int):
    """Multi-host orbax checkpointing: both ranks train (collective async
    save + exit barrier at train() end), then a FRESH runner restores
    from the SHARED checkpoint directory (the collective restore path).
    Returns (resumed step, max |param diff| vs the trained state)."""
    import tempfile

    import numpy as np

    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner

    data_dir = tempfile.mkdtemp(prefix=f"mh_ckptdata_r{rank}_")
    room = synthetic.RoomSpec(size=(6.0, 5.0, 3.0), max_order=1, fs=2000, seq_len=128)
    synthetic.write_simu_dataset(data_dir, room, n=16)

    cfg = _tiny_cfg(CKPT_SHARED_LOG, expname="mh_ckpt")
    cfg.train.total_iterations = 4
    runner = AVRRunner(cfg, data_dir, mesh_plan=plan)
    runner.train()
    p0 = jax.device_get(runner.state.params)

    cfg2 = _tiny_cfg(CKPT_SHARED_LOG, expname="mh_ckpt")
    cfg2.train.total_iterations = 4
    cfg2.train.load_ckpt = True
    runner2 = AVRRunner(cfg2, data_dir, mesh_plan=plan)
    p1 = jax.device_get(runner2.state.params)
    diff = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)
        )
    )
    return int(runner2.state.step), diff


def _validate_metrics(jax, plan, rank: int) -> dict:
    """AVRRunner.validate over the mesh: covers _device_batch's
    multi-host sharding and render_dataset's process_allgather."""
    import tempfile

    from avr_tpu.config import AVRConfig, EncodingConfig, MLPConfig, PathConfig, TrainConfig
    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner

    # identical synthetic data per rank (same seed), rank-private dirs
    data_dir = tempfile.mkdtemp(prefix=f"mh_data_r{rank}_")
    log_dir = tempfile.mkdtemp(prefix=f"mh_logs_r{rank}_")
    room = synthetic.RoomSpec(size=(6.0, 5.0, 3.0), max_order=1, fs=2000, seq_len=128)
    synthetic.write_simu_dataset(data_dir, room, n=40)

    cfg = AVRConfig()
    cfg.path = PathConfig(expname="mh_val", dataset_type="Simu", logdir=log_dir)
    rc = cfg.render
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [6.0, 5.0, 3.0]
    rc.near, rc.far = 0.0, 3.0
    rc.n_samples, rc.n_azi, rc.n_ele = 4, 6, 3
    rc.speed, rc.fs, rc.pathloss = 343.8, 2000, 0.5
    cfg.model.signal_output_dim = 128
    enc = EncodingConfig(n_levels=4, log2_hashmap_size=8, base_resolution=4)
    cfg.model.pos_encoding_sigma = enc
    cfg.model.dir_encoding_sig = enc
    cfg.model.tx_encoding_sig = enc
    cfg.model.sigma_encoder_network = MLPConfig(n_neurons=32, n_hidden_layers=2)
    cfg.model.sigma_decoder_network = MLPConfig(n_neurons=32, n_hidden_layers=1)
    cfg.model.signal_network = MLPConfig(n_neurons=32, n_hidden_layers=2)
    cfg.train = TrainConfig(
        lr=1e-3, eta_min=1e-4, T_max=10, total_iterations=10,
        batch_size=8, save_freq=1000, val_freq=1000, log_freq=5, seed=0,
    )
    runner = AVRRunner(cfg, data_dir, mesh_plan=plan)
    return runner.validate(0)


def rank_main(rank: int) -> None:
    jax = _setup_jax(4)
    from avr_tpu.parallel.mesh import initialize_multihost, make_mesh_plan

    idx = initialize_multihost(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=rank
    )
    assert idx == rank and jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    plan = make_mesh_plan(jax.devices(), batch_size=8)
    total, plan = _train_step_loss(jax, plan)
    print(
        f"rank {rank}: mesh=(data={plan.n_data} x ray={plan.n_ray}) "
        f"loss={total:.8f}",
        flush=True,
    )
    metrics = _validate_metrics(jax, plan, rank)
    print(
        f"rank {rank}: val " + " ".join(f"{k}={v:.6f}" for k, v in
                                        sorted(metrics.items())),
        flush=True,
    )
    step, diff = _ckpt_leg(jax, plan, rank)
    print(f"rank {rank}: ckpt step={step} diff={diff:.3e}", flush=True)
    jax.distributed.shutdown()


def ref_main() -> None:
    """Single-process 8-device reference: same mesh shape, same batch."""
    jax = _setup_jax(8)
    from avr_tpu.parallel.mesh import make_mesh_plan

    plan = make_mesh_plan(jax.devices(), batch_size=8)
    total, plan = _train_step_loss(jax, plan)
    print(
        f"ref: mesh=(data={plan.n_data} x ray={plan.n_ray}) "
        f"loss={total:.8f}",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "rank":
        rank_main(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        ref_main()
        return
    import shutil

    shutil.rmtree(CKPT_SHARED_LOG, ignore_errors=True)  # stale-resume guard
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "rank", str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    ref = subprocess.Popen(
        [sys.executable, __file__, "ref"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    outs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    ref_out = ref.communicate(timeout=1800)[0].decode()
    losses, vals, ckpts = [], [], []
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"rank {r}: loss") or (
                line.startswith(f"rank {r}:") and "loss=" in line
            ):
                print(line)
                losses.append(line.split("loss=")[1].split()[0])
            if line.startswith(f"rank {r}: val"):
                print(line)
                vals.append(line.split("val ")[1])
            if line.startswith(f"rank {r}: ckpt"):
                print(line)
                ckpts.append(line.split("ckpt ")[1])
    ref_loss = None
    for line in ref_out.splitlines():
        if line.startswith("ref:"):
            print(line)
            ref_loss = line.split("loss=")[1].split()[0]
    assert all(p.returncode == 0 for p in procs), outs
    assert ref.returncode == 0, ref_out
    assert len(losses) == 2 and losses[0] == losses[1], losses
    assert ref_loss is not None
    rel = abs(float(losses[0]) - float(ref_loss)) / max(abs(float(ref_loss)), 1e-12)
    assert rel < 2e-4, (
        f"2-process loss {losses[0]} != single-process {ref_loss} (rel {rel:.2e})"
    )
    assert len(vals) == 2 and vals[0] == vals[1], vals
    assert len(ckpts) == 2 and ckpts[0] == ckpts[1] == "step=4 diff=0.000e+00", (
        ckpts
    )
    print(f"loss rel-vs-single-process: {rel:.2e}")
    print("MULTIHOST SIM OK (train step + validate/process_allgather "
          "+ async ckpt save/restore)")


if __name__ == "__main__":
    main()
