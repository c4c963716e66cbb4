"""Two-process multi-host training-step simulation on CPU.

Exercises the REAL multi-host code path — `initialize_multihost`
(jax.distributed, the reference's `dist.init_process_group` analog,
avr_runner_ddp.py:37-46), the global (data, ray) mesh spanning both
processes, and `MeshPlan.shard_batch`'s
`make_array_from_process_local_data` branch — none of which single-
process virtual-mesh tests reach. Each process hosts 4 virtual CPU
devices → an 8-device global mesh; both feed the same seed-synchronized
batch and must agree on the loss (printed by each rank).

Usage: python scripts/multihost_sim.py            # launcher, spawns 2 ranks
       python scripts/multihost_sim.py rank <i>   # internal
"""

import os
import subprocess
import sys

PORT = 12357


def rank_main(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from avr_tpu.parallel.mesh import initialize_multihost, make_mesh_plan

    idx = initialize_multihost(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=rank
    )
    assert idx == rank and jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np

    from __graft_entry__ import _flagship_config
    from avr_tpu.losses import CriterionConfig
    from avr_tpu.models import field as field_lib
    from avr_tpu.render.common import make_consts
    from avr_tpu.train.state import init_state, make_train_step

    cfg = _flagship_config(small=True)
    bs = 8
    cfg.train.batch_size = bs
    plan = make_mesh_plan(jax.devices(), batch_size=bs)
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)
    state = init_state(jax.random.PRNGKey(0), fst, cfg.train)

    rng = np.random.default_rng(0)  # seed-synchronized across ranks
    F = cfg.model.signal_output_dim // 2 + 1
    batch_np = {
        "wave": rng.normal(size=(bs, F, 2)).astype(np.float32) * 1e-2,
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (bs, 1)),
    }
    batch = plan.shard_batch(batch_np)  # multi-process branch
    state, bundle = step_fn(state, batch, jax.random.PRNGKey(1))
    total = float(jax.device_get(bundle.total))
    print(
        f"rank {rank}: mesh=(data={plan.n_data} x ray={plan.n_ray}) "
        f"loss={total:.8f} step={int(jax.device_get(state.step))}",
        flush=True,
    )
    jax.distributed.shutdown()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "rank":
        rank_main(int(sys.argv[2]))
        return
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "rank", str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    losses = []
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"rank {r}:"):
                print(line)
                losses.append(line.split("loss=")[1].split()[0])
    assert all(p.returncode == 0 for p in procs), outs
    assert len(losses) == 2 and losses[0] == losses[1], losses
    print("MULTIHOST SIM OK")


if __name__ == "__main__":
    main()
