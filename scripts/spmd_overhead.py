"""Bound SPMD partitioning overhead on the real chip (VERDICT r2 item 7).

Times the FULL flagship train step (losses + Adam, the bench.py
workload) jitted two ways on the single v5e chip:

  * meshless — make_train_step(mesh_plan=None), the plain jit program;
  * 1-device mesh — the same step under a data=1 × ray=1
    jax.sharding.Mesh with every sharding constraint, pad_rays, and
    sharded-batch plumbing engaged (the multi-chip code path, degenerate
    grid, so the partitioner runs but no collectives are needed).

The delta bounds what the SPMD machinery itself costs per step — the
one piece of multi-chip evidence obtainable without multi-chip
hardware. Fetch-forced timing (axon's block_until_ready does not block).

Usage: python scripts/spmd_overhead.py [steps]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.losses import CriterionConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.parallel.mesh import make_mesh_plan  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.train.state import init_state, make_train_step  # noqa: E402


def time_variant(label, plan, cfg, fst, consts, crit, batch_np, steps):
    step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)
    state = init_state(jax.random.PRNGKey(0), fst, cfg.train)
    if plan is not None:
        # replicate up front — without this the step's OUTPUT state gains
        # mesh shardings the input lacked and the SECOND call recompiles
        # the whole program. The first version of this script warmed with
        # one call only; that hidden second compile landed inside the
        # timed loop and masqueraded as "+899% SPMD overhead" (r3).
        state = plan.shard_state(state)
    batch = (
        plan.shard_batch(batch_np)
        if plan is not None
        else {k: jax.device_put(np.asarray(v)) for k, v in batch_np.items()}
    )
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, bundle = step_fn(state, batch, key)
    first = float(jax.device_get(bundle.total))  # fetch = barrier
    compile_s = time.perf_counter() - t0
    # second warm step: catches any residual signature change (and logs
    # it — steady-state timing must never include a compile)
    t0 = time.perf_counter()
    state, bundle = step_fn(state, batch, jax.random.fold_in(key, 999))
    float(jax.device_get(bundle.total))
    warm2_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(steps):
        state, bundle = step_fn(state, batch, jax.random.fold_in(key, i))
    last = float(jax.device_get(bundle.total))
    dt = (time.perf_counter() - t0) / steps
    print(
        f"{label}: {dt * 1e3:.1f} ms/step (compile+first {compile_s:.0f}s, "
        f"second warm step {warm2_s * 1e3:.0f} ms, "
        f"loss {first:.5f} -> {last:.5f})",
        flush=True,
    )
    return dt


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    bs = cfg.train.batch_size
    rng = np.random.default_rng(0)
    F = cfg.model.signal_output_dim // 2 + 1
    d = rng.normal(size=(bs, 3))
    batch_np = {
        "wave": (rng.normal(size=(bs, F, 2)) * 1e-2).astype(np.float32),
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32),
    }

    t_plain = time_variant(
        "meshless", None, cfg, fst, consts, crit, batch_np, steps
    )
    plan = make_mesh_plan(jax.devices()[:1], batch_size=bs)
    assert plan.n_data == 1 and plan.n_ray == 1
    t_mesh = time_variant(
        "mesh 1x1", plan, cfg, fst, consts, crit, batch_np, steps
    )
    print(
        f"SPMD overhead: {(t_mesh - t_plain) * 1e3:+.1f} ms/step "
        f"({(t_mesh / t_plain - 1) * 100:+.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
