"""Multi-chip scaling evidence on a virtual CPU device mesh.

Runs the FULL sharded training step (losses + Adam + NaN guards) on
1/2/4/8 virtual devices, checks the loss agrees with single-device
execution, and inspects the compiled HLO for the collectives the SPMD
partitioner inserted (the psum over 'ray' for the spherical integral and
the gradient all-reduce — parallel/mesh.py docstring; the TPU-native
analog of the reference's NCCL all-reduce, avr_runner_ddp.py:45).

Usage: python scripts/scaling_sim.py [n_virtual_devices=8]  (CPU only;
sets the fake-device flag itself, must be launched fresh, not inside
another jax process. 16 exercises the BASELINE.md 16-chip mesh shapes,
incl. a data=4 x ray=4 grid.)
"""

import os
import re
import sys

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.losses import CriterionConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.parallel.mesh import make_mesh_plan  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.train.state import init_state, make_train_step  # noqa: E402


def run(n_devices: int, data_parallel=None, bs: int = 8):
    cfg = _flagship_config(small=True)
    cfg.train.batch_size = bs
    plan = make_mesh_plan(
        jax.devices()[:n_devices], batch_size=bs, data_parallel=data_parallel
    )
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)
    state = init_state(jax.random.PRNGKey(0), fst, cfg.train)

    rng = np.random.default_rng(0)
    F = cfg.model.signal_output_dim // 2 + 1
    batch_np = {
        "wave": rng.normal(size=(bs, F, 2)).astype(np.float32) * 1e-2,
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (bs, 1)),
    }
    batch = plan.shard_batch(batch_np)
    key = jax.random.PRNGKey(1)

    hlo = step_fn.lower(state, batch, key).compile().as_text()
    colls = sorted(
        set(re.findall(r"%?([a-z-]*(?:all-reduce|all-gather|reduce-scatter|collective-permute)[a-z-]*)", hlo))
    )
    n_ar = len(re.findall(r"= [^=]*all-reduce", hlo))

    state2, bundle = step_fn(state, batch, key)
    total = float(jax.device_get(bundle.total))
    return plan, total, colls, n_ar


def main():
    # (8, 2) forces a data=2 × ray=4 mesh: rays shard over 'ray' and the
    # spherical integral's psum + gradient all-reduce both appear.
    # Each batch size gets its own single-device reference loss.
    meshes = [(1, None, 8), (2, None, 8), (4, None, 8), (8, None, 8),
              (8, 2, 8)]
    if N_DEV >= 16:
        meshes += [(1, None, 16), (16, None, 16), (16, 4, 16)]
    ref_by_bs = {}
    for n, dp, bs in meshes:
        plan, total, colls, n_ar = run(n, dp, bs)
        ref_total = ref_by_bs.setdefault(bs, total)
        rel = abs(total - ref_total) / max(abs(ref_total), 1e-12)
        print(
            f"devices={n} bs={bs} mesh=(data={plan.n_data} x ray={plan.n_ray}) "
            f"loss={total:.8f} rel-vs-1dev={rel:.2e} "
            f"all-reduces={n_ar} collectives={colls}",
            flush=True,
        )
        assert rel < 2e-4, "sharded loss diverged from single-device"
    print("SCALING SIM OK")


if __name__ == "__main__":
    main()
