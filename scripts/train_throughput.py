"""Full TRAINING-step throughput on the flagship workload (real chip).

bench.py times the raw fwd+bwd spectral render; this script times the
production train step — full criterion bank (spec/amp/angle/time/
energy/multi-STFT), Adam + cosine LR, global-norm clip, NaN/Inf guards
— via train.state.make_train_step, at steps_per_call 1 and 5.
Fetch-forced timing.

Usage: python scripts/train_throughput.py [n_steps=30]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.losses import CriterionConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.train.state import init_state, make_train_step  # noqa: E402


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    cfg = _flagship_config()
    bs = cfg.train.batch_size
    R = cfg.render.n_rays
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)

    rng = np.random.default_rng(0)
    F = cfg.model.signal_output_dim // 2 + 1
    batch = {
        "wave": (rng.normal(size=(bs, F, 2)) * 1e-2).astype(np.float32),
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (bs, 1)),
    }
    key = jax.random.PRNGKey(1)

    for spc in (1, 5):
        cfg.train.steps_per_call = spc
        step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, None)
        state = init_state(jax.random.PRNGKey(0), fst, cfg.train)
        if spc == 1:
            args = lambda it: (batch, key, it)  # noqa: E731
        else:
            stacked = {k: np.stack([v] * spc) for k, v in batch.items()}
            args = lambda it: (stacked, key, it)  # noqa: E731
        state, bundle = step_fn(state, *args(np.int32(0)))
        float(bundle.total.sum())  # fetch barrier (compile + warm)
        calls = max(1, n_steps // spc)
        t0 = time.perf_counter()
        for c in range(calls):
            state, bundle = step_fn(state, *args(np.int32((c + 1) * spc)))
        float(bundle.total.sum())
        dt = (time.perf_counter() - t0) / (calls * spc)
        print(
            f"steps_per_call={spc}: {dt * 1e3:.1f} ms/step "
            f"{bs * R / dt:,.0f} rays/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
