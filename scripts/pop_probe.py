"""Population-HPO throughput probe: ms/step and trial-steps/s vs K.

Measures the vmapped K-trial train step (hpo/population.py) on the real
HPO workload (the synthetic-array config scripts/hpo_real_study.py
trains) at K in {1, 4, 8, ...}. The claim under test: one chip is
latency/dispatch-bound at this scale, so K trials per step cost far
less than K single-trial steps — the lever that makes a quality-budget
study (8k-iter trials) fit in an hour.

Timing is fetch-forced (device→host read of the loss bundle) — the only
reliable barrier on the axon backend. One TPU job at a time.

Usage:  python scripts/pop_probe.py [Ks=1,4,8] [--iters 120] [--warm 40]
        AVR_TPU_SCATTER=xla python scripts/pop_probe.py 8   # fallback A/B
Prints one JSON line per K.
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import interp_fullbudget_ab as fullbudget  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ks", nargs="?", default="1,4,8")
    ap.add_argument("--iters", type=int, default=120,
                    help="timed steps per K (after warmup)")
    ap.add_argument("--warm", type=int, default=40,
                    help="warmup steps (compile + cache)")
    ap.add_argument("--interp", default="hybridc:4")
    args = ap.parse_args()

    import jax  # noqa: E402  (after argparse: fail fast on bad usage)
    import jax.numpy as jnp  # noqa: E402

    from avr_tpu.hpo.population import PopulationRunner  # noqa: E402

    data_dir = os.path.join("results", "interp_fullbudget", "data")
    fullbudget.ensure_dataset(data_dir)

    for K in [int(k) for k in args.ks.split(",")]:
        cfgs = []
        for i in range(K):
            cfg = fullbudget.make_cfg(
                "/tmp/pop_probe_logs", f"probe_k{K}_t{i}", args.interp,
                10_000, seed=0,
            )
            cfg.train.runtime_hparams = True
            # spread lr so lanes are not numerically identical
            cfg.train.lr = 1e-4 * (0.5 + i / max(K - 1, 1))
            cfg.train.val_freq = 10**9  # no val dumps in the probe
            cfgs.append(cfg)
        t_build = time.time()
        pop = PopulationRunner(cfgs, data_dir)
        sp = max(1, cfgs[0].train.steps_per_call)

        # drive the step directly over sampler batches (no val/log I/O)
        batches = []
        for b in pop.train_sampler.epoch():
            batches.append(b)
            if len(batches) >= sp:
                break
        stacked = (
            {k: jnp.asarray(np.stack([bb[k] for bb in batches])) for k in batches[0]}
            if sp > 1 else
            {k: jnp.asarray(v) for k, v in batches[0].items()}
        )

        def step(it):
            pop.state, bundles = pop._step_fn(
                pop.state, stacked, pop._key, jnp.asarray(it, jnp.int32), pop._hp
            )
            return bundles

        it = 0
        t0 = time.time()
        while it < args.warm:
            b = step(it)
            it += sp
        float(np.asarray(jax.device_get(b.total)).ravel()[-1])  # barrier
        compile_s = time.time() - t0

        t0 = time.time()
        n0 = it
        while it < n0 + args.iters:
            b = step(it)
            it += sp
        tot = np.asarray(jax.device_get(b.total))  # fetch-forced barrier
        dt = time.time() - t0
        steps = it - n0
        print(json.dumps({
            "K": K,
            "interp": args.interp,
            "scatter": os.environ.get("AVR_TPU_SCATTER", "auto"),
            "dense_onehot": os.environ.get("AVR_TPU_DENSE_ONEHOT", "auto"),
            "ms_per_step": round(1e3 * dt / steps, 2),
            "trial_steps_per_s": round(K * steps / dt, 1),
            "warm_plus_compile_s": round(compile_s, 1),
            "build_s": round(t0 - t_build - compile_s, 1),
            "loss_last": [round(float(x), 4) for x in tot.reshape(K, -1)[:, -1]],
        }), flush=True)


if __name__ == "__main__":
    main()
