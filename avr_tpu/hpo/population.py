"""Vectorized HPO: K trials advanced in lockstep by ONE vmapped step.

The reference's Optuna loop is strictly serial — one model, one
optimizer, one trial at a time (reference/optuna_avr_runner.py:141-164).
On a TPU the HPO workload (small batch, few rays) leaves the chip
latency/dispatch-bound, so serial trials waste most of the MXU. This
runner stacks K trials' (params, opt_state, runtime-hparams) on a
leading axis and advances all of them with one jitted
``jax.vmap``-ed train step (train/state.make_train_step(population=K)):

  * trial identity lives ENTIRELY in the runtime-hparam bundle
    (TrainConfig.runtime_hparams) — all K trials share one compiled
    program, one data stream, and one ray-direction key sequence, so
    the only per-trial state is the [K]-stacked params/opt tree;
  * per-trial gather indices are shared (positions are trial-invariant),
    so the hash-table reads/writes batch into [K,·]-leading lookups and
    the MLP matmuls into batched GEMMs — exactly the shapes the MXU
    wants bigger;
  * validation renders are vmapped the same way; each trial's val npz
    lands in its own logdir so the standard DoA objective
    (hpo/runner.doa_objective_from_logdir) applies unchanged.

Driven by scripts/hpo_real_study.py --pop K via the study's ask/tell
surface (hpo/study.py): ask K trials, train them as one population,
tell K results.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.config import AVRConfig
from avr_tpu.data.loaders import Dataset, load_dataset
from avr_tpu.data.sampler import BatchSampler
from avr_tpu.losses import CriterionConfig
from avr_tpu.models import field as field_lib
from avr_tpu.render.common import make_consts
from avr_tpu.train.state import init_state, make_hparams, make_train_step

# Config fields allowed to differ between population members: exactly the
# runtime-hparam bundle (everything else changes the program).
_RUNTIME_FIELDS = (
    "lr", "eta_min", "weight_decay", "spec_loss_weight",
    "amplitude_loss_weight", "angle_loss_weight", "time_loss_weight",
    "energy_loss_weight", "multistft_loss_weight", "das_reg_loss_weight",
    "das_ce_loss_weight",
)


def _structural_key(cfg: AVRConfig) -> str:
    """Serialized config with runtime fields + expname masked out."""
    import copy
    import json

    c = copy.deepcopy(cfg)
    for f in _RUNTIME_FIELDS:
        if f.startswith("das_"):
            # DAS weights: the VALUE is runtime but zero-vs-nonzero is
            # structural — the beamforming branch is built only when the
            # static weight is >0 (hpo/runner.py "value runtime, branch
            # structural")
            setattr(c.train, f, 1.0 if getattr(c.train, f) > 0 else 0.0)
        else:
            # everything else is a pure runtime scalar: the lowered
            # program is identical across ANY value, including 0
            # (tests/test_train.py::test_runtime_hparams_program_invariant
            # covers weight_decay 0 → 1e-3 and spec 1 → 77)
            setattr(c.train, f, 1.0)
    c.path.expname = "_"
    return json.dumps(c.to_dict(), sort_keys=True, default=str)


class PopulationRunner:
    """Train K structurally-identical trial configs as one population."""

    def __init__(
        self,
        cfgs: List[AVRConfig],
        dataset_dir: str,
        train_data: Optional[Dataset] = None,
        test_data: Optional[Dataset] = None,
    ):
        assert cfgs, "population needs at least one trial config"
        base = cfgs[0]
        tc = base.train
        assert tc.runtime_hparams, (
            "population trials must use runtime_hparams (the 'runtime' "
            "HPO variant): trial identity must be a runtime scalar bundle"
        )
        key0 = _structural_key(base)
        for i, c in enumerate(cfgs[1:], 1):
            if _structural_key(c) != key0:
                raise ValueError(
                    f"population member {i} differs structurally from "
                    "member 0 — only runtime hparams may vary"
                )
        self.cfgs = cfgs
        self.K = len(cfgs)
        self.logdirs = [
            os.path.join(c.path.logdir, c.path.expname) for c in cfgs
        ]
        for d, c in zip(self.logdirs, cfgs):
            os.makedirs(d, exist_ok=True)
            c.to_yaml(os.path.join(d, "avr_conf.yml"))

        seq_len = base.model.signal_output_dim
        dt = base.path.dataset_type
        self.train_data = train_data if train_data is not None else load_dataset(
            dataset_dir, dt, eval=False, seq_len=seq_len, fs=base.render.fs
        )
        self.test_data = test_data if test_data is not None else load_dataset(
            dataset_dir, dt, eval=True, seq_len=seq_len, fs=base.render.fs
        )
        group8 = bool(
            tc.das_reg_loss_weight > 0 or tc.das_ce_loss_weight > 0
        ) and bool(tc.extra.get("group_sampling", False))
        self.batch_size = tc.batch_size
        self.train_sampler = BatchSampler(
            self.train_data, self.batch_size, shuffle=True, seed=tc.seed,
            jitter=True, group8=group8,
        )

        self.fstatic = field_lib.build_field(base.model, dt)
        self.consts = make_consts(base.render, seq_len)
        self.crit = CriterionConfig.from_configs(tc, base.render)
        # one init, broadcast to K: serial runtime-variant trials share
        # cfg.train.seed too, so identical inits match serial semantics —
        # trajectories diverge purely through the hparam bundle
        state1 = init_state(jax.random.PRNGKey(tc.seed), self.fstatic, tc)
        self.state = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * self.K), state1
        )
        self._step_fn, render_fn = make_train_step(
            self.fstatic, self.consts, base.render, tc, self.crit,
            population=self.K,
        )
        # [K]-stacked runtime-hparam bundle — THE per-trial identity
        hps = [make_hparams(c.train) for c in cfgs]
        self._hp = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *hps)
        # vmapped eval render: one call per test batch covers all trials
        self._eval_render = jax.jit(jax.vmap(render_fn, in_axes=(0, None, None)))
        self._key = jax.random.PRNGKey(tc.seed + 1)

    # ------------------------------------------------------------------
    def train(self, log=print) -> None:
        tc = self.cfgs[0].train
        it = int(self.state.step[0])
        host_it = it
        K_steps = max(1, tc.steps_per_call)
        pending: list = []
        t0 = time.time()
        while it < tc.total_iterations:
            for batch in self.train_sampler.epoch():
                if K_steps > 1:
                    pending.append(batch)
                    if len(pending) < K_steps:
                        continue
                    stacked = {
                        k: jnp.asarray(np.stack([b[k] for b in pending]))
                        for k in pending[0]
                    }
                    pending = []
                    self.state, bundles = self._step_fn(
                        self.state, stacked, self._key,
                        jnp.asarray(host_it + 1, jnp.int32), self._hp,
                    )
                    host_it += K_steps
                else:
                    host_it += 1
                    self.state, bundles = self._step_fn(
                        self.state, {k: jnp.asarray(v) for k, v in batch.items()},
                        self._key, jnp.asarray(host_it, jnp.int32), self._hp,
                    )
                it_prev, it = it, int(self.state.step[0])

                def crossed(freq: int) -> bool:
                    return it // freq > it_prev // freq

                if crossed(tc.log_freq):
                    # fetch-forced (device→host is the only reliable
                    # barrier on axon); one line for the whole population
                    tot = np.asarray(
                        jax.device_get(bundles.total)
                    ).reshape(self.K, -1)[:, -1]
                    rate = (
                        (it - it_prev) * self.K * self.batch_size
                        / max(time.time() - t0, 1e-9)
                    )
                    log(
                        f"pop@{it} loss[{self.K} trials] "
                        f"min={tot.min():.3f} med={np.median(tot):.3f} "
                        f"max={tot.max():.3f} ({rate:.0f} samp/s inst)"
                    )
                    t0 = time.time()
                if crossed(tc.val_freq) and it > 0:
                    self.dump_val_npz(it)
                if it >= tc.total_iterations:
                    break

    # ------------------------------------------------------------------
    def dump_val_npz(self, iteration: int) -> None:
        """Render the test split for ALL trials (vmapped) and write each
        trial's `val_iter{it}.npz` — byte-compatible with
        AVRRunner.validate's dumps, so doa_objective_from_logdir applies
        unchanged per trial."""
        from avr_tpu import geometry

        base = self.cfgs[0]
        dirs = geometry.ray_directions(
            base.render.n_azi, base.render.n_ele, key=jax.random.PRNGKey(1234)
        )
        bs = self.batch_size
        data = self.test_data
        sampler = BatchSampler(data, bs, shuffle=False, jitter=False,
                               drop_last=False)
        preds: list = []  # per batch: [K, bs, F, 2]
        oris: list = []
        for batch in sampler.epoch():
            n_real = batch["pos_rx"].shape[0]
            if n_real < bs:
                batch = {
                    k: np.concatenate([v, np.repeat(v[-1:], bs - n_real, axis=0)])
                    for k, v in batch.items()
                }
            db = {k: jnp.asarray(v) for k, v in batch.items()}
            out = jax.device_get(self._eval_render(self.state.params, db, dirs))
            preds.append(
                (out[..., 0] + 1j * out[..., 1]).astype(np.complex64)[:, :n_real]
            )
            wave = batch["wave"][:n_real]
            oris.append((wave[..., 0] + 1j * wave[..., 1]).astype(np.complex64))
        pred_all = np.concatenate(preds, axis=1)  # [K, N, F]
        ori = np.concatenate(oris)                # [N, F]
        for k, logdir in enumerate(self.logdirs):
            npz_dir = os.path.join(logdir, "val_result")
            os.makedirs(npz_dir, exist_ok=True)
            payload = dict(
                ori_sig=ori, pred_sig=pred_all[k],
                position_rx=data.pos_rx, position_tx=data.pos_tx,
                fs=base.render.fs,
            )
            if data.ch_idx is not None:
                payload["ch_idx"] = data.ch_idx
            np.savez_compressed(
                os.path.join(npz_dir, f"val_iter{iteration:06d}.npz"), **payload
            )
