"""Optimizer + jittable train step.

Reproduces the reference's optimization semantics
(reference/avr_runner.py:67-73,183-200) in optax:

  * Adam(β=0.9, 0.999) with cosine-annealed lr → eta_min (torch
    CosineAnnealingLR == optax.cosine_decay_schedule with
    alpha=eta_min/lr), L2 weight decay folded into the gradient like
    torch's Adam(weight_decay=·);
  * global-norm clip at 1.0 followed by zeroing of non-finite gradient
    entries (a NaN global norm NaNs every entry, which the zeroing then
    nulls — the same net effect as the reference's post-clip scrub);
  * NaN-loss skip: if the energy loss is non-finite the whole update
    (params, optimizer state, step count, schedule position) is dropped,
    mirroring the reference's `continue` (avr_runner.py:183-185).

The step is pure and jit-able; multi-chip sharding comes from constraints
on the batch ('data') and ray directions ('ray') when a MeshPlan is given
— XLA SPMD inserts the psum for the spherical integral and the gradient
all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from avr_tpu import geometry
from avr_tpu.config import RenderConfig, TrainConfig
from avr_tpu.losses import CriterionConfig, LossBundle, criterion
from avr_tpu.models import field as field_lib
from avr_tpu.parallel.mesh import MeshPlan
from avr_tpu.render.common import RenderConsts
from avr_tpu.render.fused import render_fused


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 completed-update counter


def zero_nonfinite() -> optax.GradientTransformation:
    """Zero NaN/Inf gradient entries (reference/avr_runner.py:192-197)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree_util.tree_map(
                lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
            ),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_schedule(tc: TrainConfig) -> optax.Schedule:
    """The cosine LR schedule (torch CosineAnnealingLR equivalent).

    Single source of truth — the optimizer applies it and the runner
    logs it (avr_tpu/train/runner.py:_current_lr), so the logged LR can
    never drift from the applied LR.
    """
    return optax.cosine_decay_schedule(
        init_value=tc.lr,
        decay_steps=max(1, tc.T_max),
        alpha=tc.eta_min / tc.lr if tc.lr else 0.0,
    )


HP_WEIGHT_KEYS = (
    "spec_loss_weight", "amplitude_loss_weight", "angle_loss_weight",
    "time_loss_weight", "energy_loss_weight", "multistft_loss_weight",
    "das_reg_loss_weight", "das_ce_loss_weight",
)


def make_hparams(tc: TrainConfig) -> dict:
    """Runtime hyper-parameter bundle (TrainConfig.runtime_hparams).

    All values the compiled step would otherwise BAKE IN as constants —
    lr/eta_min/T_max (the cosine schedule), weight decay, and the loss
    weights — as jnp scalars passed per call. Two configs differing only
    in these produce byte-identical programs, so HPO trials hit the
    persistent compile cache instead of paying a fresh remote compile
    (reference analog: optuna_avr_runner.py:141-164 pays a fresh model
    build per trial; VERDICT r3 item 7).
    """
    hp = {k: jnp.asarray(getattr(tc, k), jnp.float32) for k in HP_WEIGHT_KEYS}
    hp["lr"] = jnp.asarray(tc.lr, jnp.float32)
    hp["eta_min"] = jnp.asarray(tc.eta_min, jnp.float32)
    hp["t_max"] = jnp.asarray(max(1, tc.T_max), jnp.float32)
    hp["weight_decay"] = jnp.asarray(tc.weight_decay, jnp.float32)
    return hp


def _cosine_lr(hp: dict, step: jax.Array) -> jax.Array:
    """The optax cosine_decay_schedule formula on runtime scalars."""
    t = jnp.minimum(step.astype(jnp.float32), hp["t_max"]) / hp["t_max"]
    cosf = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return hp["eta_min"] + (hp["lr"] - hp["eta_min"]) * cosf


def _opt_core(learning_rate, weight_decay):
    """Optimizer chain with injectable scalars (runtime_hparams path).

    Same transform order as make_optimizer's static chain; the decayed
    weights enter BEFORE Adam (L2-through-Adam, matching the reference's
    torch.optim.Adam(weight_decay=...) semantics), and weight_decay=0 is
    the numeric no-op of the static path's structural omission.
    """
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        zero_nonfinite(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if getattr(tc, "runtime_hparams", False):
        return optax.inject_hyperparams(_opt_core)(
            learning_rate=tc.lr, weight_decay=tc.weight_decay
        )
    schedule = make_schedule(tc)
    chain = [
        optax.clip_by_global_norm(1.0),
        zero_nonfinite(),
    ]
    if tc.weight_decay:
        chain.append(optax.add_decayed_weights(tc.weight_decay))
    chain += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*chain)


def init_state(key: jax.Array, fstatic, tc: TrainConfig) -> TrainState:
    params = field_lib.init(key, fstatic)
    tx = make_optimizer(tc)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    fstatic,
    consts: RenderConsts,
    rc: RenderConfig,
    tc: TrainConfig,
    crit: CriterionConfig,
    mesh_plan: Optional[MeshPlan] = None,
    population: int = 0,
):
    """Build the jitted train step: (state, batch, key) → (state, bundle).

    population > 0: vmap the step over a leading [K] trial axis on
    ``state`` and the runtime-hparam bundle ``hp`` (batch/key/iteration
    shared across trials) — ONE program advances K HPO trials in
    lockstep. TPU-native vectorized HPO: the small per-trial workload is
    latency/dispatch-bound on one chip, so batching trials onto the MXU
    multiplies trial throughput (hpo/population.py; the reference's
    Optuna loop runs strictly one trial at a time,
    reference/optuna_avr_runner.py:141-164). Requires
    ``tc.runtime_hparams`` (trial identity lives entirely in hp) and is
    mutually exclusive with mesh_plan.
    """
    if population:
        assert getattr(tc, "runtime_hparams", False), (
            "population mode needs runtime_hparams=True: the K trials "
            "share one compiled program and differ only in the hp bundle"
        )
        assert mesh_plan is None, "population mode is single-device"
    tx = make_optimizer(tc)
    compute_dtype = (
        None if tc.compute_dtype in ("float32", "none", None) else jnp.dtype(tc.compute_dtype)
    )

    def constrain(x, spec):
        if mesh_plan is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh_plan.mesh, spec)
        )

    def pad_rays(dirs: jax.Array):
        """Pad R to a multiple of the mesh ray axis with zero-weight rays.

        R = n_azi·n_ele + 2 is rarely divisible by the ray axis (e.g.
        RAF-Furnished's 650 = 2·5²·13 over ray=4): without padding the
        SPMD partitioner halo-pads every [·,R,·,·] tensor and shards are
        imbalanced. Explicit inert rays keep every shard identical;
        their contribution is exactly zero (render_fused ray_weights).
        """
        if mesh_plan is None:
            return dirs, None
        n_ray = mesh_plan.n_ray
        R = dirs.shape[0]
        pad = (-R) % n_ray
        if pad == 0:
            return dirs, None
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[:1], (pad, 3))])
        ray_w = jnp.concatenate(
            [jnp.ones((R,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        return dirs, constrain(ray_w, P("ray"))

    def render(params, batch: Dict[str, jax.Array], dirs: jax.Array,
               ray_weights: Optional[jax.Array] = None) -> jax.Array:
        return render_fused(
            params,
            fstatic,
            consts,
            rc,
            constrain(batch["pos_rx"], P("data")),
            constrain(batch["pos_tx"], P("data")),
            direction_tx=batch.get("rot_tx"),
            ch_idx=batch.get("ch_idx"),
            dirs=dirs,
            compute_dtype=compute_dtype,
            shell_chunk=tc.shell_chunk,
            remat=tc.remat,
            point_budget=tc.point_budget,
            ray_weights=ray_weights,
        )

    runtime_hp = bool(getattr(tc, "runtime_hparams", False))

    def loss_fn(params, batch, dirs, ray_weights, hp) -> Tuple[jax.Array, LossBundle]:
        pred = render(params, batch, dirs, ray_weights)
        bundle, _, _ = criterion(pred, batch["wave"], crit, weights=hp)
        return bundle.total, bundle

    def train_step_core(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array,
                        it: Optional[jax.Array] = None, hp: Optional[dict] = None):
        # Fold the iteration counter into the key INSIDE jit — splitting
        # keys eagerly in the host loop costs ~100 ms/step of dispatch on
        # remote backends.
        if it is not None:
            key = jax.random.fold_in(key, it)
        dirs = geometry.ray_directions(rc.n_azi, rc.n_ele, key=key)
        dirs, ray_w = pad_rays(dirs)
        dirs = constrain(dirs, P("ray"))
        (_, bundle), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dirs, ray_w, hp
        )
        # Reference skips the iteration when the energy loss goes NaN
        # (avr_runner.py:183-185); non-finite covers inf as well.
        skip = jnp.logical_not(jnp.isfinite(bundle.energy))
        opt_in = state.opt_state
        if runtime_hp:
            # the inject_hyperparams state carries the scalars the static
            # chain bakes in; set this step's cosine LR + decay from hp
            opt_in = opt_in._replace(
                hyperparams={
                    **opt_in.hyperparams,
                    "learning_rate": _cosine_lr(hp, state.step),
                    "weight_decay": hp["weight_decay"],
                }
            )
        updates, new_opt = tx.update(grads, opt_in, state.params)
        new_state = TrainState(
            optax.apply_updates(state.params, updates), new_opt, state.step + 1
        )
        state_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(skip, o, n), new_state, state
        )
        return state_out, bundle

    def _with_mesh_ctx(fn):
        """Install the SPMD mesh for ops traced inside the step (the
        Pallas sorted-scatter must be shard_map-wrapped on multi-device
        meshes — hash_scatter.spmd_mesh)."""
        if mesh_plan is None:
            return fn

        import functools

        from avr_tpu.ops import hash_scatter

        @functools.wraps(fn)
        def wrapped(*a, **k):
            with hash_scatter.spmd_mesh(mesh_plan.mesh):
                return fn(*a, **k)

        return wrapped

    def _maybe_vmap(fn):
        if not population:
            return fn
        # state + hp carry the trial axis; batch/key/iteration are shared
        # (every trial sees the identical data stream — the runtime
        # variant's serial trials share the sampler seed too)
        return jax.vmap(fn, in_axes=(0, None, None, None, 0))

    K = max(1, int(getattr(tc, "steps_per_call", 1)))
    if K == 1:
        # NOTE: vmap train_step_core directly (no wrapper) — a wrapper
        # would rename the traced function, which renames the HLO module
        # and misses the persistent remote-compile cache for every
        # existing non-population program
        return (
            jax.jit(_with_mesh_ctx(_maybe_vmap(train_step_core)),
                    donate_argnums=(0,)),
            render,
        )

    def train_multi_step(state: TrainState, batches: Dict[str, jax.Array],
                         key: jax.Array, it0: jax.Array,
                         hp: Optional[dict] = None):
        """K optimizer steps in one dispatch via lax.scan.

        batches: the per-step batch dict stacked on a leading [K] axis.
        Amortizes per-dispatch and program-prologue overhead (~13 ms/step
        measured on the axon backend, scripts/overhead_probe.py). Returns
        the loss bundle of every inner step stacked on [K].
        """

        def body(st, inp):
            k, batch = inp
            return train_step_core(st, batch, key, it0 + k, hp)

        return jax.lax.scan(
            body, state, (jnp.arange(K, dtype=jnp.int32), batches)
        )

    return (
        jax.jit(_with_mesh_ctx(_maybe_vmap(train_multi_step)),
                donate_argnums=(0,)),
        render,
    )
