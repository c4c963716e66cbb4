"""A/B the dense one-hot matmul encode path (AVR_TPU_DENSE_ONEHOT).

Times the reference MeshRIR workload shape (simplex + trilinear) with the
coarse-level one-hot matmul path off / levels 0-1 (<=65536 rows) /
levels 0-2 (<=300000 rows), fetch-forced on the real chip. Env vars are
read at trace time, so each spec compiles its own program in-process.

Usage: python scripts/dense_onehot_ab.py [meshrir|flagship|both]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, ".")
from avr_tpu.config import AVRConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402

SPECS = ("0", "65536", "300000")


def time_step(f, params, steps=3):
    l, _ = f(params)
    float(l)  # fetch barrier (axon block_until_ready does not block)
    t0 = time.perf_counter()
    for _ in range(steps):
        l, _ = f(params)
    float(l)
    return (time.perf_counter() - t0) / steps


def run_meshrir(interp):
    with open("/root/reference/config_files/avr_meshrir.yml") as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    for enc in (cfg.model.pos_encoding_sigma, cfg.model.dir_encoding_sig,
                cfg.model.tx_encoding_sig):
        if enc is not None:
            enc.interpolation = interp
    fst = field_lib.build_field(cfg.model, cfg.path.dataset_type)
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    bs = 4
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        out = render_fused(p, fst, consts, cfg.render, rays_o, tx, key=key)
        return jnp.mean(jnp.abs(out - target))

    R = cfg.render.n_azi * cfg.render.n_ele + 2
    base = None
    for spec in SPECS:
        os.environ["AVR_TPU_DENSE_ONEHOT"] = spec
        f = jax.jit(jax.value_and_grad(loss_fn))
        dt = time_step(f, params)
        base = base or dt
        print(
            f"meshrir/{interp} dense={spec}: {dt * 1e3:.0f} ms/step "
            f"{bs * R / dt:,.0f} rays/s ({base / dt:.2f}x)",
            flush=True,
        )
        f.clear_cache()


def run_flagship():
    from __graft_entry__ import _flagship_config

    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    bs = cfg.train.batch_size
    R = cfg.render.n_rays
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(
        d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32
    )
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=key, shell_chunk=cfg.train.shell_chunk,
        )
        return jnp.mean(jnp.abs(out - target))

    base = None
    for spec in SPECS:
        os.environ["AVR_TPU_DENSE_ONEHOT"] = spec
        f = jax.jit(jax.value_and_grad(loss_fn))
        dt = time_step(f, params, steps=10)
        base = base or dt
        print(
            f"flagship dense={spec}: {dt * 1e3:.1f} ms/step "
            f"{bs * R / dt:,.0f} rays/s ({base / dt:.2f}x)",
            flush=True,
        )
        f.clear_cache()


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("meshrir", "both"):
        run_meshrir("simplex")
        run_meshrir("trilinear")
    if what in ("flagship", "both"):
        run_flagship()
