"""Scale-probe ablations: which dimension does the residual step time
scale with? Runs fwd+bwd at modified shapes (fetch-forced timing)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402


def time_case(name, cfg_mut, loss_kind="spec"):
    cfg = _flagship_config()
    cfg_mut(cfg)
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    bs = cfg.train.batch_size
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=key, shell_chunk=1,
        )
        return jnp.mean(jnp.abs(out - target))

    f = jax.jit(jax.value_and_grad(loss_fn))
    l, g = f(params)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(10):
        l, g = f(params)
    _ = float(l)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)


def noop(cfg):
    pass


def half_shells(cfg):
    cfg.render.n_samples = 16


def half_rays(cfg):
    cfg.render.n_azi = 18  # 18*18+2=326 rays


def half_T(cfg):
    cfg.model.signal_output_dim = 800


def half_levels(cfg):
    for name in (
        "pos_encoding_sigma", "tx_pos_encoding_sigma", "pos_encoding_sig",
        "tx_pos_encoding_sig", "dir_encoding_sig", "tx_dir_encoding_sig",
    ):
        getattr(cfg.model, name).n_levels = 10


def tiny_signal_net(cfg):
    cfg.model.signal_network.n_neurons = 64
    cfg.model.signal_network.n_hidden_layers = 1


if __name__ == "__main__":
    time_case("baseline", noop)
    time_case("S=16 (half shells)", half_shells)
    time_case("R=326 (half rays)", half_rays)
    time_case("T=800 (half signal len)", half_T)
    time_case("L=10 (half hash levels)", half_levels)
    time_case("signal net 64x1", tiny_signal_net)
