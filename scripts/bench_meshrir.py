"""Fwd+bwd step timing for the reference MeshRIR workload shape.

Reproduces the numbers in docs/PERFORMANCE.md ("The MeshRIR workload"):
the unmodified reference avr_meshrir.yml shape — 3202 rays x 64 samples,
2400-dim IR @ 24 kHz, batch 4 — measured fetch-forced on the real chip.

Usage: python scripts/bench_meshrir.py [trilinear|simplex] [logdir]
With a logdir, also captures a jax.profiler trace (2 steps).
"""

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


def main():
    interp = sys.argv[1] if len(sys.argv) > 1 else "trilinear"
    logdir = sys.argv[2] if len(sys.argv) > 2 else None
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

    f = jax.jit(jax.value_and_grad(loss_fn))
    l, _ = f(params)
    print("warm loss", float(l), flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        l, _ = f(params)
    _ = float(l)
    dt = (time.perf_counter() - t0) / 3
    R = cfg.render.n_azi * cfg.render.n_ele + 2
    print(f"{interp}: {dt * 1e3:.0f} ms/step  {bs * R / dt:,.0f} rays/s", flush=True)
    if logdir:
        jax.profiler.start_trace(logdir)
        for _ in range(2):
            l, _ = f(params)
        _ = float(l)
        jax.profiler.stop_trace()
        print("trace written to", logdir, flush=True)


if __name__ == "__main__":
    main()
