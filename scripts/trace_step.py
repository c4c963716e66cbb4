"""Capture a jax.profiler trace of the flagship fwd+bwd step on the real
chip, plus a summary of per-op time from the resulting xplane if readable.

Usage: python scripts/trace_step.py [logdir]
"""

import glob
import os
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


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/avr_trace"
    cfg = _flagship_config()
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
            key=key, shell_chunk=cfg.train.shell_chunk,
        )
        return jnp.mean(jnp.abs(out - target))

    f = jax.jit(jax.value_and_grad(loss_fn))
    l, g = f(params)
    print("warm loss", float(l), flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        l, g = f(params)
    _ = float(l)
    print(f"pre-trace step: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms", flush=True)

    jax.profiler.start_trace(logdir)
    for _ in range(3):
        l, g = f(params)
    _ = float(l)
    jax.profiler.stop_trace()
    print("trace written to", logdir, flush=True)
    for p in sorted(glob.glob(os.path.join(logdir, "**", "*"), recursive=True)):
        if os.path.isfile(p):
            print(f"  {os.path.getsize(p):>12}  {p}", flush=True)


if __name__ == "__main__":
    main()
