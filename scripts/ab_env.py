"""A/B the flagship fwd+bwd step across env-var configurations.

Usage: python scripts/ab_env.py [--bs=N] "LABEL:VAR=V,VAR2=V2" ...
Each spec is timed in-process (env vars are read at trace time, so each
spec compiles its own program). Timing is fetch-forced (axon's
block_until_ready does not block). --bs overrides the flagship batch
size; AVR_TPU_AB_SHELL_CHUNK / AVR_TPU_AB_REMAT override the scan's
chunking/rematerialization per spec (both read at trace time).
"""

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
    argv = sys.argv[1:]
    cfg = _flagship_config()
    bs = cfg.train.batch_size
    if argv and argv[0].startswith("--bs="):
        bs = int(argv[0].split("=", 1)[1])
        argv = argv[1:]
    specs = argv or ["base:"]
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    R = cfg.render.n_rays
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
            key=key,
            # trace-time A/B toggles for the signal scan's chunking and
            # rematerialization (VERDICT r2 item 8: shell_chunk × remat
            # grid at bs 8)
            shell_chunk=int(os.environ.get(
                "AVR_TPU_AB_SHELL_CHUNK", cfg.train.shell_chunk
            )),
            remat=os.environ.get("AVR_TPU_AB_REMAT", "1") == "1",
        )
        return jnp.mean(jnp.abs(out - target))

    for spec in specs:
        label, _, envs = spec.partition(":")
        saved = {}
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            f = jax.jit(jax.value_and_grad(loss_fn))
            t0 = time.perf_counter()
            l, g = f(params)
            _ = float(l)
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                l, g = f(params)
            _ = float(l)
            dt = (time.perf_counter() - t0) / 10
            print(
                f"{label}: {dt * 1e3:.1f} ms  {bs * R / dt:,.0f} rays/s "
                f"(loss {float(l):.6f}, compile {tc:.0f}s)",
                flush=True,
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
