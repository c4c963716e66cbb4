"""Sweep fused-renderer execution knobs on the real chip.

Times fwd+bwd of the flagship step across shell_chunk x remat variants
(fetch-forced). Finds the fastest configuration for bench/training.
"""

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

    def make(chunk, remat, dtype=jnp.bfloat16):
        def loss_fn(p):
            out = render_fused(
                p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
                key=key, shell_chunk=chunk, remat=remat, compute_dtype=dtype,
            )
            return jnp.mean(jnp.abs(out - target))

        return jax.jit(jax.value_and_grad(loss_fn))

    cases = [
        ("C=1 remat", 1, True, jnp.bfloat16),
        ("C=2 remat", 2, True, jnp.bfloat16),
        ("C=4 remat", 4, True, jnp.bfloat16),
        ("C=8 remat", 8, True, jnp.bfloat16),
        ("C=16 remat", 16, True, jnp.bfloat16),
        ("C=32 remat", 32, True, jnp.bfloat16),
        ("C=16 norem", 16, False, jnp.bfloat16),
        ("C=1 norem", 1, False, jnp.bfloat16),
        ("C=4 norem", 4, False, jnp.bfloat16),
        ("C=4 remat f32", 4, True, None),
    ]
    for name, chunk, remat, dtype in cases:
        try:
            f = make(chunk, remat, dtype)
            t0 = time.perf_counter()
            l, g = f(params)
            _ = float(l)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                l, g = f(params)
            _ = float(l)
            dt = (time.perf_counter() - t0) / 10
            print(f"{name}: {dt * 1e3:.1f} ms (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
