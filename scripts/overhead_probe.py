"""Decompose the ~55 ms fixed per-step overhead on the axon backend.

Three probes, fetch-forced timing (block_until_ready does not block on
axon; a device->host scalar read is the only barrier):

  1. trivial-dispatch: a tiny chained jitted program, per-call cost =
     dispatch/RPC + negligible execution.
  2. step x1: the flagship fwd+bwd step, dispatched one call per step
     (what bench.py does today).
  3. step-scan xK: the same K steps folded into ONE jitted
     ``lax.scan`` — if (2) - (3) is large, the overhead is per-dispatch
     and a multi-step train loop amortizes it.
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
    bs, R = cfg.train.batch_size, cfg.render.n_rays
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)

    # ---- probe 1: trivial dispatch --------------------------------
    triv = jax.jit(lambda x: x * 1.000001 + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = triv(x)
    float(x[0, 0])
    t0 = time.perf_counter()
    y = x
    for _ in range(50):
        y = triv(y)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / 50
    print(f"trivial chained dispatch: {dt*1e3:.2f} ms/call", flush=True)

    # ---- flagship loss --------------------------------------------
    def loss_fn(p, key):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=key, shell_chunk=cfg.train.shell_chunk,
        )
        return jnp.mean(jnp.abs(out - target))

    grad_fn = jax.jit(
        lambda p, i: jax.value_and_grad(loss_fn)(
            p, jax.random.fold_in(jax.random.PRNGKey(0), i)
        )
    )

    # ---- probe 2: one dispatch per step (bench.py today) ----------
    loss, grads = grad_fn(params, 0)
    float(loss)
    steps = 10
    t0 = time.perf_counter()
    for i in range(steps):
        loss, grads = grad_fn(params, i + 1)
    float(loss)
    per1 = (time.perf_counter() - t0) / steps
    print(f"step x1 dispatch-per-step: {per1*1e3:.1f} ms/step", flush=True)

    # ---- probe 3: K steps inside one scan --------------------------
    K = 5

    def scan_fn(p, i0):
        def body(carry, k):
            loss, g = jax.value_and_grad(loss_fn)(
                p, jax.random.fold_in(jax.random.PRNGKey(0), i0 + k)
            )
            # touch the grads so they aren't DCE'd; emulate an optimizer
            # update's data dependence without optimizer state.
            gn = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
            return carry + loss + 0.0 * gn, None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return tot

    scan_jit = jax.jit(scan_fn)
    print("compiling scan...", flush=True)
    tc = time.perf_counter()
    tot = scan_jit(params, 0)
    float(tot)
    print(f"scan compile+first: {time.perf_counter()-tc:.1f} s", flush=True)
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        tot = scan_jit(params, (r + 1) * K)
    float(tot)
    perk = (time.perf_counter() - t0) / (reps * K)
    print(f"step-scan x{K}: {perk*1e3:.1f} ms/step", flush=True)
    print(f"amortizable overhead: {(per1-perk)*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
