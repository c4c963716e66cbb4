"""Isolate where the fwd+bwd render step spends time on the real chip.

Fetch-forced timing (block_until_ready does not block on the axon
backend). Prints one line per experiment.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.models import hashgrid  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402


def timeit(name, fn, *args, steps=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    bs, R, S = cfg.train.batch_size, cfg.render.n_rays, cfg.render.n_samples
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss_fn(p, frozen_tables):
        if frozen_tables:
            p = {
                k: (jax.lax.stop_gradient(v) if "enc" in k else v)
                for k, v in p.items()
            }
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=key, shell_chunk=cfg.train.shell_chunk,
        )
        return jnp.mean(jnp.abs(out - target))

    full = jax.jit(lambda p: jax.value_and_grad(lambda q: loss_fn(q, False))(p))
    frozen = jax.jit(lambda p: jax.value_and_grad(lambda q: loss_fn(q, True))(p))
    fwd_only = jax.jit(lambda p: loss_fn(p, False))

    print("param keys:", sorted(params.keys()), flush=True)
    timeit("fwd only", fwd_only, params)
    timeit("fwd+bwd full", full, params)
    timeit("fwd+bwd frozen hash tables", frozen, params)

    # ---- isolated encode at the real point count --------------------
    # complex variant: pos pair encode over bs*R*S points.
    N = bs * R * S
    st = fst.encodings["pos"].grid
    print(f"N points={N}, levels={st.n_levels}, entries={st.total_entries}", flush=True)
    fused = params["enc"]["pos_pair"]
    x = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

    enc_fwd = jax.jit(lambda t: hashgrid.encode_pair_fused(t, st, x))
    timeit("encode_pair fwd (N pts)", enc_fwd, fused)

    def enc_loss(t):
        ea, eb = hashgrid.encode_pair_fused(t, st, x)
        return jnp.sum(ea) + jnp.sum(eb)

    enc_bwd = jax.jit(jax.grad(enc_loss))
    timeit("encode_pair fwd+bwd (N pts)", enc_bwd, fused)

    # ---- isolated sort / scatter at update scale --------------------
    M = N * st.n_levels * 8
    E = st.total_entries
    print(f"M updates={M}, E entries={E}", flush=True)
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(M, 4)), jnp.float32)

    scat = jax.jit(lambda i, u: jnp.zeros((E, 4), jnp.float32).at[i].add(u))
    timeit("xla scatter-add M x4", scat, idx, upd, steps=3)

    def dosort(i, u):
        ops = (i,) + tuple(u[:, j] for j in range(4))
        return jax.lax.sort(ops, num_keys=1)[0]

    srt = jax.jit(dosort)
    timeit("xla sort M keys + 4 payload", srt, idx, upd, steps=3)

    srt_k = jax.jit(lambda i: jax.lax.sort((i,), num_keys=1)[0])
    timeit("xla sort M keys only", srt_k, idx, steps=3)

    gat = jax.jit(lambda t, i: t[i])
    big_idx = jnp.asarray(rng.integers(0, E, M // 8), jnp.int32)
    fused_t = jnp.concatenate([ta, tb], axis=-1)
    timeit("xla gather M/8 rows x4", gat, fused_t, big_idx, steps=3)


if __name__ == "__main__":
    main()
