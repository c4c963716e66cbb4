"""Decompose the hash-encode forward at RAF scale (fetch-forced)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.models import field as field_lib, hashgrid  # noqa: E402


def timeit(name, f, *a, steps=10):
    o = f(*a)
    _ = float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    t0 = time.perf_counter()
    for _ in range(steps):
        o = f(*a)
    _ = float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    print(f"{name}: {(time.perf_counter() - t0) / steps * 1e3:.1f} ms", flush=True)


def main():
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    st = fst.encodings["pos"].grid
    fused = params["enc"]["pos_pair"]
    Fh = st.n_features
    ta, tb = fused[:, :Fh], fused[:, Fh:]
    fused_h = fused.astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    N = 4 * 650 * 32
    x = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

    # precompute idx/weights on device once
    idx, w = jax.jit(lambda xq: hashgrid._indices_weights(st, xq))(x)
    idx_flat = idx.reshape(-1)

    timeit("idx+w only", jax.jit(lambda q: idx_and_w(q)[1]), x)
    timeit("gather [N,L,8] f32", jax.jit(lambda t, i: t[i]), fused, idx)
    timeit("gather flat f32", jax.jit(lambda t, i: t[i]), fused, idx_flat)
    timeit("gather flat bf16", jax.jit(lambda t, i: t[i]), fused_h, idx_flat)
    timeit(
        "gather+interp (pre idx/w) f32",
        jax.jit(lambda t, i, ww: jnp.sum(t[i] * ww[..., None], axis=-2)),
        fused, idx, w,
    )
    timeit(
        "gather+interp (pre idx/w) bf16",
        jax.jit(lambda t, i, ww: jnp.sum(t[i].astype(jnp.float32) * ww[..., None], axis=-2)),
        fused_h, idx, w,
    )
    timeit(
        "full encode_pair fwd",
        jax.jit(lambda a, b: hashgrid.encode_pair(a, b, st, x)), ta, tb,
    )


if __name__ == "__main__":
    main()
