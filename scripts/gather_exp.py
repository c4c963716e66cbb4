"""XLA gather microbenchmarks at hash-encode scale (fetch-forced)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

M = 13_312_000
E = 4_766_000


def timeit(name, fn, *args, steps=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    t8 = jnp.asarray(rng.normal(size=(E, 8)), jnp.float32)
    t8h = t8.astype(jnp.bfloat16)
    t4 = t8[:, :4]
    t2 = t8[:, :2]

    timeit("gather f32 [E,8]", jax.jit(lambda t, i: t[i]), t8, idx)
    timeit("gather bf16 [E,8]", jax.jit(lambda t, i: t[i]), t8h, idx)
    timeit("gather f32 [E,4]", jax.jit(lambda t, i: t[i]), t4, idx)
    timeit("gather f32 [E,2]", jax.jit(lambda t, i: t[i]), t2, idx)
    timeit(
        "gather f32 [E,8] half rows",
        jax.jit(lambda t, i: t[i]), t8, idx[: M // 2],
    )
    # sorted indices: does locality help the emitter?
    idx_sorted = jnp.sort(idx)
    timeit("gather f32 [E,8] sorted idx", jax.jit(lambda t, i: t[i]), t8, idx_sorted)
    # one fused gather for pair vs two separate narrow gathers
    timeit(
        "2x gather f32 [E,4]",
        jax.jit(lambda a, b, i: (a[i], b[i])), t4, t8[:, 4:], idx,
    )


if __name__ == "__main__":
    main()
