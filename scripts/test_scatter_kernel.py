"""Quick correctness / perf harness for avr_tpu.ops.hash_scatter."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from avr_tpu.ops import hash_scatter  # noqa: E402


def correctness(interpret: bool):
    rng = np.random.default_rng(0)
    M, E, F = 5000, 700, 4
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(M, F)), jnp.float32)
    ref = np.zeros((E, F), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(upd))
    for prec in ["bf16x2", "bf16x3", "f32"]:
        out = hash_scatter.scatter_add_rows(
            idx, upd, E, impl="sorted", precision=prec, interpret=interpret
        )
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        print(f"{prec}: rel err {err:.2e}", flush=True)


def perf(M=13_312_000, E=4_766_000, F=4, ts=256, uc=1024, steps=5):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(M, F)), jnp.float32)

    def run(i, u):
        return hash_scatter.scatter_add_rows(
            i, u, E, impl="sorted", tile_rows=ts, chunk=uc
        )

    f = jax.jit(run)
    out = f(idx, upd)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(idx, upd)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / steps
    print(f"sorted ts={ts} uc={uc}: {dt * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "correctness"
    if mode == "correctness":
        correctness(interpret=jax.default_backend() == "cpu")
    else:
        for ts in (256, 512, 1024):
            perf(ts=ts)
