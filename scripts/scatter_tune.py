"""Tune the sorted-scatter Pallas kernel's (tile_rows, chunk) geometry.

After simplex interpolation halved the update stream (M = N·L·4 ≈ 6.65M
rows over E ≈ 4.76M entries), the kernel is tile-count bound: the grid
runs E/tile_rows sequential steps, each paying a serialized chunk-DMA
wait. Sweep geometries at the production shape (bf16-packed payload,
level-grouped pre-sorted input) and print fetch-forced times.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from avr_tpu.ops import hash_scatter  # noqa: E402


def main():
    L, n, C, F = 20, 83200, 4, 4
    sizes = [4913, 35937] + [262144] * 18  # flagship pos-pair geometry
    offs = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    E = int(np.sum(sizes))
    rng = np.random.default_rng(0)
    idx = np.stack(
        [rng.integers(offs[l], offs[l] + sizes[l], n * C) for l in range(L)]
    ).astype(np.int32)  # [L, n*C] level-grouped (scatter sorts rows per level)
    upd = rng.normal(size=(L, n * C, F)).astype(np.float32)
    idx_j, upd_j = jnp.asarray(idx), jnp.asarray(upd)
    print(f"M={L*n*C/1e6:.2f}M rows, E={E/1e6:.2f}M entries", flush=True)

    for ts, uc in [(256, 1024), (512, 1024), (1024, 1024), (1024, 2048),
                   (2048, 2048), (4096, 2048), (4096, 4096)]:
        f = jax.jit(
            lambda i, u, ts=ts, uc=uc: hash_scatter.scatter_add_rows(
                i, u, E, impl="sorted", tile_rows=ts, chunk=uc, payload="bf16"
            )
        )
        try:
            out = f(idx_j, upd_j)
            _ = float(jnp.sum(out[:8]))
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(idx_j, upd_j)
            _ = float(jnp.sum(out[:8]))
            dt = (time.perf_counter() - t0) / 5
            print(f"TS={ts} UC={uc}: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"TS={ts} UC={uc}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
