"""Isolated XLA sort-cost scaling probe (round-5 sort attack, VERDICT #1).

The sorted-scatter backward batch-sorts the (index, payload) stream as
[L, K] per-level row sorts. A comparison sort network costs
O(K log^2 K) per row — IF that model holds on the TPU emitter, sorting
[L*S, K/S] sub-runs instead (then covering S sorted runs per table tile
in the kernel's chunk schedule) would cut the dominant sort line by
log^2(K/S)/log^2(K). This probe measures lax.sort wall time vs the
(rows, row-length) split at constant total elements to decide whether
the sub-run scheme has real headroom before building the multi-range
tile schedule.

Shapes: the MeshRIR trilinear stream (131M rows over 20 levels,
K=6.55M/level) and the flagship hybridc pos-pair stream scale. Payload
operand count matches production (1 key + 1 packed-bf16-pair f32).

Run ON THE CHIP: python scripts/sort_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import avr_tpu  # noqa: F401,E402  (enables the compilation cache)


def timed(fn, *args, reps=6):
    out = fn(*args)
    # fetch-force (axon block_until_ready does not block)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return (time.time() - t0) / reps


def probe(total_rows: int, base_L: int, payload_ops: int, splits):
    rng = np.random.default_rng(0)
    print(f"== total={total_rows/1e6:.1f}M rows, base L={base_L}, "
          f"{payload_ops} payload op(s) ==", flush=True)
    results = {}
    for s in splits:
        L = base_L * s
        K = total_rows // L
        idx = jnp.asarray(
            rng.integers(0, 1 << 20, size=(L, K)).astype(np.int32)
        )
        pays = tuple(
            jnp.asarray(rng.normal(size=(L, K)).astype(np.float32))
            for _ in range(payload_ops)
        )

        @jax.jit
        def do(idx, pays):
            return jax.lax.sort(
                (idx,) + pays, dimension=1, num_keys=1, is_stable=False
            )[0]

        dt = timed(do, idx, pays)
        results[s] = dt
        rel = results[s] / results[splits[0]]
        print(f"  S={s:>3} [L={L:>4}, K={K/1e3:>8.0f}k]: {dt*1e3:8.2f} ms "
              f"({rel:5.2f}x of S=1)", flush=True)
    return results


if __name__ == "__main__":
    # MeshRIR trilinear per-level stream scale (131M rows / 20 levels)
    probe(20 * 6_553_600, 20, 1, [1, 2, 4, 8, 16, 32])
    # flagship hybridc pos-pair scale (~83k pts * 108 corners ~ 9M rows)
    probe(13 * 665_600, 13, 1, [1, 2, 4, 8, 16])
