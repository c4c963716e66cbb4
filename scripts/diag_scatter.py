"""Batched diagnostics for the sorted-scatter kernel (one TPU session)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from avr_tpu.ops import hash_scatter  # noqa: E402


def check(name, idx, upd, E, **kw):
    t0 = time.perf_counter()
    out = np.asarray(
        hash_scatter.scatter_add_rows(
            jnp.asarray(idx), jnp.asarray(upd), E, impl="sorted", **kw
        )
    )
    ref = np.zeros((E, upd.shape[1]), np.float32)
    np.add.at(ref, idx, upd)
    denom = max(np.abs(ref).max(), 1e-9)
    err = np.abs(out - ref).max() / denom
    print(
        f"{name}: rel err {err:.2e}  ({time.perf_counter() - t0:.0f}s)",
        flush=True,
    )
    return out, ref


def main():
    M, E, F = 5000, 700, 4
    rng = np.random.default_rng(0)

    # 1. all-to-row-0
    idx = np.zeros((M,), np.int32)
    upd = np.ones((M, F), np.float32)
    out, ref = check("all-row0", idx, upd, E)
    print("  row0:", out[0], "expect", ref[0], flush=True)
    print("  nonzero rows:", np.nonzero(out[:, 0])[0][:8], flush=True)

    # 2. identity permutation (same shapes → cached kernel)
    idx = np.arange(M, dtype=np.int32) % E
    upd = np.asarray(
        np.arange(M * F).reshape(M, F) % 97, np.float32
    )
    out, ref = check("mod-ident", idx, upd, E)
    bad = np.nonzero(np.abs(out - ref).max(axis=1) > 1e-3)[0]
    print("  bad rows:", bad[:16], "... total", len(bad), flush=True)
    if len(bad):
        b = bad[0]
        print(f"  row {b}: got {out[b]} want {ref[b]}", flush=True)

    # 3. random (original failing case)
    idx = rng.integers(0, E, M).astype(np.int32)
    upd = rng.normal(size=(M, F)).astype(np.float32)
    out, ref = check("random", idx, upd, E)
    bad = np.nonzero(np.abs(out - ref).max(axis=1) > 1e-2)[0]
    print("  bad rows:", bad[:16], "... total", len(bad), flush=True)




def grouped():
    """Correctness of the 2-D (grouped) sorted path at hash-level scale."""
    rng = np.random.default_rng(0)
    G, K, F = 20, 66_560, 4  # ~1.3M updates, 20 disjoint segments
    sizes = np.full(G, 250_000)
    offsets = np.cumsum(np.concatenate([[0], sizes[:-1]])).astype(np.int64)
    E = int(offsets[-1] + sizes[-1])
    idx = (offsets[:, None] + rng.integers(0, sizes[0], (G, K))).astype(np.int32)
    upd = rng.normal(size=(G, K, F)).astype(np.float32)
    t0 = time.time()
    out = np.asarray(
        hash_scatter.scatter_add_rows(
            jnp.asarray(idx), jnp.asarray(upd), E, impl="sorted"
        )
    )
    ref = np.zeros((E, F), np.float32)
    np.add.at(ref, idx.reshape(-1), upd.reshape(-1, F))
    denom = max(np.abs(ref).max(), 1e-9)
    err = np.abs(out - ref).max() / denom
    print(f"grouped: rel err {err:.2e}  ({time.time() - t0:.0f}s)", flush=True)

    out2 = np.asarray(
        hash_scatter.scatter_add_rows(
            jnp.asarray(idx), jnp.asarray(upd), E, impl="sorted", payload="bf16"
        )
    )
    err2 = np.abs(out2 - ref).max() / denom
    # per-update bf16 rounding, fp32 accumulation -> ~1e-2 worst case
    print(f"grouped bf16 payload: rel err {err2:.2e}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "grouped":
        grouped()
        raise SystemExit
    main()
