"""On-chip exactness check for the packed-pair gather (AVR_TPU_GATHER_PACK2).

The packed path carries bf16 feature pairs inside f32 words; if any TPU
data path flushed denormal f32 values (CLAUDE.md notes Pallas bitcast
denormal flushes), features would silently zero. CPU tests can't catch
that — this script compares the pack2 encode against the default bf16
gather ON THE DEVICE, bit for bit, for both interpolation modes, using
a table salted with values whose packed words are denormal.

Run: python scripts/pack2_check.py  (uses the default backend — axon)
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from avr_tpu.config import EncodingConfig  # noqa: E402
from avr_tpu.models import hashgrid  # noqa: E402


def check_op(table: jnp.ndarray) -> None:
    """The raw packed gather must be BITWISE equal to the bf16 rows —
    any denormal flush in the f32 carrier path zeroes features here."""
    from avr_tpu.ops import hash_scatter

    rng = np.random.default_rng(1)
    E = table.shape[0]
    idx = jnp.asarray(rng.integers(0, E, (4, 4096)), jnp.int32)
    f = jax.jit(lambda t, i: hash_scatter.gather_rows_packed2(t, i))
    f0, f1 = [np.asarray(a, np.float32) for a in f(table, idx)]
    want = np.asarray(
        jax.jit(lambda t, i: t.astype(jnp.bfloat16)[i])(table, idx), np.float32
    )
    ok0 = np.array_equal(f0, want[..., 0])
    ok1 = np.array_equal(f1, want[..., 1])
    # the salted rows make ~1/3 of packed words denormal; a flush would
    # zero their f0 while want keeps it
    flushed = int(((f0 == 0) & (want[..., 0] != 0)).sum())
    print(f"[op] bitwise f0={ok0} f1={ok1} flushed_rows={flushed}", flush=True)
    if not (ok0 and ok1):
        print("[op] PACK2 GATHER MISMATCH — do not enable", flush=True)
        sys.exit(1)

    # F=4 complex64 variant
    t4 = np.concatenate([np.asarray(table)] * 2, axis=-1)
    t4[1::3, 3] = 0.0
    t4j = jnp.asarray(t4)
    f4 = jax.jit(lambda t, i: hash_scatter.gather_rows_packed4(t, i))
    got4 = [np.asarray(a, np.float32) for a in f4(t4j, idx)]
    want4 = np.asarray(
        jax.jit(lambda t, i: t.astype(jnp.bfloat16)[i])(t4j, idx), np.float32
    )
    ok4 = all(np.array_equal(g, want4[..., j]) for j, g in enumerate(got4))
    print(f"[op] pack4 bitwise={ok4}", flush=True)
    if not ok4:
        print("[op] PACK4 GATHER MISMATCH — do not enable", flush=True)
        sys.exit(1)


def run(interp: str) -> None:
    cfg = EncodingConfig(
        n_levels=6, n_features_per_level=2, log2_hashmap_size=14,
        base_resolution=8, per_level_scale=1.6, interpolation=interp,
    )
    static = hashgrid.build_static(cfg)
    rng = np.random.default_rng(0)
    t = rng.normal(size=(static.padded_entries, 2)).astype(np.float32)
    # salt rows whose packed f32 word is DENORMAL: f1 bf16 bits tiny
    # (exponent 0) happen when f1 == 0 and f0 != 0 → packed word is a
    # denormal f32. Make many such rows.
    t[::3, 1] = 0.0
    table = jnp.asarray(t)
    x = jnp.asarray(rng.uniform(0, 1, (4096, 3)), jnp.float32)

    def enc(pk2: str):
        os.environ["AVR_TPU_GATHER_PACK2"] = pk2
        os.environ["AVR_TPU_ENCODE_LAYOUT"] = "klm"
        os.environ["AVR_TPU_DENSE_ONEHOT"] = "0"
        f = jax.jit(
            lambda tb, xx: hashgrid.encode(
                tb, static, xx, compute_dtype=jnp.bfloat16
            )
        )
        return np.asarray(f(table, x), np.float32)

    e0 = enc("0")
    e1 = enc("1")
    md = float(np.abs(e0 - e1).max())
    scale = float(np.abs(e0).max())
    nz0, nz1 = int((e0 != 0).sum()), int((e1 != 0).sum())
    # the two paths differ only by bf16 reduce associativity (~1-2 ulp);
    # a carrier flush would zero whole features instead
    print(f"[{interp}] encode pack2 vs default: maxdiff={md:.3e} "
          f"(scale {scale:.3e}) nonzeros {nz0} vs {nz1}", flush=True)
    if md > 0.02 * scale or abs(nz0 - nz1) > nz0 // 100:
        print(f"[{interp}] PACK2 ENCODE MISMATCH — do not enable", flush=True)
        sys.exit(1)


def main():
    cfg = EncodingConfig(
        n_levels=6, n_features_per_level=2, log2_hashmap_size=14,
        base_resolution=8, per_level_scale=1.6,
    )
    static = hashgrid.build_static(cfg)
    rng = np.random.default_rng(0)
    t = rng.normal(size=(static.padded_entries, 2)).astype(np.float32)
    t[::3, 1] = 0.0  # denormal-packed-word salt
    check_op(jnp.asarray(t))
    for interp in ("trilinear", "simplex"):
        run(interp)
    print("PACK2 CHECK OK", flush=True)


if __name__ == "__main__":
    main()
