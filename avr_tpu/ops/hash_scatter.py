"""TPU scatter-add for hash-grid table gradients (Pallas).

The backward pass of a multiresolution hash encoding is a scatter-add of
``M = points x levels x 8`` weighted gradient rows into the feature table
— the reference does this inside tinycudann's CUDA kernels with atomics
(reference/model.py:66-68); XLA's TPU scatter emitter processes colliding
rows serially and dominates the whole training step (~85% measured on the
RAF-Furnished workload).

TPU-native design (no atomics on TPU):

  1. sort the ``M`` (index, update-row) pairs by flat table index
     (``jax.lax.sort``, one fused multi-operand sort);
  2. bucket the sorted stream into table *tiles* of ``TS`` rows; the
     per-tile segment boundaries come from one vectorized
     ``searchsorted`` over the tile edges;
  3. a Pallas kernel, gridded over table tiles, DMAs each tile's
     contiguous slice of sorted updates from HBM and accumulates it with
     one-hot matmuls on the MXU: ``acc[TS,F] += onehot[UC,TS]^T @
     upd[UC,F]``. The one-hot is exact (0/1 in bf16), so splitting each
     fp32 update into bf16 hi+lo passes reconstructs fp32-accurate sums
     with pure bf16 MXU throughput.

Because chunk DMA offsets are 128-lane aligned, tile segments are widened
to block boundaries; rows spilling in from neighbouring tiles fall outside
the tile's local index range, so their one-hot column is all-zero and they
contribute nothing — no masking pass is needed. Updates are exact-summed;
only the summation ORDER differs from XLA's scatter, so results match to
fp32 accumulation tolerance (bf16x2 splitting: ~1e-6 relative; "f32"
precision mode: exact fp32 MXU passes).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def on_tpu() -> bool:
    """True when the default backend executes on TPU hardware.

    The axon remote tunnel registers an experimental 'axon' platform that
    proxies a real TPU chip; treat it as TPU.
    """
    return jax.default_backend() in ("tpu", "axon")


def scatter_add_rows(
    idx: Array,
    upd: Array,
    n_rows: int,
    *,
    impl: Optional[str] = None,
    tile_rows: int = 256,
    chunk: int = 1024,
    precision: str = "bf16x2",
    payload: Optional[str] = None,
    interpret: bool = False,
) -> Array:
    """Sum update rows into bins: out[r] = sum_{i: idx[i]==r} upd[i].

    idx: int32 [M] in [0, n_rows). upd: float32 [M, F]. Returns
    [n_rows, F] float32.

    impl: "xla" (scatter-add, the CPU/GPU default), "sorted" (sort +
    Pallas tile kernel, the TPU default), or None → auto. The
    AVR_TPU_SCATTER env var overrides auto selection.

    payload: "f32" keeps full-precision update rows through the sort;
    "bf16" rounds each update to bf16 (sums still accumulate in fp32 on
    the MXU) and halves the sort traffic — gradient-grade accuracy.
    None → AVR_TPU_SCATTER_PAYLOAD or "f32".
    """
    if impl is None:
        impl = os.environ.get("AVR_TPU_SCATTER") or (
            "sorted" if (on_tpu() or interpret) else "xla"
        )
    if impl == "xla":
        return (
            jnp.zeros((n_rows, upd.shape[-1]), upd.dtype)
            .at[idx.reshape(-1)]
            .add(upd.reshape(-1, upd.shape[-1]))
        )
    if payload is None:
        payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD", "f32")
    return _sorted_scatter(
        idx, upd, n_rows,
        tile_rows=tile_rows, chunk=chunk, precision=precision,
        payload=payload, interpret=interpret,
    )


def _sorted_scatter(
    idx: Array,
    upd: Array,
    n_rows: int,
    *,
    tile_rows: int,
    chunk: int,
    precision: str,
    payload: str = "f32",
    interpret: bool,
) -> Array:
    F = upd.shape[-1]
    M = int(np.prod(idx.shape))
    TS = tile_rows
    UC = chunk
    assert UC % _LANE == 0
    CB = UC // _LANE
    n_tiles = _cdiv(n_rows, TS)
    E_pad = n_tiles * TS

    # ---- 1. sort (index, update-row) pairs by index -------------------
    # The sort is the dominant cost of this path; "bf16" payload mode
    # rounds updates to bf16 and packs feature pairs (u_j, u_{j+F/2})
    # into single f32 lanes, so the sort moves 1 + F/2 operands instead
    # of 1 + F (and the kernel needs one matmul pass instead of hi+lo).
    packed = payload == "bf16" and F % 2 == 0 and precision != "f32"
    if packed:
        upd = jax.lax.bitcast_convert_type(
            jnp.stack(
                [upd[..., : F // 2].astype(jnp.bfloat16),
                 upd[..., F // 2 :].astype(jnp.bfloat16)],
                axis=-1,
            ),
            jnp.float32,
        )  # [..., F//2] f32 carrying bf16 pairs
    NP = upd.shape[-1]  # payload operand count

    # 2-D idx [G, K] means "group-structured": every index in group g is
    # < every index in group g+1 (hash-grid levels occupy disjoint
    # ascending table segments), so G independent batched row-sorts
    # (much cheaper than one flat M-element sort) followed by
    # concatenation yield a globally sorted stream.
    if idx.ndim == 2:
        ops = (idx,) + tuple(upd[..., j] for j in range(NP))
        sorted_ops = [o.reshape(-1) for o in jax.lax.sort(ops, dimension=1, num_keys=1)]
    else:
        ops = (idx,) + tuple(upd[:, j] for j in range(NP))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
    idx_s = sorted_ops[0]

    # ---- 2. tile segment boundaries ----------------------------------
    edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TS
    starts = jnp.searchsorted(idx_s, edges, side="left").astype(jnp.int32)
    b0 = starts[:-1] // _LANE  # first 128-col block of each tile
    b1 = -(-starts[1:] // _LANE)  # one past last block (ceil)
    blocks = jnp.stack([b0, b1], axis=0)  # [2, n_tiles] int32

    # ---- 3. pack sorted stream as [8, Mp] rows -----------------------
    # Row 0: indices as float32 VALUES (exact for idx < 2^24; a bitcast
    # would make small ints denormal floats, which the load path flushes
    # to zero); rows 1..F: update features; rest zero padding. Fields
    # live in the (padded) sublane dim so chunk DMAs slice only the
    # 128-aligned lane dim.
    assert E_pad < (1 << 24), "float32-exact index packing limit"
    Mp = (_cdiv(M, UC) + 1) * UC
    pad = Mp - M
    idx_f = jnp.concatenate(
        [idx_s, jnp.full((pad,), E_pad, jnp.int32)]
    ).astype(jnp.float32)
    rows = [idx_f] + [
        jnp.concatenate([sorted_ops[1 + j], jnp.zeros((pad,), jnp.float32)])
        for j in range(NP)
    ]
    data = jnp.concatenate(
        [jnp.stack(rows), jnp.zeros((8 - 1 - NP, Mp), jnp.float32)]
    )  # [8, Mp]

    kernel = functools.partial(
        _tile_kernel, TS=TS, UC=UC, CB=CB, F=F, precision=precision,
        packed=packed,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TS, F), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((E_pad, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, UC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(blocks, data)
    return out[:n_rows]


def _tile_kernel(blocks_ref, data_hbm, out_ref, scratch, sems, *, TS, UC, CB, F,
                 precision, packed):
    t = pl.program_id(0)
    b0 = blocks_ref[0, t]
    b1 = blocks_ref[1, t]
    nchunks = pl.cdiv(b1 - b0, CB)

    def chunk_dma(k, slot):
        col0 = (b0 + k * CB) * _LANE
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(col0, UC)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def body(k, acc):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            chunk_dma(k + 1, 1 - slot).start()

        chunk_dma(k, slot).wait()
        rows = scratch[slot]  # [8, UC] f32
        # row 0 carries integer-valued f32 indices (exact below 2^24)
        local = rows[0:1, :].astype(jnp.int32) - t * TS  # [1, UC]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TS, UC), 0)
        onehot = (lanes == local).astype(jnp.bfloat16)  # [TS, UC]
        contract = (((1,), (1,)), ((), ()))
        if packed:
            # unpack bf16 pairs: low half -> u_j, high half -> u_{j+F/2}
            bits = pltpu.bitcast(rows[1 : 1 + F // 2, :], jnp.uint32)
            lo = pltpu.bitcast(bits << 16, jnp.float32)
            hi = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
            u = jnp.concatenate([lo, hi], axis=0)  # [F, UC], bf16-valued
            return acc + jax.lax.dot_general(
                onehot, u.astype(jnp.bfloat16),
                dimension_numbers=contract,
                preferred_element_type=jnp.float32,
            )
        u = rows[1 : 1 + F, :]  # [F, UC]
        if precision == "f32":
            acc = acc + jax.lax.dot_general(
                onehot.astype(jnp.float32), u,
                dimension_numbers=contract,
                preferred_element_type=jnp.float32,
            )
        else:
            hi = u.astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                onehot, hi,
                dimension_numbers=contract,
                preferred_element_type=jnp.float32,
            )
            lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                onehot, lo,
                dimension_numbers=contract,
                preferred_element_type=jnp.float32,
            )
            if precision == "bf16x3":
                rem = u - hi.astype(jnp.float32) - lo.astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    onehot, rem.astype(jnp.bfloat16),
                    dimension_numbers=contract,
                    preferred_element_type=jnp.float32,
                )
        return acc

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((TS, F), jnp.float32)
    )
    out_ref[:] = acc


# ----------------------------------------------------------------------
# Differentiable row gather whose backward uses the sorted scatter.
# ----------------------------------------------------------------------
@jax.custom_vjp
def gather_rows(table: Array, idx: Array) -> Array:
    """table[idx] with a TPU-native scatter-add backward.

    table: [E, F]; idx: int32 [...]; returns [..., F]. Forward is XLA's
    gather; backward routes the [..., F] cotangent through
    scatter_add_rows instead of XLA's serial scatter emitter.
    """
    return table[idx]


def _gather_fwd(table, idx):
    return table[idx], (idx, table.shape)


# Below this many update rows the XLA scatter is cheap enough that the
# sort + kernel launch doesn't pay (dir/tx encodings see only R or batch
# points per step; the pos encodings see rays x samples x levels x 8).
_SORTED_MIN_ROWS = 1 << 18


def _gather_bwd(res, g):
    idx, (E, F) = res
    flat = idx.reshape(-1)
    impl = "xla" if flat.shape[0] < _SORTED_MIN_ROWS else None
    d = scatter_add_rows(
        flat, g.reshape(-1, F).astype(jnp.float32), E, impl=impl
    ).astype(g.dtype)
    return d, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def gather_rows_leveled(table: Array, idx: Array) -> Array:
    """table[idx] for hash-grid corner indices idx [..., L, 8].

    Same contract as gather_rows, but the backward exploits that level
    l's indices live in a disjoint ascending table segment: the update
    stream is regrouped as [L, N*8] and sorted with L independent
    batched row-sorts instead of one flat (N*L*8)-element sort —
    substantially cheaper (sort cost is the dominant term of the
    sorted-scatter path).

    NOTE on the forward: an ISOLATED gather runs ~25% faster on a flat
    index vector than on shaped [..., L, 8] indices, but explicitly
    flattening here breaks XLA's producer/consumer fusion in the full
    render graph and loses ~16% end-to-end (measured both ways) — so the
    shaped gather stays.
    """
    return table[idx]


def _gather_lvl_fwd(table, idx):
    return table[idx], (idx, table.shape, int(table.dtype == jnp.bfloat16))


def _gather_lvl_bwd(res, g):
    idx, (E, F), is_bf16 = res
    L, C = idx.shape[-2], idx.shape[-1]
    n = int(np.prod(idx.shape)) // (L * C)
    if n * C < _SORTED_MIN_ROWS // L:
        d = scatter_add_rows(
            idx.reshape(-1), g.reshape(-1, F).astype(jnp.float32), E, impl="xla"
        ).astype(g.dtype)
    else:
        # [..., L, C] → [L, N·C]: group rows by level
        idx2 = jnp.moveaxis(idx.reshape(n, L, C), 1, 0).reshape(L, n * C)
        g2 = jnp.moveaxis(
            g.reshape(n, L, C, F).astype(jnp.float32), 1, 0
        ).reshape(L, n * C, F)
        # bf16 forward (production compute dtype) → the cotangent is
        # already bf16-grade; sorting it as packed bf16 pairs halves the
        # dominant sort traffic. fp32 forward keeps exact f32 payload.
        payload = "bf16" if is_bf16 else None
        d = scatter_add_rows(idx2, g2, E, payload=payload).astype(g.dtype)
    return d, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_leveled.defvjp(_gather_lvl_fwd, _gather_lvl_bwd)
