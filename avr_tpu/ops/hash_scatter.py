"""TPU scatter-add for hash-grid table gradients (Pallas).

The backward pass of a multiresolution hash encoding is a scatter-add of
``M = points x levels x 8`` weighted gradient rows into the feature table
— the reference does this inside tinycudann's CUDA kernels with atomics
(reference/model.py:66-68); XLA's TPU scatter emitter processes colliding
rows serially and dominates the whole training step (~85% measured on the
RAF-Furnished workload).

TPU-native design (no atomics on TPU):

  1. sort the ``M`` (index, update-row) pairs by flat table index
     (``jax.lax.sort``, per-level batched multi-operand row-sorts);
  2. bucket the sorted stream into table *tiles* of ``TS`` rows; block
     bounds come from a binary search over a 128-strided SAMPLE of the
     stream and the chunk→tile schedule from a scatter+cumsum
     (``_tile_ranges`` — exact bounds are unnecessary because of the
     exact one-hot, see below);
  3. a Pallas kernel, gridded over table tiles, DMAs each tile's
     contiguous slice of sorted updates from HBM (a cross-tile
     pipelined ring of chunk DMAs) and accumulates on the MXU with a
     FACTORED exact one-hot: the tile-local index splits as a·B+b, two
     small one-hots ([TS/B, UC] and [B, UC]) replace the dense
     [TS, UC] compare, the b-one-hot is folded into the payload
     (V = oh_b·upd, exact 0/1 masking in bf16), and
     ``acc[TS/B, B·F] += oh_a @ V^T``. Splitting each fp32 update into
     bf16 hi+lo passes reconstructs fp32-accurate sums with pure bf16
     MXU throughput. (``AVR_TPU_SCATTER_ONEHOT=dense`` restores the
     single dense one-hot — ~2× slower kernel, measured.)

Because chunk DMA offsets are 128-lane aligned, tile segments are widened
to block boundaries; rows spilling in from neighbouring tiles fall outside
the tile's local index range, so their one-hot column is all-zero and they
contribute nothing — no masking pass is needed. Updates are exact-summed;
only the summation ORDER differs from XLA's scatter, so results match to
fp32 accumulation tolerance. Precision modes, MEASURED on v5e hardware
(scripts/test_scatter_kernel.py): bf16x2 (hi+lo split) ~4e-6 relative,
bf16x3 ~1.5e-7, and "f32" ~2.5e-3 — a Pallas f32·f32 dot lowers to a
SINGLE bf16-rounded MXU pass on v5e, so "f32" is NOT exact there; use
bf16x3 when near-fp32 sums are needed.
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
_NSLOT = 4  # chunk DMA slots (ring buffer over global chunk ids)
_LOOK = 2  # chunk DMA lookahead; must be < _NSLOT


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def on_tpu() -> bool:
    """True when the default backend executes on TPU hardware.

    The axon remote tunnel registers an experimental 'axon' platform that
    proxies a real TPU chip; treat it as TPU. AVR_TPU_FORCE_TPU=1
    overrides for deviceless AOT lowering against a TPU topology
    (scripts/aot_multichip.py traces on a CPU process but compiles for
    v5e — the Pallas path must be selected at trace time there).
    """
    if os.environ.get("AVR_TPU_FORCE_TPU") == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


# ----------------------------------------------------------------------
# SPMD context: Mosaic kernels cannot be auto-partitioned by GSPMD
# ("Please wrap the call in a shard_map" — surfaced the first time the
# Pallas-bearing step was AOT-compiled for a real v5e:2x4 topology,
# scripts/aot_multichip.py; the CPU-mesh tests use the XLA fallback and
# a 1-device chip mesh needs no partitioning, so nothing caught it
# earlier). make_train_step installs its mesh here while tracing; the
# sorted-scatter then runs as a shard_map over the row stream — each
# device sorts+scatters its local block into a full-size table gradient
# and the blocks are psum-combined (the replicated-table analog of the
# gradient all-reduce, riding ICI).
# ----------------------------------------------------------------------
import contextlib

_SPMD_MESH = None


@contextlib.contextmanager
def spmd_mesh(mesh):
    """Install the SPMD mesh for ops traced within (None = single-device)."""
    global _SPMD_MESH
    prev, _SPMD_MESH = _SPMD_MESH, mesh
    try:
        yield
    finally:
        _SPMD_MESH = prev


def _spmd_ndev(mesh) -> int:
    if mesh is None:
        return 1
    return int(np.prod(list(mesh.shape.values())))


def scatter_add_rows(
    idx: Array,
    upd: Array,
    n_rows: int,
    *,
    impl: Optional[str] = None,
    # TS/B/UC swept on the flagship with the factored one-hot
    # (2026-08-18): 1024/16/1024 = 81.6 ms < 512/16 82.8 < 2048/32 82.5
    # < 1024/32 84.4 < uc2048 85.5 < 512/32 86.0. Larger tiles got
    # relatively cheaper once the one-hot build stopped scaling with TS.
    tile_rows: int = 1024,
    chunk: int = 1024,
    precision: str = "bf16x2",
    payload: Optional[str] = None,
    interpret: bool = False,
    seg_bounds: Optional[Tuple[Tuple[int, int], ...]] = None,
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
    if impl != "xla":
        if payload is None:
            payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD", "f32")
        tile_rows = int(os.environ.get("AVR_TPU_SCATTER_TS", tile_rows))
        chunk = int(os.environ.get("AVR_TPU_SCATTER_UC", chunk))

    mesh = _SPMD_MESH
    ndev = _spmd_ndev(mesh)
    if ndev > 1 and os.environ.get("AVR_TPU_SPMD_SCATTER", "shard") == "shard":
        # Multi-device SPMD: GSPMD cannot partition the Mosaic kernel —
        # explicitly shard the row stream over ALL mesh axes, scatter
        # locally, psum the table gradient (the replicated-table analog
        # of NCCL-DDP's gradient all-reduce). Scatter-add is permutation-
        # invariant, so any block partition of the rows is correct; the
        # partitioner reshards the (already data/ray-sharded) cotangent
        # stream into contiguous blocks as needed. The SAME wrap runs
        # with the local XLA scatter body on CPU meshes (tests,
        # scaling_sim, dryrun_multichip), so the collective structure is
        # executed numerically everywhere, not just AOT-compiled.
        from jax.sharding import PartitionSpec

        idx2 = idx if idx.ndim == 2 else idx.reshape(1, -1)
        upd2 = (
            upd if upd.ndim == 3 else upd.reshape(1, -1, upd.shape[-1])
        )
        M = idx2.shape[-1]
        if M % ndev:
            # pad the stream to a device multiple with DUPLICATED valid
            # indices and ZERO update rows — exact (scatter-adds of zero
            # are no-ops) and, unlike an out-of-range pad, it preserves
            # the 2-D form's per-group ascending-segment structure that
            # the sorted kernel's batched sorts rely on. (Silently
            # falling back to the row-serial HLO scatter here was an
            # unannounced perf cliff on meshes whose device count does
            # not divide the stream — advisor r4.)
            pad = (-M) % ndev
            idx2 = jnp.concatenate(
                [idx2, jnp.broadcast_to(idx2[:, :1], (idx2.shape[0], pad))],
                axis=-1,
            )
            upd2 = jnp.concatenate(
                [upd2, jnp.zeros(upd2.shape[:1] + (pad,) + upd2.shape[2:],
                                 upd2.dtype)],
                axis=1,
            )
        axes = tuple(mesh.axis_names)

        def body(i_l, u_l):
            local = _local_scatter(
                i_l, u_l, n_rows, impl=impl,
                tile_rows=tile_rows, chunk=chunk, precision=precision,
                payload=payload, interpret=interpret, seg_bounds=seg_bounds,
            )
            return jax.lax.psum(local, axes)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(
                PartitionSpec(None, axes),
                PartitionSpec(None, axes, None),
            ),
            out_specs=PartitionSpec(),
            # pallas_call's output avals carry no varying-mesh-axes
            # annotation; the body's collective structure is trivially
            # correct (local scatter + explicit psum over all axes)
            check_vma=False,
        )(idx2, upd2)

    return _local_scatter(
        idx, upd, n_rows, impl=impl,
        tile_rows=tile_rows, chunk=chunk, precision=precision,
        payload=payload, interpret=interpret, seg_bounds=seg_bounds,
    )


def _local_scatter(
    idx: Array,
    upd: Array,
    n_rows: int,
    *,
    impl: str,
    tile_rows: int,
    chunk: int,
    precision: str,
    payload: Optional[str],
    interpret: bool,
    seg_bounds=None,
) -> Array:
    """Single-device scatter-add body (also the shard_map local body)."""
    if impl == "xla":
        if os.environ.get("AVR_TPU_SMALL_SCATTER", "unique") == "unique" and on_tpu():
            return _xla_scatter_unique(
                idx.reshape(-1), upd.reshape(-1, upd.shape[-1]), n_rows
            )
        return (
            jnp.zeros((n_rows, upd.shape[-1]), upd.dtype)
            .at[idx.reshape(-1)]
            .add(upd.reshape(-1, upd.shape[-1]))
        )
    return _sorted_scatter(
        idx, upd, n_rows,
        tile_rows=tile_rows, chunk=chunk, precision=precision,
        payload=payload, interpret=interpret, seg_bounds=seg_bounds,
    )


def scatter_add_rows_multi(
    streams,
    n_rows: int,
    *,
    impl: Optional[str] = None,
    tile_rows: int = 1024,
    chunk: int = 1024,
    precision: str = "bf16x2",
    payload: Optional[str] = None,
) -> Array:
    """scatter_add_rows over MULTIPLE streams into ONE table gradient.

    streams: list of (idx, upd) with idx [G_s, K_s] group-structured (or
    [M_s]) and upd matching with trailing feature dim. Streams must
    cover disjoint ascending table segments in list order (split-group
    encodes). One sorted-scatter kernel launch and one [n_rows, F]
    output for all streams — the per-group full-size gradient ADDs
    disappear.
    """
    if impl is None:
        impl = os.environ.get("AVR_TPU_SCATTER") or ("sorted" if on_tpu() else "xla")
    mesh = _SPMD_MESH
    ndev = _spmd_ndev(mesh)
    if impl == "xla" or ndev > 1:
        # CPU/parity path: one flat XLA scatter over the concatenated
        # stream (streams are disjoint, so sums equal the per-group
        # scatter+add bit-exactly). Multi-device meshes also take this
        # route: each stream rides the existing shard_map machinery and
        # the per-stream results sum (the concat trick would need equal
        # per-device blocks across differently-sized streams).
        if ndev > 1:
            out = None
            for s_idx, s_upd in streams:
                d = scatter_add_rows(s_idx, s_upd, n_rows, impl=impl, payload=payload)
                out = d if out is None else out + d
            return out
        F = streams[0][1].shape[-1]
        flat_idx = jnp.concatenate([i.reshape(-1) for i, _ in streams])
        flat_upd = jnp.concatenate([u.reshape(-1, F) for _, u in streams])
        return _local_scatter(
            flat_idx, flat_upd, n_rows, impl="xla",
            tile_rows=tile_rows, chunk=chunk, precision=precision,
            payload=payload, interpret=False,
        )
    if payload is None:
        payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD", "f32")
    tile_rows = int(os.environ.get("AVR_TPU_SCATTER_TS", tile_rows))
    chunk = int(os.environ.get("AVR_TPU_SCATTER_UC", chunk))
    return _sorted_scatter_streams(
        streams, n_rows,
        tile_rows=tile_rows, chunk=chunk, precision=precision,
        payload=payload, interpret=False,
    )


def _xla_scatter_unique(idx: Array, upd: Array, n_rows: int) -> Array:
    """Collision-free scatter-add for small update streams.

    XLA's TPU scatter emitter is row-serial when updates may collide
    (measured ~46 ns/row on the 52k-row view-direction gradient —
    2.4 ms/step). Here collisions are eliminated BEFORE the scatter:
    sort by index, sum each equal-index run with a cumsum difference
    (no scatter needed), then scatter only run heads — every index
    unique (non-heads get distinct out-of-range indices and drop), so
    XLA may use its vectorized no-collision path.

    Run sums via fp32 cumsum difference are exact to ~len·eps
    cancellation — gradient-grade (these streams are bf16-born
    cotangents); the dense XLA path remains available via
    AVR_TPU_SMALL_SCATTER=xla and is the CPU/parity default.
    """
    M, F = upd.shape
    ops = jax.lax.sort(
        (idx,) + tuple(upd[:, j] for j in range(F)), num_keys=1, is_stable=False
    )
    idx_s = ops[0]
    upd_s = jnp.stack(ops[1:], axis=-1)
    cs = jnp.cumsum(upd_s, axis=0)  # [M, F]
    iota = jnp.arange(M, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]]
    )  # first row of each equal-index run
    # position of the first head at-or-after i; run of head i ends at
    # next_head(i+1) − 1
    headpos = jnp.where(head, iota, M)
    first_at_or_after = jax.lax.associative_scan(
        jnp.minimum, headpos, reverse=True
    )
    run_end = jnp.concatenate(
        [first_at_or_after[1:], jnp.full((1,), M, jnp.int32)]
    ) - 1  # [M], valid at run heads
    run_sum = cs[run_end] - cs + upd_s  # valid at run heads
    dst = jnp.where(head, idx_s, n_rows + iota)  # unique (OOB rows drop)
    return (
        jnp.zeros((n_rows, F), upd.dtype)
        .at[dst]
        .add(run_sum, unique_indices=True, mode="drop")
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
    seg_bounds=None,
) -> Array:
    return _sorted_scatter_streams(
        [(idx, upd)], n_rows,
        tile_rows=tile_rows, chunk=chunk, precision=precision,
        payload=payload, interpret=interpret, seg_bounds=seg_bounds,
    )


def _pack_and_sort_stream(idx, upd, payload, precision, subruns=1):
    """Sort ONE (idx, upd) stream by index → (idx_s [M], payload cols).

    2-D idx [G, K] means "group-structured": every index in group g is
    < every index in group g+1 (hash-grid levels occupy disjoint
    ascending table segments), so G independent batched row-sorts
    (much cheaper than one flat M-element sort) followed by
    concatenation yield a globally sorted stream.
    is_stable=False: a stable sort makes XLA sort an extra iota operand
    (~25% more sort traffic); summation order among equal indices is
    irrelevant to a scatter-ADD beyond fp32 rounding, which the kernel's
    accumulation already owns.

    "bf16" payload mode rounds updates to bf16 and packs feature pairs
    (u_j, u_{j+F/2}) into single f32 lanes, so the sort moves 1 + F/2
    operands instead of 1 + F (and the kernel needs one matmul pass
    instead of hi+lo). "prepacked2": the caller already packed an F=2
    bf16 pair per f32 word (gather_rows_packed2's cotangent).
    """
    F = upd.shape[-1]
    if payload == "prepacked2":
        assert upd.shape[-1] == 1 and precision != "f32"
        F = 2
        packed = True
    else:
        packed = payload == "bf16" and F % 2 == 0 and precision != "f32"
    if packed and payload != "prepacked2":
        upd = jax.lax.bitcast_convert_type(
            jnp.stack(
                [upd[..., : F // 2].astype(jnp.bfloat16),
                 upd[..., F // 2 :].astype(jnp.bfloat16)],
                axis=-1,
            ),
            jnp.float32,
        )  # [..., F//2] f32 carrying bf16 pairs
    NP = upd.shape[-1]  # payload operand count
    if idx.ndim == 2:
        if subruns > 1:
            # sub-run split: [G, K] → [G·S, K/S] independent row sorts
            # (the measured super-linear row-length scaling is the whole
            # win — see _sorted_scatter_subruns)
            G, K = idx.shape
            idx = idx.reshape(G * subruns, K // subruns)
            upd = upd.reshape(G * subruns, K // subruns, NP)
        ops = (idx,) + tuple(upd[..., j] for j in range(NP))
        sorted_ops = list(
            jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        )
        if subruns > 1:
            return sorted_ops[0], sorted_ops[1:], F, packed  # 2-D [R, Kr]
        sorted_ops = [o.reshape(-1) for o in sorted_ops]
    else:
        ops = (idx,) + tuple(upd[:, j] for j in range(NP))
        sorted_ops = list(jax.lax.sort(ops, num_keys=1, is_stable=False))
    return sorted_ops[0], sorted_ops[1:], F, packed


def _sorted_scatter_streams(
    streams,
    n_rows: int,
    *,
    tile_rows: int,
    chunk: int,
    precision: str,
    payload: str = "f32",
    interpret: bool,
    seg_bounds=None,
) -> Array:
    """Sorted scatter over one or more (idx, upd) streams.

    Multiple streams must target DISJOINT, ASCENDING table segments in
    list order (e.g. the per-group level ranges of a split hash-grid
    encode): each stream is sorted independently and the sorted parts
    concatenate into one globally sorted stream, so all groups share ONE
    kernel launch and ONE [E_pad, F] gradient — no per-group full-size
    gradients to add afterwards (the r4 split materialized and ADDed
    two, 4.0 ms of add_any in the round-5 flagship trace).
    """
    TS = tile_rows
    UC = chunk
    assert UC % _LANE == 0
    CB = UC // _LANE
    n_tiles = _cdiv(n_rows, TS)
    E_pad = n_tiles * TS

    # ---- 0. sub-run split (AVR_TPU_SORT_SUBRUNS) ---------------------
    # XLA's batched row sort is strongly SUPER-linear in row length
    # (measured on chip, scripts/sort_probe.py: [L,K]→[8L,K/8] is
    # 0.29-0.34x the cost at constant elements). When the caller supplied
    # static per-level table bounds, split each level's sort into S
    # sub-runs and cover the S sorted runs per tile in the chunk
    # schedule (_subrun_ranges) — the kernel's exact one-hot only needs
    # COVERAGE, not a globally sorted stream.
    S = _subrun_factor(streams, seg_bounds, TS)
    if S > 1:
        s_idx, s_upd = streams[0]
        return _sorted_scatter_subruns(
            s_idx, s_upd, seg_bounds, n_rows, S,
            tile_rows=TS, chunk=UC, precision=precision,
            payload=payload, interpret=interpret,
        )

    # ---- 1. sort each stream's (index, update-row) pairs by index -----
    # The sort is the dominant cost of this path (see _pack_and_sort_
    # stream for the payload packing + batched per-level sort notes).
    F, packed = None, None
    idx_parts, pay_parts = [], []
    for s_idx, s_upd in streams:
        i_s, p_s, F_s, pk_s = _pack_and_sort_stream(s_idx, s_upd, payload, precision)
        assert F is None or (F == F_s and packed == pk_s), (
            "multi-stream scatter requires identical feature width and "
            "payload mode across streams"
        )
        F, packed = F_s, pk_s
        idx_parts.append(i_s)
        pay_parts.append(p_s)
    NP = len(pay_parts[0])
    if len(idx_parts) == 1:
        idx_s, sorted_ops = idx_parts[0], [None] + pay_parts[0]
    else:
        idx_s = jnp.concatenate(idx_parts)
        sorted_ops = [None] + [
            jnp.concatenate([p[j] for p in pay_parts]) for j in range(NP)
        ]
    M = int(idx_s.shape[0])

    Mp = (_cdiv(M, UC) + 1) * UC  # padded stream length (see step 3)
    blocks, cbase, colblk, gtot = _tile_ranges(idx_s, M, Mp, n_tiles, TS, UC)

    # ---- 3. pack sorted stream as [8, Mp] rows -----------------------
    # Rows 0-1: the index split as (idx >> 12, idx & 4095), each carried
    # as exact small float32 VALUES — a bitcast would make small ints
    # denormal floats, which the load path flushes to zero, and a single
    # f32 value row caps tables at 2^24 rows (the reference's MeshRIR
    # config needs 20 levels × 2^20 = 21M). The split supports 2^36 rows
    # and costs nothing: the [8, Mp] block is DMA'd whole either way and
    # rows 2+NP.. were zero padding. Rows 2..1+NP: update features.
    assert E_pad < (1 << 36), "hi/lo float32-exact index packing limit"
    assert NP <= 6, "payload rows exceed the 8-row DMA block"
    Mp = (_cdiv(M, UC) + 1) * UC
    pad = Mp - M
    idx_p = jnp.concatenate([idx_s, jnp.full((pad,), E_pad, jnp.int32)])
    idx_hi = (idx_p >> 12).astype(jnp.float32)
    idx_lo = (idx_p & 4095).astype(jnp.float32)
    rows = [idx_hi, idx_lo] + [
        jnp.concatenate([sorted_ops[1 + j], jnp.zeros((pad,), jnp.float32)])
        for j in range(NP)
    ]
    data = jnp.concatenate(
        [jnp.stack(rows), jnp.zeros((8 - 2 - NP, Mp), jnp.float32)]
    )  # [8, Mp]
    return _launch_tile_kernel(
        blocks, cbase, colblk, gtot, data,
        n_rows=n_rows, E_pad=E_pad, n_tiles=n_tiles, TS=TS, UC=UC, CB=CB,
        F=F, precision=precision, packed=packed, interpret=interpret,
    )


def _launch_tile_kernel(blocks, cbase, colblk, gtot, data, *, n_rows, E_pad,
                        n_tiles, TS, UC, CB, F, precision, packed, interpret):
    """Launch _tile_kernel over a prepared chunk schedule + data block."""
    # Output layout modes (AVR_TPU_SCATTER_TOUT), all measured on the
    # flagship bench under the klm encode layout (2026-08-18):
    #   "0" — row-major [E_pad, F]; any consumer relayout lands on XLA.
    #         84.3 ms/step — the DEFAULT and the best measured.
    #   "1" — feature-major [SL, E_pad] + caller transpose: −6.5 ms/step
    #         NET LOSS (only pays for untiled feature-major consumers —
    #         the sublane-padded slice copies anyway).
    #   "2" — blocked [E_pad/128, F, 128] intended to bitcast into a
    #         {0,1:T(4,128)}-tiled consumer: numerically exact but
    #         90.3 ms/step — the in-kernel [F,TS]→[TS/128,F,128] sublane
    #         shuffle costs more than the relayout copy it saves.
    tout = os.environ.get("AVR_TPU_SCATTER_TOUT", "0")
    if tout == "2" and (TS % _LANE or E_pad % _LANE):
        tout = "0"
    SL = -(-F // 8) * 8

    # One-hot construction mode (AVR_TPU_SCATTER_ONEHOT): "dense" builds
    # the full [TS, UC] one-hot by iota compare (TS·UC VPU ops per chunk
    # — the kernel's dominant cost at TS=512); "factored" splits the
    # tile-local index as a·16+b and builds two small one-hots
    # ([TS/16, UC] and [16, UC]), folding the b-one-hot into the payload:
    # acc[a, b·F+f] += Σ_u oh_a[a,u]·(oh_b[b,u]·upd[f,u]) — ~9× fewer
    # VPU ops, same exact 0/1 masking, one extra [A,B,F]→[TS,F] shuffle
    # per tile. Only wired for the row-major output path.
    FB = int(os.environ.get("AVR_TPU_SCATTER_B", "16"))  # factor split
    factored = (
        os.environ.get("AVR_TPU_SCATTER_ONEHOT", "factored") == "factored"
        and tout == "0"
        and TS % FB == 0
        and precision != "f32"  # single-pass f32 dot keeps the dense path
    )
    kernel = functools.partial(
        _tile_kernel, TS=TS, UC=UC, CB=CB, F=F, precision=precision,
        packed=packed, SL=(SL if tout == "1" else 0), blocked=(tout == "2"),
        factored=factored, B=FB,
    )
    if factored:
        # acc lives as [TS/B, B·F] (row a·B+b at [a, b·F:(b+1)·F]);
        # emitting that geometry directly keeps the kernel free of
        # lane→sublane reshapes (Mosaic rejects them); the caller-side
        # [E_pad/B, B·F] → [E_pad, F] merge is contiguous, i.e. free.
        out_specs = pl.BlockSpec(
            (TS // FB, FB * F), lambda t: (t, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((E_pad // FB, FB * F), jnp.float32)
    elif tout == "1":
        out_specs = pl.BlockSpec((SL, TS), lambda t: (0, t), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((SL, E_pad), jnp.float32)
    elif tout == "2":
        out_specs = pl.BlockSpec(
            (TS // _LANE, F, _LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((E_pad // _LANE, F, _LANE), jnp.float32)
    else:
        out_specs = pl.BlockSpec((TS, F), lambda t: (t, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((E_pad, F), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # blocks [2, n_tiles]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cbase [n_tiles + 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # colblk [g_max]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gtot [1]
            pl.BlockSpec(memory_space=pltpu.ANY),  # data [8, Mp]
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_NSLOT, 8, UC), jnp.float32),
            pltpu.SemaphoreType.DMA((_NSLOT,)),
        ],
        interpret=interpret,
    )(blocks, cbase, colblk, gtot, data)
    if factored:
        return out.reshape(E_pad, F)[:n_rows]
    if tout == "1":
        return out[:F, :n_rows].T
    if tout == "2":
        # [E_pad/128, F, 128] → [E_pad, F]: bits already match the
        # consumer's {0,1:T(4,128)} layout, so this lowers to a bitcast.
        return out.swapaxes(1, 2).reshape(E_pad, F)[:n_rows]
    return out[:n_rows]


def _tile_ranges(idx_s, M, Mp, n_tiles, TS, UC):
    """Per-tile 128-block ranges + global chunk schedule from the sorted
    index stream.

    Returns (blocks [2, n_tiles], cbase [n_tiles+1], colblk [g_max],
    gtot [1]). The kernel builds an exact one-hot against each tile's
    local index range, so rows OUTSIDE the tile that land inside its
    block range contribute zero columns — block bounds only need to
    COVER each tile's rows, not match them exactly. That slack makes a
    128-strided sample of the stream sufficient for the edge search
    (AVR_TPU_SCATTER_EDGES=exact restores the full binary search over
    all M rows; measured ~1 ms/step slower on the flagship):

      j[t] = #{sampled rows < t·TS}, sample = idx_s[::128]
      ⇒ the true row count c[t] = #{rows < t·TS} lies in
        (128·(j[t]−1), 128·j[t]], so ceil(c/128) = j[t] exactly (upper
        block bound) and floor(c/128) ∈ {j[t]−1, j[t]} (lower bound with
        one block of slack).
    """
    CB = UC // _LANE
    edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TS
    if os.environ.get("AVR_TPU_SCATTER_EDGES", "sampled") == "exact":
        starts = jnp.searchsorted(idx_s, edges, side="left").astype(jnp.int32)
        b0 = starts[:-1] // _LANE  # first 128-col block of each tile
        b1 = -(-starts[1:] // _LANE)  # one past last block (ceil)
    else:
        samp = idx_s[::_LANE]  # [ceil(M/128)] first row of each block
        j = jnp.searchsorted(samp, edges, side="left").astype(jnp.int32)
        b0 = jnp.maximum(j[:-1] - 1, 0)
        b1 = j[1:]
    blocks = jnp.stack([b0, b1], axis=0)  # [2, n_tiles] int32

    # Global chunk schedule: the kernel pipelines chunk DMAs ACROSS tiles
    # (most tiles have 1-2 chunks, so intra-tile double buffering alone
    # leaves every tile stalled on its first chunk). Chunks are numbered
    # globally in processing order; colblk[g] is chunk g's starting
    # 128-column block, precomputed here so any grid step can prefetch
    # any future chunk without scanning tile metadata.
    nch = -(-(b1 - b0) // CB)  # chunks per tile
    cbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch, dtype=jnp.int32)]
    )  # [n_tiles + 1]
    # Static upper bound on total chunks (colblk lives in SMEM — keep it
    # tight): Σ(b1−b0) ≤ M/128 blocks + 1 slack block per tile (sampled
    # bounds), and each tile's ceil rounding adds < 1 chunk.
    g_max = M // UC + 1 + n_tiles + _cdiv(n_tiles, CB)
    # chunk id → owning tile: t_of[g] = max{t : cbase[t] ≤ g}. A
    # searchsorted over cbase costs ~2.9 ms/step in 32 binary-search
    # while-iterations (measured); one small scatter + cumsum is ~10× cheaper:
    # cumsum(1 at cbase[t] for each tile t)[g] = #{t : cbase[t] ≤ g}.
    if os.environ.get("AVR_TPU_SCATTER_TOF", "cumsum") == "search":
        g_ar = jnp.arange(g_max, dtype=jnp.int32)
        t_of = jnp.clip(
            jnp.searchsorted(cbase, g_ar, side="right") - 1, 0, n_tiles - 1
        )
    else:
        marks = (
            jnp.zeros((g_max,), jnp.int32)
            .at[jnp.clip(cbase[:-1], 0, g_max - 1)]
            .add(1, indices_are_sorted=True)
        )
        t_of = jnp.clip(jnp.cumsum(marks) - 1, 0, n_tiles - 1)
        g_ar = jnp.arange(g_max, dtype=jnp.int32)
    colblk = blocks[0][t_of] + (g_ar - cbase[t_of]) * CB
    colblk = jnp.clip(colblk, 0, (Mp - UC) // _LANE)
    gtot = cbase[-1:]  # [1] total chunks
    return blocks, cbase, colblk, gtot


def _subrun_factor(streams, bounds, TS: int) -> int:
    """Sub-run split factor S for the sorted scatter (AVR_TPU_SORT_SUBRUNS).

    "auto": largest S in {16, 8, 4, 2} with 128-aligned runs (the chunk
    schedule samples the stream at 128-row block granularity) and an
    average of >= 4 blocks per (tile, run) segment — below that, the
    per-segment DMA-chunk rounding wastes more kernel bandwidth than the
    cheaper sort saves (each segment pays up to one slack block plus
    chunk-capacity rounding). "0"/"1" disable; an integer forces S.
    """
    if len(streams) != 1 or bounds is None:
        return 1
    idx, _ = streams[0]
    if idx.ndim != 2 or idx.shape[0] != len(bounds):
        return 1
    spec = os.environ.get("AVR_TPU_SORT_SUBRUNS", "auto")
    if spec in ("0", "1", "off"):
        return 1
    G, K = idx.shape
    touched = sum(-(-(hi - lo) // TS) for lo, hi in bounds)
    if spec != "auto":
        s = int(spec)
        return s if s > 1 and K % (s * _LANE) == 0 else 1
    for s in (16, 8, 4, 2):
        if K % (s * _LANE):
            continue
        if G * K >= touched * s * 4 * _LANE:
            return s
    return 1


def _sorted_scatter_subruns(
    idx: Array,
    upd: Array,
    bounds,
    n_rows: int,
    S: int,
    *,
    tile_rows: int,
    chunk: int,
    precision: str,
    payload: str,
    interpret: bool,
) -> Array:
    """Sorted scatter with per-level SUB-RUN sorts.

    idx [G, K] group-structured (level g's indices in the static table
    segment bounds[g]); each level's row sort runs as S independent
    sorts of K/S elements — measured 2.5-4.5x cheaper than one K-element
    row sort at MeshRIR/flagship scale (scripts/sort_probe.py; XLA's
    batched sort cost is strongly super-linear in row length). The
    stream is then S sorted runs per level; _subrun_ranges builds a
    chunk schedule covering every (tile, run) segment, and the
    UNCHANGED tile kernel masks spill rows with its exact one-hot.

    Each sorted run is padded to a DMA-chunk multiple PLUS one spare
    chunk of sentinel rows (idx = E_pad): a segment's last chunk window
    may overrun its block range by up to CB-1 blocks, and the pad
    guarantees the overrun stays INSIDE the same run — the next run
    starts over at small table indices that WOULD alias earlier tiles
    and double-count.
    """
    TS, UC = tile_rows, chunk
    CB = UC // _LANE
    n_tiles = _cdiv(n_rows, TS)
    E_pad = n_tiles * TS
    assert E_pad < (1 << 36), "hi/lo float32-exact index packing limit"

    idx_s2, pays2, F, packed = _pack_and_sort_stream(
        idx, upd, payload, precision, subruns=S
    )  # [R, Kr] each
    R, Kr = idx_s2.shape
    NP = len(pays2)
    assert NP <= 6, "payload rows exceed the 8-row DMA block"
    Kp = (_cdiv(Kr, UC) + 1) * UC
    Mp = R * Kp
    idx_p = jnp.pad(idx_s2, ((0, 0), (0, Kp - Kr)), constant_values=E_pad)
    flat = idx_p.reshape(-1)
    rows = [
        (flat >> 12).astype(jnp.float32),
        (flat & 4095).astype(jnp.float32),
    ] + [
        jnp.pad(p, ((0, 0), (0, Kp - Kr))).reshape(-1) for p in pays2
    ]
    data = jnp.concatenate(
        [jnp.stack(rows), jnp.zeros((8 - 2 - NP, Mp), jnp.float32)]
    )  # [8, Mp]

    blocks, cbase, colblk, gtot = _subrun_ranges(
        idx_p, bounds, S, n_tiles, TS, UC
    )
    return _launch_tile_kernel(
        blocks, cbase, colblk, gtot, data,
        n_rows=n_rows, E_pad=E_pad, n_tiles=n_tiles, TS=TS, UC=UC, CB=CB,
        F=F, precision=precision, packed=packed, interpret=interpret,
    )


def _subrun_ranges(idx_p, bounds, S, n_tiles, TS, UC):
    """Chunk schedule for a stream of G·S per-level sorted sub-runs.

    idx_p: [R, Kp] padded sorted runs (R = G·S, run r covers level r//S
    whose static table range is bounds[r//S]). Returns the same
    (blocks, cbase, colblk, gtot) contract as _tile_ranges; `blocks` is
    synthesized as (0, count·CB) per tile so the kernel's
    cdiv(b1-b0, CB) recovers the per-tile chunk count — the kernel needs
    no changes for multi-segment tiles.

    Only statically-possible (tile, run) pairs become segments (a run
    can only hold rows of its own level's table range), so the
    searchsorted work is S·(touched tiles + levels) queries over
    per-run 128-strided samples, not tiles × runs.
    """
    CB = UC // _LANE
    R, Kp = idx_p.shape
    G = R // S
    Lsp = Kp // _LANE
    samp = idx_p[:, ::_LANE]  # [R, Lsp]

    # ---- static per-level tile edges (numpy, trace-time) -------------
    t0 = np.array([lo // TS for lo, hi in bounds], np.int64)
    t1 = np.array([-(-hi // TS) for lo, hi in bounds], np.int64)  # excl
    ntl = t1 - t0  # candidate tiles per level
    Q = int(ntl.max()) + 1  # edges per level, padded with duplicates
    edges_np = np.zeros((G, Q), np.int64)
    for g in range(G):
        e = (t0[g] + np.arange(ntl[g] + 1)) * TS
        edges_np[g, : ntl[g] + 1] = e
        edges_np[g, ntl[g] + 1:] = e[-1]  # duplicate → masked below
    edges = jnp.asarray(np.repeat(edges_np, S, axis=0), jnp.int32)  # [R, Q]

    # ---- dynamic per-(run, tile) block ranges ------------------------
    j = jax.vmap(
        lambda s, e: jnp.searchsorted(s, e, side="left")
    )(samp, edges).astype(jnp.int32)  # [R, Q]
    b0 = jnp.maximum(j[:, :-1] - 1, 0)  # [R, Q-1], run-local blocks
    b1 = jnp.maximum(j[:, 1:], b0)
    valid = np.arange(Q - 1)[None, :] < np.repeat(ntl, S)[:, None]  # [R, Q-1]
    nch = jnp.where(
        jnp.asarray(valid), (b1 - b0 + CB - 1) // CB, 0
    )  # [R, Q-1]

    # ---- static tile-major segment ordering --------------------------
    tiles_rq = (
        np.repeat(t0, S)[:, None] + np.arange(Q - 1)[None, :]
    )  # [R, Q-1]
    tiles_rq = np.where(valid, tiles_rq, n_tiles)  # invalid → tail bucket
    order = np.argsort(tiles_rq.reshape(-1), kind="stable")
    tile_sorted = tiles_rq.reshape(-1)[order]  # static
    run_of = np.repeat(np.arange(R), Q - 1)[order]  # static
    nch_s = nch.reshape(-1)[order]
    blk0_s = jnp.asarray(run_of * Lsp, jnp.int32) + b0.reshape(-1)[order]
    n_segs = int(nch_s.shape[0])

    counts = (
        jnp.zeros((n_tiles + 1,), jnp.int32)
        .at[jnp.asarray(tile_sorted, jnp.int32)]
        .add(nch_s, indices_are_sorted=True)
    )[:n_tiles]
    cbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # [n_tiles + 1]

    # ---- chunk → segment mapping (marks/cumsum, as in _tile_ranges) --
    segbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nch_s, dtype=jnp.int32)]
    )
    # static bound: every block is in ≤1 chunk (+ per-seg ceil rounding)
    g_max = R * Kp // UC + n_segs + 8
    marks = (
        jnp.zeros((g_max,), jnp.int32)
        .at[jnp.clip(segbase[:-1], 0, g_max - 1)]
        .add(1, indices_are_sorted=True)
    )
    s_of = jnp.clip(jnp.cumsum(marks) - 1, 0, n_segs - 1)
    g_ar = jnp.arange(g_max, dtype=jnp.int32)
    colblk = blk0_s[s_of] + (g_ar - segbase[s_of]) * CB
    colblk = jnp.clip(colblk, 0, (R * Kp - UC) // _LANE)
    gtot = cbase[-1:]  # VALID chunks only (invalid-seg tail excluded)
    blocks = jnp.stack([jnp.zeros_like(counts), counts * CB])  # [2, n_tiles]
    return blocks, cbase, colblk, gtot


def _tile_kernel(blocks_ref, cbase_ref, colblk_ref, gtot_ref, data_hbm,
                 out_ref, scratch, sems, *, TS, UC, CB, F, precision, packed,
                 SL=0, blocked=False, factored=False, B=16):
    """One table tile; chunk DMAs are pipelined ACROSS tiles.

    Chunks are numbered globally in processing order (cbase/colblk from
    the host). Every body iteration g prefetches chunk g+_LOOK, so a
    tile's first chunk is already in flight when its grid step begins —
    without this, tiles with 1-2 chunks (the common case) stall on DMA
    latency every step. Slot safety: starts are issued in increasing g
    (bootstrap 0.._LOOK-1 at t=0, then g+_LOOK at iteration g); at most
    _LOOK+1 chunks are live, and _NSLOT > _LOOK keeps ids distinct
    mod _NSLOT.
    """
    t = pl.program_id(0)
    b0 = blocks_ref[0, t]
    b1 = blocks_ref[1, t]
    g0 = cbase_ref[t]
    nchunks = pl.cdiv(b1 - b0, CB)
    G = gtot_ref[0]

    def chunk_dma(g):
        slot = jax.lax.rem(g, _NSLOT)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(colblk_ref[g] * _LANE, UC)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        for d in range(_LOOK):
            @pl.when(d < G)
            def _():
                chunk_dma(d).start()

    # SL > 0 or blocked → transposed accumulate: acc is [SL|F, TS]
    # feature-major so the kernel output lands in (or one sublane shuffle
    # from) the consumer's layout. Otherwise the original [TS, F] layout.
    transposed = bool(SL) or blocked
    contract = (((1,), (1,)), ((), ()))

    def _acc(acc, a, b):
        """acc += a·bᵀ along UC, in whichever orientation acc uses."""
        lhs, rhs = (a, b) if transposed else (b, a)
        return acc + jax.lax.dot_general(
            lhs, rhs, dimension_numbers=contract,
            preferred_element_type=jnp.float32,
        )

    def _pad_sl(u):
        if SL and SL != u.shape[0]:
            return jnp.concatenate(
                [u, jnp.zeros((SL - u.shape[0], UC), u.dtype)], axis=0
            )
        return u

    A = TS // B  # factored split: local = a·B + b

    def _local_idx(rows):
        """Tile-local indices from the hi/lo f32 value rows: [1, UC]."""
        idx = (
            rows[0:1, :].astype(jnp.int32) * 4096 + rows[1:2, :].astype(jnp.int32)
        )
        return idx - t * TS

    def _unpack_payload(rows):
        """Payload rows of one chunk as bf16-valued [F, UC] (packed mode)."""
        bits = pltpu.bitcast(rows[2 : 2 + F // 2, :], jnp.uint32)
        lo = pltpu.bitcast(bits << 16, jnp.float32)
        hi = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
        return jnp.concatenate([lo, hi], axis=0)  # [F, UC], bf16-valued

    def body_factored(k, acc):
        # acc [A, B·F] fp32; acc[a, b·F+f] = Σ rows with local == a·B+b.
        # Exactness: oh_a/oh_b are exact 0/1 bf16 and V = oh_b·u masks
        # exactly, so each row contributes u·1 to exactly one (a, b) —
        # identical sums to the dense one-hot, ~9× fewer VPU ops.
        # Out-of-tile rows (spill-in from the ±1-block slack of the
        # sampled edge search): lax.div truncates toward zero, so
        #   local ≤ −B   ⇒ a ≤ −1 (no oh_a match);
        #   −B < local < 0 ⇒ a = 0 BUT b = local < 0 (no oh_b match);
        #   local ≥ TS   ⇒ a ≥ A (no oh_a match);
        # in every case the (a,b) product vanishes — at least one factor
        # must miss, and the negative-b case is what covers a = 0.
        g = g0 + k

        @pl.when(g + _LOOK < G)
        def _():
            chunk_dma(g + _LOOK).start()

        chunk_dma(g).wait()
        rows = scratch[jax.lax.rem(g, _NSLOT)]  # [8, UC] f32
        local = _local_idx(rows)  # [1, UC]
        a = jax.lax.div(local, B)  # truncating division (see below)
        b = local - a * B
        ia = jax.lax.broadcasted_iota(jnp.int32, (A, UC), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (B, UC), 0)
        oh_a = (ia == a).astype(jnp.bfloat16)  # [A, UC]
        oh_b = (ib == b).astype(jnp.bfloat16)  # [B, UC]

        def pass_(acc, u):  # u [F, UC] bf16
            v = (oh_b[:, None, :] * u[None, :, :]).reshape(B * F, UC)
            return acc + jax.lax.dot_general(
                oh_a, v, dimension_numbers=contract,
                preferred_element_type=jnp.float32,
            )

        if packed:
            return pass_(acc, _unpack_payload(rows).astype(jnp.bfloat16))
        u = rows[2 : 2 + F, :]
        hi = u.astype(jnp.bfloat16)
        acc = pass_(acc, hi)
        lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = pass_(acc, lo)
        if precision == "bf16x3":
            rem = u - hi.astype(jnp.float32) - lo.astype(jnp.float32)
            acc = pass_(acc, rem.astype(jnp.bfloat16))
        return acc

    def body(k, acc):
        g = g0 + k

        @pl.when(g + _LOOK < G)
        def _():
            chunk_dma(g + _LOOK).start()

        chunk_dma(g).wait()
        rows = scratch[jax.lax.rem(g, _NSLOT)]  # [8, UC] f32
        local = _local_idx(rows)  # [1, UC]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TS, UC), 0)
        onehot = (lanes == local).astype(jnp.bfloat16)  # [TS, UC]
        if packed:
            # unpack bf16 pairs: low half -> u_j, high half -> u_{j+F/2}
            return _acc(acc, _unpack_payload(rows).astype(jnp.bfloat16), onehot)
        u = rows[2 : 2 + F, :]  # [F, UC]
        if precision == "f32":
            acc = _acc(acc, _pad_sl(u), onehot.astype(jnp.float32))
        else:
            hi = u.astype(jnp.bfloat16)
            acc = _acc(acc, _pad_sl(hi), onehot)
            lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = _acc(acc, _pad_sl(lo), onehot)
            if precision == "bf16x3":
                rem = u - hi.astype(jnp.float32) - lo.astype(jnp.float32)
                acc = _acc(acc, _pad_sl(rem.astype(jnp.bfloat16)), onehot)
        return acc

    if factored:
        out_ref[:] = jax.lax.fori_loop(
            0, nchunks, body_factored, jnp.zeros((A, B * F), jnp.float32)
        )
        return
    if SL:
        init = jnp.zeros((SL, TS), jnp.float32)
    elif blocked:
        init = jnp.zeros((F, TS), jnp.float32)
    else:
        init = jnp.zeros((TS, F), jnp.float32)
    acc = jax.lax.fori_loop(0, nchunks, body, init)
    if blocked:
        # [F, TS] → [TS/128, F, 128]: lane dim intact, sublane-dims swap
        out_ref[:] = acc.reshape(F, TS // 128, 128).swapaxes(0, 1)
    else:
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
# AVR_TPU_SORTED_MIN_ROWS overrides for A/B (the sorted kernel's cost
# scales with TABLE tiles, not stream rows, so the crossover depends on
# the table size: measured on MeshRIR's 21M-row dir table, the 256k-row
# dir stream is FASTER on the XLA unique-scatter path).
def _sorted_min_rows() -> int:
    return int(os.environ.get("AVR_TPU_SORTED_MIN_ROWS", _SORTED_MIN_ROWS))


_SORTED_MIN_ROWS = 1 << 18


def _gather_bwd(res, g):
    idx, (E, F) = res
    flat = idx.reshape(-1)
    impl = "xla" if flat.shape[0] < _sorted_min_rows() else None
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
    render graph and loses ~16% end-to-end (measured both ways with
    trilinear) — so the shaped gather is the default;
    AVR_TPU_FLAT_GATHER=1 flips it for A/B runs.
    """
    return _take(table, idx)


def _take(table, idx):
    """table[idx] with a configurable index layout for the TPU gather.

    XLA's TPU gather emitter is latency-bound per row but its per-row
    cost depends on the index minor dimension (measured: minor-8 ≈ 6.4
    ns/row, minor-4 ≈ 12.5 ns/row on v5e). For simplex encodings
    (K = 4 vertices) "pair8"/"pack16" regroup 2/4 points' vertex quads
    into one minor-8/16 row before the gather and undo it after — the
    row set is identical, only the emitted loop shape changes.
    AVR_TPU_GATHER_LAYOUT ∈ {shaped, flat, merge, pair8, pack16, pack32,
    pack64} (default pack32 for K=4, shaped otherwise). Measured on the
    flagship bench: pack32 21.1k > merge 20.1k > pack16 > pair8 > shaped
    > flat rays/s — per-row latency is NOT monotone in the minor size
    ("merge" is transpose-free minor-80, yet loses to pack32's minor-32).
    """
    layout = os.environ.get("AVR_TPU_GATHER_LAYOUT", "auto")
    F = table.shape[-1]
    K = idx.shape[-1]
    if layout == "auto":
        # measured on v5e (flagship bench): shaped 16.0k, flat 13.5k,
        # pair8 16.8k, pack16 18.1k, pack32 18.5k rays/s for K=4
        layout = "pack32" if K == 4 else "shaped"
    if layout == "flat":
        return table[idx.reshape(-1)].reshape(*idx.shape, F)
    if layout == "merge" and idx.ndim >= 3:
        # Merge (L, K) into one minor-L·K index axis: same row set, larger
        # emitted minor dim, and — unlike the pack* point-grouping layouts —
        # both reshapes are contiguous-axis merges/splits (free, no
        # transpose in the forward or the cotangent).
        L, K = idx.shape[-2], idx.shape[-1]
        f = table[idx.reshape(*idx.shape[:-2], L * K)]
        return f.reshape(*idx.shape, F)
    minor = {"pair8": 8, "pack16": 16, "pack32": 32, "pack64": 64}.get(layout, 0)
    group = minor // K if (minor and minor % K == 0) else 0
    if group > 1 and idx.ndim >= 3:
        lead = idx.shape[:-2]
        L = idx.shape[-2]
        N = int(np.prod(lead))
        if N % group == 0:
            i2 = (
                idx.reshape(N // group, group, L, K)
                .swapaxes(1, 2)
                .reshape(N // group, L, group * K)
            )
            f = table[i2]  # [N/g, L, g*K, F]
            return (
                f.reshape(N // group, L, group, K, F)
                .swapaxes(1, 2)
                .reshape(*lead, L, K, F)
            )
    return table[idx]


def _gather_lvl_fwd(table, idx):
    return _take(table, idx), (idx, table.shape, int(table.dtype == jnp.bfloat16))


def _gather_lvl_bwd(res, g):
    idx, (E, F), is_bf16 = res
    L, C = idx.shape[-2], idx.shape[-1]
    n = int(np.prod(idx.shape)) // (L * C)
    if n * C < _sorted_min_rows() // L:
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
        # AVR_TPU_SCATTER_PAYLOAD overrides for A/B (without this the
        # explicit argument here would silently ignore the env knob).
        payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD") or (
            "bf16" if is_bf16 else None
        )
        d = scatter_add_rows(idx2, g2, E, payload=payload).astype(g.dtype)
    return d, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_leveled.defvjp(_gather_lvl_fwd, _gather_lvl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_packed2(table: Array, idx: Array, small: bool = False):
    """table[idx] for F=2 tables via ONE flat f32 gather per row.

    table: [E, 2] (fp32 param or bf16); idx: int32 [L, ...]. Returns
    (f0, f1): two bf16-VALUED float32 arrays of idx.shape — the two
    features as separate dense planes.

    Why: a bf16 [M, 2] gather result's only dense layout is entry-minor
    {0,1:T(2,128)}, and XLA's TPU gather emitter writes it at ~11.6
    ns/row — 2× the ~6 ns/row of a dense output (measured on the
    reference MeshRIR shape, docs/PERFORMANCE.md; a row-major [M, 2]
    bf16 result would lane-pad 2→128 into a 33.5 GB allocation). Packing
    each bf16 feature PAIR into one f32 word (bitcast, exact) makes the
    gather a scalar [E] → [M] f32 lookup whose output is an ordinary
    dense-tiled array. The planes come back via bitwise unpack (the
    scatter kernel's _unpack_payload trick): f0 = bits << 16,
    f1 = bits & 0xFFFF0000, both bf16-valued f32 — pure bit moves, no
    arithmetic touches the (possibly denormal) packed words.

    The backward packs the two cotangent planes straight into the sorted
    scatter's packed-bf16 payload (one f32 sort operand — the same
    stream the "bf16" payload mode builds), accumulating fp32 on the
    MXU. ``small`` routes the backward to the XLA scatter (callers with
    sub-crossover streams).
    """
    return _packed2_impl(table, idx)


def _packed2_words(table: Array) -> Array:
    tb = table.astype(jnp.bfloat16)
    # [E, 2] bf16 → [E] f32: element 0 lands in the LOW 16 bits
    return jax.lax.bitcast_convert_type(tb, jnp.float32)


def _unpack_words(vals: Array):
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    f0 = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    f1 = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    return f0, f1


def _packed2_impl(table: Array, idx: Array):
    vals = _packed2_words(table)[idx]  # [L, ...] f32 — dense layout
    if os.environ.get("AVR_TPU_PACK2_BARRIER", "0") == "1":
        vals = jax.lax.optimization_barrier(vals)
    return _unpack_words(vals)


def _packed2_fwd(table, idx, small):
    return (
        _packed2_impl(table, idx),
        (idx, table.shape, int(table.dtype == jnp.bfloat16)),
    )


def _packed2_bwd(small, res, g):
    idx, (E, F), table_bf16 = res
    g0, g1 = g  # f32 planes, idx.shape
    out_dtype = jnp.bfloat16 if table_bf16 else jnp.float32
    L = idx.shape[0]
    M = int(np.prod(idx.shape)) // L
    if small or L * M < _sorted_min_rows() or not on_tpu():
        d = scatter_add_rows(
            idx.reshape(-1),
            jnp.stack([g0.reshape(-1), g1.reshape(-1)], axis=-1),
            E, impl="xla",
        ).astype(out_dtype)
    else:
        # pack the bf16-rounded cotangent pair into one f32 payload word
        # (feature 0 low) — exactly the layout the sorted scatter's
        # packed mode sorts and its kernel unpacks.
        payload = jax.lax.bitcast_convert_type(
            jnp.stack(
                [g0.astype(jnp.bfloat16), g1.astype(jnp.bfloat16)], axis=-1
            ),
            jnp.float32,
        )  # idx.shape, f32 words
        d = _sorted_scatter(
            idx.reshape(L, M), payload.reshape(L, M, 1), E,
            tile_rows=int(os.environ.get("AVR_TPU_SCATTER_TS", 1024)),
            chunk=int(os.environ.get("AVR_TPU_SCATTER_UC", 1024)),
            precision="bf16x2", payload="prepacked2", interpret=False,
        ).astype(out_dtype)
    return d, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_packed2.defvjp(_packed2_fwd, _packed2_bwd)


@jax.custom_vjp
def gather_rows_packed4(table: Array, idx: Array):
    """table[idx] for F=4 tables via ONE complex64 gather per row.

    table: [E, 4] (fp32 param or bf16); idx: int32 [L, ...]. Returns
    (f0, f1, f2, f3): four bf16-VALUED float32 planes of idx.shape.

    The F=4 analog of gather_rows_packed2: four bf16 features bitcast
    into one 8-byte word (complex64 — TPU has no f64 gather path worth
    using, and complex64 is a first-class XLA element type whose gather
    result is a dense-tiled array). real = features 0/1, imag = 2/3;
    within each f32 word the lower-indexed feature sits in the LOW
    16 bits. The complex pack/unpack (lax.complex / real / imag) are bit
    moves, not arithmetic — the carried words may be denormal f32s.

    Backward: the four cotangent planes restack to [L, M, 4] and ride
    the sorted scatter's packed-bf16 payload (2 f32 sort operands).
    """
    return _packed4_impl(table, idx)


def _packed4_impl(table: Array, idx: Array):
    tb = table.astype(jnp.bfloat16)  # [E, 4]
    words = jax.lax.bitcast_convert_type(
        tb.reshape(-1, 2, 2), jnp.float32
    )  # [E, 2] f32
    cw = jax.lax.complex(words[:, 0], words[:, 1])  # [E] c64
    vals = cw[idx]  # [L, ...] c64 — dense layout
    if os.environ.get("AVR_TPU_PACK2_BARRIER", "0") == "1":
        vals = jax.lax.optimization_barrier(vals)
    f0, f1 = _unpack_words(jnp.real(vals))
    f2, f3 = _unpack_words(jnp.imag(vals))
    return f0, f1, f2, f3


def _packed4_fwd(table, idx):
    return (
        _packed4_impl(table, idx),
        (idx, table.shape, int(table.dtype == jnp.bfloat16)),
    )


def _packed4_bwd(res, g):
    idx, (E, F), table_bf16 = res
    out_dtype = jnp.bfloat16 if table_bf16 else jnp.float32
    L = idx.shape[0]
    M = int(np.prod(idx.shape)) // L
    g4 = jnp.stack(g, axis=-1)  # [L, ..., 4] f32 planes
    if L * M < _sorted_min_rows() or not on_tpu():
        d = scatter_add_rows(
            idx.reshape(-1), g4.reshape(-1, 4), E, impl="xla"
        ).astype(out_dtype)
    else:
        d = scatter_add_rows(
            idx.reshape(L, M), g4.reshape(L, M, 4), E, payload="bf16"
        ).astype(out_dtype)
    return d, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_packed4.defvjp(_packed4_fwd, _packed4_bwd)


def _maybe_pin_rowmajor(table: Array) -> Array:
    """AVR_TPU_TABLE_LAYOUT=rowmajor: pin the fp32 table row-major.

    XLA's layout assignment propagates the gather's entry-minor
    preference through the cast onto the fp32 parameter, which then
    forces a {1,0:T(8,128)}→{0,1:T(4,128)} relayout copy of the whole
    table GRADIENT every step (measured 3.4 ms on the flagship). Pinning
    the table row-major at its first use moves that relayout onto the
    forward instead — measured a NET LOSS (87.8 vs 83.3 ms/step): the
    gather path is worth more than the gradient copy. Default off;
    kept as an A/B knob for other table shapes.
    """
    if (
        os.environ.get("AVR_TPU_TABLE_LAYOUT", "") == "rowmajor"
        and on_tpu()
        and len(jax.devices()) == 1  # constraint requires a concrete sharding
    ):
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(table, Layout(major_to_minor=(0, 1)))
    return table


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_lmajor(
    table: Array,
    idx: Array,
    cast: Optional[str] = None,
    bounds: Optional[Tuple[Tuple[int, int], ...]] = None,
) -> Array:
    """table[idx] for LEVEL-MAJOR hash-grid indices idx [L, ...].

    Same contract as gather_rows_leveled but with the level axis leading,
    so the backward's per-level regrouping (idx.reshape(L, −1)) is a free
    contiguous reshape instead of a moveaxis transpose of the cotangent
    stream. Callers choose the gather's emitted minor dim by shaping the
    trailing idx axes (e.g. [L, N/g, g·K]).

    ``cast`` (a dtype name, e.g. "bfloat16") converts the table INSIDE
    this op before gathering. Casting here instead of at the caller means
    the backward hands the fp32 scatter-kernel output straight to the
    fp32 parameter — an outer ``table.astype(bf16)`` forces the 19 MB
    table cotangent through a bf16 round-trip in an awkward minor-4
    layout (measured 7.4 ms/step on the flagship).

    ``bounds``: static per-level table row ranges ((lo, hi) per leading
    idx row). Purely an optimization hint: it lets the backward's sorted
    scatter split each level's row sort into SUB-RUN batched sorts
    (AVR_TPU_SORT_SUBRUNS — XLA's batched sort cost is strongly
    super-linear in row length, measured 2.5-4.5x cheaper at K/8..K/16,
    scripts/sort_probe.py) and cover the S sorted runs per table tile in
    the scatter kernel's chunk schedule.
    """
    table = _maybe_pin_rowmajor(table)
    t = table.astype(cast) if cast is not None else table
    return _maybe_barrier(t[_maybe_idx_barrier(idx)])


def _maybe_idx_barrier(idx: Array) -> Array:
    """AVR_TPU_IDX_BARRIER=1: keep the index PRODUCERS out of the gather
    fusion.

    AVR_TPU_GATHER_BARRIER splits the gather from its consumers and
    measured FLAT on MeshRIR trilinear — the profiled fusion op was "a
    bare gather". But fusions also absorb index math upstream: at K=8
    each row's index is an 8-way corner hash (3 multiplies + 2 XORs per
    axis per corner), 2× simplex's, and if the emitter evaluates it
    per-row inside the gather loop the per-row cost scales with hash
    complexity — one candidate for the measured 11.6 (K=8) vs 5.7
    (K=4) ns/row gap on identical [L, rows/32, 32] emitted shapes.
    Barriering idx forces the hash math into its own (vectorized, VPU
    speed-of-light) fusion and leaves the gather loop reading
    precomputed indices. Default off pending hardware A/B."""
    if os.environ.get("AVR_TPU_IDX_BARRIER", "0") == "1":
        return jax.lax.optimization_barrier(idx)
    return idx


def _maybe_barrier(g: Array) -> Array:
    """AVR_TPU_GATHER_BARRIER=1: keep consumers out of the gather fusion.

    XLA fuses the interpolation arithmetic into the gather's emitted
    loop; on narrow-feature tables (F=2, the standard model) the fused
    loop runs at ~11.6 ns/row where the bare gather runs at ~6
    (measured on the reference MeshRIR shape, 131M rows). The flagship
    F=4 pair-fused graph is FASTER fused (4.4 ns/row) — default off,
    flip per-workload."""
    if os.environ.get("AVR_TPU_GATHER_BARRIER", "0") == "1":
        return jax.lax.optimization_barrier(g)
    # AVR_TPU_GATHER_ROWMAJOR=1: pin the gather OUTPUT row-major. On the
    # reference MeshRIR shape (131M rows into a bf16 [E,2] table) XLA
    # assigns the gather an entry-minor {0,1:T(2,128)} output for its
    # consumers and the emitter runs at 11.6 ns/row; with a row-major
    # output it runs at 6.0 (isolated probe) — the relayout then lands
    # on the 8× smaller K-summed features instead.
    if (
        os.environ.get("AVR_TPU_GATHER_ROWMAJOR", "0") == "1"
        and on_tpu()
        and len(jax.devices()) == 1
    ):
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(
            g, Layout(major_to_minor=tuple(range(g.ndim)))
        )
    return g


def _gather_lmaj_fwd(table, idx, cast, bounds=None):
    table = _maybe_pin_rowmajor(table)
    t = table.astype(cast) if cast is not None else table
    idx = _maybe_idx_barrier(idx)
    return (
        _maybe_barrier(t[idx]),
        (idx, table.shape, int(t.dtype == jnp.bfloat16),
         int(table.dtype == jnp.bfloat16)),
    )


def _maybe_pin_grad_consumer(d: Array) -> Array:
    """AVR_TPU_GRAD_LAYOUT=consumer: pin the table cotangent to the
    parameter's entry-minor {0,1:T(4,128)} layout at the VJP boundary.

    Without this, XLA materializes the scatter-kernel output through a
    row-major narrow [E, 4] T(8,128) intermediate whose lane dim is
    padded 4→128 — a ~2.4 GB phantom that costs 7.4 ms/step in a
    reshape+copy pair (measured; the copies are bandwidth-bound on
    padding). Constraining the cotangent's layout lets layout
    assignment collapse the pair into one dense 76 MB pass.
    """
    if (
        os.environ.get("AVR_TPU_GRAD_LAYOUT", "") == "consumer"
        and d.ndim == 2
        and d.shape[-1] == 4
        and d.dtype == jnp.float32
        and on_tpu()
        and len(jax.devices()) == 1
    ):
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(
            d, Layout(major_to_minor=(1, 0), tiling=((4, 128),))
        )
    return d


def _gather_lmaj_bwd(cast, bounds, res, g):
    idx, (E, F), is_bf16, table_bf16 = res
    out_dtype = jnp.bfloat16 if table_bf16 else jnp.float32
    L = idx.shape[0]
    M = int(np.prod(idx.shape)) // L
    if L * M < _sorted_min_rows():
        d = scatter_add_rows(
            idx.reshape(-1), g.reshape(-1, F).astype(jnp.float32), E, impl="xla"
        ).astype(out_dtype)
    else:
        # bf16 forward → pass the bf16 cotangent straight to the bf16
        # payload packer (no f32 round-trip; sums still accumulate fp32
        # on the MXU). The scatter output is fp32 and goes straight to
        # the table's dtype (fp32 params: no conversion at all).
        # AVR_TPU_SCATTER_PAYLOAD overrides for A/B (same rule as
        # _gather_lvl_bwd — this is the default klm-layout backward).
        payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD") or (
            "bf16" if is_bf16 else None
        )
        g2 = g.reshape(L, M, F)
        if not (payload == "bf16" and is_bf16 and F % 2 == 0):
            g2 = g2.astype(jnp.float32)  # packed path needs bf16 + even F
        d = scatter_add_rows(
            idx.reshape(L, M), g2, E, payload=payload, seg_bounds=bounds
        ).astype(out_dtype)
    return _maybe_pin_grad_consumer(d), jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_lmajor.defvjp(_gather_lmaj_fwd, _gather_lmaj_bwd)


# ----------------------------------------------------------------------
# Multi-group gather: one custom VJP across ALL level groups of a split
# encode, so the backward runs ONE sorted scatter (one kernel launch,
# one [E_pad, F] gradient) instead of per-group full-size gradients that
# autodiff then ADDs (4.0 ms of add_any + duplicated zero-tile writes in
# the round-5 flagship trace). The forward emits the same per-group
# gather ops as separate gather_rows_lmajor calls would — the
# gather-fusion-splitting win (docs/PERFORMANCE.md r4) is a property of
# the forward HLO, which is unchanged.
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_lmajor_multi(table: Array, idx_list, cast: Optional[str] = None):
    """table[idx] for a TUPLE of level-major index arrays (one per level
    group, each [L_g, ...]; groups must cover disjoint ascending level
    ranges in tuple order). Returns a tuple of per-group feature arrays.

    Same contract per group as gather_rows_lmajor; the backward sorts
    each group's (index, cotangent) stream per level and feeds the
    concatenated sorted streams to ONE scatter kernel launch.
    """
    table = _maybe_pin_rowmajor(table)
    t = table.astype(cast) if cast is not None else table
    return tuple(_maybe_barrier(t[_maybe_idx_barrier(i)]) for i in idx_list)


def _gather_lmaj_multi_fwd(table, idx_list, cast):
    table = _maybe_pin_rowmajor(table)
    t = table.astype(cast) if cast is not None else table
    idx_list = tuple(_maybe_idx_barrier(i) for i in idx_list)
    out = tuple(_maybe_barrier(t[i]) for i in idx_list)
    return out, (
        idx_list, table.shape, int(t.dtype == jnp.bfloat16),
        int(table.dtype == jnp.bfloat16),
    )


def _gather_lmaj_multi_bwd(cast, res, g):
    idx_list, (E, F), is_bf16, table_bf16 = res
    out_dtype = jnp.bfloat16 if table_bf16 else jnp.float32
    total = sum(int(np.prod(i.shape)) for i in idx_list)
    if total < _sorted_min_rows() or not on_tpu():
        flat_idx = jnp.concatenate([i.reshape(-1) for i in idx_list])
        flat_g = jnp.concatenate(
            [gi.reshape(-1, F).astype(jnp.float32) for gi in g]
        )
        d = scatter_add_rows(flat_idx, flat_g, E, impl="xla").astype(out_dtype)
    else:
        # same payload rule as _gather_lmaj_bwd, applied per group
        payload = os.environ.get("AVR_TPU_SCATTER_PAYLOAD") or (
            "bf16" if is_bf16 else None
        )
        streams = []
        for i, gi in zip(idx_list, g):
            L = i.shape[0]
            M = int(np.prod(i.shape)) // L
            g2 = gi.reshape(L, M, F)
            if not (payload == "bf16" and is_bf16 and F % 2 == 0):
                g2 = g2.astype(jnp.float32)
            streams.append((i.reshape(L, M), g2))
        d = scatter_add_rows_multi(streams, E, payload=payload).astype(out_dtype)
    return (
        _maybe_pin_grad_consumer(d),
        tuple(jnp.zeros(i.shape, dtype=jax.dtypes.float0) for i in idx_list),
    )


gather_rows_lmajor_multi.defvjp(_gather_lmaj_multi_fwd, _gather_lmaj_multi_bwd)
