"""Multiresolution hash-grid encoding (instant-ngp style), TPU-native.

Replaces tinycudann's ``tcnn.Encoding(3, {"otype": "HashGrid", ...})``
(reference/model.py:66-68,258-264; level/table hyper-parameters from e.g.
reference/config_files/avr_meshrir.yml:48-68). This is a fresh JAX design,
not a CUDA translation:

  * all levels are encoded with ONE batched gather over a flat feature
    table (per-level offsets are static), so XLA emits a single fused
    gather + trilinear-interpolation kernel;
  * the backward pass is the natural transpose — a scatter-add into the
    flat table. XLA's TPU scatter emitter is row-serial and dominated the
    whole training step, so the gather runs through
    ``avr_tpu.ops.hash_scatter.gather_rows``, whose backward sorts the
    (index, update) stream and accumulates it with one-hot matmuls in a
    Pallas tile kernel (MXU, no atomics); small gathers keep XLA;
  * fine levels whose dense grid exceeds the table use the instant-ngp
    spatial hash (x·p₁ ⊕ y·p₂ ⊕ z·p₃ mod T); coarse levels index densely.

Inputs are expected in the unit cube [0,1]³ (the fields map the renderer's
[−1,1] box coordinates with (x+1)/2, mirroring reference/model.py:187-189).
Out-of-range inputs are clamped.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.config import EncodingConfig
from avr_tpu.ops import hash_scatter

Array = jax.Array

# instant-ngp hash primes (Müller et al. 2022, Eq. 4). The first coordinate
# is multiplied by 1 so nearby cells fall into different buckets cheaply.
_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclass(frozen=True)
class HashGridStatic:
    """Static (trace-time) level geometry for one encoding."""

    n_levels: int
    n_features: int  # features per level
    resolutions: Tuple[int, ...]  # grid resolution per level
    offsets: Tuple[int, ...]  # flat-table offset per level
    sizes: Tuple[int, ...]  # table entries per level
    hashed: Tuple[bool, ...]  # True → spatial hash, False → dense index
    total_entries: int
    # Feature tables are allocated with this many rows: total_entries
    # rounded up to the scatter kernel's tile granularity, so the table-
    # gradient kernel writes the full parameter shape directly (a
    # misaligned out[:total] slice measured 7+ ms/step on the flagship).
    # Rows >= total_entries are never indexed; their gradients are zero.
    padded_entries: int = 0
    # "trilinear": 8 cell corners per (point, level); "simplex": Kuhn
    # tetrahedral interpolation, 4 vertices per (point, level) — halves
    # the latency-bound gather row stream fwd AND the scatter-add update
    # stream bwd (the step's dominant costs on TPU), stays C0-continuous.
    # "levels:sstt..." (canonical form of config "hybrid[:N]"): a
    # per-level mix — encode() splits the level range into contiguous
    # same-mode groups and runs each group's pipeline at its own K
    # (the simplex levels drop their share of the dominant row stream
    # while the trilinear levels keep tcnn-parity interpolation).
    interp: str = "trilinear"

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features

    @property
    def n_corners(self) -> int:
        if self.interp.startswith("levels:"):
            raise ValueError(
                "mixed-interpolation static has no single K; encode() "
                "must split it into per-mode groups first"
            )
        return 4 if self.interp == "simplex" else 8


def _parse_interp(spec, n_levels: int) -> str:
    """Canonicalize an EncodingConfig.interpolation spec.

    Accepted: "trilinear" (default, tcnn "Linear" parity), "simplex",
    "hybridc[:N]" (trilinear on the N COARSEST levels, simplex above —
    the quality-preserving split: the round-4 level attribution localized
    simplex's phase/DoA loss to the coarse levels, results/
    interp_fullbudget/attribution_s0.json), "hybrid[:N]" (trilinear on
    the N FINEST levels — measured NOT to preserve phase quality; kept
    for attribution work), and "levels:<s|t ×L>" (explicit per-level
    modes, coarsest first). N defaults to half the levels rounded up.
    Degenerate mixes collapse to the pure mode; unrecognized values fall
    back to trilinear (matching tcnn's behaviour for e.g. "Smoothstep").
    """
    s = str(spec or "").lower()
    if s == "simplex":
        return "simplex"
    if s.startswith("hybridc"):
        n_tri = int(s.split(":")[1]) if ":" in s else (n_levels + 1) // 2
        n_tri = max(0, min(n_levels, n_tri))
        if n_tri == 0:
            return "simplex"
        if n_tri == n_levels:
            return "trilinear"
        return "levels:" + "t" * n_tri + "s" * (n_levels - n_tri)
    if s.startswith("hybrid"):
        n_tri = int(s.split(":")[1]) if ":" in s else (n_levels + 1) // 2
        n_tri = max(0, min(n_levels, n_tri))
        if n_tri == 0:
            return "simplex"
        if n_tri == n_levels:
            return "trilinear"
        return "levels:" + "s" * (n_levels - n_tri) + "t" * n_tri
    if s.startswith("levels:"):
        modes = s.split(":", 1)[1]
        if len(modes) != n_levels or not set(modes) <= {"s", "t"}:
            raise ValueError(
                f"levels: spec must be {n_levels} chars of s/t, got {modes!r}"
            )
        if "s" not in modes:
            return "trilinear"
        if "t" not in modes:
            return "simplex"
        return "levels:" + modes
    return "trilinear"


def _slice_static(
    static: HashGridStatic, lo: int, hi: int, interp: str
) -> HashGridStatic:
    """Static covering levels [lo, hi) of the SAME flat table.

    total/padded entries stay those of the parent so the group's gather
    VJP scatters into the full parameter shape (groups' gradients sum).
    """
    return HashGridStatic(
        n_levels=hi - lo,
        n_features=static.n_features,
        resolutions=static.resolutions[lo:hi],
        offsets=static.offsets[lo:hi],
        sizes=static.sizes[lo:hi],
        hashed=static.hashed[lo:hi],
        total_entries=static.total_entries,
        padded_entries=static.padded_entries,
        interp=interp,
    )


def _split_max_levels(
    width: Optional[int], pure: bool, n_levels: int, n_points: Optional[int]
) -> int:
    """Max levels per encode group (AVR_TPU_SPLIT_LEVELS).

    The round-4 hybridc trace showed the per-row latency of XLA's TPU
    gather emitter DROPS when the monolithic all-level gather fusion is
    split (10.3 → ~6.3 ns/row on the MeshRIR stream); measured directly
    on pure trilinear: MeshRIR 2,131 → 1,463 ms/step (−31%), flagship
    15.4k → 16.1k rays/s — the r3 "structural floor" was a property of
    the MONOLITHIC fusion, not the hardware.

    "auto" (default, TPU only): split only LARGE point streams
    (n_points ≥ 1e5 — the per-(point,level) row streams that dominate
    the step): narrow (width ≤ 2) tables cap groups at 10 levels
    (MeshRIR hybridc subsplit 1,013 → 934 ms measured); wide pair-fused
    tables (width 4) split a PURE monolithic static in half (flagship
    trilinear +4.9%) but never their hybrid groups (measured −2.3%).
    Small per-ray/per-batch encodings are NEVER auto-split: splitting
    the flagship's tiny F=2 view encodings while leaving its pairs
    whole produced a 3× pathological program (26.1k → 8.9k rays/s,
    reproduced twice — a fusion-boundary cliff, not noise). Integer
    spec = unconditional cap; 0 disables.
    """
    spec = os.environ.get("AVR_TPU_SPLIT_LEVELS", "auto")
    if spec != "auto":
        return int(spec)
    if not hash_scatter.on_tpu():
        return 0
    if n_points is not None and n_points < 100_000:
        return 0
    if width is not None and width > 2:
        return (n_levels + 1) // 2 if pure else 0
    return 10


def _subsplit(groups, width, pure, n_levels, n_points):
    """Recursively halve groups larger than the split cap."""
    cap = _split_max_levels(width, pure, n_levels, n_points)
    if cap <= 0:
        return groups
    out = []
    for g in groups:
        stack = [g]
        while stack:
            s = stack.pop(0)
            if s.n_levels > cap:
                h = s.n_levels // 2
                stack = [
                    _slice_static(s, 0, h, s.interp),
                    _slice_static(s, h, s.n_levels, s.interp),
                ] + stack
            else:
                out.append(s)
    return out


def _hybrid_groups(
    static: HashGridStatic,
    width: Optional[int] = None,
    n_points: Optional[int] = None,
):
    """Contiguous same-mode level groups of a mixed static, further
    subdivided to the AVR_TPU_SPLIT_LEVELS cap (None = no grouping
    needed — pure mode below the cap). ``width`` = table feature width
    (pair-fused tables are wider than static.n_features), ``n_points``
    = encoded point count — the auto split rule keys on both."""
    L = static.n_levels
    if not static.interp.startswith("levels:"):
        groups = _subsplit([static], width, True, L, n_points)
        return groups if len(groups) > 1 else None
    modes = static.interp.split(":", 1)[1]
    groups, lo = [], 0
    for i in range(1, L + 1):
        if i == L or modes[i] != modes[lo]:
            mode = "simplex" if modes[lo] == "s" else "trilinear"
            groups.append(_slice_static(static, lo, i, mode))
            lo = i
    return _subsplit(groups, width, False, L, n_points)


def build_static(cfg: EncodingConfig) -> HashGridStatic:
    """Derive per-level resolutions/offsets from an EncodingConfig."""
    max_entries = 1 << cfg.log2_hashmap_size
    resolutions, offsets, sizes, hashed = [], [], [], []
    offset = 0
    for level in range(cfg.n_levels):
        res = int(np.floor(cfg.base_resolution * cfg.per_level_scale**level))
        dense = (res + 1) ** 3
        use_hash = dense > max_entries
        size = max_entries if use_hash else dense
        resolutions.append(res)
        offsets.append(offset)
        sizes.append(size)
        hashed.append(use_hash)
        offset += size
    return HashGridStatic(
        n_levels=cfg.n_levels,
        n_features=cfg.n_features_per_level,
        resolutions=tuple(resolutions),
        offsets=tuple(offsets),
        sizes=tuple(sizes),
        hashed=tuple(hashed),
        total_entries=offset,
        padded_entries=-(-offset // 4096) * 4096,
        interp=_parse_interp(getattr(cfg, "interpolation", ""), cfg.n_levels),
    )


def init(key: Array, static: HashGridStatic, dtype=jnp.float32) -> Array:
    """Feature table, uniform in [−1e−4, 1e−4] (instant-ngp init).

    Allocated with ``padded_entries`` rows (see HashGridStatic); the tail
    rows are never gathered and receive zero gradient.
    """
    n = static.padded_entries or static.total_entries
    return jax.random.uniform(
        key,
        (n, static.n_features),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


def _flat_indices(static: HashGridStatic, coords: Array) -> Array:
    """Flat table indices for lattice coordinates coords [..., L, K, 3].

    Dense levels index x + y·(res+1) + z·(res+1)²; hashed levels use the
    instant-ngp spatial hash. Returns int32 [..., L, K].
    """
    res = jnp.asarray(static.resolutions, dtype=jnp.int32)  # [L]
    sizes = jnp.asarray(static.sizes, dtype=jnp.uint32)  # [L]
    offsets = jnp.asarray(static.offsets, dtype=jnp.int32)  # [L]
    use_hash = jnp.asarray(static.hashed, dtype=bool)  # [L]

    # Vertices may touch coordinate `res` (grid has res+1 per axis).
    coords = jnp.minimum(coords, res[:, None, None])

    stride = res[:, None] + 1  # [L, 1]
    dense = (
        coords[..., 0]
        + coords[..., 1] * stride
        + coords[..., 2] * stride * stride
    )

    # Spatial hash with uint32 wraparound, then mod table size. Sizes of
    # hashed levels are powers of two, so use a bitmask.
    cu = coords.astype(jnp.uint32)
    primes = _PRIMES  # numpy constants fold into the program
    h = (cu[..., 0] * primes[0]) ^ (cu[..., 1] * primes[1]) ^ (
        cu[..., 2] * primes[2]
    )
    hashed_idx = (h & (sizes[:, None] - 1)).astype(jnp.int32)

    local = jnp.where(use_hash[:, None], hashed_idx, dense)
    return local + offsets[:, None]


def _trilinear(pos0: Array, frac: Array) -> Tuple[Array, Array]:
    """8 cell-corner offsets + trilinear weights.

    pos0 [..., L, 3] int32, frac [..., L, 3] → (coords [..., L, 8, 3],
    w [..., L, 8]).
    """
    corner = jnp.asarray(
        [[(c >> d) & 1 for d in range(3)] for c in range(8)], dtype=jnp.int32
    )  # [8, 3]
    coords = pos0[..., :, None, :] + corner[None, :, :]
    cf = corner.astype(frac.dtype)
    t = frac[..., :, None, :]  # [..., L, 1, 3]
    w = jnp.prod(cf * t + (1.0 - cf) * (1.0 - t), axis=-1)  # [..., L, 8]
    return coords, w


def _simplex(pos0: Array, frac: Array) -> Tuple[Array, Array]:
    """Kuhn tetrahedral interpolation: 4 vertices + barycentric weights.

    Each unit cell splits into 6 tetrahedra by the ordering of the
    fractional coordinates (Freudenthal/Kuhn triangulation). The vertex
    chain is v_k = pos0 + Σ_{m≤k} e_{a_m} where a_1..a_3 sorts frac
    descending; weights are successive differences of the sorted fracs.
    Piecewise-linear, reproduces linear functions exactly, C0-continuous
    across cells and tetrahedra (weights of disagreeing vertices vanish
    at ties). Returns (coords [..., L, 4, 3], w [..., L, 4]).
    """
    # Descending rank of each axis' frac (ties broken by axis index).
    t = frac  # [..., L, 3]
    gt = (t[..., None, :] > t[..., :, None]) | (
        (t[..., None, :] == t[..., :, None])
        & (jnp.arange(3)[None, :] < jnp.arange(3)[:, None])
    )  # [..., L, 3(axis i), 3(axis j)]: t_j beats t_i
    rank = jnp.sum(gt, axis=-1).astype(jnp.int32)  # [..., L, 3] in 0..2

    # Vertex k includes axis i iff rank_i < k, k = 0..3.
    k = jnp.arange(4, dtype=jnp.int32)  # [4]
    step = (rank[..., None, :] < k[:, None]).astype(jnp.int32)  # [..., L, 4, 3]
    coords = pos0[..., :, None, :] + step

    s1 = jnp.max(t, axis=-1)
    s3 = jnp.min(t, axis=-1)
    s2 = jnp.sum(t, axis=-1) - s1 - s3
    w = jnp.stack([1.0 - s1, s1 - s2, s2 - s3, s3], axis=-1)  # [..., L, 4]
    return coords, w


def _indices_weights(static: HashGridStatic, x: Array) -> Tuple[Array, Array]:
    """Shared front half of encode/encode_pair.

    x [..., 3] in [0,1]³ → (idx [..., L, K], w [..., L, K]) with
    K = static.n_corners.
    """
    x = jnp.clip(x, 0.0, 1.0)
    res = jnp.asarray(static.resolutions, dtype=x.dtype)  # [L]
    scaled = x[..., None, :] * res[:, None]  # [..., L, 3]
    pos0 = jnp.floor(scaled).astype(jnp.int32)
    pos0 = jnp.minimum(pos0, jnp.asarray(static.resolutions, jnp.int32)[:, None] - 1)
    pos0 = jnp.maximum(pos0, 0)
    frac = scaled - pos0.astype(x.dtype)  # [..., L, 3]

    if static.interp == "simplex":
        coords, w = _simplex(pos0, frac)
    else:
        coords, w = _trilinear(pos0, frac)
    return _flat_indices(static, coords), w


def _flat_indices_lm(static: HashGridStatic, coords: Array) -> Array:
    """Level-major _flat_indices: coords [L, N, K, 3] → idx [L, N, K]."""
    def pl(a):  # per-level constant, broadcast over the trailing dims
        return a.reshape((a.shape[0], 1, 1))

    res = pl(jnp.asarray(static.resolutions, dtype=jnp.int32))
    sizes = pl(jnp.asarray(static.sizes, dtype=jnp.uint32))
    offsets = pl(jnp.asarray(static.offsets, dtype=jnp.int32))
    use_hash = pl(jnp.asarray(static.hashed, dtype=bool))

    coords = jnp.minimum(coords, res[..., None])
    stride = res + 1
    dense = (
        coords[..., 0]
        + coords[..., 1] * stride
        + coords[..., 2] * stride * stride
    )
    cu = coords.astype(jnp.uint32)
    h = (cu[..., 0] * _PRIMES[0]) ^ (cu[..., 1] * _PRIMES[1]) ^ (
        cu[..., 2] * _PRIMES[2]
    )
    hashed_idx = (h & (sizes - 1)).astype(jnp.int32)
    return jnp.where(use_hash, hashed_idx, dense) + offsets


def _indices_weights_lm(static: HashGridStatic, x: Array) -> Tuple[Array, Array]:
    """Level-major twin of _indices_weights.

    x [N, 3] in [0,1]³ → (idx [L, N, K], w [L, N, K]). Generating the
    level axis LEADING makes every regrouping the TPU path needs a free
    contiguous reshape instead of a transpose: gather rows pack as
    [L, N/g, g·K], the backward's per-level sort stream is idx.reshape
    (L, −1), and the K-contraction happens in place (see encode).
    """
    x = jnp.clip(x, 0.0, 1.0)
    res = jnp.asarray(static.resolutions, dtype=x.dtype)  # [L]
    scaled = x[None, :, :] * res[:, None, None]  # [L, N, 3]
    pos0 = jnp.floor(scaled).astype(jnp.int32)
    pos0 = jnp.minimum(
        pos0, jnp.asarray(static.resolutions, jnp.int32)[:, None, None] - 1
    )
    pos0 = jnp.maximum(pos0, 0)
    frac = scaled - pos0.astype(x.dtype)  # [L, N, 3]

    if static.interp == "simplex":
        coords, w = _simplex(pos0, frac)  # [L, N, K, 3], [L, N, K]
    else:
        coords, w = _trilinear(pos0, frac)
    return _flat_indices_lm(static, coords), w


def _indices_weights_klm(
    static: HashGridStatic, x: Array
) -> Tuple[Array, Array]:
    """Vertex-major twin of _indices_weights_lm: [L, K, N] layouts.

    x [N, 3] in [0,1]³ → (idx [L, K, N] int32, w [L, K, N]). Compared to
    the [L, N, K] layout, putting the vertex axis SECOND and the point
    axis minor means (a) the interpolation's K-contraction is a planar
    sum over contiguous [N]-major slabs (the [L, N, K] layout made XLA
    transpose the 106 MB gathered-feature tensor to bring K forward —
    4.8 ms/step on the flagship), (b) every elementwise op in the index
    math runs on [L, N] planes (full-bandwidth layouts; the coords-minor
    [..., 3] and weights-minor [..., K] arrays of the other layouts run
    at 5-30 GB/s on v5e), and (c) the backward sort stream is still the
    free contiguous reshape idx.reshape(L, K·N).
    """
    x = jnp.clip(x, 0.0, 1.0)
    dt = x.dtype
    res_f = jnp.asarray(static.resolutions, dtype=dt)[:, None]  # [L, 1]
    res_i = jnp.asarray(static.resolutions, jnp.int32)[:, None]
    pos0, frac = [], []
    for a in range(3):  # structure-of-arrays: one [L, N] plane per axis
        s = x[None, :, a] * res_f
        p = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, res_i - 1)
        pos0.append(p)
        frac.append(s - p.astype(dt))
    px, py, pz = pos0
    fx, fy, fz = frac

    sizes_u = jnp.asarray(static.sizes, jnp.uint32)[:, None]
    offs = jnp.asarray(static.offsets, jnp.int32)[:, None]
    use_hash = jnp.asarray(static.hashed, dtype=bool)[:, None]
    stride = res_i + 1

    def flat(cx, cy, cz):  # [L, N] coords → [L, N] flat table index
        cx = jnp.minimum(cx, res_i)
        cy = jnp.minimum(cy, res_i)
        cz = jnp.minimum(cz, res_i)
        dense = cx + cy * stride + cz * stride * stride
        h = (
            (cx.astype(jnp.uint32) * _PRIMES[0])
            ^ (cy.astype(jnp.uint32) * _PRIMES[1])
            ^ (cz.astype(jnp.uint32) * _PRIMES[2])
        )
        hashed_idx = (h & (sizes_u - 1)).astype(jnp.int32)
        return jnp.where(use_hash, hashed_idx, dense) + offs

    if static.interp == "simplex":
        # Descending rank of each axis' frac, ties broken by axis index —
        # identical to _simplex's gt matrix, unrolled per axis.
        rx = (fy > fx).astype(jnp.int32) + (fz > fx).astype(jnp.int32)
        ry = (fx >= fy).astype(jnp.int32) + (fz > fy).astype(jnp.int32)
        rz = (fx >= fz).astype(jnp.int32) + (fy >= fz).astype(jnp.int32)
        idx = jnp.stack(
            [
                flat(px + (rx < k), py + (ry < k), pz + (rz < k))
                for k in range(4)
            ],
            axis=1,
        )  # [L, 4, N]
        s1 = jnp.maximum(fx, jnp.maximum(fy, fz))
        s3 = jnp.minimum(fx, jnp.minimum(fy, fz))
        s2 = fx + fy + fz - s1 - s3
        w = jnp.stack([1.0 - s1, s1 - s2, s2 - s3, s3], axis=1)
    else:
        idx_c, w_c = [], []
        for c in range(8):  # corner bit d = (c >> d) & 1, as in _trilinear
            bx, by, bz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            idx_c.append(flat(px + bx, py + by, pz + bz))
            w_c.append(
                (fx if bx else 1.0 - fx)
                * (fy if by else 1.0 - fy)
                * (fz if bz else 1.0 - fz)
            )
        idx = jnp.stack(idx_c, axis=1)  # [L, 8, N]
        w = jnp.stack(w_c, axis=1)
    return idx, w


_LANE_B = 128  # one-hot factor: local index = a·128 + b (b = lane dim)
_cdiv_int = hash_scatter._cdiv  # ceil division


def _n_onehot_levels(static: HashGridStatic, feature_width: int) -> int:
    """How many leading (coarsest) levels go through the one-hot matmul
    path instead of the row gather (AVR_TPU_DENSE_ONEHOT = max table rows,
    "0" = off, "auto" = measured default).

    XLA's TPU gather emitter is latency-bound per ROW (~4.4-11.6 ns/row
    regardless of row bytes, docs/PERFORMANCE.md), so coarse levels whose
    dense tables are small are cheaper to read as two factored one-hot
    contractions on the MXU (see _onehot_levels_lookup) — and their
    backward becomes a transposed matmul, leaving the sort+scatter
    gradient stream entirely. Fine hashed levels stay on the gather.
    Only a PREFIX of levels qualifies (sizes are non-decreasing).

    The auto default covers the narrow-table F<=2 regimes of BOTH
    interpolation modes: simplex (the tuned MeshRIR configuration,
    801 → 774 ms/step measured round 1) and trilinear K=8 (2,261 →
    2,133 ms/step measured round 2 under AVR_TPU_ONEHOT_CHUNK's
    point-stream chunking, which fixed the round-1 remote-compile
    blowup that originally kept K=8 auto-off). Auto stays off only for
    the pair-fused F=4 flagship, where the gather already runs at
    4.4 ns/row and forcing the matmul path on measured a 7-9% LOSS.
    """
    spec = os.environ.get("AVR_TPU_DENSE_ONEHOT", "auto")
    if spec == "auto":
        if not hash_scatter.on_tpu():
            return 0
        thresh = 65536 if feature_width <= 2 else 0
    else:
        thresh = int(spec)
    d = 0
    for lvl in range(static.n_levels):
        if static.hashed[lvl] or static.sizes[lvl] > thresh:
            break
        d += 1
    return d


def _onehot_levels_lookup(
    table: Array, static: HashGridStatic, idx_d: Array, cast: str = None
) -> Array:
    """Table rows for the D coarsest levels via factored one-hot matmuls.

    idx_d: int32 [D, K, N] GLOBAL flat indices (level offsets included).
    Returns [D, K, N, F] in the compute dtype. Per level, the local index
    splits as a·128 + b and the lookup becomes

        tmp[n, f·128+b] = Σ_a oh_a[n, a] · seg[a·128+b, f]   (MXU)
        out[n, f]       = Σ_b oh_b[n, b] · tmp[n, f·128+b]   (VPU)

    Each row of oh_a/oh_b has exactly one 1, so every contraction picks
    exactly one table row — bit-identical to the gather (no summation).
    tmp is laid out feature-major/lane-b so the b-reduction runs on
    contiguous 128-lane planes. The backward is the transposed pair
    (see _onehot_rows_bwd), replacing this level's share of the sorted
    scatter-add with one small fp32-accumulated [A, 128·F] matmul.
    """
    outs = []
    # Point-stream chunking (AVR_TPU_ONEHOT_CHUNK, 0 = off): the one-hot
    # factors are [A, M] / [128, M] with M = K·N (6.6M for MeshRIR K=8)
    # — fine to EXECUTE tiled, but the remote XLA service's compile time
    # blew past 60 min scheduling the monolithic K=8 program (round-1
    # finding). lax.map compiles ONE chunk body regardless of M, capping
    # operand sizes; the scan's closed-over `seg` cotangent accumulates
    # across chunks in the backward automatically.
    spec = os.environ.get("AVR_TPU_ONEHOT_CHUNK", "auto")
    if spec == "auto":
        # chunk only the K=8 (trilinear) programs — the ones whose
        # monolithic compile blew up; the tuned K=4 simplex program
        # stays byte-identical to its measured 763 ms/step form
        ch = (1 << 20) if idx_d.shape[1] == 8 else 0
    else:
        ch = int(spec)
    for lvl in range(idx_d.shape[0]):
        off, size = static.offsets[lvl], static.sizes[lvl]
        seg = jax.lax.slice_in_dim(table, off, off + size)  # [S, F]
        loc = idx_d[lvl] - off  # [K, N] in [0, S)
        M = int(np.prod(loc.shape))
        if 0 < ch < M:
            # pad the point stream to a chunk multiple with an
            # OUT-OF-RANGE local index (= the padded row count A·B): its
            # factored one-hot columns are all-zero, so pad rows read
            # zeros forward and contribute nothing backward — same slack
            # trick as the scatter kernel's tile spill-in.
            a_rows = _cdiv_int(size, _LANE_B)
            Mp = _cdiv_int(M, ch) * ch
            loc_flat = jnp.concatenate([
                loc.reshape(-1),
                jnp.full((Mp - M,), a_rows * _LANE_B, jnp.int32),
            ])
            rows = jax.lax.map(
                lambda lc, s=seg: _onehot_rows(s, lc, cast),
                loc_flat.reshape(Mp // ch, ch),
            )  # [Mp/ch, ch, F]
            outs.append(
                rows.reshape(Mp, -1)[:M].reshape(*loc.shape, rows.shape[-1])
            )
        else:
            outs.append(_onehot_rows(seg, loc, cast))  # [K, N, F]
    return jnp.stack(outs, axis=0)


def _onehot_factors(loc_flat: Array, a_rows: int, dtype) -> Tuple[Array, Array]:
    """Factored one-hots of loc = a·128 + b, POINTS-MINOR: ([A, M], [B, M]).

    The point axis stays minor (128 lanes, no padding); the one-hot axis
    lives in sublanes — a [M, A] orientation would lane-pad A (e.g.
    39 → 128, 3.3× wasted write bandwidth on the biggest intermediates).
    """
    a = loc_flat // _LANE_B
    b = loc_flat - a * _LANE_B
    ia = jax.lax.broadcasted_iota(jnp.int32, (a_rows, 1), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (_LANE_B, 1), 0)
    oh_a = (ia == a[None, :]).astype(dtype)
    oh_b = (ib == b[None, :]).astype(dtype)
    return oh_a, oh_b


def _onehot_rows_impl(seg: Array, loc: Array, cast: str) -> Array:
    S, F = seg.shape
    B = _LANE_B
    a_rows = _cdiv_int(S, B)
    if cast is not None:
        seg = seg.astype(cast)
    segp = jnp.pad(seg, ((0, a_rows * B - S), (0, 0)))
    # [A, B, F] → [F, B, A] → [F·B, A]: row f·B+b, column a (table-sized)
    segr = segp.reshape(a_rows, B, F).transpose(2, 1, 0).reshape(F * B, a_rows)
    oh_a, oh_b = _onehot_factors(loc.reshape(-1), a_rows, segr.dtype)
    # fp32 operands: the TPU MXU's default f32 dot is ONE bf16-rounded
    # pass — HIGHEST (bf16x3, 24 mantissa bits) makes the one-hot's
    # single product per column exact again. bf16 operands are exact in
    # a single pass by construction (0/1 × bf16 value).
    prec = (
        jax.lax.Precision.HIGHEST if segr.dtype == jnp.float32 else None
    )
    tmp = jax.lax.dot_general(
        segr, oh_a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=segr.dtype,  # exact: one term per column
        precision=prec,
    )  # [F·B, M] — points minor
    M = oh_a.shape[-1]
    out2 = jnp.sum(tmp.reshape(F, B, M) * oh_b[None], axis=1)  # [F, M]
    return jnp.moveaxis(out2.reshape(F, *loc.shape), 0, -1)  # [K, N, F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _onehot_rows(seg: Array, loc: Array, cast: str = None) -> Array:
    """seg[loc] via factored one-hot matmuls, custom VJP.

    Mirrors gather_rows_lmajor's contract: ``cast`` converts the table
    segment INSIDE the op (bf16 compute path), and the backward hands an
    fp32-ACCUMULATED cotangent straight to the segment's dtype — the
    default AD rule would reuse the forward dot's bf16
    preferred_element_type, silently bf16-accumulating the hundreds of
    per-row contributions a coarse level receives (the Pallas scatter
    kernel this path replaces accumulates in fp32 on the MXU).
    """
    return _onehot_rows_impl(seg, loc, cast)


def _onehot_rows_fwd(seg, loc, cast):
    return (
        _onehot_rows_impl(seg, loc, cast),
        (loc, seg.shape, int(seg.dtype == jnp.bfloat16)),
    )


def _onehot_rows_bwd(cast, res, g):
    loc, (S, F), seg_bf16 = res
    seg_dtype = jnp.bfloat16 if seg_bf16 else jnp.float32
    B = _LANE_B
    a_rows = _cdiv_int(S, B)
    oh_a, oh_b = _onehot_factors(loc.reshape(-1), a_rows, g.dtype)
    M = oh_a.shape[-1]
    # d_segr[f·B+b, a] = Σ_m g2[f, m] · oh_b[b, m] · oh_a[a, m]
    g2 = jnp.moveaxis(g, -1, 0).reshape(F, 1, M)
    d_tmp = (g2 * oh_b[None]).reshape(F * B, M)
    d_segr = jax.lax.dot_general(
        d_tmp, oh_a,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,  # fp32 accumulation
        # f32 cotangents (parity/oracle path): keep each product exact —
        # the default f32 MXU dot bf16-rounds the operands.
        precision=(
            jax.lax.Precision.HIGHEST if g.dtype == jnp.float32 else None
        ),
    )  # [F·B, A]
    d_seg = (
        d_segr.reshape(F, B, a_rows)
        .transpose(2, 1, 0)
        .reshape(a_rows * B, F)[:S]
        .astype(seg_dtype)
    )
    return d_seg, jnp.zeros(loc.shape, dtype=jax.dtypes.float0)


_onehot_rows.defvjp(_onehot_rows_fwd, _onehot_rows_bwd)


def _level_bounds(static: HashGridStatic, d: int) -> Tuple[Tuple[int, int], ...]:
    """Static (offset, offset+size) table range per level ≥ d — the
    sorted scatter's sub-run sort optimization hint (hash_scatter.
    gather_rows_lmajor ``bounds``)."""
    return tuple(
        (static.offsets[l], static.offsets[l] + static.sizes[l])
        for l in range(d, static.n_levels)
    )


def _interp_ksum(feats, wl, idt):
    """Weighted K-sum of [D', K, N, F] features → [D', N, F]."""
    if idt == "bfloat16" and feats.dtype == jnp.bfloat16:
        wl = wl.astype(feats.dtype)
    else:
        feats = feats.astype(wl.dtype)
    return (feats * wl[..., None]).sum(axis=1)


def _encode_klm_groups(
    table: Array, groups, x: Array, cast: str = None
) -> Optional[Array]:
    """Grouped klm encode with ONE multi-stream gather VJP across groups.

    Per-group forward HLO is identical to per-group _encode_klm calls
    (same gather ops, same interpolation); the difference is the
    BACKWARD: all groups' (index, cotangent) streams feed one sorted
    scatter launch producing one table gradient, instead of per-group
    full-size gradients that autodiff ADDs (see
    hash_scatter.gather_rows_lmajor_multi). Returns [N, L_total, F]
    level-major, or None when a group needs a path the multi op does
    not cover (caller falls back to per-group encodes).
    """
    lead = x.shape[:-1]
    N = int(np.prod(lead)) if lead else 1
    m = int(os.environ.get("AVR_TPU_KLM_MINOR", "32"))
    if N % m:
        return None
    _p2 = os.environ.get("AVR_TPU_PAD_F2", "0")
    if table.shape[-1] == 2 and (
        _p2 == "force" or (_p2 == "1" and hash_scatter.on_tpu())
    ):
        return None  # pad2 widens the table per call — keep legacy path
    F = table.shape[-1]
    if F == 2 and cast == "bfloat16" and os.environ.get(
        "AVR_TPU_GATHER_PACK2", "auto"
    ) == "1":
        return None
    if F == 4 and cast == "bfloat16" and os.environ.get(
        "AVR_TPU_GATHER_PACK4", "auto"
    ) == "1":
        return None
    xf = x.reshape(N, 3)
    idt = os.environ.get("AVR_TPU_INTERP_DTYPE", "bfloat16")
    per, gidx = [], []
    for gs in groups:
        idx, w = _indices_weights_klm(gs, xf)  # [L_g, K, N]
        D = _n_onehot_levels(gs, F)
        per.append((gs, idx, w, D))
        if D < gs.n_levels:
            K = gs.n_corners
            gidx.append(idx[D:].reshape(gs.n_levels - D, K * N // m, m))
    feats = (
        hash_scatter.gather_rows_lmajor_multi(table, tuple(gidx), cast)
        if gidx
        else ()
    )
    outs, fi = [], 0
    for gs, idx, w, D in per:
        parts = []
        if D:
            dense = _onehot_levels_lookup(table, gs, idx[:D], cast)
            parts.append(_interp_ksum(dense, w[:D], idt))
        if D < gs.n_levels:
            K = gs.n_corners
            gf = feats[fi].reshape(gs.n_levels - D, K, N, F)
            fi += 1
            parts.append(_interp_ksum(gf, w[D:], idt))
        outs.append(
            parts[0]
            if len(parts) == 1
            else jnp.concatenate([p.astype(parts[0].dtype) for p in parts], axis=0)
        )
    out = jnp.concatenate(
        [o.astype(outs[0].dtype) for o in outs], axis=0
    )  # [L_total, N, F]
    return jnp.moveaxis(out, 0, 1)  # [N, L_total, F]


def _encode_klm(
    table: Array, static: HashGridStatic, x: Array, cast: str = None
) -> Array:
    """Vertex-major encode core: x [..., 3] → [N, L, F_table].

    Gather rows are shaped [L, K·N/m, m] (minor-m emitted loop, default
    m=32 like pack32, but grouping m same-vertex points instead of
    transposing g points × K vertices — the reshape is free), the
    K-contraction sums K contiguous [N, F] slabs per level, and the
    backward sort stream is idx.reshape(L, K·N).
    """
    lead = x.shape[:-1]
    N = int(np.prod(lead)) if lead else 1
    xf = x.reshape(N, 3)
    L, K = static.n_levels, static.n_corners
    # AVR_TPU_PAD_F2=1: widen F=2 tables to F=4 with zero features for
    # the gather. The only dense layout for a narrow bf16 [M, 2] gather
    # output is entry-minor {0,1:T(2,128)}, which XLA's emitter writes
    # at ~11.6 ns/row; the F=4 output shape matches the (pair-fused)
    # flagship's, measured at ~4.4-6.5 ns/row. Costs one extra bf16
    # payload operand in the backward sort. The zero half is sliced off
    # after the K-contraction (autodiff pads the cotangent back).
    m = int(os.environ.get("AVR_TPU_KLM_MINOR", "32"))
    if N % m:
        return _encode_lm(table, static, x, cast)
    _p2 = os.environ.get("AVR_TPU_PAD_F2", "0")
    pad2 = table.shape[-1] == 2 and (
        _p2 == "force" or (_p2 == "1" and hash_scatter.on_tpu())
    )
    if pad2:
        table = jnp.concatenate([table, jnp.zeros_like(table)], axis=-1)
    F = table.shape[-1]
    idx, w = _indices_weights_klm(static, xf)  # [L, K, N]
    D = _n_onehot_levels(static, F)
    idt = os.environ.get("AVR_TPU_INTERP_DTYPE", "bfloat16")

    def interp(feats, wl):
        return _interp_ksum(feats, wl, idt)

    # AVR_TPU_GATHER_PACK2: F=2 bf16 tables gather ONE packed f32 word
    # per row (dense output layout) instead of an entry-minor bf16
    # [M, 2] — see hash_scatter.gather_rows_packed2. The interpolation
    # then runs on two per-feature planes with no [L,K,N,F] tensor at
    # all. "auto" = off pending hardware A/B; "1" forces on (CPU too —
    # the bit math is backend-neutral).
    _pk2 = os.environ.get("AVR_TPU_GATHER_PACK2", "auto")
    pk2 = (
        F == 2 and cast == "bfloat16" and not pad2
        and (_pk2 == "1" or (_pk2 == "auto" and False))
    )
    # F=4 analog (the pair-fused flagship table): one complex64 word per
    # row — see hash_scatter.gather_rows_packed4
    pk4 = (
        F == 4 and cast == "bfloat16"
        and os.environ.get("AVR_TPU_GATHER_PACK4", "auto") == "1"
    )

    parts = []
    if D:
        dense = _onehot_levels_lookup(table, static, idx[:D], cast)
        parts.append(interp(dense, w[:D]))
    if D < L:
        if pk2 or pk4:
            planes = (
                hash_scatter.gather_rows_packed2(table, idx[D:]) if pk2
                else hash_scatter.gather_rows_packed4(table, idx[D:])
            )
            wg = w[D:]
            if idt == "bfloat16":
                planes = [p.astype(jnp.bfloat16) for p in planes]
                wg = wg.astype(jnp.bfloat16)
            parts.append(
                jnp.stack([(p * wg).sum(axis=1) for p in planes], axis=-1)
            )
        else:
            gfeats = hash_scatter.gather_rows_lmajor(
                table, idx[D:].reshape(L - D, K * N // m, m), cast,
                _level_bounds(static, D),
            ).reshape(L - D, K, N, F)
            parts.append(interp(gfeats, w[D:]))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(
        [p.astype(parts[0].dtype) for p in parts], axis=0
    )  # [L, N, F]
    if pad2:
        out = out[..., :2]
    return jnp.moveaxis(out, 0, 1)  # [N, L, F]


def _encode_lm(
    table: Array, static: HashGridStatic, x: Array, cast: str = None
) -> Array:
    """Level-major encode core: x [..., 3] → [N, L, F_table].

    Every regrouping is a contiguous reshape (no transposes except the
    single final [L,N,F] → [N,L,F] move, 4–8× smaller than transposing
    the gathered corner features): gather rows pack as [L, N/g, g·K] for
    a minor-32 emitted loop, the K-contraction reshapes in place, and the
    backward's per-level sort stream is idx.reshape(L, −1). Level-major
    also walks each table segment consecutively during the gather.
    """
    lead = x.shape[:-1]
    N = int(np.prod(lead)) if lead else 1
    xf = x.reshape(N, 3)
    idx, w = _indices_weights_lm(static, xf)  # [L, N, K]
    L, K = static.n_levels, static.n_corners
    F = table.shape[-1]
    g = 32 // K if (32 % K == 0 and N % max(1, 32 // K) == 0) else 1
    # The cast-to-compute-dtype happens INSIDE the gather op so the
    # backward returns the fp32 scatter output directly (see
    # gather_rows_lmajor).
    feats = hash_scatter.gather_rows_lmajor(
        table, idx.reshape(L, N // g, g * K), cast, _level_bounds(static, 0)
    )  # [L, N/g, g*K, F]
    # With a bf16 table the weight multiply + K-sum default to bf16
    # (~2-3 ms/step: interp intermediates halve their bytes and the feats
    # cotangent is born bf16). Training-quality A/B over two seeds
    # (scripts/interp_prec_quality.py, 1500 iters): the bf16-vs-fp32
    # metric differences flip sign between seeds — seed noise dominates,
    # no systematic loss. AVR_TPU_INTERP_DTYPE=float32 forces exact
    # interpolation; fp32 tables (oracle/parity) always use it.
    idt = os.environ.get("AVR_TPU_INTERP_DTYPE", "bfloat16")
    if idt == "bfloat16" and feats.dtype == jnp.bfloat16:
        w = w.astype(feats.dtype)
    else:
        feats = feats.astype(w.dtype)
    prod = feats * w.reshape(L, N // g, g * K)[..., None]
    out = prod.reshape(L, N // g, g, K, F).sum(axis=3).reshape(L, N, F)
    return jnp.moveaxis(out, 0, 1)  # [N, L, F]


def _enc_layout() -> str:
    # measured on the flagship bench: klm 26.8k / level 24.4k / point
    # 21.1k rays/s ("klm" = level-major with the vertex axis second and
    # points minor; "level" = [L, N, K]; "point" = the original [..., L, K])
    return os.environ.get("AVR_TPU_ENCODE_LAYOUT", "klm")


def encode(
    table: Array, static: HashGridStatic, x: Array, compute_dtype=None
) -> Array:
    """Encode points x ∈ [0,1]³, shape [..., 3] → [..., L·F].

    Single batched gather over all levels and corners followed by trilinear
    interpolation. With a bf16 ``compute_dtype`` the table is cast BEFORE
    the gather: XLA's TPU row gather is byte-bound (16-byte rows move
    ~2.4x faster than 32-byte rows, measured), and the consumers are bf16
    matmuls anyway; interpolation still accumulates in fp32.
    """
    n_pts = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    groups = _hybrid_groups(static, table.shape[-1], n_pts)
    if groups is not None:
        # mixed interpolation: encode each contiguous same-mode level
        # group at its own K and concatenate level-major — the flattened
        # [..., L·F] layout is level-major, so group concat along the
        # last axis reproduces the pure-mode output ordering exactly.
        if (
            _enc_layout() == "klm"
            and os.environ.get("AVR_TPU_GROUP_GATHER", "0") == "1"
        ):
            cast = (
                jnp.dtype(compute_dtype).name
                if compute_dtype is not None and compute_dtype != table.dtype
                else None
            )
            out = _encode_klm_groups(table, groups, x, cast)
            if out is not None:
                return out.reshape(
                    *x.shape[:-1], static.n_levels * static.n_features
                )
        return jnp.concatenate(
            [encode(table, g, x, compute_dtype) for g in groups], axis=-1
        )
    layout = _enc_layout()
    if layout in ("klm", "level"):
        cast = (
            jnp.dtype(compute_dtype).name
            if compute_dtype is not None and compute_dtype != table.dtype
            else None
        )
        core = _encode_klm if layout == "klm" else _encode_lm
        out = core(table, static, x, cast)
        return out.reshape(*x.shape[:-1], static.n_levels * static.n_features)
    if compute_dtype is not None and compute_dtype != table.dtype:
        table = table.astype(compute_dtype)
    idx, w = _indices_weights(static, x)  # [..., L, K] each
    # gather with TPU-native scatter-add backward (avr_tpu/ops/hash_scatter)
    feats = hash_scatter.gather_rows_leveled(table, idx)  # [..., L, K, F]
    out = jnp.sum(feats.astype(x.dtype) * w[..., None], axis=-2)  # [..., L, F]
    return out.reshape(*x.shape[:-1], static.n_levels * static.n_features)


def encode_pair(
    table_a: Array,
    table_b: Array,
    static: HashGridStatic,
    x: Array,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """Encode through TWO same-geometry tables with ONE gather.

    When two encodings share an identical HashGridStatic and identical
    input points (e.g. the complex field's pos_encoding_sigma and
    pos_encoding_sig, reference/model.py:258-259 with equal configs),
    their corner indices coincide — concatenating the tables feature-wise
    halves the gather rows forward and the scatter-add updates backward.
    Returns (enc_a, enc_b), each [..., L·F].

    Production code should store the two tables pre-fused as one
    [rows, 2F] parameter and call :func:`encode_pair_fused` — the
    per-step concat here (and its split + layout copies in the backward)
    measured ~14 ms/step on the flagship workload.
    """
    fused = jnp.concatenate([table_a, table_b], axis=-1)  # [total, 2F]
    return encode_pair_fused(fused, static, x, compute_dtype=compute_dtype)


def encode_pair_fused(
    fused: Array,
    static: HashGridStatic,
    x: Array,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """encode_pair for a pre-fused [rows, 2F] table parameter."""
    Fh = static.n_features
    lead = x.shape[:-1]

    n_pts = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    groups = _hybrid_groups(static, fused.shape[-1], n_pts)
    if groups is not None:
        if (
            _enc_layout() == "klm"
            and os.environ.get("AVR_TPU_GROUP_GATHER", "0") == "1"
        ):
            cast = (
                jnp.dtype(compute_dtype).name
                if compute_dtype is not None and compute_dtype != fused.dtype
                else None
            )
            out = _encode_klm_groups(fused, groups, x, cast)  # [N, L, 2F]
            if out is not None:
                L = static.n_levels
                return (
                    out[..., :Fh].reshape(*lead, L * Fh),
                    out[..., Fh:].reshape(*lead, L * Fh),
                )
        outs = [encode_pair_fused(fused, g, x, compute_dtype) for g in groups]
        return (
            jnp.concatenate([o[0] for o in outs], axis=-1),
            jnp.concatenate([o[1] for o in outs], axis=-1),
        )
    layout = _enc_layout()
    if layout in ("klm", "level"):
        cast = (
            jnp.dtype(compute_dtype).name
            if compute_dtype is not None and compute_dtype != fused.dtype
            else None
        )
        core = _encode_klm if layout == "klm" else _encode_lm
        out = core(fused, static, x, cast)  # [N, L, 2F]
        return (
            out[..., :Fh].reshape(*lead, static.n_levels * Fh),
            out[..., Fh:].reshape(*lead, static.n_levels * Fh),
        )
    if compute_dtype is not None and compute_dtype != fused.dtype:
        fused = fused.astype(compute_dtype)  # halves gather bytes (see encode)

    idx, w = _indices_weights(static, x)  # [..., L, K] each
    feats = hash_scatter.gather_rows_leveled(fused, idx)  # [..., L, K, 2F]
    out = jnp.sum(feats * w[..., None], axis=-2)  # [..., L, 2F]
    return (
        out[..., :Fh].reshape(*lead, static.n_levels * Fh),
        out[..., Fh:].reshape(*lead, static.n_levels * Fh),
    )


# ----------------------------------------------------------------------
# Frequency (NeRF positional) encoding — lightweight fallback for configs
# that request otype: Frequency, and a hash-free baseline for tests.
# ----------------------------------------------------------------------
def frequency_encode(x: Array, n_frequencies: int) -> Array:
    """sin/cos positional encoding: [..., 3] → [..., 3·2·n_frequencies]."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype) * jnp.pi
    ang = x[..., :, None] * freqs  # [..., 3, K]
    enc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(*x.shape[:-1], 3 * 2 * n_frequencies)
