"""Spherical ray geometry for acoustic volume rendering.

Semantics mirror reference/renderer.py:133-165 (ray_directions) and
renderer.py:54-62 (stratified sampling + box normalization), expressed as
pure functions with explicit RNG keys. The reference draws a fresh random
azimuth offset per forward call on the CUDA generator; here the offset is
key-driven (pass ``key=None`` for the deterministic grid used by tests and
evaluation). The reference's elevation jitter is dead code (multiplied by
zero, renderer.py:153) and is intentionally not reproduced.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def ray_directions(
    n_azi: int,
    n_ele: int,
    key: Optional[Array] = None,
    dtype=jnp.float32,
) -> Array:
    """Unit direction vectors on the sphere: azimuth×elevation grid + poles.

    Azimuths are an even grid over [0, 2π); when ``key`` is given each
    azimuth gets an independent uniform offset in [0, 2π/n_azi) — matching
    the reference's per-call randomization (renderer.py:148-150). Elevations
    are uniform in cos(θ) via acos(2u−1) over the open interior grid
    (renderer.py:153-154). The two poles (0,0,±1) are appended.

    Returns [n_azi*n_ele + 2, 3].
    """
    azi = jnp.linspace(0.0, 2.0 * jnp.pi, n_azi + 1, dtype=dtype)[:-1]
    if key is not None:
        azi = azi + (2.0 * jnp.pi / n_azi) * jax.random.uniform(
            key, (n_azi,), dtype=dtype
        )
    u = jnp.linspace(0.0, 1.0, n_ele + 2, dtype=dtype)[1:-1]
    ele = jnp.arccos(2.0 * u - 1.0)

    azi_g, ele_g = jnp.meshgrid(azi, ele, indexing="ij")
    sin_ele = jnp.sin(ele_g)
    dirs = jnp.stack(
        [
            jnp.cos(azi_g) * sin_ele,
            jnp.sin(azi_g) * sin_ele,
            jnp.cos(ele_g),
        ],
        axis=-1,
    ).reshape(-1, 3)
    poles = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], dtype=dtype)
    return jnp.concatenate([dirs, poles], axis=0)


def sample_distances(near: float, far: float, n_samples: int, dtype=jnp.float32) -> Array:
    """Stratified radial distances: linspace(0,1,S)·(far−near)+near.

    (reference/renderer.py:54). Returns [n_samples].
    """
    return jnp.linspace(0.0, 1.0, n_samples, dtype=dtype) * (far - near) + near


def ray_points(rays_o: Array, dirs: Array, d_vals: Array) -> Array:
    """Sample points along every ray: [bs,3] ⊗ [R,3] ⊗ [S] → [bs,R,S,3].

    (reference/renderer.py:55).
    """
    return (
        rays_o[:, None, None, :]
        + dirs[None, :, None, :] * d_vals[None, None, :, None]
    )


def normalize_points(pts: Array, xyz_min: Array, xyz_max: Array) -> Array:
    """World → [−1,1] box coordinates (reference/renderer.py:127-128)."""
    return 2.0 * (pts - xyz_min) / (xyz_max - xyz_min) - 1.0


def denormalize_points(pts: Array, xyz_min: Array, xyz_max: Array) -> Array:
    """[−1,1] box → world coordinates (reference/renderer.py:130-131)."""
    return (pts + 1.0) / 2.0 * (xyz_max - xyz_min) + xyz_min


def rotate_xy(points: Array, center: Array, angle_rad: Array) -> Array:
    """Rigidly rotate points about ``center`` in the horizontal plane.

    Used by the rotation-DoA evaluation (reference/eval_rotate_doa_avr.py:
    151-157): microphone groups are spun around their transmitter.
    """
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rel = points - center
    x = rel[..., 0] * c - rel[..., 1] * s
    y = rel[..., 0] * s + rel[..., 1] * c
    return jnp.stack([x + center[..., 0], y + center[..., 1], points[..., 2]], axis=-1)


def quaternion_to_direction(q) -> Tuple[float, float, float]:
    """Quaternion [x,y,z,w] → planar forward direction.

    Mirrors the reference's RAF loader convention
    (reference/datasets_loader.py:223-244): the forward vector is projected
    to the horizontal plane, normalized over its (x,z) components, axes
    swapped to match the [0,2,1] position permutation, and negated.
    """
    import math

    x, y, z, w = (float(v) for v in q)
    fwd_x = 2.0 * (x * z + w * y)
    fwd_z = 1.0 - 2.0 * (x * x + y * y)
    norm = math.sqrt(fwd_x * fwd_x + fwd_z * fwd_z)
    return (-fwd_x / norm, -fwd_z / norm, 0.0)
