"""Geometry semantics vs the reference's construction (renderer.py:133-165)."""

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu import geometry


def test_ray_directions_deterministic_grid():
    dirs = np.asarray(geometry.ray_directions(6, 3))
    assert dirs.shape == (6 * 3 + 2, 3)
    # all unit vectors
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)
    # poles appended last (reference/renderer.py:164)
    np.testing.assert_allclose(dirs[-2], [0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(dirs[-1], [0, 0, -1], atol=1e-7)
    # first grid direction: azi=0, ele=acos(2·u1−1) with u1 = 1/(n_ele+1)
    u1 = 1.0 / 4.0
    ele = np.arccos(2 * u1 - 1)
    np.testing.assert_allclose(dirs[0], [np.sin(ele), 0.0, np.cos(ele)], atol=1e-6)


def test_ray_directions_random_offsets_bounded():
    key = jax.random.PRNGKey(3)
    base = np.asarray(geometry.ray_directions(8, 4))
    rand = np.asarray(geometry.ray_directions(8, 4, key=key))
    # Same elevations (z component unchanged), azimuth offsets < 2π/n_azi.
    np.testing.assert_allclose(base[:, 2], rand[:, 2], atol=1e-6)
    azi_base = np.arctan2(base[:-2, 1], base[:-2, 0]) % (2 * np.pi)
    azi_rand = np.arctan2(rand[:-2, 1], rand[:-2, 0]) % (2 * np.pi)
    delta = (azi_rand - azi_base) % (2 * np.pi)
    assert np.all(delta <= 2 * np.pi / 8 + 1e-5)


def test_elevation_uniform_in_cos():
    dirs = np.asarray(geometry.ray_directions(4, 5))[:-2].reshape(4, 5, 3)
    cos_ele = dirs[0, :, 2]
    expected = 2 * np.linspace(0, 1, 7)[1:-1] - 1
    np.testing.assert_allclose(np.sort(cos_ele), np.sort(expected), atol=1e-6)


def test_sampling_and_points():
    d = geometry.sample_distances(0.5, 2.5, 5)
    np.testing.assert_allclose(np.asarray(d), [0.5, 1.0, 1.5, 2.0, 2.5], atol=1e-6)
    rays_o = jnp.asarray([[1.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 1.0, 0.0]])
    pts = np.asarray(geometry.ray_points(rays_o, dirs, d))
    assert pts.shape == (1, 1, 5, 3)
    np.testing.assert_allclose(pts[0, 0, :, 1], np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(pts[0, 0, :, 0], 1.0, atol=1e-6)


def test_normalize_roundtrip():
    lo = jnp.asarray([-2.0, -3.0, 0.0])
    hi = jnp.asarray([2.0, 5.0, 4.0])
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    n = geometry.normalize_points(x, lo, hi)
    assert np.all(np.abs(np.asarray(n)) <= 1.0)
    back = geometry.denormalize_points(n, lo, hi)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_quaternion_to_direction_matches_reference_convention():
    # identity quaternion faces −z in the reference convention → (0,−1,0)
    # after the [0,2,1] axis permutation and negation.
    d = geometry.quaternion_to_direction([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(d, [0.0, -1.0, 0.0], atol=1e-7)
    # 90° yaw about +y: q = (0, sin45, 0, cos45) → forward +x → (−1, 0, 0).
    s = np.sin(np.pi / 4)
    d = geometry.quaternion_to_direction([0.0, s, 0.0, s])
    np.testing.assert_allclose(d, [-1.0, 0.0, 0.0], atol=1e-6)
