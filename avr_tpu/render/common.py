"""Shared rendering math: static constants, masks, compositing weights.

Everything that depends only on the render config (sample distances, the
per-shell propagation delays, tail masks, path-loss slices and phase
factors) is precomputed once in numpy — the radial sample grid is
deterministic (reference/renderer.py:54), so all of it folds into the
compiled program as constants instead of being recomputed per step as the
reference does (renderer.py:79-109).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.config import RenderConfig

Array = jax.Array


class RenderConsts(NamedTuple):
    """Static per-config rendering constants.

    T = signal length (time samples), S = n_samples, F = T//2+1.
    """

    d_vals: Array  # [S] radial sample distances
    pts2rx: Array  # [S] fractional delay (samples) point→receiver
    shift: Array  # [S] int32 rounded delay, drives masks & path loss
    tail_mask: Array  # [S, T] zero out the last `shift` samples
    pathloss: Array  # [S, T] per-shell 1/d attenuation slice
    phase_re: Array  # [S, F] Re e^{−j2πk·pts2rx/T}
    phase_im: Array  # [S, F] Im e^{−j2πk·pts2rx/T}


def make_consts(rc: RenderConfig, signal_len: int) -> RenderConsts:
    T = int(signal_len)
    F = T // 2 + 1
    S = rc.n_samples

    d_vals = np.linspace(0.0, 1.0, S, dtype=np.float64) * (rc.far - rc.near) + rc.near
    pts2rx = rc.fs * d_vals / rc.speed  # [S], fractional samples
    # np.round matches torch.round (half-to-even), reference/renderer.py:80.
    shift = np.round(pts2rx).astype(np.int64)

    # Tail mask: zero where (T−1−t) − shift ≤ 0 (reference/renderer.py:82).
    t_rev = np.arange(T - 1, -1, -1, dtype=np.float64)[None, :]  # [1, T]
    tail = (t_rev - shift[:, None] > 0).astype(np.float32)  # [S, T]

    # Path loss lookup over a 2.5×T grid with near-field clamp of the first
    # int(0.1/c·fs) samples (reference/renderer.py:96-100).
    prev = int(0.1 / rc.speed * rc.fs)
    # The reference uses a fixed 2.5·T grid, which silently truncates when
    # round(fs·far/c) > 1.5·T (impossible on reference configs, easy to hit
    # on short test IRs) — extend the grid so every shell slice is full.
    grid_len = max(int(T * 2.5), int(shift.max()) + T)
    grid = np.arange(0, grid_len, dtype=np.float64) / rc.fs * rc.speed
    pl = rc.pathloss / (grid + 1e-3)
    pl[0:prev] = pl[prev + 1]
    pl_shell = np.stack([pl[s : s + T] for s in shift]).astype(np.float32)  # [S, T]

    # Frequency-domain fractional delay (reference/renderer.py:108): the
    # UNROUNDED pts2rx drives the phase; rounding only affects masks/loss.
    k = np.arange(F, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi / T * k * pts2rx[:, None]  # [S, F]

    return RenderConsts(
        d_vals=jnp.asarray(d_vals, jnp.float32),
        pts2rx=jnp.asarray(pts2rx, jnp.float32),
        shift=jnp.asarray(shift, jnp.int32),
        tail_mask=jnp.asarray(tail),
        pathloss=jnp.asarray(pl_shell),
        phase_re=jnp.asarray(np.cos(ang), jnp.float32),
        phase_im=jnp.asarray(np.sin(ang), jnp.float32),
    )


def compositing_weights(attn: Array, d_vals: Array) -> Array:
    """Acoustic volume-rendering weights w = transmittance × alpha.

    attn: [..., S] non-negative attenuation coefficients.
    Mirrors reference/renderer.py:181-192: the last integration interval is
    1e10 (opaque), transmittance is the exclusive cumprod of (1−α+1e−6).
    """
    dists = jnp.concatenate(
        [d_vals[1:] - d_vals[:-1], jnp.full((1,), 1e10, d_vals.dtype)]
    )
    alpha = 1.0 - jnp.exp(-attn * dists)
    one = jnp.ones((*alpha.shape[:-1], 1), alpha.dtype)
    trans = jnp.cumprod(
        jnp.concatenate([one, 1.0 - alpha + 1e-6], axis=-1), axis=-1
    )[..., :-1]
    return trans * alpha


def head_delay_mask(dist_tx: Array, fs: float, speed: float, T: int) -> Array:
    """Causality mask zeroing the signal before sound can reach the point.

    dist_tx: [...] world-space ‖tx − point‖. Returns float mask [..., T]
    with 1 where t ≥ round(dist·fs/c) clamped to [0, T−1]
    (reference/renderer.py:86-90; round ⇒ zero gradient w.r.t. geometry,
    a documented reference semantic we preserve).

    Note: the reference computes this distance by passing the *difference*
    of normalized coordinates through denormalize_points
    (renderer.py:86), which adds a spurious (xyz_max+xyz_min)/2 offset;
    every reference config uses a symmetric box so the offset is zero
    there. We compute the true world-space distance — identical on all
    reference configs, correct in general.
    """
    delay = jnp.clip(jnp.round(dist_tx * fs / speed), 0, T - 1)
    t = jnp.arange(T, dtype=delay.dtype)
    return (t >= delay[..., None]).astype(jnp.float32)
