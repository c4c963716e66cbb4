"""Reference-faithful renderer — the numerical oracle.

A direct, fully-vectorized jnp statement of the algorithm in
reference/renderer.py:31-124 / renderer_cpu.py:23-102 (the reference's own
CPU correctness path): one batched field query over all bs·R·S points,
causality masks, per-shell path loss, rFFT + fractional phase delay,
alpha-compositing, spherical integration. It materializes the
[bs, R, S, F] spectrum like the reference does, so it is only meant for
small shapes: unit tests, golden parity checks against
avr_tpu.render.fused, and CPU-runnable evaluation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from avr_tpu import geometry
from avr_tpu.config import RenderConfig
from avr_tpu.models import field as field_lib
from avr_tpu.render.common import RenderConsts, compositing_weights, head_delay_mask

Array = jax.Array


def render_oracle(
    params,
    fstatic: field_lib.FieldStatic,
    consts: RenderConsts,
    rc: RenderConfig,
    rays_o: Array,
    position_tx: Array,
    direction_tx: Optional[Array] = None,
    ch_idx: Optional[Array] = None,
    key: Optional[Array] = None,
    dirs: Optional[Array] = None,
) -> Array:
    """Render received IR spectra.

    rays_o/position_tx: [bs, 3] world coords; direction_tx: [bs, 3] unit
    (complex variant); ch_idx: [bs] int32 or None; key: PRNG key for the
    random azimuth offsets (None → deterministic grid); dirs: optionally
    precomputed ray directions [R, 3] (overrides key).

    Returns [bs, F, 2] (real/imag), F = T//2+1.
    """
    xyz_min = jnp.asarray(rc.xyz_min, jnp.float32)
    xyz_max = jnp.asarray(rc.xyz_max, jnp.float32)
    T = fstatic.signal_output_dim

    if dirs is None:
        dirs = geometry.ray_directions(rc.n_azi, rc.n_ele, key=key)
    d_vals = consts.d_vals
    pts = geometry.ray_points(rays_o, dirs, d_vals)  # [bs, R, S, 3]
    bs, R, S, _ = pts.shape

    pts_n = geometry.normalize_points(pts, xyz_min, xyz_max)
    view = jnp.broadcast_to(-dirs[None, :, None, :], pts.shape)
    tx_n = geometry.normalize_points(position_tx, xyz_min, xyz_max)
    tx_b = jnp.broadcast_to(tx_n[:, None, None, :], pts.shape)
    tx_view_b = (
        jnp.broadcast_to(direction_tx[:, None, None, :], pts.shape)
        if direction_tx is not None
        else None
    )
    ch_b = (
        jnp.broadcast_to(ch_idx[:, None, None], pts.shape[:-1])
        if ch_idx is not None
        else None
    )

    attn, signal = field_lib.apply(
        params, fstatic, pts_n, view, tx_b, tx_view=tx_view_b, ch_idx=ch_b
    )
    attn = attn[..., 0]  # [bs, R, S]

    # Causality masks (reference/renderer.py:79-90).
    signal = signal * consts.tail_mask[None, None, :, :]
    dist_tx = jnp.linalg.norm(position_tx[:, None, None, :] - pts, axis=-1)
    signal = signal * head_delay_mask(dist_tx, rc.fs, rc.speed, T)

    # Path loss, rFFT, fractional phase delay (renderer.py:96-109).
    spec = jnp.fft.rfft(signal * consts.pathloss[None, None, :, :], axis=-1)
    spec = spec * (consts.phase_re + 1j * consts.phase_im)[None, None, :, :]

    # Alpha-composite along rays, integrate over the sphere (:115-121).
    w = compositing_weights(attn, d_vals)  # [bs, R, S]
    ray_sig = jnp.sum(spec * w[..., None].astype(spec.dtype), axis=-2)  # [bs, R, F]
    out = jnp.sum(ray_sig, axis=-2)  # [bs, F]
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
