"""Fused production renderer — the TPU performance core.

Same math as avr_tpu.render.oracle (and therefore as
reference/renderer.py:31-124), restructured for the TPU memory hierarchy.
The reference materializes a [bs, R, S, F] complex spectrum — its peak-
memory pain point, mitigated there with `torch.cuda.empty_cache()` calls
(renderer.py:64-122). Here that tensor never exists:

  1. **Attenuation pass** — a `lax.scan` over sample shells evaluates only
     the sigma branch for all points ([bs, R, S] scalars kept), then the
     compositing weights w = transmittance·α are formed once.
  2. **Signal pass** — a second shell scan evaluates the signal network
     per shell ([bs, R, C, T]), applies causality masks, and immediately
     contracts over rays: y[b,c,t] = Σ_r w·mask·signal. Only then does the
     rFFT + fractional phase delay run — on the ray-REDUCED [bs, C, T]
     signal — and accumulate into the [bs, F] output spectrum.
  3. Direction/tx encodings are computed once per ray / per batch element
     and folded into the signal network's first matmul
     (field.signal_context / signal_from_parts), cutting hash-grid
     traffic ~3× versus the reference's per-point concatenation.

Peak live memory is O(bs·R·C·T) for one shell chunk instead of
O(bs·R·S·F·8B); with ``remat=True`` the backward pass recomputes each
shell's activations, so the same bound holds for training. All matmuls run
on the MXU in a configurable compute dtype (bf16 default) with fp32
accumulation; masks, compositing and FFT stay fp32.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from avr_tpu import geometry
from avr_tpu.config import RenderConfig
from avr_tpu.models import field as field_lib
from avr_tpu.render.common import RenderConsts, compositing_weights, head_delay_mask

Array = jax.Array


@jax.custom_vjp
def _ray_contract(w: Array, masked: Array) -> Array:
    """Spherical pre-reduction y[b,c,t] = Σ_r w[b,r,c]·masked[b,r,c,t].

    ``masked`` arrives in the signal compute dtype (bf16 on the hot path —
    the [bs,R,C,T] signal tensor is the biggest bandwidth stream of the
    render, and its masks are exact 0/1 in bf16). The custom VJP keeps both
    directions on single-pass bf16 MXU matmuls with fp32 accumulation; the
    default AD rule would contract the fp32 output cotangent against bf16
    operands, which XLA promotes to multi-pass fp32 matmuls.
    """
    return jax.lax.dot_general(
        w.astype(masked.dtype), masked,
        dimension_numbers=(((1,), (1,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32,
    )


def _ray_contract_fwd(w, masked):
    y = jax.lax.dot_general(
        w.astype(masked.dtype), masked,
        dimension_numbers=(((1,), (1,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32,
    )
    return y, (w, masked)


def _ray_contract_bwd(res, g):
    w, masked = res
    gc = g.astype(masked.dtype)  # [b, c, t]
    d_masked = w.astype(masked.dtype)[:, :, :, None] * gc[:, None, :, :]
    d_w = jax.lax.dot_general(
        masked, gc,
        dimension_numbers=(((3,), (2,)), ((0, 2), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [b, c, r]
    return d_w.transpose(0, 2, 1).astype(w.dtype), d_masked


_ray_contract.defvjp(_ray_contract_fwd, _ray_contract_bwd)


def _pick_chunk(n_samples: int, requested: int) -> int:
    c = max(1, min(requested, n_samples))
    while n_samples % c:
        c -= 1
    return c


def _remat_wrap(fn, remat):
    """Wrap a scan body per the rematerialization spec.

    ``remat`` (TrainConfig.remat / render_fused arg; AVR_TPU_REMAT env
    overrides for A/B): True/"full" = bare jax.checkpoint (recompute
    everything in the backward — the measured default: residual traffic
    beats recompute on every workload tried, docs/PERFORMANCE.md);
    False/"none" = save all residuals; "dots" =
    jax.checkpoint_policies.dots_saveable (save MXU matmul outputs,
    recompute the cheap elementwise/gather glue); "dots_nb" =
    dots_with_no_batch_dims_saveable (save only non-batch contractions).
    """
    spec = os.environ.get("AVR_TPU_REMAT") or remat
    if spec in (False, "none", "0"):
        return fn
    if spec in (True, "full", "1"):
        return jax.checkpoint(fn)
    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_nb": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if str(spec) not in policies:
        raise ValueError(
            f"unrecognized remat spec {spec!r} (AVR_TPU_REMAT or config "
            "remat): expected one of none/full/dots/dots_nb"
        )
    return jax.checkpoint(fn, policy=policies[str(spec)])


def render_fused(
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
    compute_dtype=jnp.bfloat16,
    shell_chunk: int = 1,
    remat="full",
    point_budget: int = 4_000_000,
    ray_weights: Optional[Array] = None,
) -> Array:
    """Render received IR spectra [bs, F, 2]. Same contract as render_oracle.

    Two execution plans share the same math:

    * **precomputed** (bs·R·S ≤ point_budget, the common case): hash
      encodings + sigma features for ALL sample points are evaluated in
      one vectorized pass — each hash table sees exactly one gather
      forward and one scatter-add backward per step — and the shell scan
      only runs the matmul-only signal tail + masks + reduction + FFT.
      Per-point features are tens of MB, far below the [bs,R,S,T] signal
      tensor the scan still avoids.
    * **streaming** (huge configs): the original plan where the sigma
      branch is recomputed per shell inside the scan, bounding live
      memory by one shell chunk at the cost of per-shell gathers.
    """
    xyz_min = jnp.asarray(rc.xyz_min, jnp.float32)
    xyz_max = jnp.asarray(rc.xyz_max, jnp.float32)
    T = fstatic.signal_output_dim
    F = T // 2 + 1
    S = rc.n_samples
    C = _pick_chunk(S, shell_chunk)
    n_chunks = S // C

    if dirs is None:
        dirs = geometry.ray_directions(rc.n_azi, rc.n_ele, key=key)
    R = dirs.shape[0]
    bs = rays_o.shape[0]
    d_vals = consts.d_vals

    tx_n = geometry.normalize_points(position_tx, xyz_min, xyz_max)  # [bs, 3]
    is_complex = fstatic.variant == "complex"
    ch_b = ch_idx[:, None, None] if ch_idx is not None else None  # [bs,1,1]

    def shell_points(d_c: Array) -> Array:
        """World-space sample points for one chunk of shells: [bs,R,C,3]."""
        return (
            rays_o[:, None, None, :]
            + dirs[None, :, None, :] * d_c[None, None, :, None]
        )

    precompute = bs * R * S <= point_budget

    # ---------------- per-ray / per-batch signal context ----------------
    h_ray, h_batch = field_lib.signal_context(
        params, fstatic, dirs, tx_n,
        tx_view=direction_tx, ch_idx=ch_idx, compute_dtype=compute_dtype,
    )
    h_extra = h_ray[None, :, None, :] + h_batch[:, None, None, :]  # [bs,R,1,W]

    # ---------------- pass 1: per-point features + attenuation ----------
    if precompute:
        pts_all = shell_points(d_vals)  # [bs, R, S, 3]
        pts_n_all = geometry.normalize_points(pts_all, xyz_min, xyz_max)
        tx_q = tx_n[:, None, None, :] if is_complex else None
        sigma_feat_all, attn_all, psig_all = field_lib.point_features(
            params, fstatic, pts_n_all, tx=tx_q, ch_idx=ch_b,
            compute_dtype=compute_dtype,
        )
        attn = attn_all[..., 0]
        dist_all = jnp.linalg.norm(
            position_tx[:, None, None, :] - pts_all, axis=-1
        )  # [bs, R, S]
    else:
        def attn_body(carry, d_c):
            pts = shell_points(d_c)
            pts_n = geometry.normalize_points(pts, xyz_min, xyz_max)
            tx_q = tx_n[:, None, None, :] if is_complex else None
            _, a = field_lib.sigma_query(
                params, fstatic, pts_n, tx=tx_q, ch_idx=ch_b,
                compute_dtype=compute_dtype,
            )
            return carry, a[..., 0]  # [bs, R, C]

        body_a = _remat_wrap(attn_body, remat)
        _, attn_chunks = jax.lax.scan(body_a, None, d_vals.reshape(n_chunks, C))
        attn = attn_chunks.transpose(1, 2, 0, 3).reshape(bs, R, S)

    w = compositing_weights(attn, d_vals)  # [bs, R, S]
    if ray_weights is not None:
        # per-ray contribution scale; rays enter the output only through
        # w (the compositing weights multiply the signal stream), so a
        # zero entry removes a ray exactly. Used by the sharded train
        # step to pad R to a multiple of the mesh ray axis with inert
        # rays (balanced shards, no SPMD halo padding).
        w = w * ray_weights.astype(w.dtype)[None, :, None]

    # ---------------- pass 2: signal tail + reduce + spectrum -----------
    xs = [
        d_vals.reshape(n_chunks, C),
        w.reshape(bs, R, n_chunks, C).transpose(2, 0, 1, 3),  # [n,bs,R,C]
        consts.tail_mask.reshape(n_chunks, C, T),
        consts.pathloss.reshape(n_chunks, C, T),
        consts.phase_re.reshape(n_chunks, C, F),
        consts.phase_im.reshape(n_chunks, C, F),
    ]
    # AVR_TPU_SCAN_SLICE=1: instead of pre-stacking the per-point feature
    # tensors chunk-major for lax.scan (a transpose copy of each), close
    # over the [bs,R,S,·] arrays and dynamic-slice the shell axis inside
    # the body. The per-chunk consts reshapes stay in xs (leading-axis
    # splits, free).
    scan_slice = precompute and os.environ.get("AVR_TPU_SCAN_SLICE", "0") == "1"
    if precompute and not scan_slice:
        D = sigma_feat_all.shape[-1]
        xs.append(
            sigma_feat_all.reshape(bs, R, n_chunks, C, D).transpose(2, 0, 1, 3, 4)
        )
        xs.append(
            None
            if psig_all is None
            else psig_all.reshape(bs, R, n_chunks, C, -1).transpose(2, 0, 1, 3, 4)
        )
        xs.append(dist_all.reshape(bs, R, n_chunks, C).transpose(2, 0, 1, 3))
        xs = tuple(x for x in xs if x is not None)
    elif scan_slice:
        xs[1] = jnp.arange(n_chunks, dtype=jnp.int32)  # chunk index i
        xs = tuple(xs)

    # AVR_TPU_SIGNAL_DTYPE ∈ {float32, bfloat16, auto}: dtype of the
    # [bs,R,C,T] signal stream through the masks + ray contraction
    # (_ray_contract keeps both directions on single-pass bf16 MXU).
    # Measured on the flagship (v5e): bf16 is perf-NEUTRAL (84.3 vs
    # 84.2 ms — the pass is not bandwidth-bound after the klm encode
    # rework), so the default stays exact fp32; "auto" follows
    # compute_dtype for experiments.
    sdt = os.environ.get("AVR_TPU_SIGNAL_DTYPE", "float32")
    sig_bf16 = sdt == "bfloat16" or (
        sdt == "auto"
        and compute_dtype is not None
        and jnp.dtype(compute_dtype) == jnp.bfloat16
    )

    def spectrum_accumulate(signal, dist_tx, w_c, tail_c, pl_c, ph_re, ph_im, carry):
        acc_re, acc_im = carry
        head = head_delay_mask(dist_tx, rc.fs, rc.speed, T)  # [bs, R, C, T]
        if sig_bf16:
            mask = (head * tail_c[None, None, :, :]).astype(jnp.bfloat16)
            masked = signal.astype(jnp.bfloat16) * mask
            y = _ray_contract(w_c, masked)  # [bs, C, T] fp32
        else:
            masked = signal * head * tail_c[None, None, :, :]
            # Spherical pre-reduction: contract rays BEFORE the FFT.
            y = jnp.einsum("brc,brct->bct", w_c, masked)  # [bs, C, T]
        spec = jnp.fft.rfft(y * pl_c[None, :, :], axis=-1)  # [bs, C, F]
        re = jnp.real(spec) * ph_re - jnp.imag(spec) * ph_im
        im = jnp.real(spec) * ph_im + jnp.imag(spec) * ph_re
        return (acc_re + jnp.sum(re, axis=1), acc_im + jnp.sum(im, axis=1))

    if scan_slice:

        def signal_body(carry, x):
            d_c, i, tail_c, pl_c, ph_re, ph_im = x
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * C, C, axis=2)
            w_c = sl(w)  # [bs, R, C]
            feat_c = sl(sigma_feat_all)
            psig_c = None if psig_all is None else sl(psig_all)
            dist_c = sl(dist_all)
            signal = field_lib.signal_tail_from_features(
                params, fstatic, feat_c, psig_c, h_extra,
                ch_idx=ch_b, compute_dtype=compute_dtype,
            )  # [bs, R, C, T] fp32
            return (
                spectrum_accumulate(
                    signal, dist_c, w_c, tail_c, pl_c, ph_re, ph_im, carry
                ),
                None,
            )
    elif precompute:
        has_psig = is_complex

        def signal_body(carry, x):
            if has_psig:
                d_c, w_c, tail_c, pl_c, ph_re, ph_im, feat_c, psig_c, dist_c = x
            else:
                d_c, w_c, tail_c, pl_c, ph_re, ph_im, feat_c = x[:7]
                psig_c, dist_c = None, x[7]
            signal = field_lib.signal_tail_from_features(
                params, fstatic, feat_c, psig_c, h_extra,
                ch_idx=ch_b, compute_dtype=compute_dtype,
            )  # [bs, R, C, T] fp32
            return (
                spectrum_accumulate(
                    signal, dist_c, w_c, tail_c, pl_c, ph_re, ph_im, carry
                ),
                None,
            )
    else:

        def signal_body(carry, x):
            d_c, w_c, tail_c, pl_c, ph_re, ph_im = x
            pts = shell_points(d_c)  # [bs, R, C, 3]
            pts_n = geometry.normalize_points(pts, xyz_min, xyz_max)
            tx_q = tx_n[:, None, None, :] if is_complex else None
            sigma_feat, _ = field_lib.sigma_query(
                params, fstatic, pts_n, tx=tx_q, ch_idx=ch_b,
                compute_dtype=compute_dtype,
            )
            signal = field_lib.signal_from_parts(
                params, fstatic, sigma_feat, pts_n, h_extra,
                ch_idx=ch_b, compute_dtype=compute_dtype,
            )  # [bs, R, C, T] fp32
            dist_tx = jnp.linalg.norm(position_tx[:, None, None, :] - pts, axis=-1)
            return (
                spectrum_accumulate(
                    signal, dist_tx, w_c, tail_c, pl_c, ph_re, ph_im, carry
                ),
                None,
            )

    body_s = _remat_wrap(signal_body, remat)
    init = (jnp.zeros((bs, F), jnp.float32), jnp.zeros((bs, F), jnp.float32))
    (out_re, out_im), _ = jax.lax.scan(body_s, init, tuple(xs))
    return jnp.stack([out_re, out_im], axis=-1)
