"""Training criterion: the full AVR loss bank in JAX.

Functional re-design of reference/utils/criterion.py (Criterion, :7-126):
spectral L1 (real+imag), amplitude L1, phase sin/cos L1, time-domain L1,
energy-decay-curve L1, multi-resolution STFT loss (auraloss
MultiResolutionSTFTLoss(w_lin_mag=1, fft_sizes=[512,256,128,64],
win_lengths=[300,150,75,30], hop_sizes=[60,30,8,4]) — criterion.py:33),
and the fork's delay-and-sum beamforming losses (cross-entropy on the GT
direction bin and soft-argmax angle regression, criterion.py:35-122).

All losses are jit-able and fully differentiable. Inputs are complex
spectra packed as [..., F, 2] real/imag (the renderer's output layout) or
complex arrays; both accepted.

Reference quirks preserved for parity (SURVEY.md "Quirks"):
  * the energy-decay curve squares the already-squared spectral energy
    (criterion.py:80-83);
  * the DAS beamformer models each 8-row block of the batch as one
    8-microphone circular group on a unit circle starting at φ₀=π/2
    (criterion.py:39-52 — the reference asserts the batch is exactly
    one such group; here batches of G·8 beamform G groups and average);
  * auraloss's magnitude clamp eps=1e-8 and periodic Hann windows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.config import RenderConfig, TrainConfig
from avr_tpu.ops import stft as stft_lib

Array = jax.Array


def to_complex(x: Array) -> Array:
    """Accept [..., F, 2] real/imag stacks or complex arrays."""
    if jnp.iscomplexobj(x):
        return x
    return jax.lax.complex(x[..., 0], x[..., 1])


# ----------------------------------------------------------------------
# Multi-resolution STFT loss (auraloss semantics)
# ----------------------------------------------------------------------
@dataclass(frozen=True)
class MRSTFTConfig:
    fft_sizes: Tuple[int, ...] = (512, 256, 128, 64)
    win_lengths: Tuple[int, ...] = (300, 150, 75, 30)
    hop_sizes: Tuple[int, ...] = (60, 30, 8, 4)
    w_sc: float = 1.0
    w_log_mag: float = 1.0
    w_lin_mag: float = 1.0
    eps: float = 1e-8


# The 3-resolution variant used by the evaluation metrics
# (reference/utils/metric.py:31).
MRSTFT_METRIC = MRSTFTConfig(
    fft_sizes=(512, 256, 128), win_lengths=(300, 150, 75), hop_sizes=(60, 30, 8)
)


def multi_resolution_stft_loss(
    x: Array, y: Array, cfg: MRSTFTConfig = MRSTFTConfig()
) -> Array:
    """auraloss MultiResolutionSTFTLoss(x=input, y=target), mean-reduced.

    Per resolution: w_sc·‖y_mag−x_mag‖_F/‖y_mag‖_F (batch-mean) +
    w_log_mag·L1(log x_mag, log y_mag) + w_lin_mag·L1(x_mag, y_mag);
    averaged over resolutions. Hann(win_length) windows, centered frames.
    """
    x2 = x.reshape(-1, x.shape[-1])
    y2 = y.reshape(-1, y.shape[-1])
    total = 0.0
    for n_fft, win, hop in zip(cfg.fft_sizes, cfg.win_lengths, cfg.hop_sizes):
        w = stft_lib.hann_window(win, x2.dtype)
        xm = stft_lib.stft_magnitude(x2, n_fft, hop, win, w, eps=cfg.eps)
        ym = stft_lib.stft_magnitude(y2, n_fft, hop, win, w, eps=cfg.eps)
        loss = 0.0
        if cfg.w_sc:
            fro = lambda a: jnp.sqrt(jnp.sum(a**2, axis=(-2, -1)))
            loss = loss + cfg.w_sc * jnp.mean(fro(ym - xm) / fro(ym))
        if cfg.w_log_mag:
            loss = loss + cfg.w_log_mag * jnp.mean(jnp.abs(jnp.log(xm) - jnp.log(ym)))
        if cfg.w_lin_mag:
            loss = loss + cfg.w_lin_mag * jnp.mean(jnp.abs(xm - ym))
        total = total + loss
    return total / len(cfg.fft_sizes)


# ----------------------------------------------------------------------
# DAS beamforming (fork addition)
# ----------------------------------------------------------------------
def beamforming_power(
    sig: Array, fs: float, sound_speed: float, n_fft: int = 512, n_angles: int = 360
) -> Array:
    """Spatial spectrum of one M-mic circular group: [M, F_in] → [n_angles].

    Mirrors reference/utils/criterion.py:35-67: irfft → rfft(n=512),
    unit-circle mic positions starting at φ₀=π/2, frequency-domain
    delay-and-sum, per-frequency power normalization, sum over frequency.
    """
    sig = to_complex(sig)
    M = sig.shape[0]
    time_sig = jnp.fft.irfft(sig, axis=-1)
    T = time_sig.shape[-1]
    if T >= n_fft:
        X = jnp.fft.rfft(time_sig[..., :n_fft], axis=-1)
    else:
        X = jnp.fft.rfft(
            jnp.pad(time_sig, [(0, 0)] * (time_sig.ndim - 1) + [(0, n_fft - T)]),
            axis=-1,
        )
    freqs = jnp.asarray(np.fft.rfftfreq(n_fft, 1.0 / fs), X.real.dtype)

    mic_angles = jnp.linspace(np.pi / 2, np.pi / 2 + 2 * np.pi, M + 1)[:-1]
    mic_pos = jnp.stack([jnp.cos(mic_angles), jnp.sin(mic_angles)], axis=-1)
    mic_pos = mic_pos - jnp.mean(mic_pos, axis=0)

    thetas = jnp.deg2rad(jnp.arange(0.0, float(n_angles), 1.0))
    u = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # [K, 2]
    delays = (u @ mic_pos.T) / sound_speed  # [K, M]
    phase = jnp.exp(-1j * 2 * jnp.pi * delays[:, :, None] * freqs[None, None, :])

    beam = jnp.einsum("mf,kmf->kf", X, phase) / M
    power = jnp.abs(beam) ** 2
    power = power / (jnp.sum(power, axis=0, keepdims=True) + 1e-8)
    return jnp.sum(power, axis=-1)  # [K]


# ----------------------------------------------------------------------
# Criterion
# ----------------------------------------------------------------------
class LossBundle(NamedTuple):
    """Weighted loss terms (reference/utils/criterion.py:124-126 tuple)."""

    spec: Array
    amplitude: Array
    angle: Array
    time: Array
    energy: Array
    multi_stft: Array
    das_reg: Array
    das_ce: Array

    @property
    def total(self) -> Array:
        return (
            self.spec + self.amplitude + self.angle + self.time
            + self.energy + self.multi_stft + self.das_reg + self.das_ce
        )

    def as_dict(self) -> Dict[str, Array]:
        return dict(zip(self._fields, self))


@dataclass(frozen=True)
class CriterionConfig:
    spec_loss_weight: float = 1.0
    amplitude_loss_weight: float = 0.5
    angle_loss_weight: float = 0.5
    time_loss_weight: float = 100.0
    energy_loss_weight: float = 5.0
    multistft_loss_weight: float = 1.0
    das_reg_loss_weight: float = 0.0
    das_ce_loss_weight: float = 0.0
    beta: float = 100.0
    fs: int = 16000
    speed: float = 343.8
    # microphones per beamforming group. The reference hard-asserts the
    # whole batch is ONE 8-mic array (criterion.py:41); here batches that
    # are a multiple of the group size are split into [G, 8] groups and
    # the DAS losses averaged over groups, so batch_size=16 beamforms two
    # real 8-mic arrays instead of one fictitious 16-mic one. Any other
    # batch size raises (the parity analog of the reference assert).
    das_group_size: int = 8

    @classmethod
    def from_configs(cls, tc: TrainConfig, rc: RenderConfig) -> "CriterionConfig":
        return cls(
            spec_loss_weight=tc.spec_loss_weight,
            amplitude_loss_weight=tc.amplitude_loss_weight,
            angle_loss_weight=tc.angle_loss_weight,
            time_loss_weight=tc.time_loss_weight,
            energy_loss_weight=tc.energy_loss_weight,
            multistft_loss_weight=tc.multistft_loss_weight,
            das_reg_loss_weight=tc.das_reg_loss_weight,
            das_ce_loss_weight=tc.das_ce_loss_weight,
            beta=tc.beta,
            fs=rc.fs,
            speed=rc.speed,
        )


def energy_decay_curve(time_sig: Array) -> Array:
    """log10 reversed-cumsum STFT spectral energy, first-bin normalized.

    (reference/utils/criterion.py:74-83 — note the energy is squared AGAIN
    inside the cumsum; preserved for parity.)
    """
    spec = jnp.abs(stft_lib.stft(time_sig, n_fft=256))  # [..., F, frames]
    spec_energy = jnp.sum(spec**2, axis=-2)  # [..., frames]
    rev = jnp.flip(spec_energy, axis=-1) ** 2
    curve = jnp.log10(jnp.flip(jnp.cumsum(rev, axis=-1), axis=-1) + 1e-9)
    return curve - curve[..., :1]


def criterion(
    pred_sig: Array, ori_sig: Array, cfg: CriterionConfig, weights=None
) -> Tuple[LossBundle, Array, Array]:
    """Compute the weighted loss bank.

    pred_sig/ori_sig: [bs, F, 2] or complex [bs, F].
    Returns (LossBundle, ori_time, pred_time) like the reference's
    10-tuple (criterion.py:124-126).

    ``weights``: optional dict of RUNTIME weight overrides (jnp scalars,
    keyed by the CriterionConfig field name). The compiled program then
    no longer bakes the weight values in, so HPO trials that vary only
    loss weights reuse one program (TrainConfig.runtime_hparams).
    Structural decisions (whether the DAS branch exists at all) still
    come from ``cfg`` — a zero runtime weight on an active DAS branch is
    a multiply-by-zero, not a recompile.
    """
    w = lambda name: (
        weights[name] if weights is not None and name in weights
        else getattr(cfg, name)
    )
    pred_c = to_complex(pred_sig)
    ori_c = to_complex(ori_sig)
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))

    pred_time = jnp.fft.irfft(pred_c, axis=-1)
    ori_time = jnp.fft.irfft(ori_c, axis=-1)

    spec = (
        l1(jnp.real(pred_c), jnp.real(ori_c)) + l1(jnp.imag(pred_c), jnp.imag(ori_c))
    ) * w("spec_loss_weight")
    amplitude = l1(jnp.abs(pred_c), jnp.abs(ori_c)) * w("amplitude_loss_weight")
    pa, oa = jnp.angle(pred_c), jnp.angle(ori_c)
    angle = (
        l1(jnp.cos(pa), jnp.cos(oa)) + l1(jnp.sin(pa), jnp.sin(oa))
    ) * w("angle_loss_weight")
    time = l1(ori_time, pred_time) * w("time_loss_weight")
    energy = l1(
        energy_decay_curve(ori_time), energy_decay_curve(pred_time)
    ) * w("energy_loss_weight")
    multi = (
        multi_resolution_stft_loss(ori_time[:, None, :], pred_time[:, None, :])
        * w("multistft_loss_weight")
    )

    das_reg = jnp.zeros((), pred_time.dtype)
    das_ce = jnp.zeros((), pred_time.dtype)
    if cfg.das_reg_loss_weight > 0 or cfg.das_ce_loss_weight > 0:
        g = cfg.das_group_size
        bs = pred_c.shape[0]
        if bs % g != 0:
            raise ValueError(
                f"DAS losses need the batch to be whole {g}-mic groups; "
                f"got batch_size={bs} (reference/utils/criterion.py:41 "
                "asserts exactly one group of 8)"
            )
        # [G, g, F] — each row block is one circular mic array
        pred_g = pred_c.reshape(bs // g, g, pred_c.shape[-1])
        ori_g = ori_c.reshape(bs // g, g, ori_c.shape[-1])
        bp = jax.vmap(lambda s: beamforming_power(s, cfg.fs, cfg.speed))
        power_pred = bp(pred_g)  # [G, K]
        power_ori = bp(ori_g)
        if cfg.das_ce_loss_weight > 0:
            target = jnp.argmax(power_ori, axis=-1)  # [G]
            picked = jnp.take_along_axis(power_pred, target[:, None], axis=-1)[:, 0]
            ce = jax.nn.logsumexp(power_pred, axis=-1) - picked
            das_ce = jnp.mean(ce) * w("das_ce_loss_weight")
        if cfg.das_reg_loss_weight > 0:
            angles = jnp.deg2rad(jnp.arange(0.0, 360.0, 1.0))
            wp = jax.nn.softmax(cfg.beta * power_pred, axis=-1)  # [G, K]
            wo = jax.nn.softmax(cfg.beta * power_ori, axis=-1)
            pred_ang = jnp.sum(wp * angles, axis=-1)  # [G]
            true_ang = jnp.sum(wo * angles, axis=-1)
            das_reg = jnp.mean(
                jnp.abs(jnp.sin(pred_ang) - jnp.sin(true_ang))
                + jnp.abs(jnp.cos(pred_ang) - jnp.cos(true_ang))
            ) * w("das_reg_loss_weight")

    return (
        LossBundle(spec, amplitude, angle, time, energy, multi, das_reg, das_ce),
        ori_time,
        pred_time,
    )
