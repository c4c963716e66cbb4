"""Loss-stack parity tests against torch-CPU (the reference's substrate).

torch.stft is the semantic ground truth for framing/window/padding
conventions (reference/utils/criterion.py:33,74-75); we check our JAX STFT
against it directly, then check each criterion term against a torch
restatement of the reference math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from avr_tpu.losses import (
    CriterionConfig,
    MRSTFTConfig,
    beamforming_power,
    criterion,
    energy_decay_curve,
    multi_resolution_stft_loss,
)
from avr_tpu.ops import stft as stft_lib


def test_stft_matches_torch_rectangular(rng):
    x = rng.normal(size=(3, 500)).astype(np.float32)
    ours = np.asarray(stft_lib.stft(jnp.asarray(x), n_fft=256))
    theirs = torch.stft(torch.tensor(x), n_fft=256, return_complex=True).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_matches_torch_hann_short_window(rng):
    x = rng.normal(size=(2, 800)).astype(np.float32)
    n_fft, hop, win = 512, 60, 300
    w = stft_lib.hann_window(win)
    ours = np.asarray(stft_lib.stft(jnp.asarray(x), n_fft, hop, win, w))
    theirs = torch.stft(
        torch.tensor(x), n_fft, hop, win, torch.hann_window(win), return_complex=True
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(stft_lib.hann_window(75)),
        torch.hann_window(75).numpy(),
        atol=1e-6,
    )


def _torch_energy_curve(t: torch.Tensor) -> torch.Tensor:
    """reference/utils/criterion.py:74-83 restated."""
    spec = torch.abs(torch.stft(t, n_fft=256, return_complex=True))
    e = torch.sum(spec**2, dim=1)
    c = torch.log10(torch.flip(torch.cumsum(torch.flip(e, [-1]) ** 2, dim=-1), [-1]) + 1e-9)
    return c - c[:, [0]]


def test_energy_decay_curve_matches_torch(rng):
    x = rng.normal(size=(2, 400)).astype(np.float32)
    ours = np.asarray(energy_decay_curve(jnp.asarray(x)))
    theirs = _torch_energy_curve(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def _torch_das_power(sig: torch.Tensor, fs: float, speed: float) -> torch.Tensor:
    """reference/utils/criterion.py:35-67 restated (loop form)."""
    import math

    M = sig.shape[0]
    time_sig = torch.real(torch.fft.irfft(sig, dim=-1))
    n_fft = 512
    freqs = torch.fft.rfftfreq(n_fft, 1 / fs)
    X = torch.fft.rfft(time_sig, n=n_fft, dim=-1)
    mic_angles = torch.linspace(math.pi / 2, math.pi / 2 + 2 * math.pi, M + 1)[:-1]
    mic_pos = torch.stack([torch.cos(mic_angles), torch.sin(mic_angles)], dim=-1)
    mic_pos = mic_pos - mic_pos.mean(dim=0)
    K = 360
    angles = torch.deg2rad(torch.arange(0.0, 360.0, 1.0))
    steering = torch.zeros(K, M, freqs.shape[0], dtype=torch.cfloat)
    for i, theta in enumerate(angles):
        u = torch.tensor([torch.cos(theta), torch.sin(theta)])
        delays = (mic_pos @ u) / speed
        steering[i] = torch.exp(-1j * 2 * math.pi * delays[:, None] * freqs[None, :])
    beam = torch.einsum("mf,kmf->kf", X, steering) / M
    p = torch.abs(beam) ** 2
    p = p / (torch.sum(p, dim=0, keepdim=True) + 1e-8)
    return torch.sum(p, dim=-1)


def test_das_power_matches_torch(rng):
    F = 300
    sig = (rng.normal(size=(8, F)) + 1j * rng.normal(size=(8, F))).astype(np.complex64)
    ours = np.asarray(beamforming_power(jnp.asarray(sig), fs=16000.0, sound_speed=343.8))
    theirs = _torch_das_power(torch.tensor(sig), 16000.0, 343.8).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-5)


def test_das_power_peaks_at_source_direction():
    """A plane wave from 90° must produce a spatial-spectrum peak near 90°."""
    fs, c, n_fft = 16000.0, 343.8, 512
    M, radius = 8, 0.0365
    mic_angles = np.linspace(np.pi / 2, np.pi / 2 + 2 * np.pi, M + 1)[:-1]
    # The criterion's beamformer assumes unit-radius mics; synthesize with
    # the same geometry so delays match.
    mic_pos = np.stack([np.cos(mic_angles), np.sin(mic_angles)], -1)
    mic_pos -= mic_pos.mean(0)
    theta = np.pi / 2
    u = np.array([np.cos(theta), np.sin(theta)])
    delays = (mic_pos @ u) / c
    rng_ = np.random.default_rng(1)
    base = rng_.normal(size=2048)
    sigs = []
    for d in delays:
        shift = np.fft.rfft(base) * np.exp(
            -2j * np.pi * np.fft.rfftfreq(2048, 1 / fs) * (-d)
        )
        sigs.append(shift)
    sig = np.stack(sigs).astype(np.complex64)
    p = np.asarray(beamforming_power(jnp.asarray(sig), fs, c, n_fft))
    peak = int(np.argmax(p))
    err = min(abs(peak - 90), 360 - abs(peak - 90))
    assert err <= 3, f"DAS peak at {peak}°, expected ≈90°"


def test_criterion_terms_match_torch(rng):
    F = 201
    pred = rng.normal(size=(4, F, 2)).astype(np.float32)
    ori = rng.normal(size=(4, F, 2)).astype(np.float32)
    cfg = CriterionConfig(fs=16000, speed=343.8, multistft_loss_weight=0.0)
    bundle, ori_t, pred_t = criterion(jnp.asarray(pred), jnp.asarray(ori), cfg)

    tp = torch.complex(torch.tensor(pred[..., 0]), torch.tensor(pred[..., 1]))
    to = torch.complex(torch.tensor(ori[..., 0]), torch.tensor(ori[..., 1]))
    tp_time = torch.real(torch.fft.irfft(tp, dim=-1))
    to_time = torch.real(torch.fft.irfft(to, dim=-1))
    l1 = torch.nn.L1Loss()

    spec = (l1(tp.real, to.real) + l1(tp.imag, to.imag)) * cfg.spec_loss_weight
    amp = l1(torch.abs(tp), torch.abs(to)) * cfg.amplitude_loss_weight
    ang = (
        l1(torch.cos(torch.angle(tp)), torch.cos(torch.angle(to)))
        + l1(torch.sin(torch.angle(tp)), torch.sin(torch.angle(to)))
    ) * cfg.angle_loss_weight
    time = l1(to_time, tp_time) * cfg.time_loss_weight
    energy = l1(_torch_energy_curve(to_time), _torch_energy_curve(tp_time)) * cfg.energy_loss_weight

    np.testing.assert_allclose(float(bundle.spec), float(spec), rtol=1e-4)
    np.testing.assert_allclose(float(bundle.amplitude), float(amp), rtol=1e-4)
    np.testing.assert_allclose(float(bundle.angle), float(ang), rtol=1e-3)
    np.testing.assert_allclose(float(bundle.time), float(time), rtol=1e-4)
    np.testing.assert_allclose(float(bundle.energy), float(energy), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pred_t), tp_time.numpy(), rtol=1e-4, atol=1e-5
    )


def test_mrstft_identical_inputs_zero(rng):
    x = jnp.asarray(rng.normal(size=(2, 1, 700)), jnp.float32)
    v = float(multi_resolution_stft_loss(x, x))
    assert abs(v) < 1e-6


def test_mrstft_differentiable(rng):
    x = jnp.asarray(rng.normal(size=(1, 1, 600)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 1, 600)), jnp.float32)
    g = jax.grad(lambda a: multi_resolution_stft_loss(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_criterion_with_das_terms(rng):
    F = 120
    pred = rng.normal(size=(8, F, 2)).astype(np.float32) * 0.1
    ori = rng.normal(size=(8, F, 2)).astype(np.float32) * 0.1
    cfg = CriterionConfig(
        fs=16000, speed=343.8, das_reg_loss_weight=1.0, das_ce_loss_weight=1.0,
        multistft_loss_weight=0.0,
    )
    bundle, _, _ = criterion(jnp.asarray(pred), jnp.asarray(ori), cfg)
    assert float(bundle.das_ce) > 0
    assert np.isfinite(float(bundle.das_reg))
    assert np.isfinite(float(bundle.total))


def test_das_batch16_equals_two_batch8_groups(rng):
    """batch 16 with DAS on must beamform TWO 8-mic groups whose losses
    average — not one fictitious 16-mic array (VERDICT round-1 Weak #1;
    the reference asserts one group of 8, utils/criterion.py:41)."""
    F = 120
    pred = rng.normal(size=(16, F, 2)).astype(np.float32) * 0.1
    ori = rng.normal(size=(16, F, 2)).astype(np.float32) * 0.1
    cfg = CriterionConfig(
        fs=16000, speed=343.8, das_reg_loss_weight=1.0, das_ce_loss_weight=1.0,
    )
    b16, _, _ = criterion(jnp.asarray(pred), jnp.asarray(ori), cfg)
    b8a, _, _ = criterion(jnp.asarray(pred[:8]), jnp.asarray(ori[:8]), cfg)
    b8b, _, _ = criterion(jnp.asarray(pred[8:]), jnp.asarray(ori[8:]), cfg)
    np.testing.assert_allclose(
        float(b16.das_ce), (float(b8a.das_ce) + float(b8b.das_ce)) / 2, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(b16.das_reg), (float(b8a.das_reg) + float(b8b.das_reg)) / 2, rtol=1e-5
    )


def test_das_rejects_partial_groups(rng):
    pred = rng.normal(size=(12, 64, 2)).astype(np.float32)
    cfg = CriterionConfig(das_reg_loss_weight=1.0)
    with pytest.raises(ValueError, match="8-mic groups"):
        criterion(jnp.asarray(pred), jnp.asarray(pred), cfg)
