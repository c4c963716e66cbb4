"""Metric-suite tests: scipy ground truth where available + physics sanity."""

import numpy as np
import pytest

from avr_tpu import metrics


def synth_ir(rng, fs=16000, T=4000, t60=0.4):
    """Exponentially-decaying noise IR with a known T60."""
    t = np.arange(T) / fs
    tau = t60 / (3 * np.log(10))  # energy decays 60 dB in t60 seconds
    return rng.normal(size=T) * np.exp(-t / tau)


def test_hilbert_matches_scipy(rng):
    from scipy.signal import hilbert

    x = rng.normal(size=(3, 257))
    ours = metrics._hilbert_envelope(x)
    theirs = np.abs(hilbert(x))
    np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-10)


def test_box_smooth_matches_scipy(rng):
    import scipy.ndimage

    x = rng.normal(size=(2, 100))
    ours = metrics._box_smooth(x, 32)
    theirs = scipy.ndimage.convolve1d(x, np.ones(32))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-10)


def test_t60_recovers_known_decay(rng):
    fs = 16000
    ir = synth_ir(rng, fs=fs, T=16000, t60=0.5)[None, :]
    energy = metrics.backward_energy_db(ir)
    t60, edt = metrics.t60_edt(energy, fs=fs)
    assert abs(t60[0] - 0.5) / 0.5 < 0.15
    assert 0 < edt[0] < 2.0


def test_identical_irs_give_zero_errors(rng):
    ir = synth_ir(rng)[None, :]
    m = metrics.metric_cal(ir, ir, fs=16000)
    assert m.angle_error < 1e-9
    assert m.amp_error < 1e-9
    assert m.env_error < 1e-9
    assert m.t60_error < 1e-9
    assert m.edt_error < 1e-9
    assert m.c50_error < 1e-9
    assert m.multi_stft < 1e-5


def test_metric_orders_by_quality(rng):
    """A slightly-perturbed IR must score better than a heavily-perturbed one."""
    ir = synth_ir(rng)
    small = ir + rng.normal(size=ir.shape) * 0.01 * np.abs(ir).max()
    big = ir + rng.normal(size=ir.shape) * 0.5 * np.abs(ir).max()
    m_small = metrics.metric_cal(ir[None], small[None], fs=16000)
    m_big = metrics.metric_cal(ir[None], big[None], fs=16000)
    assert m_small.amp_error < m_big.amp_error
    assert m_small.env_error < m_big.env_error
    assert m_small.multi_stft < m_big.multi_stft


def test_linregress_equivalence(rng):
    """np.polyfit deg-1 == scipy.stats.linregress slope/intercept."""
    from scipy import stats

    x = np.arange(50) / 7.0
    y = -3.0 * x + 1.5 + rng.normal(size=50) * 0.1
    slope_sp, inter_sp = stats.linregress(x, y)[0:2]
    slope_np, inter_np = np.polyfit(x, y, 1)
    np.testing.assert_allclose(slope_np, slope_sp, rtol=1e-10)
    np.testing.assert_allclose(inter_np, inter_sp, rtol=1e-10)
