"""DoA estimator fidelity on REVERBERANT signals (VERDICT r3 item 2).

The reference gets its DoA estimators from pyroomacoustics
(reference/plot_eval.py:27,101-105); avr_tpu reimplements all seven
natively (avr_tpu/eval/doa.py). tests/test_doa.py validates them on
anechoic plane waves only — but every downstream consumer (the HPO
NormMUSIC objective, optuna_avr_runner.py:113-124; whitenoise/rotation
evals) runs them on *reverberant* room responses. This battery closes
that gap with image-source-model rooms (avr_tpu/data/synthetic.py):

  * single-source recovery for all 7 estimators in a reverberant room
    with known true azimuth;
  * a reverberation-level (absorption) sweep for NormMUSIC — the fork's
    primary objective;
  * the monotonicity property the HPO objective rests on: NormMUSIC
    pred-vs-gt error must rank {GT IR, lightly-degraded IR, random IR}
    correctly;
  * two-source + additive-noise cases for the subspace-focusing
    estimators (CSSM/WAVES) and TOPS.

Tolerances are recorded in PARITY.md.
"""

import numpy as np
import pytest

from avr_tpu.data import synthetic
from avr_tpu.eval import doa

FS = 16000
SEQ = 1600  # 100 ms IRs
CENTER = np.array([3.0, 2.5, 1.5], np.float32)


def reverb_group(
    angle_deg: float,
    dist: float = 2.0,
    absorption: float = 0.35,
    max_order: int = 3,
    center=CENTER,
):
    """8-mic circular-array IR group for a source at a known azimuth.

    Returns (irs [8, SEQ], mic_xy [2, 8], true azimuth deg). Geometry
    matches the evaluation convention (radius 0.0365 m, φ₀=π/2,
    reference/plot_eval.py:56-68): true angle measured from the array
    center to tx in the xy plane.
    """
    room = synthetic.RoomSpec(
        size=(6.0, 5.0, 3.0), absorption=absorption, max_order=max_order,
        fs=FS, seq_len=SEQ,
    )
    th = np.deg2rad(angle_deg)
    tx = center + np.array(
        [dist * np.cos(th), dist * np.sin(th), 0.0], np.float32
    )
    mics = synthetic.circular_array(center)
    irs = np.stack([synthetic.simulate_ir(room, rx, tx) for rx in mics])
    mic_xy = doa.circular_2d_array(center[:2])
    return irs, mic_xy, angle_deg


def spectrum_est(irs, mic_xy, algo, num_src=1):
    X = doa.stft_frames(irs, 512)
    sp = doa.doa_spectrum(X, mic_xy, FS, 512, algo, num_src=num_src)
    return sp, doa.estimate_azimuth_deg(sp)


# measured fidelity of the native estimators on image-source rooms
# (absorption 0.35, order 3): tolerance table mirrored in PARITY.md
REVERB_TOL = {
    # plain (un-normalized, un-focused) MUSIC carries a small coherent-
    # multipath bias (measured up to 11°) — the reason NormMUSIC/CSSM
    # exist and the fork optimizes NormMUSIC
    "MUSIC": 12.0,
    "NormMUSIC": 5.0,
    "SRP": 5.0,
    "CSSM": 5.0,
    "WAVES": 5.0,
    "TOPS": 5.0,
    "FRIDA": 5.0,
}


@pytest.mark.parametrize("algo", doa.ALGO_NAMES)
@pytest.mark.parametrize("angle", [35.0, 160.0, 287.0])
def test_reverb_single_source(algo, angle):
    irs, mic_xy, true_deg = reverb_group(angle)
    _, est = spectrum_est(irs, mic_xy, algo)
    err = doa.angular_error_deg(est, true_deg)
    assert err <= REVERB_TOL[algo], f"{algo}: {est:.1f} vs {true_deg} ({err:.1f}°)"


@pytest.mark.parametrize("absorption", [0.7, 0.35, 0.15])
def test_normmusic_reverberation_sweep(absorption):
    """The HPO objective's estimator must hold up as the room gets
    livelier (absorption 0.15 ≈ strongly reverberant shoebox)."""
    errs = []
    for angle in (35.0, 160.0, 287.0):
        irs, mic_xy, true_deg = reverb_group(angle, absorption=absorption)
        _, est = spectrum_est(irs, mic_xy, "NormMUSIC")
        errs.append(doa.angular_error_deg(est, true_deg))
    assert float(np.mean(errs)) <= 10.0, errs


def _group_pred_vs_gt_error(gt_irs, pred_irs, mic_xy):
    """The HPO objective's per-group core (optuna_avr_runner.py:113-124):
    NormMUSIC azimuth of the predicted group vs the GT group."""
    _, est_gt = spectrum_est(gt_irs, mic_xy, "NormMUSIC")
    _, est_pr = spectrum_est(pred_irs, mic_xy, "NormMUSIC")
    return doa.angular_error_deg(est_pr, est_gt)


def test_normmusic_objective_monotonicity():
    """NormMUSIC pred-vs-gt error must rank {GT, lightly-degraded,
    random} IRs correctly — the property the HPO objective and the
    headline quality gate rest on."""
    rng = np.random.default_rng(11)
    light_errs, rand_errs = [], []
    for angle in (20.0, 95.0, 210.0, 325.0):
        gt, mic_xy, _ = reverb_group(angle)
        scale = np.abs(gt).max()
        light = gt + rng.normal(size=gt.shape).astype(np.float32) * (
            0.03 * scale
        )  # ~-30 dB perturbation
        rand = rng.normal(size=gt.shape).astype(np.float32) * scale
        assert _group_pred_vs_gt_error(gt, gt, mic_xy) == 0.0
        light_errs.append(_group_pred_vs_gt_error(gt, light, mic_xy))
        rand_errs.append(_group_pred_vs_gt_error(gt, rand, mic_xy))
    light_mean, rand_mean = float(np.mean(light_errs)), float(np.mean(rand_errs))
    assert light_mean <= 10.0, light_errs
    assert rand_mean > max(light_mean + 10.0, 30.0), (light_errs, rand_errs)


@pytest.mark.parametrize("algo", ["CSSM", "WAVES"])
def test_two_source_reverb(algo):
    """Subspace-focusing estimators must expose BOTH sources in a
    reverberant room (num_src=2, peaks read from the spatial spectrum)."""
    irs1, mic_xy, a1 = reverb_group(50.0)
    irs2, _, a2 = reverb_group(230.0, dist=1.8)
    sp, _ = spectrum_est(irs1 + irs2, mic_xy, algo, num_src=2)
    grid = np.arange(len(sp)) * (360.0 / len(sp))
    peaks = grid[np.argsort(sp)[-30:]]
    err1 = min(doa.angular_error_deg(p, a1) for p in peaks)
    err2 = min(doa.angular_error_deg(p, a2) for p in peaks)
    assert err1 <= 12 and err2 <= 12, (algo, err1, err2)


@pytest.mark.parametrize("algo", ["CSSM", "WAVES", "TOPS"])
@pytest.mark.parametrize("snr_db", [20.0, 10.0])
def test_noise_robustness_reverb(algo, snr_db):
    """Additive sensor noise at finite SNR on top of reverberation."""
    rng = np.random.default_rng(7)
    irs, mic_xy, true_deg = reverb_group(120.0)
    sig_rms = float(np.sqrt(np.mean(irs**2)))
    noise = rng.normal(size=irs.shape).astype(np.float32) * (
        sig_rms * 10 ** (-snr_db / 20)
    )
    _, est = spectrum_est(irs + noise, mic_xy, algo)
    err = doa.angular_error_deg(est, true_deg)
    tol = 25.0 if algo == "TOPS" else 12.0
    assert err <= tol, f"{algo}@{snr_db}dB: {est:.1f} vs {true_deg} ({err:.1f}°)"
