"""DoA estimator tests: plane-wave recovery at known angles + npz flow."""

import numpy as np
import pytest

from avr_tpu.eval import doa


def make_group_signals(angle_deg, fs=16000, radius=0.0365, m=8, T=1600, seed=0,
                       snr_noise=0.0):
    """8-mic signals for a far-field broadband source at angle_deg.
    Returns rFFT spectra [M, T//2+1] like a val npz row group."""
    rng = np.random.default_rng(seed)
    mic_xy = doa.circular_2d_array(np.zeros(2), m, radius)
    centered = mic_xy - mic_xy.mean(axis=1, keepdims=True)
    th = np.deg2rad(angle_deg)
    u = np.asarray([np.cos(th), np.sin(th)])
    # far-field: wavefront hits mics with delay −(p·u)/c
    tau = -(centered.T @ u) / doa.SOUND_SPEED
    base = rng.normal(size=T)
    base_f = np.fft.rfft(base)
    freqs = np.fft.rfftfreq(T, 1.0 / fs)
    sig = base_f[None, :] * np.exp(-2j * np.pi * freqs[None, :] * tau[:, None])
    if snr_noise > 0:
        sig = sig + np.fft.rfft(rng.normal(size=(m, T)) * snr_noise, axis=-1)
    return sig.astype(np.complex64), mic_xy


@pytest.mark.parametrize("algo", ["MUSIC", "NormMUSIC", "SRP", "CSSM", "WAVES"])
@pytest.mark.parametrize("angle", [30.0, 147.0, 265.0])
def test_doa_recovers_plane_wave(algo, angle):
    sig, mic_xy = make_group_signals(angle, snr_noise=0.01)
    time_sig = np.fft.irfft(sig, axis=-1).real
    X = doa.stft_frames(time_sig, 512)
    sp = doa.doa_spectrum(X, mic_xy, 16000, 512, algo)
    est = doa.estimate_azimuth_deg(sp)
    assert doa.angular_error_deg(est, angle) <= 6, f"{algo}: {est} vs {angle}"


def test_tops_recovers_plane_wave():
    sig, mic_xy = make_group_signals(200.0, snr_noise=0.01)
    time_sig = np.fft.irfft(sig, axis=-1).real
    X = doa.stft_frames(time_sig, 512)
    sp = doa.doa_spectrum(X, mic_xy, 16000, 512, "TOPS")
    est = doa.estimate_azimuth_deg(sp)
    assert doa.angular_error_deg(est, 200.0) <= 15  # TOPS is noisier


def test_frida_two_sources():
    sig1, mic_xy = make_group_signals(60.0, seed=1, snr_noise=0.005)
    sig2, _ = make_group_signals(210.0, seed=2, snr_noise=0.005)
    time_sig = np.fft.irfft(sig1 + sig2, axis=-1).real
    X = doa.stft_frames(time_sig, 512)
    sp = doa.doa_spectrum(X, mic_xy, 16000, 512, "FRIDA", num_src=2)
    grid = np.arange(len(sp)) * (360.0 / len(sp))
    # the two strongest grid-free peaks should land near the sources
    peaks = grid[np.argsort(sp)[-40:]]
    err1 = min(doa.angular_error_deg(p, 60.0) for p in peaks)
    err2 = min(doa.angular_error_deg(p, 210.0) for p in peaks)
    assert err1 <= 10 and err2 <= 10, (err1, err2)


@pytest.mark.parametrize("angle", [10.0, 147.0, 265.0])
def test_frida_recovers_plane_wave(angle):
    sig, mic_xy = make_group_signals(angle, snr_noise=0.01)
    X = doa.stft_frames(np.fft.irfft(sig, axis=-1).real, 512)
    sp = doa.doa_spectrum(X, mic_xy, 16000, 512, "FRIDA")
    est = doa.estimate_azimuth_deg(sp)
    assert doa.angular_error_deg(est, angle) <= 6, f"FRIDA: {est} vs {angle}"


def _fake_npz(tmp_path, angles, fs=16000):
    """Build a val_iter-style npz with groups at the given source angles."""
    preds, oris, rxs, txs = [], [], [], []
    for g, ang in enumerate(angles):
        sig, mic_xy = make_group_signals(ang, fs=fs, seed=g)
        noisy = sig * np.exp(1j * 0.05)  # pred = slightly phase-shifted gt
        preds.append(noisy)
        oris.append(sig)
        center = np.asarray([1.0 + g, 2.0])
        rxs.append(
            np.concatenate([mic_xy.T + (center - mic_xy.mean(axis=1)),
                            np.full((8, 1), 1.5)], axis=1)
        )
        d = 3.0
        tx = center + d * np.asarray([np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang))])
        txs.append(np.tile(np.asarray([*tx, 1.5]), (8, 1)))
    path = str(tmp_path / "val_iter000001.npz")
    np.savez(
        path,
        pred_sig=np.concatenate(preds),
        ori_sig=np.concatenate(oris),
        position_rx=np.concatenate(rxs).astype(np.float32),
        position_tx=np.concatenate(txs).astype(np.float32),
        fs=fs,
    )
    return path


def test_run_doa_on_npz_schema_and_accuracy(tmp_path):
    path = _fake_npz(tmp_path, [45.0, 120.0, 300.0])
    save = str(tmp_path / "doa.pkl")
    res = doa.run_doa_on_npz(path, algo_names=["NormMUSIC", "FRIDA"], save_path=save)
    assert set(res) == {"NormMUSIC", "FRIDA"}
    r = res["NormMUSIC"]
    assert len(r["true_deg"]) == 3
    for k in ("pred_deg", "gt_deg", "pred_vs_gt_error", "pred_vs_true_error",
              "gt_vs_true_error"):
        assert len(r[k]) == 3
    # gt signals point at the true angle
    assert np.mean(r["gt_vs_true_error"]) < 10
    # pred is a phase-rotated copy → matches gt closely
    assert np.mean(r["pred_vs_gt_error"]) < 5
    # FRIDA (grid-free FRI) also locates the sources
    fr = res["FRIDA"]
    assert all(v is not None for v in fr["pred_deg"])
    assert np.mean(fr["gt_vs_true_error"]) < 10
    import pickle

    with open(save, "rb") as f:
        loaded = pickle.load(f)
    assert loaded["NormMUSIC"]["true_deg"] == r["true_deg"]


def test_run_das_on_npz(tmp_path):
    path = _fake_npz(tmp_path, [80.0, 210.0])
    res = doa.run_delay_and_sum_on_npz(path)
    assert set(res) == {"NormDAS_soft-argmax", "NormDAS_argmax"}
    for method in res:
        assert len(res[method]["pred_deg"]) == 2
        # DAS on the unit-circle array quirk is biased but finite
        assert all(np.isfinite(v) for v in res[method]["pred_deg"])
    summary = doa.summarize(res)
    assert "mean_pred_vs_gt" in summary["NormDAS_argmax"]


def test_summarize_handles_none():
    res = doa._empty_results(["X"])
    doa._record(res, "X", 10.0, None, None)
    s = doa.summarize(res)
    assert np.isnan(s["X"]["mean_pred_vs_gt"])
    assert s["X"]["n"] == 0
