"""Plotting + config-tooling smoke tests (files produced, schemas hold)."""

import json
import os

import numpy as np
import yaml

from avr_tpu.utils import config_tools, plotting


def test_prediction_figure(tmp_path, rng):
    F = 100
    pred = (rng.normal(size=F) + 1j * rng.normal(size=F)).astype(np.complex64)
    ori = (rng.normal(size=F) + 1j * rng.normal(size=F)).astype(np.complex64)
    p = str(tmp_path / "img" / "fig.png")
    plotting.plot_prediction_figure(
        pred, ori, np.fft.irfft(pred), np.fft.irfft(ori),
        np.asarray([1.0, 2.0, 1.0]), np.asarray([3.0, 1.0, 1.0]), "test", p,
    )
    assert os.path.getsize(p) > 10_000


def test_inference_figure(tmp_path, rng):
    x = rng.normal(size=500)
    p = str(tmp_path / "energy.png")
    plotting.plot_inference_figure(
        x, x * 0.9,
        {"Angle": 1.0, "Amplitude": 0.2, "Envelope": 0.1, "T60": 0.05,
         "C50": 1.2, "EDT": 0.02},
        p,
    )
    assert os.path.getsize(p) > 10_000


def test_loss_curve_reading_and_plot(tmp_path):
    j = str(tmp_path / "metrics.jsonl")
    with open(j, "w") as f:
        for step in (20, 40, 60):
            f.write(json.dumps({"tag": "train_loss", "value": 1.0 / step, "step": step}) + "\n")
            f.write(json.dumps({"tag": "test_loss/spec_loss", "value": 2.0 / step, "step": step}) + "\n")
            f.write(json.dumps({"tag": "test_loss/time_loss", "value": 3.0 / step, "step": step}) + "\n")
    curves = plotting.read_metrics_jsonl(j)
    assert curves["train_loss"] == [(20, 0.05), (40, 0.025), (60, 1 / 60)]
    summed = plotting.sum_curves_by_prefix(curves, "test_loss/")
    assert summed[0] == (20, 5.0 / 20)

    out = str(tmp_path / "loss.png")
    plotting.plot_loss_curves(j, out, prefixes=("train_loss", "test_loss/"))
    assert os.path.exists(out)

    out2 = str(tmp_path / "loss_doa.png")
    plotting.plot_loss_and_doa(j, {20: 30.0, 40: 12.0, 60: 8.0}, out2)
    assert os.path.exists(out2)


def test_doa_scatter(tmp_path):
    results = {
        "NormMUSIC": {"pred_vs_gt_error": [1.0, 2.0, None, 4.0]},
        "SRP": {"pred_vs_gt_error": [None, None]},
    }
    p = str(tmp_path / "scatter.png")
    plotting.plot_doa_scatter(results, p)
    assert os.path.exists(p)


def test_config_variant_generation(tmp_path):
    d = tmp_path / "real_exp"
    d.mkdir()
    base = {
        "path": {"expname": "Real_exp_param_1_1", "dataset_type": "Real_env",
                 "logdir": "logs/"},
        "render": {"n_samples": 64, "fs": 16000},
        "train": {"lr": 1e-3, "batch_size": 4},
        "model": {"signal_output_dim": 1600,
                  "signal_network": {"n_neurons": 512}},
    }
    with open(d / "avr_real_exp_1.yml", "w") as f:
        yaml.safe_dump(base, f)

    written = config_tools.generate_param_variants(
        str(d),
        {"train": {"lr": [1e-4, 1e-5]},
         "render": {"n_samples": [32]},
         "model": {"signal_network": {"n_neurons": [256]},
                   "signal_output_dim": [800]}},
    )
    assert len(written) == 5
    c2 = yaml.safe_load(open(d / "avr_real_exp_2.yml"))
    assert c2["train"]["lr"] == 1e-4
    assert c2["path"]["expname"] == "Real_exp_param_2_1"
    c5 = yaml.safe_load(open(d / "avr_real_exp_5.yml"))
    assert c5["model"]["signal_network"]["n_neurons"] == 256
    c6 = yaml.safe_load(open(d / "avr_real_exp_6.yml"))
    assert c6["model"]["signal_output_dim"] == 800
    # base untouched
    b = yaml.safe_load(open(d / "avr_real_exp_1.yml"))
    assert b["train"]["lr"] == 1e-3


def test_tb_event_reader_roundtrip(tmp_path):
    """Scalars written through MetricsWriter's TB stream read back via
    the event-file reader identically to the JSONL stream (the reference
    reporting layer consumes TB event files — plot_loss.py:9-25)."""
    from avr_tpu.utils.logging import MetricsWriter
    from avr_tpu.utils.tb_events import read_scalar_curves, read_tb_scalars

    logdir = str(tmp_path / "run")
    w = MetricsWriter(logdir)
    for step in (10, 20, 30):
        w.scalar("train_loss", 1.0 / step, step)
        w.scalars({"spec_loss": 0.5 / step, "time_loss": 2.0 / step},
                  step, prefix="test_loss/")
    w.close()

    tb = read_tb_scalars(logdir)
    assert [s for s, _ in tb["train_loss"]] == [10, 20, 30]
    np.testing.assert_allclose(
        [v for _, v in tb["test_loss/spec_loss"]], [0.05, 0.025, 0.5 / 30],
        rtol=1e-6,
    )
    # unified loader: logdir prefers metrics.jsonl, but a TB-only dir
    # (reference-produced) still works
    full = read_scalar_curves(logdir)
    assert full["train_loss"] == sorted(full["train_loss"])
    os.remove(os.path.join(logdir, "metrics.jsonl"))
    tb_only = read_scalar_curves(logdir)
    assert set(tb_only) == set(tb)


def test_plot_loss_by_epoch_from_tb(tmp_path):
    """plot_loss.py parity: per-prefix tag sums vs epoch, from a TB-only
    logdir."""
    from avr_tpu.utils.logging import MetricsWriter

    logdir = str(tmp_path / "run")
    w = MetricsWriter(logdir)
    for step in (100, 200, 300):
        w.scalars({"spec": 1.0 / step, "time": 3.0 / step}, step,
                  prefix="train_loss/")
        w.scalars({"spec": 2.0 / step}, step, prefix="test_loss/")
    w.close()
    os.remove(os.path.join(logdir, "metrics.jsonl"))  # TB-only
    png = str(tmp_path / "loss_by_epoch.png")
    plotting.plot_loss_by_epoch(logdir, png)
    assert os.path.getsize(png) > 10_000


def _fake_doa_pkls(base, method, errs_by_iter):
    """val_iter*.pkl files with the reference result schema."""
    import pickle

    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(0)
    for it, mean_err in errs_by_iter.items():
        n = 12
        gt = rng.uniform(0, 360, n)
        rec = {
            "true_deg": list(gt + 1.0), "gt_deg": list(gt),
            "pred_deg": list((gt + mean_err) % 360),
            "pred_vs_gt_error": [mean_err] * (n - 1) + [None],
            "pred_vs_true_error": [mean_err + 1.0] * n,
            "gt_vs_true_error": [1.0] * n,
        }
        payload = {m: rec for m in ([method] if isinstance(method, str) else method)}
        with open(os.path.join(base, f"val_iter{it:06d}.pkl"), "wb") as f:
            pickle.dump(payload, f)


def test_doa_detail_scatter(tmp_path):
    from avr_tpu.eval import aggregators

    logdir = str(tmp_path / "exp")
    _fake_doa_pkls(os.path.join(logdir, "doa_results"), "NormMUSIC",
                   {1000: 40.0, 2000: 10.0, 3000: 25.0})
    png = aggregators.plot_doa_detail_scatter(logdir)
    assert png == os.path.join(logdir, "doa_detail_scatter.png")
    assert os.path.getsize(png) > 20_000


def test_das_detail_scatter(tmp_path):
    from avr_tpu.eval import aggregators

    logdir = str(tmp_path / "exp")
    _fake_doa_pkls(os.path.join(logdir, "beamform_results"),
                   ["NormDAS_soft-argmax", "NormDAS_argmax"],
                   {1000: 30.0, 2000: 5.0})
    png = aggregators.plot_das_detail_scatter(logdir)
    assert os.path.getsize(png) > 20_000


def test_wide_cardioid_beam_pattern():
    """Parity with reference/utils/spatialization.py:4-27 (torch)."""
    import torch

    from avr_tpu.utils.spatialization import wide_cardioid_beam_pattern

    phi = np.linspace(0, 2 * np.pi, 73)
    for facing, base in ((0.7, 2.0), (3.1, 0.0)):
        ours = np.asarray(wide_cardioid_beam_pattern(facing, phi, base))
        # reference math restated in torch
        t_phi = torch.tensor(phi)
        main = (1 + torch.cos(t_phi - facing)) / 2
        b = base if base else 1.0
        theirs = (main + b) / torch.max(main + b)
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-6)
        assert ours.max() == 1.0
