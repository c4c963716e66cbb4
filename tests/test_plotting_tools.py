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
