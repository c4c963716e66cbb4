"""Aggregator/reporting tests over small synthetic result trees."""

import os
import pickle

import numpy as np

from avr_tpu.data import tools
from avr_tpu.eval import aggregators, whitenoise

from test_doa import _fake_npz


def _fake_condition(tmp_path, name="results_t0.pkl"):
    cond = {
        "per_group": [
            {
                "true_deg": 45.0,
                "pred": {"mean": 47.0, "var": 0.01, "std": 5.0,
                         "windows": [44.0, 46.0, 50.0]},
                "gt": {"mean": 45.5, "var": 0.005, "std": 3.0,
                       "windows": [45.0, 45.5, 46.0]},
                "err_pred_vs_gt": 1.5,
                "err_pred_vs_true": 2.0,
            },
            {
                "true_deg": 200.0,
                "pred": {"mean": 210.0, "var": 0.02, "std": 8.0,
                         "windows": [205.0, 212.0]},
                "gt": {"mean": 199.0, "var": 0.002, "std": 2.0,
                       "windows": [199.0, 199.5]},
                "err_pred_vs_gt": 11.0,
                "err_pred_vs_true": 10.0,
            },
        ],
        "summary": {"mean_pred_vs_gt": 6.25},
    }
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        pickle.dump(cond, f)
    return p


def test_frame_error_table_and_plots(tmp_path):
    p = _fake_condition(tmp_path)
    df = aggregators.frame_error_table(p)
    assert len(df) == 5  # 3 + 2 windows
    assert set(df.columns) >= {"group", "window", "pred_deg", "err_vs_gt_mean"}
    g0 = df[df.group == 0]
    assert abs(g0.iloc[0]["err_vs_gt_mean"] - 1.5) < 1e-9  # |44 − 45.5|

    out = str(tmp_path / "frames.png")
    aggregators.plot_frame_errors([p], out)
    assert os.path.exists(out)
    out2 = str(tmp_path / "scatter.png")
    aggregators.plot_frame_scatter(p, out2)
    assert os.path.exists(out2)


def test_circular_median_summary(tmp_path):
    _fake_condition(tmp_path, "results_a.pkl")
    _fake_condition(tmp_path, "results_b.pkl")
    df = aggregators.circular_median_summary(str(tmp_path))
    assert len(df) == 2
    assert os.path.exists(str(tmp_path / "summary_circular_median.csv"))
    assert (df["median_err"] == 6.25).all()


def test_compare_stft_conditions(tmp_path):
    npz = _fake_npz(tmp_path, [60.0, 300.0])
    df = aggregators.compare_stft_conditions(
        [npz], n_ffts=(256, 512), wins=("hann", "none"),
        save_csv=str(tmp_path / "stft.csv"),
    )
    assert len(df) == 4
    assert (df["mean_pred_vs_gt"] < 15).all()
    assert os.path.exists(str(tmp_path / "stft.csv"))


def test_plot_band_response(tmp_path):
    npz = _fake_npz(tmp_path, [100.0])
    out = str(tmp_path / "band.png")
    aggregators.plot_band_response(npz, out)
    assert os.path.exists(out)


def test_study_report(tmp_path):
    from avr_tpu.hpo.study import create_study

    study = create_study("rep", seed=0)
    study.optimize(lambda t: (t.suggest_float("x", -2, 2) - 0.5) ** 2, n_trials=15)
    out = str(tmp_path / "study.png")
    rep = aggregators.study_report(study, out)
    assert rep["n_trials"] == 15
    assert rep["running_best"][-1] == min(rep["values"])
    assert os.path.exists(out)


def test_meshrir_split_tool(tmp_path, rng):
    src = tmp_path / "raw"
    src.mkdir()
    for i in range(20):
        np.save(str(src / f"ir_{i:05d}.npy"), rng.normal(size=(1, 50)))
    np.save(str(src / "pos_mic.npy"), rng.normal(size=(20, 3)))
    train, test = tools.meshrir_split(str(src), str(tmp_path / "out"), seed=1)
    assert len(train) == 18 and len(test) == 2
    assert len(os.listdir(tmp_path / "out" / "train")) == 18
    assert len(os.listdir(tmp_path / "out" / "test")) == 2
    # deterministic given the seed
    train2, test2 = tools.meshrir_split(str(src), str(tmp_path / "out2"), seed=1)
    assert test == test2


def test_inspectors(tmp_path, rng):
    p = str(tmp_path / "a.npy")
    np.save(p, rng.normal(size=(3, 4)))
    info = tools.inspect_npy(p)
    assert info["shape"] == [3, 4]
    z = str(tmp_path / "b.npz")
    np.savez(z, ir=rng.normal(size=10), position_rx=np.ones(3))
    zi = tools.inspect_npz(z)
    assert set(zi) == {"ir", "position_rx"}


def test_waveform_level_summary(tmp_path):
    _fake_condition(tmp_path, "results_a.pkl")
    sub = tmp_path / "deeper"
    sub.mkdir()
    _fake_condition(sub, "results_b.pkl")
    out = tmp_path / "wl"
    df = aggregators.waveform_level_summary(str(tmp_path), str(out))
    # 2 pickles x 2 groups x 2 reductions
    assert len(df) == 8
    assert set(df["reduction"]) == {"mean", "median"}
    m = df[(df["reduction"] == "mean") & (df["group"] == 0)].iloc[0]
    assert abs(m["pred_deg"] - 46.64) < 0.5  # circular mean of 44/46/50
    assert os.path.exists(out / "scatter_wave_all.png")
    assert os.path.exists(out / "scatter_wave_all_median.png")
    assert os.path.exists(out / "waveform_level.csv")


def test_plot_rotate_results(tmp_path):
    import numpy as np

    npz = str(tmp_path / "val_rotate_pred.npz")
    np.savez(
        npz,
        pred_deg=np.asarray([10, 50, 100], np.int16),
        true_deg=np.asarray([12, 48, 95], np.int16),
        deg_step=np.float32(30.0),
    )
    out = str(tmp_path / "rotate.png")
    aggregators.plot_rotate_results(npz, out)
    assert os.path.exists(out)


def test_experiment_report(tmp_path):
    import json

    import numpy as np
    import yaml

    from test_doa import _fake_npz

    base = tmp_path / "logs" / "exp1"
    val = base / "val_result"
    val.mkdir(parents=True)
    # two checkpoints' npz dumps
    src = _fake_npz(tmp_path, [45.0, 120.0])
    import shutil

    shutil.copy(src, val / "val_iter000100.npz")
    shutil.copy(src, val / "val_iter000200.npz")
    with open(base / "metrics.jsonl", "w") as f:
        for step in (100, 200):
            f.write(json.dumps({"tag": "train_loss", "value": 1.0 / step,
                                "step": step}) + "\n")
    cfg = {
        "path": {"expname": "exp1", "logdir": str(tmp_path / "logs"),
                 "dataset_type": "Real_env"},
        "render": {"fs": 16000},
        "train": {}, "model": {},
    }
    cfg_path = str(tmp_path / "conf.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "report.png")
    doa_by_iter = aggregators.experiment_report(cfg_path, save_path=out)
    assert set(doa_by_iter) == {100, 200}
    assert all(np.isfinite(v) for v in doa_by_iter.values())
    assert os.path.exists(out)
    # resume-safe: cached pickles exist and a second run reuses them
    assert os.path.exists(base / "doa_results" / "doa_iter000100.pkl")
    again = aggregators.experiment_report(cfg_path, save_path=out)
    assert again == doa_by_iter
