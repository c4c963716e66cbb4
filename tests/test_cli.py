"""Smoke tests for the unified CLI (python -m avr_tpu ...).

Covers the reporting/tooling subcommands added for parity with the
reference's standalone scripts (plot_loss.py, check_data.py,
tools/meshrir_split.py) — train/hpo/doa flows are exercised by their own
test modules.
"""

import json
import os

import numpy as np
import pytest

from avr_tpu.__main__ import main


def test_cli_help(capsys):
    main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("train", "hpo", "doa", "rotate", "whitenoise", "plot", "tools"):
        assert cmd in out


def test_cli_unknown_command():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_cli_plot_loss(tmp_path):
    j = str(tmp_path / "metrics.jsonl")
    with open(j, "w") as f:
        for step in (20, 40):
            f.write(json.dumps({"tag": "train_loss", "value": 1.0 / step,
                                "step": step}) + "\n")
    out = str(tmp_path / "loss.png")
    main(["plot", "loss", j, "--save", out])
    assert os.path.exists(out)


def test_cli_tools_inspect_npz(tmp_path, capsys):
    p = str(tmp_path / "x.npz")
    np.savez(p, ir=np.ones((8, 16), np.float32), position_rx=np.zeros((8, 3)))
    main(["tools", "inspect", p])
    info = json.loads(capsys.readouterr().out)
    assert info["ir"]["shape"] == [8, 16]


def test_cli_tools_meshrir_split(tmp_path, capsys):
    src = tmp_path / "raw"
    src.mkdir()
    np.save(str(src / "pos_mic.npy"), np.zeros((20, 3)))
    np.save(str(src / "pos_src.npy"), np.zeros((1, 3)))
    for i in range(20):
        np.save(str(src / f"ir_{i:05d}.npy"), np.zeros(64, np.float32))
    main(["tools", "meshrir-split", str(src), "--test_ratio", "0.2"])
    res = json.loads(capsys.readouterr().out)
    assert res["train"] + res["test"] == 20 and res["test"] == 4


def test_cli_render_from_checkpoint(tmp_path):
    """`python -m avr_tpu render` renders IRs from a trained checkpoint
    for an npz of (rx, tx) queries, with time-domain + WAV export."""
    import numpy as np

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner
    from conftest import tiny_model_config, tiny_render_config

    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=1, fs=4000,
                              seq_len=256)
    d = str(tmp_path / "simu")
    synthetic.write_simu_dataset(d, room, n=8)
    rc = tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000)
    rc.far = 6.0
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [4.0] * 3
    cfg = AVRConfig(
        path=PathConfig(expname="r", dataset_type="Simu",
                        logdir=str(tmp_path / "logs")),
        render=rc,
        train=TrainConfig(lr=5e-3, total_iterations=2, save_freq=2,
                          val_freq=100, batch_size=4,
                          compute_dtype="float32", seed=0),
        model=tiny_model_config(signal_output_dim=256),
    )
    runner = AVRRunner(cfg, d)
    runner.train()
    conf = f"{runner.logdir}/avr_conf.yml"

    rng = np.random.default_rng(0)
    queries = str(tmp_path / "queries.npz")
    np.savez(queries,
             pos_rx=rng.uniform(1, 3, (5, 3)).astype(np.float32),
             pos_tx=rng.uniform(1, 3, (5, 3)).astype(np.float32))
    out = str(tmp_path / "irs.npz")
    wavs = str(tmp_path / "wavs")
    main(["render", "--config", conf, "--queries", queries, "--out", out,
          "--batch", "4", "--time_domain", "--wav_dir", wavs])

    z = np.load(out)
    assert z["spec"].shape == (5, 129) and z["spec"].dtype == np.complex64
    assert np.isfinite(z["spec"]).all()
    assert z["ir"].shape == (5, 256)
    assert len(os.listdir(wavs)) == 5


def test_cli_render_raf_with_rot_tx(tmp_path):
    """render CLI through the complex (RAF) variant: rot_tx queries are
    forwarded to the renderer's direction_tx."""
    import numpy as np

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner
    from conftest import tiny_model_config, tiny_render_config

    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=1, fs=4000,
                              seq_len=256)
    d = str(tmp_path / "raf")
    synthetic.write_raf_dataset(d, room, n=8)
    rc = tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000)
    rc.far = 6.0
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [4.0] * 3
    cfg = AVRConfig(
        path=PathConfig(expname="raf", dataset_type="RAF",
                        logdir=str(tmp_path / "logs")),
        render=rc,
        train=TrainConfig(lr=5e-3, total_iterations=2, save_freq=2,
                          val_freq=100, batch_size=4,
                          compute_dtype="float32", seed=0),
        model=tiny_model_config(signal_output_dim=256, complex_variant=True),
    )
    runner = AVRRunner(cfg, d)
    runner.train()

    rng = np.random.default_rng(0)
    rot = rng.normal(size=(3, 3))
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    queries = str(tmp_path / "q.npz")
    np.savez(queries,
             pos_rx=rng.uniform(1, 3, (3, 3)).astype(np.float32),
             pos_tx=rng.uniform(1, 3, (3, 3)).astype(np.float32),
             rot_tx=rot.astype(np.float32))
    out = str(tmp_path / "irs.npz")
    main(["render", "--config", f"{runner.logdir}/avr_conf.yml",
          "--queries", queries, "--out", out])
    z = np.load(out)
    assert z["spec"].shape == (3, 129)
    assert np.isfinite(z["spec"]).all()


def test_cli_render_refuses_without_checkpoint(tmp_path):
    """render must not silently produce garbage from random init."""
    import numpy as np
    import pytest

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from conftest import tiny_model_config, tiny_render_config

    cfg = AVRConfig(
        path=PathConfig(expname="empty", dataset_type="Simu",
                        logdir=str(tmp_path / "logs")),
        render=tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000),
        train=TrainConfig(batch_size=4, compute_dtype="float32"),
        model=tiny_model_config(signal_output_dim=256),
    )
    conf = str(tmp_path / "c.yml")
    cfg.to_yaml(conf)
    queries = str(tmp_path / "q.npz")
    rng = np.random.default_rng(0)
    np.savez(queries,
             pos_rx=rng.uniform(1, 3, (2, 3)).astype(np.float32),
             pos_tx=rng.uniform(1, 3, (2, 3)).astype(np.float32))
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["render", "--config", conf, "--queries", queries,
              "--out", str(tmp_path / "o.npz")])


def test_cli_render_validates_queries(tmp_path):
    """Zero-row or key-missing query npz exits with a clear message
    instead of an opaque concatenate/KeyError (ADVICE r1)."""
    import numpy as np
    import pytest

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from conftest import tiny_model_config, tiny_render_config

    cfg = AVRConfig(
        path=PathConfig(expname="qv", dataset_type="Simu",
                        logdir=str(tmp_path / "logs")),
        render=tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000),
        train=TrainConfig(batch_size=4, compute_dtype="float32"),
        model=tiny_model_config(signal_output_dim=256),
    )
    conf = str(tmp_path / "c.yml")
    cfg.to_yaml(conf)

    empty = str(tmp_path / "empty.npz")
    np.savez(empty,
             pos_rx=np.zeros((0, 3), np.float32),
             pos_tx=np.zeros((0, 3), np.float32))
    with pytest.raises(SystemExit, match="zero rows"):
        main(["render", "--config", conf, "--queries", empty,
              "--out", str(tmp_path / "o.npz")])

    nokeys = str(tmp_path / "nokeys.npz")
    np.savez(nokeys, pos_rx=np.zeros((2, 3), np.float32))
    with pytest.raises(SystemExit, match="missing required key"):
        main(["render", "--config", conf, "--queries", nokeys,
              "--out", str(tmp_path / "o.npz")])

    mismatch = str(tmp_path / "mismatch.npz")
    np.savez(mismatch,
             pos_rx=np.zeros((2, 3), np.float32),
             pos_tx=np.zeros((3, 3), np.float32))
    with pytest.raises(SystemExit, match="rows"):
        main(["render", "--config", conf, "--queries", mismatch,
              "--out", str(tmp_path / "o.npz")])


def test_cli_render_ignores_group8_sampling(tmp_path):
    """Inference must not trip the DAS group-8 train-sampler invariant
    (query counts are arbitrary)."""
    import numpy as np

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner
    from conftest import tiny_model_config, tiny_render_config

    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=1, fs=4000,
                              seq_len=256)
    d = str(tmp_path / "arr")
    synthetic.write_real_env_dataset(d, room, n_groups=2, seed=0)
    rc = tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000)
    rc.far = 6.0
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [4.0] * 3
    cfg = AVRConfig(
        path=PathConfig(expname="g8", dataset_type="Real_env",
                        logdir=str(tmp_path / "logs")),
        render=rc,
        train=TrainConfig(lr=5e-3, total_iterations=2, save_freq=2,
                          val_freq=100, batch_size=8,
                          das_reg_loss_weight=1.0,
                          compute_dtype="float32", seed=0,
                          extra={"group_sampling": True}),
        model=tiny_model_config(signal_output_dim=256),
    )
    runner = AVRRunner(cfg, d)
    runner.train()

    rng = np.random.default_rng(0)
    queries = str(tmp_path / "q.npz")
    np.savez(queries,  # 3 queries: NOT a multiple of 8
             pos_rx=rng.uniform(1, 3, (3, 3)).astype(np.float32),
             pos_tx=rng.uniform(1, 3, (3, 3)).astype(np.float32),
             ch_idx=np.arange(3, dtype=np.int32))
    out = str(tmp_path / "o.npz")
    main(["render", "--config", f"{runner.logdir}/avr_conf.yml",
          "--queries", queries, "--out", out])
    z = np.load(out)
    assert z["spec"].shape[0] == 3 and np.isfinite(z["spec"]).all()


def test_cli_train_test_mode_loads_checkpoint(tmp_path, capsys):
    """--mode test on a finished logdir evaluates the TRAINED model:
    load_ckpt is forced on even if the backed-up config said false."""
    import numpy as np

    from avr_tpu.__main__ import main
    from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
    from avr_tpu.data import synthetic
    from avr_tpu.train.runner import AVRRunner
    from conftest import tiny_model_config, tiny_render_config

    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=1, fs=4000,
                              seq_len=256)
    d = str(tmp_path / "simu")
    synthetic.write_simu_dataset(d, room, n=8)
    rc = tiny_render_config(n_samples=4, n_azi=4, n_ele=2, fs=4000)
    rc.far = 6.0
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [4.0] * 3
    cfg = AVRConfig(
        path=PathConfig(expname="tm", dataset_type="Simu",
                        logdir=str(tmp_path / "logs")),
        render=rc,
        train=TrainConfig(lr=5e-3, total_iterations=2, save_freq=2,
                          val_freq=100, batch_size=4,
                          compute_dtype="float32", seed=0),
        model=tiny_model_config(signal_output_dim=256),
    )
    runner = AVRRunner(cfg, d)
    runner.train()

    # config backup has load_ckpt: false; test mode must load anyway
    main(["train", "--mode", "test", "--config", runner.logdir,
          "--dataset_dir", d])
    log = open(os.path.join(runner.logdir, "train.log")).read()
    assert "resumed from checkpoint step 2" in log
    npzs = os.listdir(os.path.join(runner.logdir, "val_result"))
    assert any("000002" in f for f in npzs)


def test_cli_plot_detail_scatters_and_loss_epoch(tmp_path):
    """The new plot kinds (doa-detail, das-detail, loss-epoch) run from
    the CLI over synthetic logdir artifacts."""
    import json
    import pickle

    import numpy as np

    from avr_tpu.__main__ import main

    logdir = tmp_path / "exp"
    rng = np.random.default_rng(0)

    def fake_pkls(sub, methods):
        d = logdir / sub
        d.mkdir(parents=True)
        for it, err in ((1000, 30.0), (2000, 8.0)):
            gt = rng.uniform(0, 360, 10)
            rec = {
                "true_deg": list(gt), "gt_deg": list(gt),
                "pred_deg": list((gt + err) % 360),
                "pred_vs_gt_error": [err] * 10,
                "pred_vs_true_error": [err] * 10,
                "gt_vs_true_error": [0.0] * 10,
            }
            with open(d / f"val_iter{it:06d}.pkl", "wb") as f:
                pickle.dump({m: rec for m in methods}, f)

    fake_pkls("doa_results", ["NormMUSIC"])
    fake_pkls("beamform_results", ["NormDAS_soft-argmax", "NormDAS_argmax"])
    with open(logdir / "metrics.jsonl", "w") as f:
        for step in (100, 200, 300):
            f.write(json.dumps({"tag": "train_loss/spec",
                                "value": 1.0 / step, "step": step}) + "\n")

    for kind, out in (("doa-detail", "dd.png"), ("das-detail", "das.png"),
                      ("loss-epoch", "le.png")):
        save = str(tmp_path / out)
        main(["plot", kind, str(logdir), "--save", save])
        import os

        assert os.path.getsize(save) > 10_000


def test_interp_gate_decision_on_committed_ab(capsys):
    """The committed full-budget A/B must keep gating the headline flip.

    Locks scripts/interp_gate.py's decision rule to the round-3 artifact
    (results/interp_fullbudget/ab_summary.json): simplex measured worse
    than trilinear outside seed noise on Angle, so the gate must demand
    the trilinear flip that __graft_entry__/bench.py now ship. If a
    future A/B overwrites the summary with different conclusions, this
    test flags that the shipped default needs re-gating.
    """
    import runpy
    import sys as _sys

    root = os.path.join(os.path.dirname(__file__), "..")
    summary = os.path.join(root, "results", "interp_fullbudget", "ab_summary.json")
    assert os.path.exists(summary), "committed quality A/B summary missing"
    argv, _sys.argv = _sys.argv, ["interp_gate.py", summary]
    try:
        with pytest.raises(SystemExit) as ei:
            runpy.run_path(
                os.path.join(root, "scripts", "interp_gate.py"),
                run_name="__main__",
            )
    finally:
        _sys.argv = argv
    assert ei.value.code == 1, "gate no longer demands the trilinear flip"
    out = capsys.readouterr().out
    # the decisive line must name Angle in its flip set — a bare
    # "Angle" substring check is trivially satisfied by the per-metric
    # table rows printed for every run (ADVICE r3).
    gate_lines = [l for l in out.splitlines() if "flip headline to TRILINEAR" in l]
    assert gate_lines, "gate verdict line missing"
    flip_set = gate_lines[0].split("worse outside seed noise on:")[-1]
    assert "Angle" in flip_set, f"Angle not in the gate's flip set: {gate_lines[0]}"


def test_interp_gate_hybridc_candidate_passes(capsys):
    """The round-4 headline: coarse-trilinear hybridc (levels:tttt+s*8 on
    the 12-level A/B config) passes the quality gate against trilinear
    over 3 committed seeds — within seed noise on every metric, DoA
    objective better on average. Guards the shipped hybridc headline the
    same way the previous test guards the simplex->trilinear flip."""
    import runpy
    import sys as _sys

    root = os.path.join(os.path.dirname(__file__), "..")
    argv, _sys.argv = _sys.argv, [
        "interp_gate.py", "--logs", "--candidate", "levels:ttttssssssss",
    ]
    cwd = os.getcwd()
    try:
        os.chdir(root)
        with pytest.raises(SystemExit) as ei:
            runpy.run_path(
                os.path.join(root, "scripts", "interp_gate.py"),
                run_name="__main__",
            )
    finally:
        os.chdir(cwd)
        _sys.argv = argv
    assert ei.value.code == 0, "hybridc candidate no longer passes the gate"
    out = capsys.readouterr().out
    assert "headline stands" in out
