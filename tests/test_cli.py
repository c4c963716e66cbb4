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
