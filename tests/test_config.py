"""Config loading tests: reference YAML schema compatibility.

The reference configs write exponent literals without a decimal point
('2e-4', reference/config_files/avr_raf_furnished.yml:25), which YAML
1.1 parses as STRINGS — the loader must coerce them to the declared
field types.
"""

import glob

import pytest
import yaml

from avr_tpu.config import AVRConfig

REF_CONFIGS = sorted(glob.glob("/root/reference/config_files/*.yml"))


def test_exponent_strings_coerced(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        """
path: {expname: e, dataset_type: Real_env, logdir: logs/x}
render: {xyz_min: -6, xyz_max: 6, fs: 16000, n_samples: 32}
train:
  lr: 1e-3
  eta_min: 1e-4
  weight_decay: 0
  total_iterations: 2e3
  batch_size: 8
model:
  signal_output_dim: 1600
  leaky_relu: 3e-2
"""
    )
    cfg = AVRConfig.from_yaml(str(p))
    assert isinstance(cfg.train.lr, float) and cfg.train.lr == 1e-3
    assert isinstance(cfg.train.eta_min, float) and cfg.train.eta_min == 1e-4
    assert isinstance(cfg.train.total_iterations, int)
    assert cfg.train.total_iterations == 2000
    assert cfg.model.leaky_relu == pytest.approx(0.03)
    # scalar bounds broadcast to 3-vectors (reference stores scalars)
    assert cfg.render.xyz_min == [-6.0] * 3
    # optimizer construction must not crash on coerced values
    from avr_tpu.train.state import make_optimizer

    make_optimizer(cfg.train)


@pytest.mark.skipif(not REF_CONFIGS, reason="reference not mounted")
@pytest.mark.parametrize(
    "path",
    [p for p in REF_CONFIGS if "/" not in p.replace("/root/reference/config_files/", "")],
)
def test_reference_yamls_load(path):
    cfg = AVRConfig.from_yaml(path)
    assert isinstance(cfg.train.lr, float)
    assert isinstance(cfg.train.eta_min, float)
    assert isinstance(cfg.render.fs, int)
    assert isinstance(cfg.render.near, float)
    assert isinstance(cfg.model.signal_output_dim, int)
    assert cfg.model.signal_output_dim > 0


def test_roundtrip(tmp_path):
    cfg = AVRConfig()
    cfg.train.lr = 5e-4
    cfg.path.expname = "rt"
    out = str(tmp_path / "rt.yml")
    cfg.to_yaml(out)
    cfg2 = AVRConfig.from_yaml(out)
    assert cfg2.train.lr == 5e-4
    assert cfg2.path.expname == "rt"


def test_extra_keys_preserved(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        "path: {expname: e}\nrender: {}\ntrain: {mystery_knob: 7}\nmodel: {}\n"
    )
    cfg = AVRConfig.from_yaml(str(p))
    assert cfg.train.extra["mystery_knob"] == 7


ALL_REF_CONFIGS = sorted(
    glob.glob("/root/reference/config_files/**/*.yml", recursive=True)
)


@pytest.mark.skipif(not ALL_REF_CONFIGS, reason="reference not mounted")
def test_every_reference_yaml_loads_and_builds():
    """ALL reference YAMLs (top-level + 180+ generated control-experiment
    variants incl. every channel-embedding/DAS combination) parse into the
    typed config AND construct field statics — the full model-config
    surface of make_config_for_control_exp.py / the Optuna mutators."""
    from avr_tpu.models import field as field_lib

    built = 0
    for path in ALL_REF_CONFIGS:
        cfg = AVRConfig.from_yaml(path)
        assert cfg.model.signal_output_dim > 0, path
        fst = field_lib.build_field(cfg.model, cfg.path.dataset_type)
        assert fst.signal_output_dim == cfg.model.signal_output_dim, path
        built += 1
    assert built >= 200, f"only {built} reference configs found"
