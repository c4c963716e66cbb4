"""Vectorized (population) HPO: the vmapped K-trial step must reproduce
K serial runtime-variant trials exactly, and the PopulationRunner must
produce per-trial val npz dumps the standard DoA objective can consume.
Reference analog: optuna_avr_runner.py:141-164 runs trials strictly
serially — the population path is a TPU-native capability on top."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.config import AVRConfig, PathConfig, TrainConfig
from avr_tpu.data import synthetic
from avr_tpu.hpo.population import PopulationRunner
from avr_tpu.hpo.study import Study
from avr_tpu.losses import CriterionConfig
from avr_tpu.models import field as field_lib
from avr_tpu.render.common import make_consts
from avr_tpu.train.state import init_state, make_hparams, make_train_step

from conftest import tiny_model_config, tiny_render_config


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=2, fs=4000, seq_len=256)
    d = str(tmp_path_factory.mktemp("simu_pop"))
    synthetic.write_simu_dataset(d, room, n=24)
    return d


def tiny_cfg(logdir: str, name: str = "tiny", lr: float = 5e-3) -> AVRConfig:
    rc = tiny_render_config(n_samples=8, n_azi=6, n_ele=3, fs=4000)
    rc.far = 6.0
    rc.xyz_min, rc.xyz_max = [0.0] * 3, [4.0] * 3
    cfg = AVRConfig(
        path=PathConfig(expname=name, dataset_type="Simu", logdir=logdir),
        render=rc,
        train=TrainConfig(
            lr=lr, T_max=50, eta_min=1e-4, total_iterations=8,
            save_freq=100, val_freq=4, batch_size=4, log_freq=4,
            compute_dtype="float32", seed=0,
        ),
        model=tiny_model_config(signal_output_dim=256),
    )
    cfg.train.runtime_hparams = True
    return cfg


def test_ask_tell_surface():
    """ask() hands out monotonically distinct numbers before any tell();
    tell() records values the best_* surface sees (Optuna's batched
    ask/tell protocol, used by the population driver)."""
    study = Study("s", n_startup=2)
    a, b, c = study.ask(), study.ask(), study.ask()
    assert [a.number, b.number, c.number] == [0, 1, 2]
    a.suggest_float("lr", 1e-6, 1e-4, log=True)
    b.suggest_float("lr", 1e-6, 1e-4, log=True)
    c.suggest_float("lr", 1e-6, 1e-4, log=True)
    study.tell(b, 5.0)
    study.tell(a, 9.0)
    study.tell(c, None, state="FAIL")
    assert study.best_value == 5.0
    assert study.best_trial["number"] == 1
    # numbering continues past told + failed trials
    assert study.ask().number == 3


def test_enqueue_trial_seeds_values():
    """enqueue_trial serves fixed values (clamped to range) to the next
    asked trial only — the seed-lane mechanism of the population study."""
    study = Study("s", n_startup=2)
    study.enqueue_trial({"lr": 1e-3, "x": 5})
    t = study.ask()
    assert t.suggest_float("lr", 1e-6, 2e-3, log=True) == 1e-3
    assert t.suggest_int("x", 0, 3) == 3  # clamped to high
    t2 = study.ask()
    v = t2.suggest_float("lr", 1e-6, 2e-3, log=True)
    assert 1e-6 <= v <= 2e-3 and v != 1e-3  # sampled, not replayed


def test_population_step_matches_serial():
    """One vmapped population step == K independent runtime-variant
    steps with the same data/key (exact: same program per lane)."""
    cfg = tiny_cfg("/tmp/unused")
    tc = cfg.train
    fst = field_lib.build_field(cfg.model, "Simu")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(tc, cfg.render)

    bs, F = tc.batch_size, cfg.model.signal_output_dim // 2 + 1
    rng = np.random.default_rng(0)
    batch = {
        "wave": jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-2, jnp.float32),
        "pos_rx": jnp.asarray(rng.uniform(0.5, 3.5, (bs, 3)), jnp.float32),
        "pos_tx": jnp.asarray(rng.uniform(0.5, 3.5, (bs, 3)), jnp.float32),
    }
    key, it = jax.random.PRNGKey(1), jnp.asarray(3, jnp.int32)

    tcs = []
    for lr, spec_w in ((5e-3, 1.0), (1e-4, 20.0)):
        t2 = copy.deepcopy(tc)
        t2.lr, t2.spec_loss_weight = lr, spec_w
        tcs.append(t2)

    # serial: one step per trial
    serial_states, serial_bundles = [], []
    step1, _ = make_train_step(fst, consts, cfg.render, tc, crit, None)
    for t2 in tcs:
        s, b = step1(
            init_state(jax.random.PRNGKey(0), fst, t2), batch, key, it,
            make_hparams(t2),
        )
        serial_states.append(s)
        serial_bundles.append(b)

    # population: one vmapped step for both trials
    stepK, _ = make_train_step(fst, consts, cfg.render, tc, crit, None,
                               population=2)
    state1 = init_state(jax.random.PRNGKey(0), fst, tc)
    stateK = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state1)
    hpK = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[make_hparams(t2) for t2 in tcs]
    )
    sK, bK = stepK(stateK, batch, key, it, hpK)

    for k in range(2):
        np.testing.assert_allclose(
            float(serial_bundles[k].total), float(np.asarray(bK.total)[k]),
            rtol=1e-6,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(serial_states[k].params),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x[k], sK.params)
            ),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
            )
    # the two lanes actually diverged (different lr)
    la = jax.tree_util.tree_leaves(sK.params)[0]
    assert not np.allclose(np.asarray(la)[0], np.asarray(la)[1])


def test_population_runner_end2end(tmp_path, dataset_dir):
    """PopulationRunner trains K=2 trials in lockstep and writes each
    trial's val_iter npz with the reference schema; different hparams
    produce different predictions."""
    logdir = str(tmp_path / "pop")
    cfgs = [
        tiny_cfg(logdir, name=f"trial{i}", lr=lr)
        for i, lr in enumerate((5e-3, 1e-6))
    ]
    pop = PopulationRunner(cfgs, dataset_dir)
    pop.train(log=lambda *a: None)
    assert int(pop.state.step[0]) == 8

    preds = []
    for i in range(2):
        npz_dir = os.path.join(logdir, f"trial{i}", "val_result")
        files = sorted(os.listdir(npz_dir))
        assert files == ["val_iter000004.npz", "val_iter000008.npz"]
        z = np.load(os.path.join(npz_dir, files[-1]))
        for key in ("ori_sig", "pred_sig", "position_rx", "position_tx", "fs"):
            assert key in z, key
        assert z["pred_sig"].dtype == np.complex64
        assert z["pred_sig"].shape == z["ori_sig"].shape
        preds.append(z["pred_sig"])
    assert not np.allclose(preds[0], preds[1]), (
        "population lanes with lr 5e-3 vs 1e-6 rendered identical "
        "predictions — trials are not actually independent"
    )


def test_population_rejects_structural_mismatch(tmp_path, dataset_dir):
    logdir = str(tmp_path / "bad")
    a = tiny_cfg(logdir, name="a")
    b = tiny_cfg(logdir, name="b")
    b.render.n_samples = 16  # structural: changes the program
    with pytest.raises(ValueError, match="structurally"):
        PopulationRunner([a, b], dataset_dir)
