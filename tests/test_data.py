"""Data pipeline tests: synthetic generation → format writers → loaders."""

import os
import pickle

import numpy as np
import pytest

from avr_tpu.data import loaders, sampler, synthetic, wav


@pytest.fixture(scope="module")
def room():
    return synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=2, fs=4000, seq_len=400)


def test_simulate_ir_physics(room):
    rng = np.random.default_rng(0)
    rx = np.asarray([1.0, 1.0, 1.0])
    tx = np.asarray([3.0, 2.0, 1.5])
    ir = synthetic.simulate_ir(room, rx, tx)
    assert ir.shape == (400,)
    d = np.linalg.norm(rx - tx)
    direct_idx = d / room.speed * room.fs
    # first significant arrival is the direct sound at the geometric delay
    # (coincident symmetric reflections may later exceed it — physical)
    first = np.argmax(np.abs(ir) > 0.2 * np.abs(ir).max())
    assert abs(first - direct_idx) < 4
    # nothing before the direct sound (minus the sinc tail)
    assert np.abs(ir[: int(direct_idx) - 5]).max() < np.abs(ir).max() * 0.05
    # reflections exist after the direct arrival
    assert np.abs(ir[int(direct_idx) + 10 :]).max() > 0


def test_wav_roundtrip(tmp_path, rng):
    x = rng.normal(size=1000).astype(np.float32) * 0.5
    p = str(tmp_path / "t.wav")
    wav.write_wav(p, x, 48000)
    y, sr = wav.read_wav(p)
    assert sr == 48000
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_simu_format_roundtrip(tmp_path, room):
    d = str(tmp_path / "simu")
    synthetic.write_simu_dataset(d, room, n=20)
    train = loaders.load_dataset(d, "Simu", eval=False, seq_len=400, fs=room.fs)
    test = loaders.load_dataset(d, "Simu", eval=True, seq_len=400, fs=room.fs)
    assert len(train) == 18 and len(test) == 2
    assert train.wave.shape == (18, 201)
    assert train.wave.dtype == np.complex64
    assert not train.has_channels


def test_real_env_format_roundtrip(tmp_path, room):
    d = str(tmp_path / "realenv")
    synthetic.write_real_env_dataset(d, room, n_groups=4)
    train = loaders.load_dataset(d, "Real_env", eval=False, seq_len=400, fs=room.fs)
    test = loaders.load_dataset(d, "Real_env", eval=True, seq_len=400, fs=room.fs)
    assert len(train) == 24 and len(test) == 8  # 3 groups train, 1 test
    assert train.has_channels
    np.testing.assert_array_equal(train.ch_idx[:8], np.arange(8))
    # mics of one group share a center within the array diameter
    grp = train.pos_rx[:8]
    assert np.linalg.norm(grp - grp.mean(0), axis=1).max() < 0.05


def test_meshrir_format_roundtrip(tmp_path, room):
    d = str(tmp_path / "meshrir")
    synthetic.write_meshrir_dataset(d, room, n=10)
    train = loaders.load_dataset(d, "MeshRIR", eval=False, seq_len=400, fs=room.fs)
    test = loaders.load_dataset(d, "MeshRIR", eval=True, seq_len=400, fs=room.fs)
    assert len(train) == 9 and len(test) == 1
    # loader must recover the synthesized IR through the stride/window path
    meta_rx = np.load(os.path.join(d, "pos_mic.npy"))
    ir_direct = synthetic.simulate_ir(room, meta_rx[0], np.load(os.path.join(d, "pos_src.npy"))[0])
    got = np.fft.irfft(train.wave[0], n=400)
    np.testing.assert_allclose(got, ir_direct, atol=1e-4)


def test_raf_format_roundtrip(tmp_path, room):
    d = str(tmp_path / "raf")
    synthetic.write_raf_dataset(d, room, n=10)
    train = loaders.load_dataset(d, "RAF", eval=False, seq_len=400, fs=room.fs)
    test = loaders.load_dataset(d, "RAF", eval=True, seq_len=400, fs=room.fs)
    assert len(train) == 8 and len(test) == 2
    assert train.has_tx_direction
    # identity quaternion → (0,−1,0) direction (loader convention)
    np.testing.assert_allclose(train.rot_tx[0], [0, -1, 0], atol=1e-6)
    # position roundtrip through the [0,2,1] permutation
    assert train.pos_rx.min() > 0 and train.pos_rx.max() < 4.0


def test_sampler_batching(tmp_path, room):
    d = str(tmp_path / "simu2")
    synthetic.write_simu_dataset(d, room, n=20)
    data = loaders.load_dataset(d, "Simu", eval=False, seq_len=400, fs=room.fs)
    s = sampler.BatchSampler(data, batch_size=4, seed=0)
    batches = list(s.epoch())
    assert len(batches) == len(data) // 4
    b = batches[0]
    assert b["wave"].shape == (4, 201, 2)
    assert b["pos_rx"].shape == (4, 3)
    assert "ch_idx" not in b
    # different epochs shuffle differently
    b2 = next(iter(s.epoch()))
    assert not np.allclose(b["pos_rx"], b2["pos_rx"])


def test_sampler_group8(tmp_path, room):
    d = str(tmp_path / "realenv2")
    synthetic.write_real_env_dataset(d, room, n_groups=5)
    data = loaders.load_dataset(d, "Real_env", eval=False, seq_len=400, fs=room.fs)
    s = sampler.BatchSampler(data, batch_size=8, group8=True, seed=1)
    for b in s.epoch():
        np.testing.assert_array_equal(b["ch_idx"], np.arange(8))


def test_raf_jitter(tmp_path, room):
    d = str(tmp_path / "raf2")
    synthetic.write_raf_dataset(d, room, n=10)
    data = loaders.load_dataset(d, "RAF", eval=False, seq_len=400, fs=room.fs)
    s = sampler.BatchSampler(data, batch_size=4, jitter=True, shuffle=False, seed=0)
    b1 = next(iter(s.epoch()))
    s2 = sampler.BatchSampler(data, batch_size=4, jitter=False, shuffle=False, seed=0)
    b2 = next(iter(s2.epoch()))
    delta = np.abs(b1["pos_rx"] - b2["pos_rx"])
    assert delta.max() > 0  # jitter applied
    assert delta.max() < 1.0  # ~N(0, 0.1²)
