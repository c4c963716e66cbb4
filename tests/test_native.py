"""Native C++ fastload tests: build, decode parity with numpy, fallback."""

import numpy as np
import pytest

from avr_tpu import native
from avr_tpu.data import wav as wav_lib


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_version(lib):
    assert lib.avr_fastload_version() == 1


def test_npy_batch_matches_numpy(tmp_path, lib, rng):
    paths = []
    refs = []
    stride, start, seq_len = 2, 5, 50
    for i in range(6):
        a = rng.normal(size=(1, 300)).astype(np.float64 if i % 2 else np.float32)
        p = str(tmp_path / f"ir_{i}.npy")
        np.save(p, a)
        paths.append(p)
        strided = a[0, ::stride]
        win = strided[start : start + seq_len]
        refs.append(np.pad(win, (0, seq_len - len(win))))
    out = native.load_npy_batch(paths, seq_len, stride, start)
    np.testing.assert_allclose(out, np.stack(refs).astype(np.float32), rtol=1e-6)


def test_wav_batch_matches_python(tmp_path, lib, rng):
    paths, refs = [], []
    seq_len, stride = 80, 3
    for i in range(4):
        a = (rng.normal(size=400) * 0.3).astype(np.float32)
        p = str(tmp_path / f"r{i}.wav")
        wav_lib.write_wav(p, a, 48000)
        paths.append(p)
        s = a[::stride][:seq_len]
        refs.append(np.pad(s, (0, seq_len - len(s))))
    out = native.load_wav_batch(paths, seq_len, stride)
    np.testing.assert_allclose(out, np.stack(refs), atol=1e-6)


def test_pcm16_wav(tmp_path, lib):
    import struct

    sr, n = 16000, 100
    x = (np.sin(np.linspace(0, 20, n)) * 20000).astype(np.int16)
    payload = x.tobytes()
    p = str(tmp_path / "pcm.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    out = native.load_wav_batch([p], n, 1)
    np.testing.assert_allclose(out[0], x / 32768.0, atol=1e-4)


def test_error_on_missing_file(tmp_path, lib):
    with pytest.raises(IOError):
        native.load_npy_batch([str(tmp_path / "nope.npy")], 10, 1, 0)


def test_loader_integration_uses_native(tmp_path):
    """MeshRIR loader must produce identical data with/without native."""
    from avr_tpu.data import loaders, synthetic

    room = synthetic.RoomSpec(size=(4.0, 3.0, 2.5), max_order=1, fs=4000, seq_len=200)
    d = str(tmp_path / "mesh")
    synthetic.write_meshrir_dataset(d, room, n=6)
    ds_native = loaders.load_dataset(d, "MeshRIR", seq_len=200, fs=room.fs)

    import avr_tpu.native as nat

    saved = nat._build_failed, nat._lib
    nat._build_failed, nat._lib = True, None  # force python fallback
    try:
        ds_py = loaders.load_dataset(d, "MeshRIR", seq_len=200, fs=room.fs)
    finally:
        nat._build_failed, nat._lib = saved
    np.testing.assert_allclose(ds_native.wave.real, ds_py.wave.real, atol=1e-5)
    np.testing.assert_allclose(ds_native.wave.imag, ds_py.wave.imag, atol=1e-5)
