"""Sub-run sorted-scatter schedule correctness (round 5 sort attack).

AVR_TPU_SORT_SUBRUNS splits each level's row sort into S independent
sub-run sorts (measured 2.5-4.5x cheaper on chip, scripts/sort_probe.py)
and generalizes the scatter kernel's chunk schedule to cover the S
sorted runs per table tile (_subrun_ranges). The Pallas kernel itself is
unchanged and hardware-only (interpret-mode manual-DMA emulation hangs),
so these tests validate the SCHEDULE exactly by emulating the kernel's
chunk walk in numpy: for every tile, walk its chunks, reconstruct row
indices from the hi/lo f32 value rows, apply the tile-local masking the
one-hot performs, and accumulate. The result must equal a direct
scatter-add of the original stream BIT-EXACTLY (integer payloads) —
this catches coverage holes, double counting (chunk overrun into a
neighboring run), and mis-ordered chunk->tile mappings.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avr_tpu.ops import hash_scatter as hs


def _emulate(blocks, cbase, colblk, gtot, data, n_tiles, TS, UC, F):
    """Numpy re-implementation of _tile_kernel's accumulation contract."""
    blocks = np.asarray(blocks)
    cbase = np.asarray(cbase)
    colblk = np.asarray(colblk)
    data = np.asarray(data)
    CB = UC // 128
    out = np.zeros((n_tiles * TS, F), np.float64)
    total = int(np.asarray(gtot)[0])
    for t in range(n_tiles):
        nchunks = -(-(blocks[1, t] - blocks[0, t]) // CB)
        g0 = cbase[t]
        assert nchunks == cbase[t + 1] - g0, (
            "kernel chunk count (blocks) must equal the cbase diff"
        )
        for k in range(nchunks):
            g = g0 + k
            assert g < total
            c0 = colblk[g] * 128
            chunk = data[:, c0 : c0 + UC]
            idx = chunk[0].astype(np.int64) * 4096 + chunk[1].astype(np.int64)
            local = idx - t * TS
            sel = (local >= 0) & (local < TS)
            for u in np.nonzero(sel)[0]:
                out[t * TS + local[u]] += chunk[2 : 2 + F, u]
    return out


def _run_case(sizes, K, S, seed=0, F=2, TS=64, UC=128):
    rng = np.random.default_rng(seed)
    G = len(sizes)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    n_rows = int(offs[-1])
    bounds = tuple((int(offs[g]), int(offs[g + 1])) for g in range(G))
    idx = np.stack(
        [rng.integers(offs[g], offs[g + 1], size=K).astype(np.int32) for g in range(G)]
    )
    upd = rng.integers(-8, 9, size=(G, K, F)).astype(np.float32)

    n_tiles = -(-n_rows // TS)
    E_pad = n_tiles * TS

    def schedule(idx, upd):
        idx_s2, pays2, F_, packed = hs._pack_and_sort_stream(
            jnp.asarray(idx), jnp.asarray(upd), "f32", "f32", subruns=S
        )
        R, Kr = idx_s2.shape
        Kp = (-(-Kr // UC) + 1) * UC
        idx_p = jnp.pad(idx_s2, ((0, 0), (0, Kp - Kr)), constant_values=E_pad)
        flat = idx_p.reshape(-1)
        rows = [
            (flat >> 12).astype(jnp.float32),
            (flat & 4095).astype(jnp.float32),
        ] + [jnp.pad(p, ((0, 0), (0, Kp - Kr))).reshape(-1) for p in pays2]
        data = jnp.concatenate(
            [jnp.stack(rows),
             jnp.zeros((8 - 2 - len(pays2), R * Kp), jnp.float32)]
        )
        blocks, cbase, colblk, gtot = hs._subrun_ranges(
            idx_p, bounds, S, n_tiles, TS, UC
        )
        return blocks, cbase, colblk, gtot, data

    blocks, cbase, colblk, gtot, data = jax.jit(schedule)(idx, upd)
    got = _emulate(blocks, cbase, colblk, gtot, data, n_tiles, TS, UC, F)

    want = np.zeros((E_pad, F), np.float64)
    np.add.at(want, idx.reshape(-1), upd.reshape(-1, F).astype(np.float64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("S", [2, 4])
def test_subrun_schedule_exact_uniform_levels(S):
    _run_case(sizes=[256, 256, 256], K=1024, S=S)


@pytest.mark.parametrize("S", [2, 4, 8])
def test_subrun_schedule_unaligned_level_boundaries(S):
    # level boundaries NOT multiples of TS=64: tiles straddle levels
    _run_case(sizes=[100, 37, 333, 170], K=1024, S=S, seed=1)


def test_subrun_schedule_tiny_levels_share_tiles():
    # several whole levels inside ONE tile
    _run_case(sizes=[10, 7, 21, 400], K=512, S=2, seed=2, TS=256)


def test_subrun_schedule_wide_payload():
    _run_case(sizes=[128, 384], K=768, S=2, seed=3, F=4)


def test_subrun_factor_rules(monkeypatch):
    idx = jnp.zeros((4, 64 * 128), jnp.int32)
    upd = jnp.zeros((4, 64 * 128, 2), jnp.float32)
    bounds = tuple((i * 4096, (i + 1) * 4096) for i in range(4))
    streams = [(idx, upd)]
    # 2048 rows/tile = 16 blocks -> S=4 keeps >= 4 blocks per (tile, run)
    assert hs._subrun_factor(streams, bounds, 1024) == 4
    # no bounds / flat idx / multi-stream -> off
    assert hs._subrun_factor(streams, None, 1024) == 1
    assert hs._subrun_factor([(idx.reshape(-1), upd.reshape(-1, 2))], bounds, 1024) == 1
    assert hs._subrun_factor(streams + streams, bounds, 1024) == 1
    monkeypatch.setenv("AVR_TPU_SORT_SUBRUNS", "0")
    assert hs._subrun_factor(streams, bounds, 1024) == 1
    monkeypatch.setenv("AVR_TPU_SORT_SUBRUNS", "4")
    assert hs._subrun_factor(streams, bounds, 1024) == 4
    monkeypatch.setenv("AVR_TPU_SORT_SUBRUNS", "auto")
    # sparse stream (huge table, few rows/tile) -> stays 1
    sparse_bounds = tuple((i * (1 << 20), (i + 1) * (1 << 20)) for i in range(4))
    assert hs._subrun_factor(streams, sparse_bounds, 1024) == 1
