"""Tests for avr_tpu.ops.hash_scatter (TPU-native table-gradient path).

The Pallas sorted kernel itself needs TPU hardware (interpret-mode DMA
emulation is not usable here); on CPU these tests pin the XLA fallback,
the custom-VJP contract of gather_rows, and that the hash-grid encode
gradients are unchanged by the rewiring. The sorted kernel is validated
on-device by scripts/diag_scatter.py and the bench.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avr_tpu.models import hashgrid
from avr_tpu.config import EncodingConfig
from avr_tpu.ops import hash_scatter


def test_scatter_add_rows_xla_matches_numpy():
    rng = np.random.default_rng(0)
    M, E, F = 4096, 333, 4
    idx = rng.integers(0, E, M).astype(np.int32)
    upd = rng.normal(size=(M, F)).astype(np.float32)
    out = hash_scatter.scatter_add_rows(
        jnp.asarray(idx), jnp.asarray(upd), E, impl="xla"
    )
    ref = np.zeros((E, F), np.float32)
    np.add.at(ref, idx, upd)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gather_rows_forward_and_vjp():
    rng = np.random.default_rng(1)
    E, F = 97, 2
    table = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, (7, 5, 8)), jnp.int32)

    out = hash_scatter.gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])

    g = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    _, vjp = jax.vjp(lambda t: hash_scatter.gather_rows(t, idx), table)
    (dt,) = vjp(g)
    ref = np.zeros((E, F), np.float32)
    np.add.at(ref, np.asarray(idx).reshape(-1), np.asarray(g).reshape(-1, F))
    np.testing.assert_allclose(np.asarray(dt), ref, rtol=1e-5, atol=1e-5)


def test_encode_grads_match_direct_indexing():
    """hashgrid.encode with gather_rows == plain table[idx] autodiff."""
    cfg = EncodingConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=8,
        base_resolution=4, per_level_scale=1.6,
    )
    st = hashgrid.build_static(cfg)
    key = jax.random.PRNGKey(0)
    table = hashgrid.init(key, st)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    def loss_now(t):
        return jnp.sum(jnp.sin(hashgrid.encode(t, st, x)))

    def loss_plain(t):
        # re-derive with direct indexing (pre-rewire semantics)
        x1 = jnp.clip(x, 0.0, 1.0)
        res = jnp.asarray(st.resolutions, x.dtype)
        scaled = x1[..., None, :] * res[:, None]
        pos0 = jnp.floor(scaled).astype(jnp.int32)
        pos0 = jnp.clip(pos0, 0, jnp.asarray(st.resolutions, jnp.int32)[:, None] - 1)
        frac = scaled - pos0.astype(x.dtype)
        corner_i = jnp.asarray(
            [[(c >> d) & 1 for d in range(3)] for c in range(8)], dtype=jnp.int32
        )
        idx = hashgrid._flat_indices(st, pos0[..., :, None, :] + corner_i)
        feats = t[idx]
        corner = corner_i.astype(x.dtype)
        tt = frac[..., :, None, :]
        w = jnp.prod(corner * tt + (1.0 - corner) * (1.0 - tt), axis=-1)
        out = jnp.sum(feats * w[..., None], axis=-2)
        return jnp.sum(jnp.sin(out.reshape(x.shape[0], -1)))

    v1, g1 = jax.value_and_grad(loss_now)(table)
    v2, g2 = jax.value_and_grad(loss_plain)(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)


def test_encode_pair_still_matches_two_encodes():
    cfg = EncodingConfig(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=4, per_level_scale=2.0,
    )
    st = hashgrid.build_static(cfg)
    ta = hashgrid.init(jax.random.PRNGKey(0), st)
    tb = hashgrid.init(jax.random.PRNGKey(1), st)
    x = jax.random.uniform(jax.random.PRNGKey(2), (33, 3))
    ea, eb = hashgrid.encode_pair(ta, tb, st, x)
    np.testing.assert_allclose(
        np.asarray(ea), np.asarray(hashgrid.encode(ta, st, x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(eb), np.asarray(hashgrid.encode(tb, st, x)), rtol=1e-6
    )


def test_xla_scatter_unique_matches_numpy():
    rng = np.random.default_rng(7)
    for M, E in [(5000, 700), (1, 10), (513, 1)]:
        idx = rng.integers(0, E, M).astype(np.int32)
        upd = rng.normal(size=(M, 2)).astype(np.float32)
        out = jax.jit(
            lambda i, u: hash_scatter._xla_scatter_unique(i, u, E)
        )(jnp.asarray(idx), jnp.asarray(upd))
        ref = np.zeros((E, 2), np.float32)
        np.add.at(ref, idx, upd)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("edges", ["sampled", "exact"])
@pytest.mark.parametrize("tof", ["cumsum", "search"])
def test_tile_ranges_cover_and_schedule(monkeypatch, edges, tof):
    """_tile_ranges invariants, both edge-search and t_of modes.

    (1) every sorted row lies inside its tile's [b0·128, b1·128) block
    range; (2) exact-mode upper bounds are never exceeded by sampled
    slack on the low side by more than one block; (3) the global chunk
    schedule enumerates each tile's blocks contiguously from b0 with
    stride CB and gtot == cbase[-1] ≤ colblk's static length.
    """
    monkeypatch.setenv("AVR_TPU_SCATTER_EDGES", edges)
    monkeypatch.setenv("AVR_TPU_SCATTER_TOF", tof)
    rng = np.random.default_rng(42)
    TS, UC = 512, 1024
    CB = UC // 128
    for M, E in [(20_000, 3_000), (9_999, 70_000), (1024, 512)]:
        n_tiles = -(-E // TS)
        Mp = (M // UC + 2) * UC
        idx_s = jnp.asarray(np.sort(rng.integers(0, E, M)).astype(np.int32))
        blocks, cbase, colblk, gtot = jax.jit(
            lambda i: hash_scatter._tile_ranges(i, M, Mp, n_tiles, TS, UC)
        )(idx_s)
        b0, b1 = np.asarray(blocks)
        cbase, colblk, gtot = map(np.asarray, (cbase, colblk, gtot))
        idx_np = np.asarray(idx_s)
        starts = np.searchsorted(idx_np, np.arange(n_tiles + 1) * TS)
        # (1) coverage: tile t's rows live in [starts[t], starts[t+1])
        assert (b0 * 128 <= starts[:-1]).all()
        assert (b1 * 128 >= starts[1:]).all()
        # (2) tightness: ≤1 slack block per side
        assert (b0 * 128 >= np.maximum(starts[:-1] - 128, 0) - 127).all()
        assert (b1 * 128 <= starts[1:] + 127 + (0 if edges == "exact" else 0)).all()
        # (3) chunk schedule
        nch = -(-(b1 - b0) // CB)
        assert (cbase[1:] - cbase[:-1] == nch).all()
        assert gtot[0] == cbase[-1] <= len(colblk)
        for t in range(0, n_tiles, max(1, n_tiles // 50)):
            for k in range(nch[t]):
                g = cbase[t] + k
                assert colblk[g] == min(b0[t] + k * CB, (Mp - UC) // 128)


@pytest.mark.skipif(not hash_scatter.on_tpu(), reason="needs TPU hardware")
def test_sorted_scatter_on_tpu():
    rng = np.random.default_rng(0)
    M, E, F = 50_000, 7_000, 4
    idx = rng.integers(0, E, M).astype(np.int32)
    upd = rng.normal(size=(M, F)).astype(np.float32)
    out = hash_scatter.scatter_add_rows(
        jnp.asarray(idx), jnp.asarray(upd), E, impl="sorted"
    )
    ref = np.zeros((E, F), np.float32)
    np.add.at(ref, idx, upd)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_gather_rows_packed2_forward_and_vjp():
    """Packed-pair gather: forward equals the bf16-cast rows bitwise;
    backward equals the dense XLA scatter of the two cotangent planes."""
    rng = np.random.default_rng(5)
    E, L, M = 96, 3, 40
    table = jnp.asarray(rng.normal(size=(E, 2)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, (L, M)), jnp.int32)

    f0, f1 = hash_scatter.gather_rows_packed2(table, idx)
    want = np.asarray(table.astype(jnp.bfloat16)[idx], np.float32)
    np.testing.assert_array_equal(np.asarray(f0), want[..., 0])
    np.testing.assert_array_equal(np.asarray(f1), want[..., 1])

    g0 = jnp.asarray(rng.normal(size=(L, M)), jnp.float32)
    g1 = jnp.asarray(rng.normal(size=(L, M)), jnp.float32)

    def loss(t):
        a, b = hash_scatter.gather_rows_packed2(t, idx)
        return jnp.sum(a * g0) + jnp.sum(b * g1)

    got = np.asarray(jax.grad(loss)(table))
    want_g = np.zeros((E, 2), np.float32)
    np.add.at(want_g[:, 0], np.asarray(idx).reshape(-1), np.asarray(g0).reshape(-1))
    np.add.at(want_g[:, 1], np.asarray(idx).reshape(-1), np.asarray(g1).reshape(-1))
    np.testing.assert_allclose(got, want_g, rtol=1e-6, atol=1e-6)


def test_sorted_scatter_prepacked2_matches_xla():
    """The prepacked2 payload (one f32 word carrying a bf16 pair) sums
    like the XLA scatter of the unpacked pairs (kernel in interpret mode
    is fine here: no manual-DMA hang risk on this small case? — NO:
    interpret-mode emulation of the DMA kernel hangs (CLAUDE.md); use
    the host-side pack/unpack helpers instead)."""
    rng = np.random.default_rng(6)
    M, E = 512, 64
    idx = jnp.asarray(np.sort(rng.integers(0, E, M)).astype(np.int32))
    pair = rng.normal(size=(M, 2)).astype(np.float32)
    pair_bf = np.asarray(jnp.asarray(pair).astype(jnp.bfloat16))
    payload = jax.lax.bitcast_convert_type(
        jnp.asarray(pair_bf).astype(jnp.bfloat16), jnp.float32
    )
    # unpack must invert pack exactly
    bits = jax.lax.bitcast_convert_type(payload, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    np.testing.assert_array_equal(np.asarray(lo), pair_bf[:, 0].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(hi), pair_bf[:, 1].astype(np.float32))


def test_gather_rows_packed4_forward_and_vjp():
    """complex64-packed F=4 gather: bitwise forward, XLA-scatter grads."""
    rng = np.random.default_rng(7)
    E, L, M = 80, 2, 48
    table = jnp.asarray(rng.normal(size=(E, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, (L, M)), jnp.int32)

    planes = hash_scatter.gather_rows_packed4(table, idx)
    want = np.asarray(table.astype(jnp.bfloat16)[idx], np.float32)
    for j, p in enumerate(planes):
        np.testing.assert_array_equal(np.asarray(p), want[..., j])

    gs = [jnp.asarray(rng.normal(size=(L, M)), jnp.float32) for _ in range(4)]

    def loss(t):
        ps = hash_scatter.gather_rows_packed4(t, idx)
        return sum(jnp.sum(p * g) for p, g in zip(ps, gs))

    got = np.asarray(jax.grad(loss)(table))
    want_g = np.zeros((E, 4), np.float32)
    for j, g in enumerate(gs):
        np.add.at(want_g[:, j], np.asarray(idx).reshape(-1),
                  np.asarray(g).reshape(-1))
    np.testing.assert_allclose(got, want_g, rtol=1e-6, atol=1e-6)
