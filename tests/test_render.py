"""Renderer tests: oracle semantics, fused-vs-oracle parity (IR + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.models import field as field_lib
from avr_tpu.render import common, fused, oracle

from conftest import tiny_model_config, tiny_render_config


def _setup(complex_variant=False, T=64):
    mcfg = tiny_model_config(signal_output_dim=T, complex_variant=complex_variant)
    rc = tiny_render_config()
    fst = field_lib.build_field(mcfg, "RAF" if complex_variant else "MeshRIR")
    params = field_lib.init(jax.random.PRNGKey(7), fst)
    consts = common.make_consts(rc, T)
    return params, fst, consts, rc


def _batch(rng, bs, complex_variant=False):
    rays_o = jnp.asarray(rng.uniform(-1, 1, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-1, 1, (bs, 3)), jnp.float32)
    if complex_variant:
        d = rng.normal(size=(bs, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return rays_o, tx, jnp.asarray(d, jnp.float32)
    return rays_o, tx, None


def test_consts_shapes_and_values():
    rc = tiny_render_config(n_samples=8, fs=2000)
    T = 64
    c = common.make_consts(rc, T)
    F = T // 2 + 1
    assert c.tail_mask.shape == (8, T)
    assert c.pathloss.shape == (8, T)
    assert c.phase_re.shape == (8, F)
    # shell 0 at distance `near`=0: shift 0, tail mask zeroes only t=T−1
    tail0 = np.asarray(c.tail_mask[0])
    assert tail0[-1] == 0 and tail0[:-1].min() == 1
    # phase at k=0 is always 1+0j
    np.testing.assert_allclose(np.asarray(c.phase_re[:, 0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c.phase_im[:, 0]), 0.0, atol=1e-7)
    # path loss decays with distance beyond the near-field clamp
    pl = np.asarray(c.pathloss[-1])
    assert pl[0] >= pl[-1]


def test_compositing_weights_semantics():
    d_vals = jnp.linspace(0.0, 3.0, 5)
    # zero attenuation → zero alpha → zero weights
    w = common.compositing_weights(jnp.zeros((1, 2, 5)), d_vals)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-7)
    # huge attenuation on first sample → first weight ≈ 1, rest ≈ 0
    attn = jnp.zeros((1, 1, 5)).at[0, 0, 0].set(1e6)
    w = np.asarray(common.compositing_weights(attn, d_vals))
    assert w[0, 0, 0] > 0.99
    assert w[0, 0, 1:].max() < 1e-3
    # weights sum ≤ 1 (+ cumprod epsilon slack)
    attn = jnp.ones((1, 1, 5)) * 0.7
    w = np.asarray(common.compositing_weights(attn, d_vals))
    assert w.sum() <= 1.0 + 1e-4


def test_head_delay_mask():
    m = np.asarray(common.head_delay_mask(jnp.asarray([343.8]), 1000.0, 343.8, 8))
    # distance 343.8 m at c=343.8, fs=1k → 1000 samples, clamped to T−1=7
    assert m[0, :7].max() == 0 and m[0, 7] == 1
    m = np.asarray(common.head_delay_mask(jnp.asarray([0.0]), 1000.0, 343.8, 8))
    np.testing.assert_allclose(m[0], 1.0)


@pytest.mark.parametrize("complex_variant", [False, True])
def test_oracle_output_shape_and_finite(rng, complex_variant):
    params, fst, consts, rc = _setup(complex_variant)
    rays_o, tx, tx_view = _batch(rng, 2, complex_variant)
    out = oracle.render_oracle(
        params, fst, consts, rc, rays_o, tx, direction_tx=tx_view
    )
    T = fst.signal_output_dim
    assert out.shape == (2, T // 2 + 1, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("complex_variant", [False, True])
@pytest.mark.parametrize("shell_chunk", [1, 4])
@pytest.mark.parametrize("point_budget", [4_000_000, 0])  # precomputed | streaming
def test_fused_matches_oracle_forward(rng, complex_variant, shell_chunk, point_budget):
    params, fst, consts, rc = _setup(complex_variant)
    rays_o, tx, tx_view = _batch(rng, 2, complex_variant)
    kw = dict(direction_tx=tx_view)
    ref = np.asarray(
        oracle.render_oracle(params, fst, consts, rc, rays_o, tx, **kw)
    )
    got = np.asarray(
        fused.render_fused(
            params, fst, consts, rc, rays_o, tx, **kw,
            compute_dtype=None, shell_chunk=shell_chunk,
            point_budget=point_budget,
        )
    )
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-5)


@pytest.mark.parametrize("complex_variant", [False, True])
def test_scan_slice_mode_matches_default(monkeypatch, rng, complex_variant):
    """AVR_TPU_SCAN_SLICE=1 (dynamic-slice scan body) must reproduce the
    pre-stacked xs path bit-for-bit — same math, different data movement."""
    params, fst, consts, rc = _setup(complex_variant)
    rays_o, tx, tx_view = _batch(rng, 2, complex_variant)
    kw = dict(direction_tx=tx_view, compute_dtype=None, shell_chunk=4,
              point_budget=4_000_000)

    def run(flag):
        monkeypatch.setenv("AVR_TPU_SCAN_SLICE", flag)
        def f(p):
            out = fused.render_fused(p, fst, consts, rc, rays_o, tx, **kw)
            return jnp.sum(jnp.abs(out)), out
        (_, out), grads = jax.value_and_grad(f, has_aux=True)(params)
        return np.asarray(out), grads

    out0, g0 = run("0")
    out1, g1 = run("1")
    np.testing.assert_array_equal(out0, out1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        g0, g1,
    )


@pytest.mark.parametrize("point_budget", [4_000_000, 0])
def test_fused_matches_oracle_gradients(rng, point_budget):
    params, fst, consts, rc = _setup()
    rays_o, tx, _ = _batch(rng, 2)
    target = jnp.asarray(rng.normal(size=(2, fst.signal_output_dim // 2 + 1, 2)), jnp.float32)

    def loss_fn(render):
        def f(p):
            out = render(p, fst, consts, rc, rays_o, tx)
            return jnp.mean((out - target) ** 2)
        return f

    g_ref = jax.grad(loss_fn(lambda *a, **k: oracle.render_oracle(*a, **k)))(params)
    g_fus = jax.grad(
        loss_fn(
            lambda *a, **k: fused.render_fused(
                *a, **k, compute_dtype=None, shell_chunk=2,
                point_budget=point_budget,
            )
        )
    )(params)
    ref_flat, tree = jax.tree_util.tree_flatten(g_ref)
    fus_flat, tree2 = jax.tree_util.tree_flatten(g_fus)
    assert tree == tree2
    for a, b in zip(ref_flat, fus_flat):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)


def test_fused_with_channel_embedding(rng):
    from avr_tpu.config import ChannelEmbedConfig
    from conftest import tiny_model_config

    mcfg = tiny_model_config(signal_output_dim=64)
    mcfg.channel_embed = ChannelEmbedConfig(
        is_embed=True, connection_type="add", ch_num=8,
        is_sigma_encoder=True, is_signal_network=True,
    )
    rc = tiny_render_config()
    fst = field_lib.build_field(mcfg, "Real_env")
    params = field_lib.init(jax.random.PRNGKey(2), fst)
    consts = common.make_consts(rc, 64)
    rays_o, tx, _ = _batch(rng, 2)
    ch = jnp.asarray([0, 5], jnp.int32)
    ref = np.asarray(
        oracle.render_oracle(params, fst, consts, rc, rays_o, tx, ch_idx=ch)
    )
    got = np.asarray(
        fused.render_fused(
            params, fst, consts, rc, rays_o, tx, ch_idx=ch, compute_dtype=None
        )
    )
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-5)
    # channels actually matter
    got2 = np.asarray(
        fused.render_fused(
            params, fst, consts, rc, rays_o, tx,
            ch_idx=jnp.asarray([1, 1], jnp.int32), compute_dtype=None,
        )
    )
    assert np.abs(got - got2).max() > 1e-7


def test_random_azimuth_changes_output(rng):
    params, fst, consts, rc = _setup()
    rays_o, tx, _ = _batch(rng, 1)
    o1 = np.asarray(
        oracle.render_oracle(
            params, fst, consts, rc, rays_o, tx, key=jax.random.PRNGKey(0)
        )
    )
    o2 = np.asarray(
        oracle.render_oracle(
            params, fst, consts, rc, rays_o, tx, key=jax.random.PRNGKey(1)
        )
    )
    o1b = np.asarray(
        oracle.render_oracle(
            params, fst, consts, rc, rays_o, tx, key=jax.random.PRNGKey(0)
        )
    )
    assert np.abs(o1 - o2).max() > 1e-9  # different keys differ
    np.testing.assert_allclose(o1, o1b)  # same key reproduces


@pytest.mark.parametrize("remat", ["none", "dots", "dots_nb"])
def test_remat_policies_match_full(rng, remat):
    """Every rematerialization policy (render/fused._remat_wrap) must
    reproduce the default full-remat gradients exactly — policies change
    what the backward SAVES, never what it computes."""
    params, fst, consts, rc = _setup()
    rays_o, tx, _ = _batch(rng, 2)
    target = jnp.asarray(
        rng.normal(size=(2, fst.signal_output_dim // 2 + 1, 2)), jnp.float32
    )

    def grads(mode):
        def f(p):
            out = fused.render_fused(
                p, fst, consts, rc, rays_o, tx, compute_dtype=None,
                shell_chunk=2, point_budget=0, remat=mode,
            )
            return jnp.mean((out - target) ** 2)
        return jax.grad(f)(params)

    g_full = grads("full")
    g_pol = grads(remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g_full, g_pol,
    )
