"""Field unit tests: variants, channel conditioning, factored-query parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.config import ChannelEmbedConfig
from avr_tpu.models import field as field_lib
from avr_tpu.models import mlp

from conftest import tiny_model_config


def _setup(complex_variant=False, channel=None):
    cfg = tiny_model_config(signal_output_dim=48, complex_variant=complex_variant)
    if channel:
        cfg.channel_embed = channel
    fst = field_lib.build_field(cfg, "RAF" if complex_variant else "MeshRIR")
    params = field_lib.init(jax.random.PRNGKey(1), fst)
    return cfg, fst, params


def test_standard_shapes(rng):
    _, fst, params = _setup()
    pts = jnp.asarray(rng.uniform(-1, 1, (2, 10, 3)), jnp.float32)
    view = jnp.asarray(rng.uniform(-1, 1, (2, 10, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-1, 1, (2, 10, 3)), jnp.float32)
    attn, sig = field_lib.apply(params, fst, pts, view, tx)
    assert attn.shape == (2, 10, 1)
    assert sig.shape == (2, 10, 48)
    assert np.all(np.asarray(attn) >= 0)  # attn = |leaky_relu(raw)|


def test_complex_shapes(rng):
    _, fst, params = _setup(complex_variant=True)
    x = lambda: jnp.asarray(rng.uniform(-1, 1, (2, 6, 3)), jnp.float32)
    attn, sig = field_lib.apply(params, fst, x(), x(), x(), tx_view=x())
    assert attn.shape == (2, 6, 1)
    assert sig.shape == (2, 6, 48)
    with pytest.raises(ValueError):
        field_lib.apply(params, fst, x(), x(), x())  # tx_view required


@pytest.mark.parametrize("conn", ["add", "concat"])
def test_channel_embedding_modes(rng, conn):
    ch = ChannelEmbedConfig(
        is_embed=True, connection_type=conn, ch_num=4,
        is_sigma_encoder=True, is_sigma_decoder=True, is_signal_network=True,
        emb_dim_sigma_encoder=5, emb_dim_sigma_decoder=6, emb_dim_signal_network=7,
    )
    _, fst, params = _setup(channel=ch)
    pts = jnp.asarray(rng.uniform(-1, 1, (3, 4, 3)), jnp.float32)
    view = jnp.asarray(rng.uniform(-1, 1, (3, 4, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-1, 1, (3, 4, 3)), jnp.float32)
    ch0 = jnp.zeros((3, 4), jnp.int32)
    ch1 = jnp.ones((3, 4), jnp.int32)
    a0, s0 = field_lib.apply(params, fst, pts, view, tx, ch_idx=ch0)
    a1, s1 = field_lib.apply(params, fst, pts, view, tx, ch_idx=ch1)
    # different channels must produce different outputs
    assert np.abs(np.asarray(s0) - np.asarray(s1)).max() > 1e-6
    if conn == "add":
        assert fst.signal.inject and params["signal"]["emb"]
    else:
        assert "sig" in params["concat_emb"]


@pytest.mark.parametrize("complex_variant", [False, True])
def test_factored_query_matches_full_apply(rng, complex_variant):
    """The low-rank first-layer decomposition must be exact."""
    _, fst, params = _setup(complex_variant=complex_variant)
    bs, R = 2, 5
    dirs_np = rng.normal(size=(R, 3))
    dirs_np /= np.linalg.norm(dirs_np, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs_np, jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (bs, R, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-0.9, 0.9, (bs, 3)), jnp.float32)
    tx_view = jnp.asarray(dirs_np[:bs], jnp.float32)

    view = jnp.broadcast_to(-dirs[None, :, :], (bs, R, 3))
    tx_b = jnp.broadcast_to(tx[:, None, :], (bs, R, 3))
    tv_b = jnp.broadcast_to(tx_view[:, None, :], (bs, R, 3)) if complex_variant else None
    attn_full, sig_full = field_lib.apply(
        params, fst, pts, view, tx_b, tx_view=tv_b
    )

    sigma_feat, attn_fac = field_lib.sigma_query(
        params, fst, pts, tx=tx[:, None, :] if complex_variant else None
    )
    h_ray, h_batch = field_lib.signal_context(
        params, fst, dirs, tx, tx_view=tx_view if complex_variant else None
    )
    sig_fac = field_lib.signal_from_parts(
        params, fst, sigma_feat, pts, h_ray[None, :, :] + h_batch[:, None, :]
    )
    np.testing.assert_allclose(
        np.asarray(attn_fac), np.asarray(attn_full), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sig_fac), np.asarray(sig_full), rtol=2e-4, atol=2e-5
    )


def test_mlp_injection_changes_hidden_only(rng):
    st = mlp.MLPStatic(
        n_input_dims=8, n_output_dims=4, n_neurons=16, n_hidden_layers=2,
        inject=True, ch_num=3,
    )
    params = mlp.init(jax.random.PRNGKey(0), st)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    y0 = mlp.apply(params, st, x, ch_idx=jnp.zeros((5,), jnp.int32))
    y1 = mlp.apply(params, st, x, ch_idx=jnp.full((5,), 2, jnp.int32))
    assert np.abs(np.asarray(y0 - y1)).max() > 1e-6
    assert len(params["emb"]) == 2  # one per hidden layer, none on output


def test_mlp_gradients_flow(rng):
    st = mlp.MLPStatic(n_input_dims=8, n_output_dims=4, n_neurons=16, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0), st)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)

    g = jax.grad(lambda p: jnp.sum(mlp.apply(p, st, x) ** 2))(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert sum(float(jnp.abs(a).sum()) for a in flat) > 0
