"""Test harness: force an 8-device CPU platform before JAX initializes.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multi-chip path. This file must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start;
# env vars alone cannot override it, so reset it here before any backend
# initializes. Tests always run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from avr_tpu.config import AVRConfig, EncodingConfig, MLPConfig, ModelConfig, RenderConfig  # noqa: E402


def tiny_model_config(signal_output_dim=64, complex_variant=False) -> ModelConfig:
    enc = EncodingConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=8, base_resolution=4,
        per_level_scale=1.5,
    )
    cfg = ModelConfig(
        signal_output_dim=signal_output_dim,
        leaky_relu=0.03,
        pos_encoding_sigma=enc,
        dir_encoding_sig=enc,
        tx_encoding_sig=enc,
        sigma_encoder_network=MLPConfig(n_neurons=32, n_hidden_layers=2),
        sigma_decoder_network=MLPConfig(n_neurons=32, n_hidden_layers=2),
        signal_network=MLPConfig(n_neurons=32, n_hidden_layers=2),
    )
    if complex_variant:
        cfg.tx_pos_encoding_sigma = enc
        cfg.pos_encoding_sig = enc
        cfg.tx_pos_encoding_sig = enc
        cfg.tx_dir_encoding_sig = enc
    return cfg


def tiny_render_config(n_samples=8, n_azi=6, n_ele=3, fs=2000) -> RenderConfig:
    return RenderConfig(
        xyz_min=[-4.0] * 3, xyz_max=[4.0] * 3,
        near=0.0, far=3.0,
        n_samples=n_samples, n_azi=n_azi, n_ele=n_ele,
        speed=343.8, fs=fs, pathloss=1.5,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
