"""Shared MeshRIR flagship workload setup for the A/B and trace scripts.

Single source of truth for the reference MeshRIR-shaped fwd+bwd step
(/root/reference/config_files/avr_meshrir.yml: 3202 rays x 64 samples x
2400-dim IR) so scripts/meshrir_env_ab.py and scripts/trace_meshrir.py
time and trace the SAME program — the two setups had drifted on the
remat kwarg (round-2 advisor finding), which would have made a trace
silently profile a different program than the A/B it was explaining.

All env knobs (including AVR_TPU_AB_REMAT) are read at trace time
inside loss_fn, so callers can flip them per jit without rebuilding.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, ".")
from avr_tpu.config import AVRConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402


def build(interp: str, bs: int = 4, shell_chunk: int = 2):
    """Returns (loss_fn, params, bs, n_rays) for the MeshRIR step.

    loss_fn closes over fixed random inputs (seeded) and reads
    AVR_TPU_AB_REMAT at trace time (default on — the measured-best
    configuration, docs/PERFORMANCE.md remat sweep).
    """
    with open("/root/reference/config_files/avr_meshrir.yml") as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    for enc in (cfg.model.pos_encoding_sigma, cfg.model.dir_encoding_sig,
                cfg.model.tx_encoding_sig):
        if enc is not None:
            enc.interpolation = interp
    fst = field_lib.build_field(cfg.model, cfg.path.dataset_type)
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, key=key,
            shell_chunk=shell_chunk,
            # trace-time A/B toggle for the scan's rematerialization
            remat=os.environ.get("AVR_TPU_AB_REMAT", "1") == "1",
        )
        return jnp.mean(jnp.abs(out - target))

    return loss_fn, params, bs, cfg.render.n_azi * cfg.render.n_ele + 2
