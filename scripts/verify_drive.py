"""End-to-end verify drive (see .claude/skills/verify): render + grad
step, fused-vs-oracle parity, loss decrease. Run with arg `cpu` or
`axon`. On axon the grad step exercises the Pallas sorted-scatter
backward for the position hash tables.
"""

import sys
import time

import numpy as np

platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

sys.path.insert(0, ".")
from avr_tpu.config import AVRConfig  # noqa: E402
from avr_tpu.models import field  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402
from avr_tpu.render.oracle import render_oracle  # noqa: E402


def main(interp="trilinear"):
    with open("/root/reference/config_files/avr_meshrir.yml") as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    rc, mc = cfg.render, cfg.model
    rc.n_azi, rc.n_ele, rc.n_samples = 8, 4, 8
    T = 128
    mc.signal_output_dim = T
    shrunk = 0
    for name in (
        "pos_encoding_sigma", "dir_encoding_sig", "tx_encoding_sig",
        "tx_pos_encoding_sigma", "pos_encoding_sig", "tx_pos_encoding_sig",
        "tx_dir_encoding_sig",
    ):
        enc = getattr(mc, name, None)
        if enc is not None:
            enc.n_levels, enc.log2_hashmap_size, enc.base_resolution = 4, 10, 4
            enc.interpolation = interp
            shrunk += 1
    assert shrunk >= 3, f"encoding shrink matched only {shrunk} encodings"

    fst = field.build_field(mc, cfg.path.dataset_type)
    params = field.init(jax.random.PRNGKey(0), fst)
    consts = make_consts(rc, T)

    bs = 2
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    dirs = None  # deterministic directions (key=None)

    t0 = time.time()
    fused = jax.jit(
        lambda p: render_fused(p, fst, consts, rc, rays_o, tx, dirs=dirs)
    )
    out = fused(params)
    out_np = np.asarray(out)
    print(f"[{platform}] fused out {out.shape} finite={np.isfinite(out_np).all()} "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    fused32 = jax.jit(
        lambda p: render_fused(
            p, fst, consts, rc, rays_o, tx, dirs=dirs, compute_dtype=None
        )
    )
    oracle = jax.jit(
        lambda p: render_oracle(p, fst, consts, rc, rays_o, tx, dirs=dirs)
    )
    o32, orc = np.asarray(fused32(params)), np.asarray(oracle(params))
    scale = np.abs(orc).max() + 1e-12
    rel32 = np.abs(o32 - orc).max() / scale
    relbf = np.abs(out_np - orc).max() / scale
    print(f"[{platform}] parity fp32 rel={rel32:.2e} bf16 rel={relbf:.2e} "
          f"({time.time() - t0:.0f}s)", flush=True)
    assert rel32 < 5e-5, "fp32 parity"
    assert relbf < 3e-2, "bf16 parity"

    # grad step decreases loss (exercises Pallas scatter on TPU)
    F = T // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)

    def loss_fn(p):
        return jnp.mean(
            jnp.abs(render_fused(p, fst, consts, rc, rays_o, tx, dirs=dirs) - target)
        )

    t0 = time.time()
    vg = jax.jit(jax.value_and_grad(loss_fn))
    l0, g = vg(params)
    gnorm = jax.jit(
        lambda g: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    )(g)
    sgd = jax.jit(
        lambda p, g: jax.tree_util.tree_map(lambda a, b: a - 1.0 * b, p, g)
    )
    p1 = sgd(params, g)
    l1, _ = vg(p1)
    print(f"[{platform}] loss {float(l0):.12f} -> {float(l1):.12f} "
          f"|g|1={float(gnorm):.3e} ({time.time() - t0:.0f}s)", flush=True)
    assert float(l1) < float(l0), "loss must decrease"
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    print(f"[{platform}] VERIFY OK ({interp})", flush=True)


if __name__ == "__main__":
    main("trilinear")
    main("simplex")
    main("hybrid:2")  # mixed per-level interpolation (round 4)
