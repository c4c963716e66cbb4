"""Sweep shell_chunk on the reference MeshRIR workload (simplex).

The flagship tuned shell_chunk=8 (docs/PERFORMANCE.md); the MeshRIR
shape (3202 rays x 64 samples x 2400-dim IR) was never swept — its
chunk-1 scan shows ~100 ms/step of while-loop + dynamic-update-slice
overhead in traces. Peak [bs,R,C,T] signal chunk at C=8 is ~1 GB f32,
so the sweep also watches for memory blowups.

Usage: python scripts/meshrir_chunk_ab.py [chunks...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, ".")
from avr_tpu.config import AVRConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402


def main():
    chunks = [int(c) for c in sys.argv[1:]] or [1, 2, 4, 8]
    os.environ.setdefault("AVR_TPU_DENSE_ONEHOT", "65536")
    with open("/root/reference/config_files/avr_meshrir.yml") as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    for enc in (cfg.model.pos_encoding_sigma, cfg.model.dir_encoding_sig,
                cfg.model.tx_encoding_sig):
        if enc is not None:
            enc.interpolation = "simplex"
    fst = field_lib.build_field(cfg.model, cfg.path.dataset_type)
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    bs = 4
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-0.5, 0.5, (bs, 3)), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)
    R = cfg.render.n_azi * cfg.render.n_ele + 2

    base = None
    for c in chunks:
        def loss_fn(p, _c=c):
            out = render_fused(
                p, fst, consts, cfg.render, rays_o, tx, key=key, shell_chunk=_c
            )
            return jnp.mean(jnp.abs(out - target))

        f = jax.jit(jax.value_and_grad(loss_fn))
        try:
            l, _ = f(params)
            float(l)
            t0 = time.perf_counter()
            for _ in range(3):
                l, _ = f(params)
            float(l)
            dt = (time.perf_counter() - t0) / 3
        except Exception as e:  # noqa: BLE001 — report OOM etc. per chunk
            print(f"chunk={c}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        base = base or dt
        print(
            f"chunk={c}: {dt * 1e3:.0f} ms/step {bs * R / dt:,.0f} rays/s "
            f"({base / dt:.2f}x)",
            flush=True,
        )
        f.clear_cache()


if __name__ == "__main__":
    main()
