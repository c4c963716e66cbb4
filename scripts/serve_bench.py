"""Forward-only (inference) render throughput on the flagship workload.

bench.py times fwd+bwd training renders; serving renders IRs with no
gradient. Times jit(render_fused) at batch 4 (training default) and 16
(server batching), fetch-forced.

Usage: python scripts/serve_bench.py [steps=20]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.render.fused import render_fused  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    R = cfg.render.n_rays
    rng = np.random.default_rng(0)

    for bs in (4, 16):
        rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
        tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
        d = rng.normal(size=(bs, 3))
        tx_view = jnp.asarray(
            d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32
        )

        @jax.jit
        def fwd(p, ro, t, tv):
            return render_fused(
                p, fst, consts, cfg.render, ro, t, direction_tx=tv,
                key=jax.random.PRNGKey(0),
                shell_chunk=cfg.train.shell_chunk,
            )

        out = fwd(params, rays_o, tx, tx_view)
        float(out[0, 0, 0])  # fetch barrier
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(params, rays_o, tx, tx_view)
        float(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / steps
        print(
            f"batch={bs}: {dt * 1e3:.1f} ms/render-call "
            f"{bs * R / dt:,.0f} rays/s {bs / dt:,.1f} IRs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
