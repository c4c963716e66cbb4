"""Capture a jax.profiler trace of the MeshRIR-shaped fwd+bwd step.

Same workload as scripts/meshrir_env_ab.py (reference flagship config,
/root/reference/config_files/avr_meshrir.yml: 3202 rays x 64 samples x
2400-dim IR), but wrapped in a profiler trace so parse_trace.py can
attribute the step to ops. Env knobs are read from the environment —
set them in the invocation.

Usage: python scripts/trace_meshrir.py [--interp=trilinear|simplex] [logdir]
"""

import glob
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
    argv = sys.argv[1:]
    interp = "simplex"
    if argv and argv[0].startswith("--interp="):
        interp = argv[0].split("=", 1)[1]
        argv = argv[1:]
    logdir = argv[0] if argv else f"/tmp/meshrir_trace_{interp}"
    with open("/root/reference/config_files/avr_meshrir.yml") as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    for enc in (cfg.model.pos_encoding_sigma, cfg.model.dir_encoding_sig,
                cfg.model.tx_encoding_sig):
        if enc is not None:
            enc.interpolation = interp
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

    def loss_fn(p):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, key=key, shell_chunk=2,
        )
        return jnp.mean(jnp.abs(out - target))

    f = jax.jit(jax.value_and_grad(loss_fn))
    l, _ = f(params)
    print("warm loss", float(l), flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        l, _ = f(params)
    _ = float(l)
    print(f"pre-trace step: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms",
          flush=True)

    jax.profiler.start_trace(logdir)
    for _ in range(2):
        l, _ = f(params)
    _ = float(l)
    jax.profiler.stop_trace()
    print("trace written to", logdir, flush=True)
    for p in sorted(glob.glob(os.path.join(logdir, "**", "*"), recursive=True)):
        if os.path.isfile(p):
            print(f"  {os.path.getsize(p):>12}  {p}", flush=True)


if __name__ == "__main__":
    main()
