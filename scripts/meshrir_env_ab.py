"""A/B env-var configurations on the reference MeshRIR workload shape.

Like scripts/ab_env.py but for the MeshRIR config (3202 rays x 64
samples x 2400-dim IR, dense one-hot on, shell_chunk 2).
Usage: python scripts/meshrir_env_ab.py [--interp=trilinear|simplex]
                                        "LABEL:VAR=V,VAR2=V2" ...
(default simplex; trilinear runs the reference's exact tcnn algorithm
and skips the dense-onehot default — control it per spec.)
Env vars are read at trace time; each spec compiles its own program.
Timing is fetch-forced.
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
    argv = sys.argv[1:]
    interp = "simplex"
    if argv and argv[0].startswith("--interp="):
        interp = argv[0].split("=", 1)[1]
        argv = argv[1:]
    specs = argv or ["base:"]
    if interp == "simplex":
        os.environ.setdefault("AVR_TPU_DENSE_ONEHOT", "65536")
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
    R = cfg.render.n_azi * cfg.render.n_ele + 2

    def loss_fn(p):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, key=key, shell_chunk=2,
            # trace-time A/B toggle for the scan's rematerialization
            remat=os.environ.get("AVR_TPU_AB_REMAT", "1") == "1",
        )
        return jnp.mean(jnp.abs(out - target))

    base = None
    for spec in specs:
        label, _, envs = spec.partition(":")
        set_keys = []
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
            set_keys.append(k)
        f = jax.jit(jax.value_and_grad(loss_fn))
        try:
            l, _ = f(params)
            float(l)
            t0 = time.perf_counter()
            for _ in range(3):
                l, _ = f(params)
            float(l)
            dt = (time.perf_counter() - t0) / 3
            base = base or dt
            print(
                f"{label}: {dt * 1e3:.0f} ms/step {bs * R / dt:,.0f} rays/s "
                f"({base / dt:.2f}x)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            f.clear_cache()
            for k in set_keys:
                del os.environ[k]


if __name__ == "__main__":
    main()
