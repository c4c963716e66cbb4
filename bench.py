"""Benchmark: rays/s/chip for the fwd+bwd frequency-domain render.

Measures the flagship RAF-Furnished workload (650 rays × 32 samples ×
1600-dim IR @ 16 kHz, batch 4 — reference/config_files/
avr_raf_furnished.yml:16-44): one full value_and_grad of the spectral
loss through the fused renderer per step, on whatever device JAX selects
(the real TPU chip under the driver). Headline mode = hybridc:7
(quality-gated coarse-trilinear/fine-simplex mix, round 4 — see
__graft_entry__._flagship_config); AVR_TPU_BENCH_INTERP=trilinear runs
the bit-parity tcnn mode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
two secondary keys (VERDICT r3 item 8): ``meshrir_ms_per_step`` /
``meshrir_rays_per_s`` (the UNMODIFIED reference avr_meshrir.yml shape —
3202 rays × 64 samples, 2400-dim IR @ 24 kHz, batch 4, fwd+bwd) and
``serving_fwd_rays_per_s`` (forward-only flagship render at batch 16).
Set AVR_TPU_BENCH_EXTRAS=0 to print only the headline.
``vs_baseline`` is relative to BASELINE_RAYS_S, the first recorded
single-chip measurement of this workload on TPU v5e (this repo's own
round-1 anchor — the reference publishes no numbers, BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_config
from avr_tpu.models import field as field_lib
from avr_tpu.render.common import make_consts
from avr_tpu.render.fused import render_fused

# First recorded single-chip fwd+bwd measurement of this workload
# (TPU v5e, round 1, 2026-08-17): 2687 rays/s. vs_baseline tracks
# speedup over this repo's own first end-to-end measurement — the
# reference publishes no numbers to compare against (BASELINE.md).
BASELINE_RAYS_S = 2687.0


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)

    bs = cfg.train.batch_size
    R = cfg.render.n_rays
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    F = cfg.model.signal_output_dim // 2 + 1
    target = jnp.asarray(rng.normal(size=(bs, F, 2)) * 1e-3, jnp.float32)

    def loss_fn(p, key):
        out = render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=key, shell_chunk=cfg.train.shell_chunk,
        )
        return jnp.mean(jnp.abs(out - target))

    # Fold the step index into the key INSIDE jit — eager key-splitting in
    # the timing loop costs ~100s of ms of host dispatch on this backend.
    grad_fn = jax.jit(
        lambda p, i: jax.value_and_grad(loss_fn)(p, jax.random.fold_in(jax.random.PRNGKey(0), i))
    )

    # warmup/compile. NOTE: on the axon remote backend block_until_ready
    # does not actually block — a device→host scalar fetch is the only
    # reliable completion barrier, and device execution is sequential, so
    # fetching the last step's loss waits for every queued step.
    loss, grads = grad_fn(params, 0)
    float(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        loss, grads = grad_fn(params, i + 1)
    float(loss)
    dt = time.perf_counter() - t0

    rays_per_s = bs * R * steps / dt
    result = {
        "metric": "rays_per_s_per_chip_fwd_bwd",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_S, 3),
    }
    if os.environ.get("AVR_TPU_BENCH_EXTRAS", "1") != "0":
        for k, fn in (("meshrir", _bench_meshrir), ("serving", _bench_serving)):
            try:
                result.update(fn())
            except Exception as e:  # extras must never sink the headline
                import traceback

                traceback.print_exc(file=sys.stderr)  # full cause to stderr
                result[f"{k}_error"] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(result))


def _bench_meshrir(steps: int = 3) -> dict:
    """Fwd+bwd step on the unmodified reference MeshRIR config
    (reference/config_files/avr_meshrir.yml; scripts/bench_meshrir.py is
    the standalone version with tracing)."""
    import yaml

    from avr_tpu.config import AVRConfig

    ref_root = os.environ.get("AVR_TPU_REFERENCE_DIR", "/root/reference")
    with open(os.path.join(ref_root, "config_files", "avr_meshrir.yml")) as f:
        cfg = AVRConfig.from_dict(yaml.safe_load(f))
    # headline mode (quality-gated hybridc mix); AVR_TPU_BENCH_INTERP
    # overrides (e.g. trilinear for the tcnn-parity measurement —
    # scripts/bench_meshrir.py is the standalone per-mode harness)
    interp = os.environ.get("AVR_TPU_BENCH_INTERP", "hybridc:7")
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
        out = render_fused(p, fst, consts, cfg.render, rays_o, tx, key=key)
        return jnp.mean(jnp.abs(out - target))

    f = jax.jit(jax.value_and_grad(loss_fn))
    l, _ = f(params)
    float(l)  # fetch barrier (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    for _ in range(steps):
        l, _ = f(params)
    float(l)
    dt = (time.perf_counter() - t0) / steps
    R = cfg.render.n_azi * cfg.render.n_ele + 2
    return {
        "meshrir_ms_per_step": round(dt * 1e3, 1),
        "meshrir_rays_per_s": round(bs * R / dt, 1),
    }


def _bench_serving(steps: int = 10, bs: int = 16) -> dict:
    """Forward-only flagship render at server batching (scripts/
    serve_bench.py is the standalone version)."""
    cfg = _flagship_config()
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    params = field_lib.init(jax.random.PRNGKey(0), fst)
    R = cfg.render.n_rays
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    tx = jnp.asarray(rng.uniform(-2, 2, (bs, 3)), jnp.float32)
    d = rng.normal(size=(bs, 3))
    tx_view = jnp.asarray(
        d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32
    )

    @jax.jit
    def fwd(p):
        return render_fused(
            p, fst, consts, cfg.render, rays_o, tx, direction_tx=tx_view,
            key=jax.random.PRNGKey(0), shell_chunk=cfg.train.shell_chunk,
        )

    out = fwd(params)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params)
    float(out[0, 0, 0])
    dt = time.perf_counter() - t0
    return {"serving_fwd_rays_per_s": round(bs * R * steps / dt, 1)}


if __name__ == "__main__":
    main()
