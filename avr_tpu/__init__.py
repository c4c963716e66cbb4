"""avr_tpu — TPU-native differentiable acoustic volume rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of KMASAHIRO/AVR
(penn-waves-lab "Acoustic Volume Rendering for Neural Impulse Response Fields",
NeurIPS 2024): neural impulse-response fields rendered by casting rays on a
sphere around a listener, querying a hash-grid-encoded neural field for
attenuation and per-point emitted time signals, applying frequency-domain
propagation delays, and alpha-compositing along rays with spherical
integration.

Design principles (TPU-first, not a port):
  * functional core — params are pytrees, every compute path is jit-able
  * static shapes everywhere; `lax.scan` over sample shells instead of
    materializing the `[batch, rays, samples, freq]` complex tensor that is
    the reference's peak-memory driver (reference/renderer.py:106-109)
  * factored field queries: direction / transmitter encodings are computed
    once per ray / per batch element and folded into the first matmul of the
    signal network (low-rank input decomposition) instead of being
    re-encoded for every sample point as the reference does
  * multi-chip scaling via `jax.sharding.Mesh` + `shard_map`, with partial
    spherical integrals combined by `psum` — the workload's analog of
    context parallelism (there is no NCCL/DDP translation)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the flagship render step takes minutes to
# compile on the remote TPU backend; cache compiled executables across
# processes (bench, trainers, eval scripts, tests). Opt out with
# AVR_TPU_NO_COMPILE_CACHE=1 or override via JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("AVR_TPU_NO_COMPILE_CACHE"):
    if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "avr_tpu_jax_cache"
        )
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avr_tpu.config import AVRConfig, RenderConfig, TrainConfig  # noqa: F401
