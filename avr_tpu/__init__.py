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

from avr_tpu.config import AVRConfig, RenderConfig, TrainConfig  # noqa: F401
