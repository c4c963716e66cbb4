"""Device-mesh planning and sharding for multi-chip rendering/training.

TPU-native replacement for the reference's NCCL DDP / DataParallel
(reference/avr_runner_ddp.py:37-46,98; avr_runner.py:63). There is no
process-group management: a 2-D ``jax.sharding.Mesh`` with axes

    ('data', 'ray')

shards the batch over 'data' and the spherical ray directions over 'ray'.
The renderer's per-ray computation is embarrassingly parallel up to the
final spherical integration (Σ over rays), which XLA's SPMD partitioner
turns into an all-reduce over the 'ray' axis riding ICI — the workload's
analog of context/sequence parallelism (SURVEY.md §2.12). Parameter
gradients are all-reduced over both axes by the same mechanism and the
latency-hiding scheduler overlaps them with the backward pass.

The model is tiny (MLPs + hash tables), so parameters stay fully
replicated; the scaling dimensions are batch and rays, exactly mirroring
how the reference scales (batch over GPUs; rays were never scaled there).

Why no 'freq' mesh axis (SURVEY.md §7 floated "frequency bins sharded
where profitable"): frequency bins are born INSIDE the step from an
rFFT along the time axis, so sharding F would put an all-to-all around
every per-shell FFT just to split an elementwise phase rotation whose
cost is ~1% of the step — while the big tensors ([bs, R, C, T] signal
chunks, the hash-table update streams) scale with rays and batch, not
F. Rays already give the same memory relief with one psum at the very
end. A freq axis would only pay if the phase-rotated spectrum itself
dominated memory, which the shell-chunked renderer avoids by design.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh
    data_axis: str = "data"
    ray_axis: str = "ray"

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_ray(self) -> int:
        return self.mesh.shape[self.ray_axis]

    # ---- shardings -------------------------------------------------
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.data_axis))

    def dirs_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.ray_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        s = self.batch_sharding()
        if jax.process_count() > 1:
            # multi-host: every process holds the SAME global batch (the
            # sampler is seed-synchronized). global_shape MUST be passed
            # as the full shape: without it JAX assumes each process
            # holds only its own rows and infers a global batch of
            # local_rows x n_processes — silently training on a
            # duplicated, double-size batch.
            return {
                k: jax.make_array_from_process_local_data(
                    s, v, global_shape=v.shape
                )
                for k, v in batch.items()
            }
        return {k: jax.device_put(v, s) for k, v in batch.items()}

    def shard_state(self, state):
        """Replicate a (state) pytree onto the mesh up front.

        Without this, the first train step takes unsharded arrays, its
        OUTPUT state carries mesh shardings, and the second call sees a
        new input signature → the whole step recompiles. Measured
        (scripts/spmd_overhead.py, r3): the duplicate compile dominated
        a 10-step timing loop and masqueraded as "+899% SPMD overhead";
        with state pre-replicated the mesh step compiles once and
        steady-state matches the meshless program.

        Multi-host: plain device_put cannot place data on another
        process's devices — build each replicated global array from the
        process-local copy instead (every process holds identical state;
        the seed is shared), mirroring shard_batch's branch.
        """
        s = self.replicated()
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    s, np.asarray(x), global_shape=np.shape(x)
                ),
                state,
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host run (the NCCL `init_process_group` analog,
    reference/avr_runner_ddp.py:37-46 — but one line, no rank plumbing).

    On TPU pod slices `jax.distributed.initialize()` auto-discovers the
    coordinator from the TPU metadata; elsewhere pass the coordinator
    address plus COUNT/RANK (or set JAX_COORDINATOR_ADDRESS etc.).
    Returns this host's process index. Safe to call when single-host
    (no-op).
    """
    import os

    if num_processes in (None, 1) and not (
        coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        try:
            jax.distributed.initialize()
        except Exception:
            return 0  # single-host / unmanaged environment
        return jax.process_index()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def make_mesh_plan(
    devices: Optional[Sequence[jax.Device]] = None,
    batch_size: Optional[int] = None,
    data_parallel: Optional[int] = None,
) -> MeshPlan:
    """Factor the device grid into (data, ray) axes.

    By default the data axis gets the largest power-of-two factor that
    divides the batch size (so batch shards are equal), and the remainder
    goes to ray parallelism — rays are abundant (650-3202 per query) so
    uneven ray shards cost little.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = 1
        if batch_size:
            while (
                data_parallel * 2 <= n
                and n % (data_parallel * 2) == 0
                and batch_size % (data_parallel * 2) == 0
            ):
                data_parallel *= 2
    if n % data_parallel:
        raise ValueError(f"{n} devices not divisible by data_parallel={data_parallel}")
    grid = np.asarray(devices).reshape(data_parallel, n // data_parallel)
    return MeshPlan(mesh=Mesh(grid, ("data", "ray")))
