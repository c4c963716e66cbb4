"""Numeric execution of the multi-device shard_map scatter path.

The Pallas sorted scatter cannot be GSPMD-partitioned, so on >1-device
meshes `scatter_add_rows` runs as a shard_map: each device scatters its
block of the row stream into a full-size table gradient and the blocks
are psum-combined (avr_tpu/ops/hash_scatter.py, the replicated-table
analog of NCCL-DDP's gradient all-reduce,
reference/avr_runner_ddp.py:45,257). Round 4 proved this path only as an
AOT compile artifact (v5e:2x4); these tests EXECUTE the wrap numerically
on the 8-device CPU mesh with the backend-agnostic local-XLA body —
including the uneven-stream (M % ndev != 0) zero-pad branch that
previously fell back to the serial HLO scatter silently (advisor r4).

Updates are integer-valued floats so device-partial-sum + psum equals the
single-device sum EXACTLY (no fp32 rounding ambiguity).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from avr_tpu.ops import hash_scatter


def _mesh(shape=(2, 4), names=("data", "ray")):
    devs = np.array(jax.devices("cpu")[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _int_stream(rng, m, n_rows, f):
    idx = rng.integers(0, n_rows, size=m).astype(np.int32)
    upd = rng.integers(-8, 9, size=(m, f)).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(upd)


@pytest.mark.parametrize("m", [4096, 4096 + 5])  # even and M % 8 != 0
def test_shard_map_scatter_matches_single_device(m):
    rng = np.random.default_rng(0)
    n_rows, f = 257, 4
    idx, upd = _int_stream(rng, m, n_rows, f)

    base = hash_scatter.scatter_add_rows(idx, upd, n_rows, impl="xla")
    with hash_scatter.spmd_mesh(_mesh()):
        sharded = jax.jit(
            lambda i, u: hash_scatter.scatter_add_rows(i, u, n_rows, impl="xla")
        )(idx, upd)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


def test_shard_map_scatter_group_structured_2d():
    """2-D [G, K] group-structured streams shard along K; the duplicated-
    index zero-update pad preserves each group's ascending segment."""
    rng = np.random.default_rng(1)
    G, K, f = 3, 1000 + 3, 2  # K % 8 != 0 exercises the pad
    sizes = [64, 128, 256]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    n_rows = int(offs[-1])
    idx = np.stack(
        [
            rng.integers(offs[g], offs[g + 1], size=K).astype(np.int32)
            for g in range(G)
        ]
    )
    upd = rng.integers(-8, 9, size=(G, K, f)).astype(np.float32)
    idx, upd = jnp.asarray(idx), jnp.asarray(upd)

    base = hash_scatter.scatter_add_rows(idx, upd, n_rows, impl="xla")
    with hash_scatter.spmd_mesh(_mesh()):
        sharded = jax.jit(
            lambda i, u: hash_scatter.scatter_add_rows(i, u, n_rows, impl="xla")
        )(idx, upd)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


def test_shard_map_scatter_compiles_to_all_reduce():
    """The wrap's psum must survive into the compiled module as a real
    collective (the structure the TPU path rides over ICI)."""
    rng = np.random.default_rng(2)
    n_rows = 64
    idx, upd = _int_stream(rng, 512, n_rows, 2)
    mesh = _mesh()
    with hash_scatter.spmd_mesh(mesh):
        lowered = jax.jit(
            lambda i, u: hash_scatter.scatter_add_rows(i, u, n_rows, impl="xla")
        ).lower(idx, upd)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo


def test_spmd_scatter_env_off_restores_single_path(monkeypatch):
    monkeypatch.setenv("AVR_TPU_SPMD_SCATTER", "off")
    rng = np.random.default_rng(3)
    n_rows = 64
    idx, upd = _int_stream(rng, 512, n_rows, 2)
    base = hash_scatter.scatter_add_rows(idx, upd, n_rows, impl="xla")
    with hash_scatter.spmd_mesh(_mesh()):
        off = hash_scatter.scatter_add_rows(idx, upd, n_rows, impl="xla")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))
