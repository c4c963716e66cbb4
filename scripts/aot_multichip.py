"""AOT-compile the Pallas-bearing sharded train step for a REAL
multi-chip TPU topology — no chips needed (VERDICT r3 item 5).

The repo's multi-chip evidence so far ran on virtual CPU meshes (XLA
fallback for the scatter kernel) or a degenerate 1x1 chip mesh. This
script closes the gap: it builds the full flagship train step over a
(data x ray) mesh of a **v5e:2x4 topology description**
(jax.experimental.topologies — deviceless PjRt compile via the local
libtpu), with AVR_TPU_FORCE_TPU=1 so trace-time backend gates select the
production Pallas sorted-scatter path, and compiles it with the real TPU
compiler. Success proves the SPMD program containing `pl.pallas_call`
partitions and compiles for an 8-chip slice; the printed collective
table is the TPU-topology analog of docs/SCALING.md's CPU-mesh table.

Usage: python scripts/aot_multichip.py [topology=v5e:2x4] [data_parallel=2]
"""

import os
import re
import sys
import time

os.environ["AVR_TPU_FORCE_TPU"] = "1"  # select Pallas paths at trace time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.losses import CriterionConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.parallel.mesh import make_mesh_plan  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.train.state import init_state, make_train_step  # noqa: E402


def main():
    topo_name = sys.argv[1] if len(sys.argv) > 1 else "v5e:2x4"
    dp = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    td = topologies.get_topology_desc(topo_name, platform="tpu")
    plan = make_mesh_plan(td.devices, data_parallel=dp)
    print(f"topology {topo_name}: mesh {dict(plan.mesh.shape)}", flush=True)

    cfg = _flagship_config()  # FULL flagship shapes — the production program
    bs = 8
    cfg.train.batch_size = bs
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    step, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)

    state = jax.eval_shape(
        lambda k: init_state(k, fst, cfg.train), jax.random.PRNGKey(0)
    )
    rep = NamedSharding(plan.mesh, P())
    bsh = NamedSharding(plan.mesh, P("data"))
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), state
    )
    F = cfg.model.signal_output_dim // 2 + 1
    batch_abs = {
        "wave": jax.ShapeDtypeStruct((bs, F, 2), jnp.float32, sharding=bsh),
        "pos_rx": jax.ShapeDtypeStruct((bs, 3), jnp.float32, sharding=bsh),
        "pos_tx": jax.ShapeDtypeStruct((bs, 3), jnp.float32, sharding=bsh),
        "rot_tx": jax.ShapeDtypeStruct((bs, 3), jnp.float32, sharding=bsh),
    }
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
    it_abs = jax.ShapeDtypeStruct((), jnp.int32, sharding=rep)

    t0 = time.time()
    lowered = step.lower(state_abs, batch_abs, key_abs, it_abs, None)
    t_lower = time.time() - t0
    print(f"lowered in {t_lower:.1f}s", flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"COMPILED for {topo_name} in {t_compile:.1f}s", flush=True)

    txt = compiled.as_text()
    pallas_calls = len(re.findall(r'custom_call_target="tpu_custom_call"', txt))
    table = {
        op: len(re.findall(rf"\b{op}\b", txt))
        for op in (
            "all-reduce", "all-gather", "reduce-scatter",
            "collective-permute", "all-to-all",
        )
    }
    print(f"pallas (tpu_custom_call) kernels in partitioned HLO: {pallas_calls}")
    print("collective table:", table, flush=True)
    assert pallas_calls > 0, (
        "Pallas kernel absent from the compiled multi-chip program — "
        "trace-time backend gating routed to the XLA fallback"
    )
    assert table["all-reduce"] > 0, "no gradient/psum collectives found"
    # memory analysis of the partitioned program (per-chip)
    try:
        ma = compiled.memory_analysis()
        print(
            f"per-chip memory: args {ma.argument_size_in_bytes / 1e6:.0f} MB, "
            f"output {ma.output_size_in_bytes / 1e6:.0f} MB, "
            f"temp {ma.temp_size_in_bytes / 1e6:.0f} MB",
            flush=True,
        )
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")
    print("AOT MULTICHIP OK", flush=True)


if __name__ == "__main__":
    main()
