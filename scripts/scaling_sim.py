"""Multi-chip scaling evidence on a virtual CPU device mesh.

Runs the FULL sharded training step (losses + Adam + NaN guards) on
virtual device meshes and produces, per mesh:

  * loss parity with single-device execution (bit-level tolerance);
  * the collectives the SPMD partitioner inserted (the psum over 'ray'
    for the spherical integral and the gradient all-reduce —
    parallel/mesh.py docstring; the TPU-native analog of the reference's
    NCCL all-reduce, avr_runner_ddp.py:45), with PER-DEVICE COMMUNICATION
    BYTES parsed from the partitioned HLO (shapes there are already
    per-partition) and per-device FLOPs from XLA cost analysis;
  * the RAY-SHARD BALANCE study for the RAF-Furnished ray count
    R = 36·18+2 = 650 = 2·5²·13 over ray axes {2, 4, 8}: the train step
    pads dirs to a multiple of the axis with zero-weight rays
    (train/state.pad_rays), so every shard is identical and the only
    waste is the inert pad rays (reported as waste %).

A markdown table of the results is written to docs/SCALING.md.

Usage: python scripts/scaling_sim.py [n_virtual_devices=8] [--full]
(CPU only; sets the fake-device flag itself, must be launched fresh, not
inside another jax process. 16 exercises the BASELINE.md 16-chip mesh
shapes, incl. a data=4 x ray=4 grid. --full compiles the FULL
flagship-scale step (small=False) for the 8/16-device meshes and
appends its per-device collective bytes to docs/SCALING.md — compile
only, no execution: a full-scale step is impractical on host CPU, but
collective structure and per-partition byte counts come from the
partitioned HLO alone.)
"""

import os
import re
import sys

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
FULL = "--full" in sys.argv[1:]
N_DEV = int(_args[0]) if _args else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_config  # noqa: E402
from avr_tpu.losses import CriterionConfig  # noqa: E402
from avr_tpu.models import field as field_lib  # noqa: E402
from avr_tpu.parallel.mesh import make_mesh_plan  # noqa: E402
from avr_tpu.render.common import make_consts  # noqa: E402
from avr_tpu.train.state import init_state, make_train_step  # noqa: E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "c64": 8, "c128": 16,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def collective_bytes(hlo: str):
    """{op kind: (count, per-device bytes)} from partitioned HLO text.

    Shapes in the compiled (post-SPMD) module are per-partition, so the
    parsed result-shape bytes are what ONE device moves per step.
    Handles VARIADIC collectives too — XLA fuses the parameter-gradient
    reduction into one tuple-shaped all-reduce, e.g.
    "%ar = (f32[16,8]{1,0}, f32[4,16]{1,0}) all-reduce(...)" — by
    capturing the whole result-shape string and summing every
    dtype[dims] element inside it."""
    out = {}
    pat = re.compile(
        r"= ((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\]\S*)) ("
        + "|".join(_COLLECTIVES) + r")(?:-start)?\("
    )
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for shapes, kind in pat.findall(hlo):
        b = 0
        for dt, dims in shape_pat.findall(shapes):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b += n * _DTYPE_BYTES.get(dt, 4)
        c, tot = out.get(kind, (0, 0))
        out[kind] = (c + 1, tot + b)
    return out


def run(n_devices: int, data_parallel=None, bs: int = 8, n_azi=None, n_ele=None,
        small: bool = True, execute: bool = True):
    cfg = _flagship_config(small=small)
    cfg.train.batch_size = bs
    if n_azi:
        cfg.render.n_azi, cfg.render.n_ele = n_azi, n_ele
    plan = make_mesh_plan(
        jax.devices()[:n_devices], batch_size=bs, data_parallel=data_parallel
    )
    fst = field_lib.build_field(cfg.model, "RAF")
    consts = make_consts(cfg.render, cfg.model.signal_output_dim)
    crit = CriterionConfig.from_configs(cfg.train, cfg.render)
    step_fn, _ = make_train_step(fst, consts, cfg.render, cfg.train, crit, plan)
    state = init_state(jax.random.PRNGKey(0), fst, cfg.train)
    if plan is not None:
        state = plan.shard_state(state)  # avoid step-2 resharding recompile

    rng = np.random.default_rng(0)
    F = cfg.model.signal_output_dim // 2 + 1
    batch_np = {
        "wave": rng.normal(size=(bs, F, 2)).astype(np.float32) * 1e-2,
        "pos_rx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "pos_tx": rng.uniform(-2, 2, (bs, 3)).astype(np.float32),
        "rot_tx": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (bs, 1)),
    }
    batch = plan.shard_batch(batch_np)
    key = jax.random.PRNGKey(1)

    compiled = step_fn.lower(state, batch, key).compile()
    hlo = compiled.as_text()
    comm = collective_bytes(hlo)
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan"))) if cost else float("nan")

    total = float("nan")
    if execute:
        state2, bundle = step_fn(state, batch, key)
        total = float(jax.device_get(bundle.total))

    R = cfg.render.n_azi * cfg.render.n_ele + 2
    pad = (-R) % plan.n_ray
    return {
        "plan": plan, "loss": total, "comm": comm, "flops": flops,
        "R": R, "R_pad": R + pad, "pad": pad,
        "shard_rays": (R + pad) // plan.n_ray,
    }


def fmt_comm(comm) -> str:
    if not comm:
        return "none"
    return " ".join(
        f"{k}:{c}x/{b/1e6:.2f}MB" for k, (c, b) in sorted(comm.items())
    )


def main():
    # (8, 2) forces a data=2 × ray=4 mesh: rays shard over 'ray' and the
    # spherical integral's psum + gradient all-reduce both appear.
    # Each batch size gets its own single-device reference loss.
    meshes = [(1, None, 8), (2, None, 8), (4, None, 8), (8, None, 8),
              (8, 2, 8)]
    if N_DEV >= 16:
        meshes += [(1, None, 16), (16, None, 16), (16, 4, 16)]
    rows = []
    ref_by_key = {}
    for n, dp, bs in meshes:
        r = run(n, dp, bs)
        plan = r["plan"]
        ref = ref_by_key.setdefault(("base", bs), r["loss"])
        rel = abs(r["loss"] - ref) / max(abs(ref), 1e-12)
        ar_b = r["comm"].get("all-reduce", (0, 0))[1]
        print(
            f"devices={n} bs={bs} mesh=(data={plan.n_data} x ray={plan.n_ray}) "
            f"loss={r['loss']:.8f} rel-vs-1dev={rel:.2e} "
            f"flops/dev={r['flops']/1e9:.2f}G comm[{fmt_comm(r['comm'])}]",
            flush=True,
        )
        assert rel < 2e-4, "sharded loss diverged from single-device"
        rows.append({
            "mesh": f"{n} dev (data={plan.n_data}×ray={plan.n_ray}), bs={bs}",
            "R": f"{r['R']}", "waste": "0.0%",
            "flops": r["flops"], "ar_bytes": ar_b, "comm": fmt_comm(r["comm"]),
            "rel": rel,
        })

    # ---- R=650 ray-shard balance study (RAF-Furnished ray count) --------
    print("\n-- ray-shard balance, R = 36*18+2 = 650 --", flush=True)
    ref650 = None
    for dp in (8, 4, 2, 1):  # ray axis 1, 2, 4, 8
        if N_DEV < 8:
            break
        r = run(8, dp, 8, n_azi=36, n_ele=18)
        plan = r["plan"]
        if ref650 is None:
            ref650 = r["loss"]
        rel = abs(r["loss"] - ref650) / max(abs(ref650), 1e-12)
        waste = 100.0 * r["pad"] / r["R_pad"]
        print(
            f"ray={plan.n_ray}: R 650 -> pad {r['R_pad']} "
            f"({r['shard_rays']}/shard, waste {waste:.2f}%) "
            f"loss={r['loss']:.8f} rel={rel:.2e} "
            f"flops/dev={r['flops']/1e9:.2f}G comm[{fmt_comm(r['comm'])}]",
            flush=True,
        )
        assert rel < 2e-4, "padded ray sharding changed the loss"
        rows.append({
            "mesh": f"8 dev (data={plan.n_data}×ray={plan.n_ray}), bs=8",
            "R": f"650→{r['R_pad']}", "waste": f"{waste:.2f}%",
            "flops": r["flops"],
            "ar_bytes": r["comm"].get("all-reduce", (0, 0))[1],
            "comm": fmt_comm(r["comm"]), "rel": rel,
        })

    _write_docs(rows)
    print("SCALING SIM OK")


def main_full():
    """Full-flagship-scale (small=False) collective bytes, compile-only."""
    meshes = [(8, None, 8), (8, 2, 8)]
    if N_DEV >= 16:
        meshes += [(16, None, 16), (16, 4, 16)]
    rows = []
    for n, dp, bs in meshes:
        r = run(n, dp, bs, small=False, execute=False)
        plan = r["plan"]
        waste = 100.0 * r["pad"] / r["R_pad"]
        print(
            f"devices={n} bs={bs} mesh=(data={plan.n_data} x ray={plan.n_ray}) "
            f"R {r['R']}->{r['R_pad']} (waste {waste:.2f}%) "
            f"flops/dev={r['flops']/1e12:.3f}T comm[{fmt_comm(r['comm'])}]",
            flush=True,
        )
        rows.append({
            "mesh": f"{n} dev (data={plan.n_data}×ray={plan.n_ray}), bs={bs}",
            "R": f"{r['R']}→{r['R_pad']}", "waste": f"{waste:.2f}%",
            "flops": r["flops"],
            "ar_bytes": r["comm"].get("all-reduce", (0, 0))[1],
            "comm": fmt_comm(r["comm"]), "rel": float("nan"),
        })
    _append_full_docs(rows)
    print("SCALING SIM FULL OK")


_FULL_HEADER = "\n## Full flagship scale (small=False, compile-only)\n"


def _append_full_docs(rows) -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "SCALING.md")
    with open(path) as f:
        text = f.read()
    # idempotent: drop a previous full-scale section before re-appending,
    # but PRESERVE any hand-written sections that follow it (the r3 SPMD
    # overhead + r4 AOT sections were silently lost once — r5)
    head, sep, rest = text.partition(_FULL_HEADER)
    tail = ""
    if sep:
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:]
    with open(path, "w") as f:
        f.write(head)
        if tail:
            pass  # re-attached after the regenerated table below
        f.write(
            _FULL_HEADER
            + "\nSame sharded train step at the REAL RAF-Furnished scale\n"
            "(650 rays × 32 samples × 1600-dim IR, full model), compiled\n"
            "for virtual 8/16-device meshes (`scripts/scaling_sim.py N\n"
            "--full`). Per-device collective bytes are parsed from the\n"
            "partitioned HLO; no execution (loss parity is established at\n"
            "dry-run scale above — the partitioner's choices, not float\n"
            "values, are what change with scale).\n\n"
            "| mesh | rays (pad) | waste | flops/dev | all-reduce B/dev | collectives |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['mesh']} | {r['R']} | {r['waste']} | "
                f"{r['flops']/1e12:.3f}T | {r['ar_bytes']/1e6:.2f}MB | "
                f"{r['comm']} |\n"
            )
        if tail:
            f.write(tail)
    print(f"table appended -> {os.path.abspath(path)}", flush=True)


def _write_docs(rows) -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "SCALING.md")
    # keep a previously generated full-scale section across rewrites
    full_section = ""
    if os.path.exists(path):
        with open(path) as f:
            parts = f.read().split(_FULL_HEADER)
        if len(parts) == 2:
            full_section = _FULL_HEADER + parts[1]
    with open(path, "w") as f:
        f.write(
            "# Multi-chip scaling evidence (virtual CPU meshes)\n\n"
            "Produced by `python scripts/scaling_sim.py` — the FULL\n"
            "sharded train step (render + criterion + Adam + guards) on\n"
            "virtual meshes, with per-device collective bytes parsed from\n"
            "the partitioned HLO and per-device FLOPs from XLA cost\n"
            "analysis. Loss is asserted equal to single-device execution\n"
            "for every mesh. Rays are padded to the mesh ray axis with\n"
            "zero-weight rays (train/state.pad_rays), so shards are\n"
            "balanced; 'waste' is the inert-ray fraction.\n\n"
            "Shapes are the dry-run scale (small=True); byte/FLOP figures\n"
            "scale with the workload but the COLLECTIVE STRUCTURE (what is\n"
            "reduced, how many times, per device) is scale-independent.\n\n"
            "| mesh | rays (pad) | waste | flops/dev | all-reduce B/dev | collectives | rel-vs-1dev |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['mesh']} | {r['R']} | {r['waste']} | "
                f"{r['flops']/1e9:.2f}G | {r['ar_bytes']/1e6:.2f}MB | "
                f"{r['comm']} | {r['rel']:.1e} |\n"
            )
        f.write(full_section)
    print(f"table -> {os.path.abspath(path)}", flush=True)


if __name__ == "__main__":
    main_full() if FULL else main()
