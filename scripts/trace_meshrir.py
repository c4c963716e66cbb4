"""Capture a jax.profiler trace of the MeshRIR-shaped fwd+bwd step.

Same workload as scripts/meshrir_env_ab.py — both import the setup from
scripts/meshrir_workload.py, so a trace taken to explain an A/B result
profiles exactly the program the A/B timed (incl. AVR_TPU_AB_REMAT and
every other env knob, all read at trace time). parse_trace.py
attributes the captured step to ops.

Usage: python scripts/trace_meshrir.py [--interp=trilinear|simplex] [logdir]
"""

import glob
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import meshrir_workload  # noqa: E402


def main():
    argv = sys.argv[1:]
    interp = "simplex"
    if argv and argv[0].startswith("--interp="):
        interp = argv[0].split("=", 1)[1]
        argv = argv[1:]
    logdir = argv[0] if argv else f"/tmp/meshrir_trace_{interp}"
    loss_fn, params, _, _ = meshrir_workload.build(interp)

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
