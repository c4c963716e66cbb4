"""A/B env-var configurations on the reference MeshRIR workload shape.

Like scripts/ab_env.py but for the MeshRIR config (3202 rays x 64
samples x 2400-dim IR, shell_chunk 2; workload shared with
scripts/trace_meshrir.py via scripts/meshrir_workload.py).
Usage: python scripts/meshrir_env_ab.py [--interp=trilinear|simplex]
                                        "LABEL:VAR=V,VAR2=V2" ...
(default simplex; trilinear runs the reference's exact tcnn algorithm.
Both modes default the dense one-hot coarse-level path on — the
measured-best config per mode, docs/PERFORMANCE.md — override per spec.)
Env vars are read at trace time; each spec compiles its own program.
Timing is fetch-forced.
"""

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
    specs = argv or ["base:"]
    loss_fn, params, bs, R = meshrir_workload.build(interp)

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
