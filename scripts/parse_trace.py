"""Summarize a jax.profiler chrome trace (from scripts/trace_step.py).

Usage: python scripts/parse_trace.py /tmp/avr_trace [top_n] [n_steps]

n_steps defaults to the MEDIAN occurrence count of the top-duration ops
— correct when those ops run once per step (the usual case here), but
pass it explicitly if hot ops run k>1 times per step (e.g. fwd+bwd
instances sharing a fusion name), or every per-step figure divides by
the wrong count.

Finds the newest vm.trace.json.gz under the logdir, aggregates device-op
durations (pid 3 / tid 3 on the axon backend), prints the top ops per
step with their HLO category and source line.
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/avr_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        sys.exit(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)

    ev = [
        e
        for e in data["traceEvents"]
        if e.get("ph") == "X" and e["pid"] == 3 and e.get("tid") == 3
    ]
    if not ev:
        sys.exit("no device events (pid 3 / tid 3)")
    ev.sort(key=lambda e: e["ts"])
    span_ms = (ev[-1]["ts"] + ev[-1]["dur"] - ev[0]["ts"]) / 1e3
    # Step count: argv[3] if given, else auto-detect from the modal
    # occurrence count of expensive once-per-step ops (trace_step.py
    # records 3 steps, bench_meshrir.py records 2 — assuming 3 silently
    # deflated every per-step figure by 1.5x for 2-step traces).
    if len(sys.argv) > 3:
        n_steps = int(sys.argv[3])
    else:
        by_name = collections.Counter()
        dur = collections.Counter()
        for e in ev:
            by_name[e["name"]] += 1
            dur[e["name"]] += e["dur"]
        top = [n for n, _ in dur.most_common(10)]
        counts = sorted(by_name[n] for n in top)
        n_steps = counts[len(top) // 2]  # median
        n_steps = max(1, min(int(n_steps), 16))
        # make a mis-detection visible (ops that run k>1 times per step
        # deflate per-step figures) — pass n_steps explicitly to override
        print(f"auto n_steps={n_steps} from top-10-op counts {counts}")
    print(f"{paths[-1]}")
    print(f"device span {span_ms:.1f} ms over {n_steps} steps "
          f"({span_ms / n_steps:.1f} ms/step), {len(ev)} events")

    agg = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    cat = collections.Counter()
    for e in ev:
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
        a = e.get("args", {})
        if e["name"] not in meta:
            meta[e["name"]] = (
                a.get("hlo_category", "?"),
                a.get("source", ""),
                a.get("tf_op", ""),
            )
        cat[a.get("hlo_category", "?")] += e["dur"]

    print("\n--- by HLO category (ms/step) ---")
    for c, d in cat.most_common():
        print(f"{d / n_steps / 1e3:9.2f}  {c}")

    print(f"\n--- top {top_n} ops (ms/step) ---")
    for name, d in agg.most_common(top_n):
        c, src, tf = meta[name]
        src = src.replace("/root/repo/", "")
        print(
            f"{d / n_steps / 1e3:8.2f} x{cnt[name] / n_steps:6.1f}  "
            f"{name[:40]:40s} {c[:16]:16s} {src[:44]:44s} {tf[:40]}"
        )


if __name__ == "__main__":
    main()
