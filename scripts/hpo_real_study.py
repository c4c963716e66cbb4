"""Run a REAL HPO study end-to-end on the chip (VERDICT r2 item 4).

The reference's top-level workflow is optuna_avr_runner.py:141-164:
create a resumable study, and per trial mutate the base config, train,
dump val npz checkpoints, run NormMUSIC DoA on each, and return the min
mean pred-vs-gt error. The repo's engine + spaces were fixture-tested
only; this script exercises the whole stack for real on the synthetic
8-mic-array dataset (the same one the full-budget quality A/B trains
on) at a reduced per-trial budget.

Usage: python scripts/hpo_real_study.py [n_trials] [--iters N]
       [--variant das] [--interp simplex]
Resume-safe: the study is SQLite-backed (load_if_exists semantics), so
re-running continues from the recorded trials. Outputs in
results/hpo_study/: study.db, study_trials.jsonl, study_report.png.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import interp_fullbudget_ab as fullbudget  # noqa: E402  (shared dataset+config)
from avr_tpu.eval.aggregators import study_report  # noqa: E402
from avr_tpu.hpo.runner import make_objective  # noqa: E402
from avr_tpu.hpo.study import Study  # noqa: E402

ROOT = os.path.join("results", "hpo_study")


def _write_artifacts(study, args, wall, new_trials=None):
    """Dump study_trials jsonl + report png and print the summary line.

    Per-variant artifact names so re-runs never clobber earlier studies'
    committed outputs (r3: the das study at the default budget); a
    non-default --iters gets a suffix for EVERY variant, das included,
    and population studies a further _pop{K} suffix."""
    iters_tag = f"_{args.iters}" if args.iters != 1500 else ""
    tag = (
        iters_tag
        if args.variant == "das"
        else f"_{args.variant}{iters_tag}"
    ) + (f"_pop{args.pop}" if args.pop else "")
    with open(os.path.join(ROOT, f"study_trials{tag}.jsonl"), "w") as f:
        for t in study.trials:
            f.write(json.dumps(t) + "\n")
    rep = study_report(study, os.path.join(ROOT, f"study_report{tag}.png"))
    print(json.dumps({
        "n_trials": rep["n_trials"],
        "best_value": rep["best_value"],
        "best_params": rep["best_params"],
        "new_trials": new_trials,
        "wall_seconds": round(wall, 1),
        "trials_per_hour": (
            round(3600 * new_trials / wall, 2) if new_trials and wall else None
        ),
    }, indent=1), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_trials", nargs="?", type=int, default=8)
    ap.add_argument("--iters", type=int, default=1500,
                    help="per-trial budget before the batch-size scale rule")
    ap.add_argument("--variant", default="das",
                    choices=["base", "ch", "ch_without_das", "ch_only_das", "das", "runtime"])
    ap.add_argument("--interp", default="simplex")
    ap.add_argument("--pop", type=int, default=0,
                    help="population size K: advance K runtime-variant "
                         "trials per vmapped train step (ONE compiled "
                         "program, hpo/population.py) instead of the "
                         "serial trial loop; requires --variant runtime")
    args = ap.parse_args()
    if args.pop and args.variant != "runtime":
        ap.error("--pop requires --variant runtime (trial identity must "
                 "be a runtime-hparam bundle)")

    os.makedirs(ROOT, exist_ok=True)
    data_dir = os.path.join("results", "interp_fullbudget", "data")
    fullbudget.ensure_dataset(data_dir)

    # base config = the quality-A/B synthetic-array config with the
    # reduced per-trial budget; expname carries the reference's
    # param_{trial}_1 pattern so update_config renames per trial
    it = args.iters
    cfg = fullbudget.make_cfg(ROOT, "hpo_param_0_1", args.interp, it, seed=0)
    cfg.train.val_freq = max(it // 5, 1)     # 5 DoA checkpoints per trial
    cfg.train.save_freq = max(it // 2, 1)

    # n_startup=4 so the TPE sampler actually engages within a small
    # real-hardware study (create_study's default 10 would leave an
    # 8-trial study purely random)
    # budget-tagged name so a 5k-iter study never resumes a 1500-iter
    # one (r3's das study keeps its original untagged name)
    study_name = f"avr_tpu_{args.variant}" + (
        f"_{args.iters}" if args.iters != 1500 else ""
    ) + (f"_pop{args.pop}" if args.pop else "")
    if args.pop:
        # distinct expname prefix: population trials must never share a
        # logdir (and its val_result/) with an earlier serial trial of
        # the same number from another study variant
        cfg.path.expname = f"pop{args.iters}_param_0_1"
    study = Study(
        study_name,
        storage=f"sqlite:///{os.path.join(ROOT, 'study.db')}",
        n_startup=4,
    )
    done_before = len(study.trials)
    t0 = time.time()
    todo = max(args.n_trials - done_before, 0)
    print(f"study: {done_before} trials recorded, running {todo} more",
          flush=True)
    if todo and args.variant == "runtime" and not any(
        t["params"].get("lr", 0) > 1.2e-4 for t in study.trials
    ):
        # seed only while the widened-lr region (>1e-4, the old ceiling)
        # is unexplored — fresh studies AND resumed pre-widening ones
        # seed trial: the full-budget gate runs' known-good
        # configuration (results/interp_fullbudget/, make_cfg defaults +
        # das_reg=10) — gives TPE an anchored good region from the start
        # instead of blind startup draws (serial and population paths)
        study.enqueue_trial({
            "lr": 1e-3, "eta_min_ratio": 0.1, "weight_decay": 0.0,
            "spec_loss_weight": 1.0, "angle_loss_weight": 0.5,
            "time_loss_weight": 100.0, "energy_loss_weight": 5.0,
            "multistft_loss_weight": 1.0, "das_reg_loss_weight": 10.0,
        })
    if todo and args.pop:
        # vectorized path: ask K trials, train them as ONE vmapped
        # population, tell K results; repeat until the budget is done
        from avr_tpu.hpo.population import PopulationRunner
        from avr_tpu.hpo.runner import doa_objective_from_logdir, update_config

        while len(study.trials) < args.n_trials:
            # ALWAYS full-width batches: a trailing batch with fewer
            # lanes would change the vmap axis size — a different
            # program and a fresh multi-minute remote compile for a
            # handful of leftover trials. Extra completed trials past
            # n_trials are kept (more evidence, same compile).
            trials = [study.ask() for _ in range(args.pop)]
            tcfgs = [
                update_config(cfg, 0, t.number, t, "runtime") for t in trials
            ]
            pop = PopulationRunner(tcfgs, data_dir)
            pop.train()
            # host-side DoA objectives are pure numpy — fan the K trials
            # over worker processes (they serialize after each batch
            # otherwise and sit on the study's critical path)
            from concurrent.futures import ProcessPoolExecutor

            logdirs = [
                os.path.join(c.path.logdir, c.path.expname) for c in tcfgs
            ]
            with ProcessPoolExecutor(max_workers=2) as ex:
                futs = [
                    ex.submit(doa_objective_from_logdir, d, cfg.render.fs)
                    for d in logdirs
                ]
            for t, fut in zip(trials, futs):
                try:
                    study.tell(t, fut.result())
                except Exception as e:  # one bad trial must not kill the batch
                    print(f"trial {t.number} objective failed: {e}", flush=True)
                    study.tell(t, None, state="FAIL")
            # incremental artifacts: a time-boxed study interrupted
            # between batches still leaves a complete trials file +
            # report (the SQLite study itself resumes either way)
            _write_artifacts(study, args, time.time() - t0)
    elif todo:
        study.optimize(
            make_objective(cfg, data_dir, start_index=0, variant=args.variant),
            n_trials=todo,
            catch=(Exception,),
        )
    _write_artifacts(study, args, time.time() - t0, new_trials=todo)


if __name__ == "__main__":
    main()
