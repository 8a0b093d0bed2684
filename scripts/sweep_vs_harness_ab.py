#!/usr/bin/env python
"""A/B: batched-sim statistics vs the per-scenario harness eval on the
same preset scenarios (VERDICT r3 next-step #2 "done" criterion).

Both sides run mpc+cvmp on preset scenarios 0-2.  They are not seed-
matched step-for-step (the batched sim draws pedestrian stagger from JAX
PRNG streams, the harness from numpy), so the comparison is distributional:
success/collision/timeout rates per scenario within seed noise, plus the
safety metrics.  The batched side runs the PRODUCTION operating point —
`SolverConfiguration()` defaults with the in-scan escalation ladder and
static-collision semantics (sim/batch.py r4).

    python scripts/sweep_vs_harness_ab.py --runs 10 [--platform cpu]

Writes docs/sweep_vs_harness_r4.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--batched-runs", type=int, default=None,
                    help="pedestrian seeds for the batched side (default "
                         "--runs; more seeds tighten the distributional "
                         "comparison at negligible cost)")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--scenarios", default="0,1,2")
    ap.add_argument("--platform", default="")
    ap.add_argument("--skip-harness", action="store_true")
    ap.add_argument("--reuse-harness", default=None, metavar="JSON",
                    help="copy harness rows from a previous artifact "
                         "instead of re-running the (slow) per-scenario "
                         "eval — for re-measuring the batched side after "
                         "a sim change")
    args = ap.parse_args()
    n_batched = args.batched_runs or args.runs

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.sim.batch import Scenario, build_batch_sim
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import build_scenario

    out = {"runs": args.runs, "batched_runs": n_batched,
           "steps": args.steps, "scenarios": {}}
    prev = None
    if args.reuse_harness:
        with open(args.reuse_harness) as f:
            prev = json.load(f)
        # Guard against an apples-to-oranges reuse (ADVICE r4): the prior
        # artifact must cover the same protocol and every requested scenario.
        for key in ("runs", "steps"):
            if prev.get(key) != getattr(args, key):
                raise SystemExit(
                    f"--reuse-harness artifact has {key}={prev.get(key)} "
                    f"but this invocation uses {key}={getattr(args, key)}")
        missing = [s for s in args.scenarios.split(",")
                   if s not in prev.get("scenarios", {})
                   or "harness" not in prev["scenarios"][s]]
        if missing:
            raise SystemExit(
                "--reuse-harness artifact lacks harness rows for "
                f"scenarios {missing}")

    for s_idx in (int(x) for x in args.scenarios.split(",")):
        base = MainBase(max_run_time_step=args.steps, evaluation=True,
                        seed=0, scenario_index=s_idx,
                        max_num_run=args.runs)
        sc = build_scenario(base, scenario_index=s_idx)
        row = {}

        # --- batched sim, `runs` pedestrian seeds of the same scenario ---
        run = build_batch_sim(base.config_mpc, base.config_robot,
                              SolverConfiguration(), n_steps=args.steps)
        batch = Scenario(*[jnp.stack([x] * n_batched) for x in sc])
        res = run(batch, jnp.arange(n_batched))
        succ = np.asarray(res.success)
        coll = np.asarray(res.collided)
        row["batched"] = {
            "success_rate": float(succ.mean()),
            "collision_rate": float(coll.mean()),
            "static_collision_rate": float(np.asarray(
                res.collided_static).mean()),
            "timeout_rate": float((~succ & ~coll).mean()),
            "min_clearance_mean": float(np.asarray(
                res.min_clearance)[np.isfinite(
                    np.asarray(res.min_clearance))].mean()),
            "min_static_clearance_mean": float(np.asarray(
                res.min_static_clearance).mean()),
            "solver_fail_steps_mean": float(np.asarray(
                res.solver_fail_steps).mean()),
            "steps_used_mean": float(np.asarray(res.steps_used).mean()),
        }
        print(f"scenario {s_idx} batched: {json.dumps(row['batched'])}",
              flush=True)

        # --- per-scenario harness, same protocol (main_eva shape) ---
        if prev is not None:
            row["harness"] = prev["scenarios"][str(s_idx)].get("harness")
            print(f"scenario {s_idx} harness (reused): "
                  f"{json.dumps(row['harness'])}", flush=True)
        elif not args.skip_harness:
            base.run("mpc", "cvmp")
            summary = base.results_summary()
            outcomes = summary.pop("outcomes", [])
            kinds = [o["outcome"] for o in outcomes]
            row["harness"] = {
                "success_rate": summary.get("success_rate"),
                "collision_rate": kinds.count("collision") / max(len(kinds), 1),
                "timeout_rate": kinds.count("timeout") / max(len(kinds), 1),
                "clearance_mean": summary.get("clearance_mean"),
                "clearance_dyn_mean": summary.get("clearance_dyn_mean"),
                "steps_used_mean": float(np.mean(
                    [o["steps"] for o in outcomes])) if outcomes else None,
            }
            print(f"scenario {s_idx} harness: {json.dumps(row['harness'])}",
                  flush=True)

        out["scenarios"][str(s_idx)] = row

    path = os.path.join(REPO, "docs", "sweep_vs_harness_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
