#!/usr/bin/env python
"""Eval-triage evidence: random-sweep timeout rate vs step budget.

Runs the SAME random scenario batch (generator, seed and solver profile of
the docs/multiproc_sweep_r3.txt evidence run) at several step budgets and
cross-tabulates outcome vs the scenario's reference-trajectory length, to
show the 80-step timeouts are path-length-by-construction
(docs/eval_triage_r4.md §1).

    python scripts/triage_sweep_budget.py --n 64 [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--budgets", default="80,120,180")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.sim.batch import build_batch_sim
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import random_scenarios

    base = MainBase(max_run_time_step=120, evaluation=True, seed=args.seed)
    batch = random_scenarios(base, args.n, n_humans=1, seed=args.seed)
    ref_lens = np.asarray(batch.ref_len)
    seeds = jnp.arange(args.n)

    rows = []
    for steps in (int(x) for x in args.budgets.split(",")):
        run = build_batch_sim(base.config_mpc, base.config_robot,
                              SolverConfiguration(), n_steps=steps)
        res = run(batch, seeds)
        success = np.asarray(res.success)
        collided = np.asarray(res.collided)
        timeout = ~success & ~collided
        # Timeout vs ref_len cross-tab: scenarios whose constant-speed
        # reference alone needs > 2/3 of the budget.
        long_path = ref_lens > (2 * steps) // 3
        rows.append({
            "steps": steps,
            "success_rate": float(success.mean()),
            "collision_rate": float(collided.mean()),
            "timeout_rate": float(timeout.mean()),
            "timeout_rate_long_paths": float(timeout[long_path].mean())
            if long_path.any() else None,
            "timeout_rate_short_paths": float(timeout[~long_path].mean())
            if (~long_path).any() else None,
            "n_long_paths": int(long_path.sum()),
            "ref_len_p50_of_timeouts": float(np.median(ref_lens[timeout]))
            if timeout.any() else None,
            "ref_len_p50_of_successes": float(np.median(ref_lens[success]))
            if success.any() else None,
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"n": args.n, "seed": args.seed,
           "ref_len_minmax": [int(ref_lens.min()), int(ref_lens.max())],
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "triage_sweep_budget_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
