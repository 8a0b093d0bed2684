#!/usr/bin/env python
"""Control-fidelity check against an independent solver (OpEn stand-in).

Neither casadi nor opengen exist in this image, so the reference's actual
Rust solver cannot run here.  Instead this script replays the scenario-0
closed loop and, at every control step, solves the *identical* NLP (same
flat parameter vector) two ways:

  1. the framework's in-graph ALM-Newton solve (float32, TPU-style), and
  2. scipy SLSQP in float64 with JAX-exact gradients and the same
     bounds/constraints,

reporting per-step control deviation max|u_ours - u_slsqp| and the cost
gap.  BASELINE.md's fidelity target (<1e-3 control deviation vs OpEn) is
assessed through this proxy: both solvers drive the same objective to
stationarity, so agreement here bounds formulation + solver error.

Usage: python scripts/parity_check.py [--steps 10]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--inner-iters", type=int, default=None,
                    help="override SolverConfiguration.max_inner_iters")
    ap.add_argument("--outer-iters", type=int, default=None)
    ap.add_argument("--later-iters", type=int, default=None)
    ap.add_argument("--substeps", type=int, default=1,
                    help="Newton updates per Hessian refresh (chord method)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.ops import costs
    from dyobav_tpu.ops.params import unpack
    from dyobav_tpu.sim.harness import MainBase

    scfg = None
    if args.inner_iters is not None:
        scfg = SolverConfiguration(
            max_inner_iters=args.inner_iters,
            max_outer_iters=args.outer_iters or 4,
            inner_iters_later=args.later_iters or max(args.inner_iters // 2, 3),
            newton_substeps=args.substeps)
    base = MainBase(max_run_time_step=args.steps, evaluation=True, seed=0,
                    solver_config=scfg)
    robot, humans = base._prepare_agents()
    tracker_intf, predictor = base._prepare_interfaces(robot, "cvmp", "mpc")
    tracker = tracker_intf.traj_tracker
    cfg, rob = tracker.config, tracker.robot_spec

    lo = np.tile([rob.lin_vel_min, -rob.ang_vel_max], cfg.N_hor)
    hi = np.tile([rob.lin_vel_max, rob.ang_vel_max], cfg.N_hor)
    acc_lo = np.concatenate([np.full(cfg.N_hor, rob.lin_acc_min),
                             np.full(cfg.N_hor, -rob.ang_acc_max)])
    acc_hi = np.concatenate([np.full(cfg.N_hor, rob.lin_acc_max),
                             np.full(cfg.N_hor, rob.ang_acc_max)])

    # Capture each step's parameter vector by wrapping the bundle solve.
    captured = {}
    orig_solve_batch = tracker.bundle.solve_batch

    def capture_solve_batch(Z, U0):
        captured["z"] = np.asarray(Z[0])
        captured["u0"] = np.asarray(U0[0])
        return orig_solve_batch(Z, U0)

    tracker.bundle = tracker.bundle._replace(solve_batch=capture_solve_batch)

    devs, cost_gaps = [], []
    for kt in range(args.steps):
        base.run_one_step(robot, humans, tracker_intf, predictor)
        z = captured["z"]
        p = unpack(jnp.asarray(z), cfg)
        p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float32), p)

        eval_jit = jax.jit(lambda u: costs.evaluate(u, p64, cfg, rob))
        grad_jit = jax.jit(jax.grad(
            lambda u: costs.evaluate(u, p64, cfg, rob).objective))

        u_ours = np.asarray(tracker._last_u, np.float64)

        cons = [
            {"type": "ineq",
             "fun": lambda u: np.asarray(eval_jit(jnp.asarray(u, jnp.float32)).f1,
                                         np.float64) - acc_lo},
            {"type": "ineq",
             "fun": lambda u: acc_hi - np.asarray(
                 eval_jit(jnp.asarray(u, jnp.float32)).f1, np.float64)},
            {"type": "ineq",
             "fun": lambda u: -np.asarray(
                 eval_jit(jnp.asarray(u, jnp.float32)).f2, np.float64)},
        ]
        res = minimize(
            lambda u: float(eval_jit(jnp.asarray(u, jnp.float32)).objective),
            u_ours,  # start SLSQP from our solution: measures stationarity
            jac=lambda u: np.asarray(grad_jit(jnp.asarray(u, jnp.float32)),
                                     np.float64),
            method="SLSQP", bounds=list(zip(lo, hi)), constraints=cons,
            options={"maxiter": 200, "ftol": 1e-12})

        dev = float(np.abs(u_ours - res.x).max())
        ours_cost = float(eval_jit(jnp.asarray(u_ours, jnp.float32)).objective)
        gap = ours_cost - float(res.fun)
        devs.append(dev)
        cost_gaps.append(gap)
        print(f"step {kt}: control dev {dev:.2e}; cost ours {ours_cost:.4f} "
              f"slsqp {res.fun:.4f} (gap {gap:+.2e})", flush=True)

    print(json.dumps({
        "metric": "control_deviation_vs_independent_solver",
        "max": float(np.max(devs)),
        "mean": float(np.mean(devs)),
        "cost_gap_max": float(np.max(cost_gaps)),
        "steps": args.steps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
