"""Pod-scale evaluation sweep over randomized warehouse scenarios.

The batched counterpart of `main_eva` (BASELINE.json config #5): thousands
of randomized (start, goal, pedestrian-seed) episodes run as ONE sharded
device program; success/collision/clearance statistics reduce on-device.

    python -m dyobav_tpu.sim.sweep --n 256 --steps 60 --devices 8
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="number of scenarios")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--humans", type=int, default=1)
    ap.add_argument("--robots", type=int, default=1,
                    help=">1 switches to the decentralized fleet sim")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (0 = all available)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed over ICI/DCN; run one "
                         "process per host (degenerate no-op on one host)")
    ap.add_argument("--inner-iters", type=int, default=None,
                    help="custom solver budget (default: the production "
                         "SolverConfiguration() profile)")
    ap.add_argument("--outer-iters", type=int, default=None)
    ap.add_argument("--no-multistart", action="store_true",
                    help="opt out of the tracker's 5-candidate multistart "
                         "decision rule (budget-only escalation of the "
                         "warm guess; ~5x cheaper, weaker basin recovery)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..configs import SolverConfiguration
    from ..parallel.mesh import (init_distributed, make_global_batch,
                                 make_mesh, pad_to_multiple, shard_batch)
    from .batch import Scenario, build_batch_sim
    from .fleet import FleetScenario, build_fleet_sim
    from .harness import MainBase
    from .scenarios import random_fleet_scenarios, random_scenarios

    if args.distributed:
        init_distributed()

    base = MainBase(max_run_time_step=args.steps, evaluation=True,
                    seed=args.seed)
    fleet = args.robots > 1
    if fleet:
        batch = random_fleet_scenarios(base, args.n, n_robots=args.robots,
                                       n_humans=args.humans, seed=args.seed)
    else:
        batch = random_scenarios(base, args.n, n_humans=args.humans,
                                 seed=args.seed)

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    cls = FleetScenario if fleet else Scenario
    padded = cls(*[
        pad_to_multiple(np.asarray(x), n_dev)[0] for x in batch])
    true_n = args.n
    if args.distributed:
        # Every process holds the identical batch (same seed); each host
        # materializes only its addressable shards of the global arrays.
        padded = make_global_batch(mesh, padded)
    else:
        padded = shard_batch(
            mesh, cls(*[jnp.asarray(x) for x in padded]))

    # Default: the shipped production operating point (one configuration
    # everywhere); passing either iteration flag opts into a custom budget.
    if args.inner_iters is not None or args.outer_iters is not None:
        inner = (args.inner_iters if args.inner_iters is not None
                 else SolverConfiguration().max_inner_iters)
        outer = (args.outer_iters if args.outer_iters is not None
                 else SolverConfiguration().max_outer_iters)
        scfg = SolverConfiguration(
            max_inner_iters=inner,
            max_outer_iters=outer,
            inner_iters_later=max(inner // 2, 3))
    else:
        scfg = SolverConfiguration()
    ms = not args.no_multistart
    if fleet:
        run = build_fleet_sim(base.config_mpc, base.config_robot, scfg,
                              n_robots=args.robots, n_steps=args.steps,
                              multistart=ms)
    else:
        run = build_batch_sim(base.config_mpc, base.config_robot, scfg,
                              n_humans=args.humans, n_steps=args.steps,
                              multistart=ms)
    seeds = jnp.arange(padded[0].shape[0])

    t0 = time.perf_counter()
    res = run(padded, seeds)
    res.success.block_until_ready()
    first = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = run(padded, seeds)
    res.success.block_until_ready()
    steady = time.perf_counter() - t0

    if args.distributed and jax.process_count() > 1:
        # Multi-host: per-element fetches cannot address remote shards, so
        # the statistics reduce IN-GRAPH (XLA collectives over ICI/DCN) to
        # replicated scalars every host can read; process 0 prints.
        @jax.jit
        def reduce_global(res):
            B = res.success.shape[0]
            valid = jnp.arange(B) < true_n
            coll = res.collided
            static_clear = res.min_static_clearance
            fails = res.solver_fail_steps
            smooth = res.smoothness
            dev_mean = res.deviation_mean
            dev_max = res.deviation_max
            if coll.ndim > 1:                 # fleet: per-robot flags
                coll = coll.any(axis=1)
                static_clear = static_clear.min(axis=1)
                fails = fails.sum(axis=1)
                smooth = smooth.mean(axis=1)
                dev_mean = dev_mean.mean(axis=1)
                dev_max = dev_max.max(axis=1)
            finite = jnp.isfinite(res.min_clearance) & valid
            finite_s = jnp.isfinite(static_clear) & valid
            nv = jnp.maximum(jnp.sum(valid), 1)
            return (
                jnp.sum(jnp.where(valid, res.success, False)) / true_n,
                jnp.sum(jnp.where(valid, coll, False)) / true_n,
                jnp.sum(jnp.where(finite, res.min_clearance, 0.0))
                / jnp.maximum(jnp.sum(finite), 1),
                jnp.sum(jnp.where(finite_s, static_clear, 0.0))
                / jnp.maximum(jnp.sum(finite_s), 1),
                jnp.sum(jnp.where(valid, fails, 0)) / true_n,
                jnp.sum(jnp.where(valid, res.steps_used, 0)) / true_n,
                jnp.sum(jnp.where(valid[:, None], smooth, 0.0), axis=0) / nv,
                jnp.sum(jnp.where(valid, dev_mean, 0.0)) / nv,
                jnp.max(jnp.where(valid, dev_max, 0.0)),
            )

        (succ_m, coll_m, clear_m, sclear_m, fails_m, steps_m,
         smooth_m, dev_m, dev_x) = reduce_global(res)
        succ_m, coll_m, clear_m, sclear_m, fails_m, steps_m, dev_m, dev_x = (
            float(x) for x in (succ_m, coll_m, clear_m, sclear_m, fails_m,
                               steps_m, dev_m, dev_x))
        out = {
            "n_scenarios": true_n,
            "devices": n_dev,
            "hosts": jax.process_count(),
            "robots": args.robots,
            "success_rate": succ_m,
            "collision_rate": coll_m,
            "timeout_rate": float(1.0 - succ_m - coll_m),
            "min_clearance_mean": clear_m,
            "min_static_clearance_mean": sclear_m,
            "solver_fail_steps_mean": fails_m,
            "steps_used_mean": steps_m,
            "smoothness_mean": [float(x) for x in smooth_m],
            "deviation_mean": dev_m,
            "deviation_max": dev_x,
            "wall_s_first": round(first, 2),
            "wall_s_steady": round(steady, 2),
            "control_steps_per_s": round(
                true_n * args.steps * args.robots / steady, 1),
        }
        if jax.process_index() == 0:
            print(json.dumps(out))
        return 0

    success = np.asarray(res.success)[:true_n]
    collided = np.asarray(res.collided)[:true_n]
    clearance = np.asarray(res.min_clearance)[:true_n]
    static_clear = np.asarray(res.min_static_clearance)[:true_n]
    fail_steps = np.asarray(res.solver_fail_steps)[:true_n]
    steps_used = np.asarray(res.steps_used)[:true_n]
    smooth = np.asarray(res.smoothness)[:true_n]
    dev_mean = np.asarray(res.deviation_mean)[:true_n]
    dev_max = np.asarray(res.deviation_max)[:true_n]
    overflow = np.asarray(res.escalation_overflow_steps)[:true_n]
    if collided.ndim > 1:                     # fleet: per-robot flags
        collided = collided.any(axis=1)
        static_clear = static_clear.min(axis=1)
        fail_steps = fail_steps.sum(axis=1)
        smooth = smooth.mean(axis=1)
        dev_mean = dev_mean.mean(axis=1)
        dev_max = dev_max.max(axis=1)
        overflow = overflow.sum(axis=1)

    out = {
        "n_scenarios": true_n,
        "devices": n_dev,
        "robots": args.robots,
        "success_rate": float(success.mean()),
        "collision_rate": float(collided.mean()),
        "timeout_rate": float(1.0 - success.mean() - collided.mean()),
        "min_clearance_mean": float(clearance[np.isfinite(clearance)].mean())
        if np.isfinite(clearance).any() else None,
        "min_static_clearance_mean": float(
            static_clear[np.isfinite(static_clear)].mean())
        if np.isfinite(static_clear).any() else None,
        "solver_fail_steps_mean": float(fail_steps.mean()),
        "steps_used_mean": float(steps_used.mean()),
        # Reference eval-protocol metrics (main_base.py:483-506): action
        # smoothness [mean|Δ²v|, mean|Δ²ω|] averaged over episodes, and
        # path-deviation mean/std (over per-episode means) + max (of maxes).
        "smoothness_mean": [float(x) for x in smooth.mean(axis=0)],
        "deviation_mean": float(dev_mean.mean()),
        "deviation_std": float(dev_mean.std()),
        "deviation_max": float(dev_max.max()) if len(dev_max) else None,
        "escalation_overflow_steps_mean": float(overflow.mean()),
        "wall_s_first": round(first, 2),
        "wall_s_steady": round(steady, 2),
        "control_steps_per_s": round(
            true_n * args.steps * args.robots / steady, 1),
    }
    if fleet:
        inter = np.asarray(res.min_inter_robot)[:true_n]
        out["min_inter_robot_mean"] = float(
            inter[np.isfinite(inter)].mean()) if np.isfinite(inter).any() else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
