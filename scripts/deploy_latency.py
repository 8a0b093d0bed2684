#!/usr/bin/env python
"""Deployment-node tick latency on the CERTIFIED fused path (VERDICT r4 #6).

Drives `sim.deploy.NavigationNode` in fused mode — the full neural control
step (SWTA CNN prediction x 20 offsets, on-device CGF, constraint assembly,
multistart NMPC solve) as ONE device program behind the node's transport —
for n >= 100 ticks against the reference's 0.2 s/step budget
(config/mpc_default.yaml ts).  Optionally captures a jax.profiler trace to
back the device/dispatch split.

    python scripts/deploy_latency.py --n 120 --out docs/deploy_latency_r5.json
    python scripts/deploy_latency.py --n 20 --trace /tmp/deploy_trace
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--out", default="")
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--ckpt", default=os.path.join(REPO, "Model",
                                                   "wsd_1t20_full"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import SolverConfiguration, WtaNetConfiguration
    from dyobav_tpu.models.manager import NetworkManager
    from dyobav_tpu.predictors.mmp import ObstacleSnapper
    from dyobav_tpu.sim.batch import (Scenario, build_step_program,
                                      make_wta_predictor)
    from dyobav_tpu.sim.deploy import LocalTransport, NavigationNode
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import build_scenario

    base = MainBase(max_run_time_step=3, evaluation=True, seed=0)
    sc = build_scenario(base, scenario_index=0)
    scenario = Scenario(*[jnp.asarray(x) for x in sc])

    mgr = NetworkManager(WtaNetConfiguration(), verbose=False)
    mgr.build_network()
    mgr.load_checkpoint(args.ckpt)
    variables = {"params": mgr.state.params,
                 "batch_stats": mgr.state.batch_stats}
    net_apply = lambda v, images: mgr.state.apply_fn(v, images, train=False)
    snapper = ObstacleSnapper(255.0 - base.ref_map)
    pred = make_wta_predictor(net_apply, variables, base.ref_map,
                              base.ct2real, n_hor=base.config_mpc.N_hor,
                              snap_nearest=snapper.tables(),
                              scale2nn=base.sim_config.scale2nn)

    fused = build_step_program(base.config_mpc, base.config_robot,
                               SolverConfiguration(), predictor=pred)
    transport = LocalTransport()
    node = NavigationNode(transport, fused_step=fused, scenario=scenario,
                          n_humans=int(sc.human_starts.shape[0]))

    # Feed live messages the way a ROS adapter would.
    robot0 = np.asarray(sc.robot_start, float)
    human0 = np.asarray(sc.human_starts, float)
    transport.publish("robot_pose", {"x": robot0[0], "y": robot0[1],
                                     "theta": robot0[2]})
    transport.publish("actor_poses", {
        "poses": {f"a{i}": (p[0], p[1]) for i, p in enumerate(human0)}})

    a = node.control_tick()            # compile (cold_start + step)
    assert a is not None and np.all(np.isfinite(a)), a

    # Advance the "world" a little each tick (pedestrian drifts; robot pose
    # follows the commanded action kinematically) so every tick is a fresh
    # but realistic problem.
    from dyobav_tpu.motion.models import unicycle_step_np
    rng = np.random.default_rng(0)
    lat = []
    state = robot0.copy()
    humans = human0.copy()
    for k in range(args.n):
        humans = humans + rng.uniform(-0.1, 0.1, humans.shape) + [0.0, 0.15]
        transport.publish("actor_poses", {
            "poses": {f"a{i}": (p[0], p[1]) for i, p in enumerate(humans)}})
        transport.publish("robot_pose", {"x": state[0], "y": state[1],
                                         "theta": state[2]})
        t0 = time.perf_counter()
        a = node.control_tick()
        lat.append(time.perf_counter() - t0)
        state = unicycle_step_np(state, np.asarray(a, float), 0.2)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                node.control_tick()
        print(f"profiler trace written to {args.trace}", file=sys.stderr)

    lat_ms = np.sort(np.array(lat)) * 1e3
    result = {
        "metric": "deploy_tick_latency_p95",
        "value": round(float(np.percentile(lat_ms, 95)), 2),
        "unit": "ms",
        "vs_baseline": round(200.0 / float(np.percentile(lat_ms, 95)), 2),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "mean_ms": round(float(lat_ms.mean()), 2),
        "n": args.n,
        "path": "NavigationNode fused_step (build_step_program)",
        "ckpt": os.path.basename(args.ckpt),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
