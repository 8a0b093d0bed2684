#!/usr/bin/env python
"""Seed-matched LOCKSTEP A/B: batched sim vs per-scenario harness.

The r4 sweep-vs-harness comparison could only argue "within joint sampling
noise" because the two simulators drew different pedestrian stagger streams
(numpy `random.Random` in the harness agents vs `jax.random` in the batched
sim).  This script removes the sampling dimension entirely (VERDICT r4 #4):

  1. replay the harness's `random.Random(seed)` stagger stream into a
     (T, H) tensor with an exact replica of its Human agents (same float64
     code path, same draw order);
  2. run the per-scenario harness (mpc + cvmp, production operating point);
  3. run the batched sim on the same scenario with `stagger_stream` feeding
     the SAME scalars;
  4. compare, per seed: replica-vs-harness pedestrian trajectories (must be
     bit-equal — validates the replay), outcome, steps, and per-step robot
     position divergence.

    python scripts/lockstep_ab.py --seeds 0,1,2,3,4 --scenario 0 \
        --steps 120 --out docs/lockstep_ab_r5.json
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _RecordingRandom(random.Random):
    """random.Random that logs choice/randint results (the two draws the
    Human agent makes per active step, motion/agents.py:50-53)."""

    def __init__(self, seed):
        super().__init__(seed)
        self.log = []

    def choice(self, seq):
        v = super().choice(seq)
        self.log.append(v)
        return v

    def randint(self, a, b):
        v = super().randint(a, b)
        self.log.append(v)
        return v


def replay_stagger(base, seed: int, steps: int):
    """Replica of the harness pedestrians: returns (stagger (T, H),
    human_traj (T+1, H, 2)) drawn from random.Random(seed) exactly as
    MainBase's agents would consume it (only humans draw; list order)."""
    from dyobav_tpu.motion.agents import Human, Robot

    rec = _RecordingRandom(seed)
    # _prepare_agents order: Robot first (never draws), then humans.
    human_starts = [np.array(base.ct2real(h)) for h in base.HUMAN_STARTS]
    human_paths = [[tuple(base.ct2real(list(x)))
                    for x in base.net_graph.return_given_nodelist(p)]
                   for p in base.HUMAN_PATHS]
    _ = Robot(np.array(base.ct2real(base.ROBOT_START_POINT)),
              base.config_robot.ts,
              radius=base.config_robot.vehicle_width / 2, rng=rec)
    humans = []
    for h, path in zip(human_starts, human_paths):
        hu = Human(np.concatenate([h, [0.0]]), base.config_robot.ts,
                   radius=base.HUMAN_SIZE, stagger=base.HUMAN_STAGGER,
                   rng=rec)
        hu.set_path(path)
        humans.append(hu)

    H = len(humans)
    stagger = np.zeros((steps, H), np.float32)
    traj = np.zeros((steps + 1, H, 2))
    traj[0] = [hu.state[:2] for hu in humans]
    for t in range(steps):
        for i, hu in enumerate(humans):
            n0 = len(rec.log)
            hu.run_step(base.HUMAN_VMAX)
            if len(rec.log) == n0 + 2:
                stagger[t, i] = (rec.log[n0] * rec.log[n0 + 1] / 10
                                 * base.HUMAN_STAGGER)
        traj[t + 1] = [hu.state[:2] for hu in humans]
    return stagger, traj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--scenario", type=int, default=0)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.sim.batch import Scenario, build_batch_sim
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import build_scenario

    seeds = [int(s) for s in args.seeds.split(",")]
    B, T = len(seeds), args.steps

    rows = []
    staggers = []
    replica_trajs = []
    harness_rows = []
    base0 = None
    for seed in seeds:
        base = MainBase(max_run_time_step=T, evaluation=True, seed=seed,
                        scenario_index=args.scenario)
        base0 = base0 or base
        stag, rep_traj = replay_stagger(base, seed, T)
        staggers.append(stag)
        replica_trajs.append(rep_traj)

        robot, human_list = base._prepare_agents()
        tr, pr = base._prepare_interfaces(robot, "cvmp", "mpc")
        base.run_once(robot, human_list, tr, pr)
        out = base.outcome_results[-1]
        h_traj = np.array([s[:3] for s in robot.past_traj])
        static_diag = None
        if out["outcome"] == "collision":
            from dyobav_tpu.sim import metrics as hmetrics
            pos = h_traj[min(out["steps"], len(h_traj) - 1)][:2]
            static_diag = {
                "cause": out.get("collision_cause"),
                "harness_static_dist": float(
                    hmetrics.calc_minimal_obstacle_distance(
                        [pos], base.geo_map.processed_obstacle_list)),
            }
        hum_traj = np.stack([np.array([s[:2] for s in hu.past_traj])
                             for hu in human_list], axis=1)  # (t+1, H, 2)
        # Replay validation: the replica pedestrians must walk the harness
        # pedestrians' exact float64 path for the steps the episode ran.
        t_run = hum_traj.shape[0]
        replay_err = float(np.abs(
            rep_traj[:t_run] - hum_traj[:t_run]).max())
        harness_rows.append({"outcome": out["outcome"],
                             "steps": int(out["steps"]),
                             "traj": h_traj, "replay_err": replay_err,
                             "static_diag": static_diag})
        print(f"seed {seed}: harness {out['outcome']} in {out['steps']} "
              f"steps (replay_err {replay_err:.2e})", flush=True)

    sc = build_scenario(base0, scenario_index=args.scenario)
    batch = Scenario(*[jnp.stack([jnp.asarray(x)] * B) for x in sc])
    run = build_batch_sim(base0.config_mpc, base0.config_robot,
                          SolverConfiguration(), n_steps=T,
                          record_traj=True,
                          stagger_stream=np.stack(staggers))
    res, (traj, hum_traj_b) = run(batch, jnp.asarray(seeds))
    traj = np.asarray(traj)                    # (T, B, 3)
    hum_traj_b = np.asarray(hum_traj_b)        # (T, B, H, 2)

    agree = 0
    for i, seed in enumerate(seeds):
        hrow = harness_rows[i]
        b_outcome = ("collision" if bool(res.collided[i]) else
                     "success" if bool(res.success[i]) else "timeout")
        b_steps = int(res.steps_used[i])
        # Compare over the JOINT active window only: after either episode
        # ends its sim freezes (batched) / stops recording (harness), so
        # later rows are not comparable.
        t_cmp = min(hrow["traj"].shape[0] - 1, b_steps, T)
        dxy = np.linalg.norm(hrow["traj"][1:t_cmp + 1, :2]
                             - traj[:t_cmp, i, :2], axis=-1)
        ped = (np.abs(replica_trajs[i][1:t_cmp + 1]
                      - hum_traj_b[:t_cmp, i]).max() if t_cmp > 0 else 0.0)
        # Robot-pedestrian min-distance series in both sims: where the
        # encounter actually happens, and whether a flip is a centimeter
        # margin (float chaos) or a control divergence.
        d_h = np.array([np.linalg.norm(
            hrow["traj"][t + 1, :2] - replica_trajs[i][t + 1], axis=-1).min()
            for t in range(t_cmp)])
        d_b = np.array([np.linalg.norm(
            traj[t, i, :2] - hum_traj_b[t, i], axis=-1).min()
            for t in range(t_cmp)])
        ddist = np.abs(d_h - d_b)
        first_div = next((t for t in range(t_cmp) if ddist[t] > 0.01), None)
        coll_diag = None
        if hrow["outcome"] == "collision":
            from dyobav_tpu.sim import metrics as hmetrics
            tc = min(hrow["steps"] - 1, t_cmp - 1)
            pos_b = traj[tc, i, :2]
            coll_diag = {"harness_dist": float(d_h[tc]) if tc >= 0 else None,
                         "batched_dist": float(d_b[tc]) if tc >= 0 else None,
                         "step": int(tc + 1),
                         **(hrow["static_diag"] or {}),
                         "batched_static_dist": float(
                             hmetrics.calc_minimal_obstacle_distance(
                                 [pos_b],
                                 base0.geo_map.processed_obstacle_list)),
                         "robot_div_at_step": float(dxy[tc]) if tc >= 0
                         else None}
        ok = (b_outcome == hrow["outcome"])
        agree += ok
        rows.append({
            "seed": seed,
            "harness_outcome": hrow["outcome"],
            "harness_steps": hrow["steps"],
            "batched_outcome": b_outcome,
            "batched_steps": b_steps,
            "outcome_match": ok,
            "replay_err": hrow["replay_err"],
            "ped_div_max": float(ped),
            "robot_div_mean": float(dxy.mean()) if len(dxy) else None,
            "robot_div_max": float(dxy.max()) if len(dxy) else None,
            "robot_div_at_10": float(dxy[9]) if len(dxy) > 9 else None,
            "min_encounter_dist_harness": float(d_h.min()) if t_cmp else None,
            "min_encounter_dist_batched": float(d_b.min()) if t_cmp else None,
            "first_dist_div_step": first_div,
            "collision_step_diag": coll_diag,
        })
        print(f"seed {seed}: batched {b_outcome} in {b_steps} steps; "
              f"robot div mean {rows[-1]['robot_div_mean']} "
              f"max {rows[-1]['robot_div_max']} ped {ped:.2e} "
              f"enc h/b {rows[-1]['min_encounter_dist_harness']:.3f}/"
              f"{rows[-1]['min_encounter_dist_batched']:.3f}", flush=True)

    out = {
        "scenario": args.scenario, "steps": T, "seeds": seeds,
        "outcome_agreement": agree / B,
        "rows": rows,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
