#!/usr/bin/env python
"""Behavioral parity against the ACTUAL reference implementations.

The reference's baseline predictors (kfmp/cvmp) and its DWA tracker are
pure numpy (no casadi / torch / Rust), so — uniquely among the subsystems —
they can be imported straight from the read-only reference checkout and run
side-by-side with ours on identical inputs.  This turns the round-2 eval
anomalies ("kfmp loses to cvmp by 0.5 success on scenario 2", "dwa collapses
on scenarios 1-2") into a decidable question: if our implementation matches
the reference step-for-step, the anomaly is reference-faithful baseline
behavior, not a rebuild bug.

Four parts (each skippable if the reference tree is absent):
  1. kfmp predictor output parity (positions + uncertainty) on synthetic
     pedestrian trajectories — vs `interfaces/kfmp_interface.py:26-55`.
  2. cvmp predictor output parity — vs `interfaces/cvmp_interface.py:24-58`.
  3. DWA tracker lockstep parity: both trackers driven with identical
     states/obstacles/predictions for a full synthetic episode; compares
     the chosen action and the reference-cost of our choice —
     vs `pkg_dwa_tracker/trajectory_tracker.py:304-355`.
  4. Scenario-level: our eval harness run with the REFERENCE DWA tracker
     wrapped in an adapter, scenarios 0-2 — success rates answer whether
     the dwa collapse is the baseline itself.

Usage:
  python scripts/reference_parity.py [--parts 1,2,3,4] [--steps 60]
      [--runs 5] [--json-out docs/reference_parity_r3.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = os.environ.get("REF_SRC", "/root/reference/src")
sys.path.insert(0, REPO)


def np_unicycle(state: np.ndarray, action: np.ndarray, ts: float) -> np.ndarray:
    """Numpy RK4 unicycle identical to `motion.models.unicycle_step` (and to
    the reference's numpy branch, motion_model.py:141-163) — the reference
    tracker needs a casadi-free motion model to import-run here."""
    def d(s):
        return ts * np.array([action[0] * math.cos(s[2]),
                              action[0] * math.sin(s[2]), action[1]])
    k1 = d(state)
    k2 = d(state + 0.5 * k1)
    k3 = d(state + 0.5 * k2)
    k4 = d(state + k3)
    return state + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def synthetic_trajs(n: int, seed: int = 0):
    """Pedestrian-like past trajectories: ~1.2 m/s walks with stagger."""
    rng = np.random.default_rng(seed)
    trajs = []
    for i in range(n):
        L = int(rng.integers(1, 30))
        p = rng.uniform(-10, 10, 2)
        heading = rng.uniform(-np.pi, np.pi)
        v = rng.uniform(0.8, 1.5)
        pts = []
        for _ in range(L):
            pts.append(tuple(p))
            p = p + v * 0.2 * np.array([np.cos(heading), np.sin(heading)])
            p = p + rng.normal(0, 0.05, 2)     # stagger
            heading += rng.normal(0, 0.1)
        trajs.append(pts)
    return trajs


def part1_kfmp() -> dict:
    from interfaces.kfmp_interface import KfmpInterface as RefKfmp
    from dyobav_tpu.predictors.kfmp import KfmpInterface as OurKfmp

    ref = RefKfmp("mpc_fast.yaml")
    ours = OurKfmp()
    max_pos = max_std = 0.0
    n_cases = 0
    for traj in synthetic_trajs(40, seed=1):
        p_ref, s_ref = ref.get_motion_prediction(traj)
        p_our, s_our = ours.get_motion_prediction(traj)
        max_pos = max(max_pos, float(np.abs(np.array(p_ref) - np.array(p_our)).max()))
        max_std = max(max_std, float(np.abs(np.array(s_ref) - np.array(s_our)).max()))
        n_cases += 1
    out = {"part": "kfmp", "cases": n_cases,
           "max_position_diff": max_pos, "max_uncertainty_diff": max_std,
           "pass": max_pos < 1e-9 and max_std < 1e-9}
    print(json.dumps(out))
    return out


def part2_cvmp() -> dict:
    from interfaces.cvmp_interface import CvmpInterface as RefCvmp
    from dyobav_tpu.predictors.cvmp import CvmpInterface as OurCvmp

    ref = RefCvmp("mpc_fast.yaml")
    ours = OurCvmp()
    max_pos = max_std = 0.0
    n_cases = 0
    for traj in synthetic_trajs(40, seed=2):
        p_ref, s_ref = ref.get_motion_prediction(traj)
        p_our, s_our = ours.get_motion_prediction(traj)
        max_pos = max(max_pos, float(np.abs(np.array(p_ref) - np.array(p_our)).max()))
        max_std = max(max_std, float(np.abs(np.array(s_ref) - np.array(s_our)).max()))
        n_cases += 1
    out = {"part": "cvmp", "cases": n_cases,
           "max_position_diff": max_pos, "max_uncertainty_diff": max_std,
           "pass": max_pos < 1e-9 and max_std < 1e-9}
    print(json.dumps(out))
    return out


def _dwa_scene():
    """Synthetic corridor scene: two wall rectangles, one crossing walker."""
    static_obstacles = [
        [(2.0, 1.2), (8.0, 1.2), (8.0, 3.0), (2.0, 3.0)],
        [(2.0, -3.0), (8.0, -3.0), (8.0, -1.2), (2.0, -1.2)],
    ]
    ref_path = [(0.0, 0.0), (12.0, 0.0)]
    return static_obstacles, ref_path


def part3_dwa_lockstep(steps: int = 60) -> dict:
    sys.path.insert(0, REF_SRC)
    from pkg_dwa_tracker.trajectory_tracker import TrajectoryTracker as RefDwa
    from configs import DwaConfiguration as RefDwaCfg
    from configs import CircularRobotSpecification as RefRobot

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    DwaConfiguration)
    from dyobav_tpu.trackers.dwa_tracker import TrajectoryTracker as OurDwa

    cfg_path = os.path.join(REF_SRC, "..", "config", "dwa_test.yaml")
    ref_cfg = RefDwaCfg.from_yaml(cfg_path)
    ref_rob = RefRobot.from_yaml(cfg_path)
    ref = RefDwa(ref_cfg, ref_rob)
    ref.load_motion_model(np_unicycle)

    ours = OurDwa(DwaConfiguration(), CircularRobotSpecification())
    static_obstacles, ref_path = _dwa_scene()
    start = np.array([0.0, 0.0, 0.0])
    goal = np.array([12.0, 0.0, 0.0])

    ref.load_init_states(start.copy(), goal.copy())
    ref.set_work_mode("work")
    ours.load_init_states(start.copy(), goal.copy())
    ours.set_ref_trajectory(ref_path)

    # Crossing pedestrian: scripted constant-velocity track + its CV
    # "prediction" per step (list over N_hor+1 steps of position lists),
    # identical input to both trackers.
    def walker(k):
        return np.array([6.0, 4.0 - 0.24 * k])

    rows = []
    state_ref = start.copy()
    state_our = start.copy()
    N = ref_cfg.N_hor
    for k in range(steps):
        dyn = [[list(walker(k + t))] for t in range(N + 1)]
        # Both trackers are kept on the SAME state trajectory (the
        # reference's) so per-step decisions stay comparable even if a
        # cost-tied candidate flips once.
        ref.set_current_state(state_ref.copy())
        ours.set_current_state(state_ref.copy())
        ours.past_actions = [a.copy() for a in ref.past_actions]

        u_ref, traj_ref, min_cost_ref, _, _, _ = ref.run_step(
            ref_path, static_obstacles, dyn, mode="work")
        u_our, traj_our, min_cost_our, _, _, _ = ours.run_step(
            ref_path, static_obstacles, dyn, mode="work")

        # Behavioral comparison: the reference-cost of OUR chosen action
        # vs the reference's own min cost (tie-insensitive), plus raw
        # action agreement.
        ours_cost_under_ref = ref.calc_trajectory_cost(
            ref.pred_trajectory(state_ref.copy(), np.asarray(u_our, float)),
            np.asarray(u_our, float), np.array(ref_path), goal,
            static_obstacles, dyn)
        rows.append({
            "step": k,
            "du": float(np.abs(np.asarray(u_ref) - np.asarray(u_our)).max()),
            "cost_gap": float(ours_cost_under_ref - min_cost_ref)
            if np.isfinite(min_cost_ref) else 0.0,
        })
        state_ref = traj_ref[1].copy() if traj_ref.shape[0] > 1 else state_ref
        if math.hypot(state_ref[0] - goal[0], state_ref[1] - goal[1]) < 0.5:
            break

    du = np.array([r["du"] for r in rows])
    gaps = np.array([r["cost_gap"] for r in rows])
    out = {"part": "dwa_lockstep", "steps": len(rows),
           "action_match_rate": float(np.mean(du <= 1e-5)),
           "du_max": float(du.max()),
           "cost_gap_max": float(gaps.max()),
           "cost_gap_p95": float(np.percentile(gaps, 95)),
           # Pass = our pick is always within float32 noise of the
           # reference's optimum under the REFERENCE's own cost.
           "pass": bool(np.max(gaps) < 1e-3)}
    print(json.dumps(out))
    return out


class RefDwaInterface:
    """Adapter: the reference DWA tracker under our harness's DWA-interface
    protocol (set_current_state / update_global_path / run_step) — lets the
    eval protocol run the ACTUAL reference tracker on our scenarios."""

    def __init__(self, current_state, geo_map, ref_src=REF_SRC):
        sys.path.insert(0, ref_src)
        from pkg_dwa_tracker.trajectory_tracker import TrajectoryTracker as RefDwa
        from configs import DwaConfiguration as RefDwaCfg
        from configs import CircularRobotSpecification as RefRobot
        cfg_path = os.path.join(ref_src, "..", "config", "dwa_test.yaml")
        self.traj_tracker = RefDwa(RefDwaCfg.from_yaml(cfg_path),
                                   RefRobot.from_yaml(cfg_path))
        self.traj_tracker.load_motion_model(np_unicycle)
        self.state = current_state
        self.geo_map = geo_map
        self.prepared = False

    def set_current_state(self, current_state):
        self.state = current_state
        self.traj_tracker.set_current_state(current_state)

    def update_global_path(self, new_global_path):
        self.traj_tracker.load_init_states(self.state,
                                           np.array(new_global_path[-1]))
        self.traj_tracker.set_work_mode("work")
        self.traj_tracker.set_ref_trajectory(new_global_path)
        self.ref_path = new_global_path
        self.ref_traj = self.traj_tracker.ref_traj
        self.prepared = True

    def run_step(self, mode, dyn_obstacle_list=None, map_updated=None):
        static_obstacles = self.geo_map.processed_obstacle_list
        action, self.pred_states, cost, all_traj, ok_traj, ok_cost = \
            self.traj_tracker.run_step(self.ref_path, static_obstacles,
                                       dyn_obstacle_list, mode=mode)
        self.state = self.traj_tracker.state
        return action, self.pred_states, cost, all_traj, ok_traj, ok_cost


def part4_dwa_eval(runs: int, steps: int, scenarios=(0, 1, 2)) -> list:
    """Run the eval protocol (dwa:cvmp) twice per scenario: once with our
    tracker, once with the reference tracker via the adapter.

    Episodes are seed-matched PER REP (the harness's single shared RNG
    would otherwise desynchronize pedestrian stagger between the two
    branches as soon as one episode ends at a different step count), so
    both trackers face the identical pedestrian realizations."""
    import random

    from dyobav_tpu.sim.harness import MainBase

    rows = []
    for sc in scenarios:
        for which in ("ours", "reference"):
            base = MainBase(max_num_run=runs, max_run_time_step=steps,
                            scenario_index=sc, evaluation=True, seed=0)
            for rep in range(runs):
                base.rng = random.Random(1000 + rep)
                robot, humans = base._prepare_agents()
                if which == "ours":
                    intf, predictor = base._prepare_interfaces(robot, "cvmp",
                                                               "dwa")
                else:
                    intf = RefDwaInterface(robot.state, base.geo_map)
                    intf.update_global_path(robot.path)
                    _, predictor = base._prepare_interfaces(robot, "cvmp",
                                                            "dwa")
                base.run_once(robot, humans, intf, predictor, rep)
            summary = base.results_summary()
            summary["outcomes"] = ["fail" if c else "ok"
                                   for c in base.collision_results]
            summary.update(tracker=f"dwa({which})", predictor="cvmp",
                           scenario=sc, runs=runs)
            rows.append(summary)
            print(json.dumps(summary), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="1,2,3,4")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    if not os.path.isdir(REF_SRC):
        print(json.dumps({"skipped": "reference tree not present"}))
        return 0

    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REF_SRC)

    parts = {int(p) for p in args.parts.split(",")}
    results = {}
    if 1 in parts:
        results["kfmp"] = part1_kfmp()
    if 2 in parts:
        results["cvmp"] = part2_cvmp()
    if 3 in parts:
        results["dwa_lockstep"] = part3_dwa_lockstep(args.steps)
    if 4 in parts:
        results["dwa_eval"] = part4_dwa_eval(args.runs, 120)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
