"""Decentralized multi-robot fleet simulation (scenario-batched).

The reference's solver consumes other-robot parameters — current states
`others0` and predicted trajectories `others_pred`
(mpc_builder.py:52-53, cost_fleet_collision mpc_cost.py:65-76,
trajectory_tracker.py `run_step(other_robot_states=...)` :273-296) — but
no in-tree harness ever populates them (the multi-robot story lives in the
schedule-driven `GlobalPathPlanner`, global_path_plan.py:74).  This module
closes that loop TPU-natively: R robots per scenario run receding-horizon
NMPC *simultaneously*, each avoiding the others via their previous-step
predicted trajectories (standard decentralized/communicated-plan MPC).

Everything is one jitted program: per step the R solves run under `vmap`
(one batched device call), the whole episode is a `lax.scan`, and scenarios
batch/shard exactly like `sim.batch`.

Slot conventions (matching the reference cost semantics, which skips
`others0` slot 0 in the "current" fleet term — mpc_builder.py:86-87):
  others0 slot 0      = the ego robot itself (inert by construction),
  others0 slots 1..   = other robots' current states, FAR-padded;
  others_pred slot 0  = FAR (the predictive term uses every slot),
  others_pred 1..     = other robots' predicted trajectories, FAR-padded.
A finished robot parks at its goal and keeps repelling others as a static
plan (its "prediction" broadcasts its parked state).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (CircularRobotSpecification, MpcConfiguration,
                       SolverConfiguration)
from ..motion.models import unicycle_step
from ..ops import costs
from ..ops.newton import make_alm_newton_solver
from ..ops.params import MpcParams, tuning_vector
from .batch import (FAR_COORD, HUMAN_SIZE, assemble_dyn_obstacles,
                    closest_obstacle_halfspaces, cv_predict_horizon,
                    human_waypoint_step, ref_window_select)


class FleetScenario(NamedTuple):
    """Fixed-size tensors for one R-robot episode (batch by stacking)."""
    robot_starts: jnp.ndarray   # (R, 3)
    goals: jnp.ndarray          # (R, 3)
    ref_trajs: jnp.ndarray      # (R, P, 3) padded constant-speed references
    ref_lens: jnp.ndarray       # (R,)
    all_stc: jnp.ndarray        # (M, nstcobs) halfspaces of ALL obstacles
    all_polys: jnp.ndarray      # (M, 4, 2) obstacle rectangles (FAR-padded)
    human_starts: jnp.ndarray   # (H, 2) — H may be 0
    human_paths: jnp.ndarray    # (H, W, 2)
    human_path_len: jnp.ndarray # (H,)


class FleetState(NamedTuple):
    robots: jnp.ndarray         # (R, 3)
    pred: jnp.ndarray           # (R, N, ns) last predicted states per robot
    u_prev: jnp.ndarray         # (R, 2)
    u_warm: jnp.ndarray         # (R, nu*N)
    ref_idx: jnp.ndarray        # (R,)
    done: jnp.ndarray           # (R,) bool
    collided: jnp.ndarray       # (R,) bool (human or robot-robot)
    min_inter: jnp.ndarray      # () min inter-robot center distance so far
    min_clearance: jnp.ndarray  # (R,) min robot-human distance so far
    humans: jnp.ndarray         # (H, 2)
    human_wp: jnp.ndarray       # (H,)
    human_hist: jnp.ndarray     # (5, H, 2)
    rng: jnp.ndarray


class FleetResult(NamedTuple):
    success: jnp.ndarray        # (B,) all robots done, none collided
    done: jnp.ndarray           # (B, R)
    collided: jnp.ndarray       # (B, R)
    min_inter_robot: jnp.ndarray  # (B,)
    min_clearance: jnp.ndarray  # (B, R) vs humans (inf when H == 0)
    final_states: jnp.ndarray   # (B, R, 3)
    steps_used: jnp.ndarray     # (B,)


def build_fleet_sim(cfg: MpcConfiguration,
                    robot_cfg: CircularRobotSpecification,
                    solver_cfg: SolverConfiguration | None = None,
                    n_robots: int = 2, n_steps: int = 120,
                    human_vmax: float = 1.5, human_stagger: float = 0.5,
                    predictor=None, dtype=jnp.float32):
    """Returns run(batch: FleetScenario[B], seeds) -> FleetResult (jitted).

    n_robots must be <= cfg.Nother + 1 (solver other-robot slot capacity;
    slot 0 is reserved for the ego, see module docstring).
    """
    if n_robots > cfg.Nother + 1:
        raise ValueError(
            f"n_robots={n_robots} exceeds solver capacity Nother+1="
            f"{cfg.Nother + 1}")
    scfg = solver_cfg or SolverConfiguration()
    N, ns = cfg.N_hor, cfg.ns
    R = n_robots
    ts = cfg.ts
    base_speed = robot_cfg.lin_vel_max * 0.8      # 'work' mode
    q_vec = jnp.asarray(tuning_vector(cfg), dtype)
    # Collision predicate follows the harness's point-robot convention
    # (humans collide at dist <= HUMAN_SIZE, not + robot radius): the ego
    # point hits the other robot's disk.  The solver's soft fleet cost
    # (safe_distance = vehicle_width, weights 1000/10 — mpc_builder.py:90,97)
    # equilibrates passes at ≈ vehicle_width center distance, so this
    # threshold is at 2x margin from the cost equilibrium.
    collide_dist = 0.5 * robot_cfg.vehicle_width

    u_lo, u_hi = costs.action_bounds(cfg, robot_cfg, dtype)
    c_lo, c_hi = costs.acceleration_bounds(cfg, robot_cfg, dtype)

    # Row i lists the other robots' indices for robot i (static shape).
    others_idx = jnp.asarray(
        np.stack([[j for j in range(R) if j != i] for i in range(R)])
        if R > 1 else np.zeros((R, 0), np.int32), jnp.int32)

    def solve_one(p: MpcParams, u0: jnp.ndarray):
        def obj(u_flat):
            br = costs.evaluate(u_flat, p, cfg, robot_cfg)
            return br.objective, br.f1, br.f2
        res = make_alm_newton_solver(obj, u_lo, u_hi, c_lo, c_hi, scfg)(u0)
        return res.u

    # Cold-start escalation for the episode's first solve (same rationale
    # as sim/batch.py: the warm profile assumes a shifted warm start).
    cold_solve_one = None
    if scfg.cold_profile:
        import dataclasses
        prof = tuple(scfg.cold_profile)
        ci, co, cl, cs = prof[:4]
        pen = prof[4] if len(prof) > 4 else 10.0
        cold_cfg = dataclasses.replace(
            scfg, max_inner_iters=ci, max_outer_iters=co,
            inner_iters_later=cl, newton_substeps=cs, initial_penalty=pen,
            cold_profile=None)

        def cold_solve_one(p: MpcParams, u0: jnp.ndarray):
            def obj(u_flat):
                br = costs.evaluate(u_flat, p, cfg, robot_cfg)
                return br.objective, br.f1, br.f2
            res = make_alm_newton_solver(obj, u_lo, u_hi, c_lo, c_hi,
                                         cold_cfg)(u0)
            return res.u

    predict_fn = (predictor if predictor is not None
                  else lambda hist: cv_predict_horizon(hist, N))

    far_state = jnp.full((ns,), FAR_COORD, dtype)

    def assemble_one(sc: FleetScenario, st: FleetState, i, window, dyn):
        """Solver parameters for robot i, others gathered per slot spec."""
        idx = others_idx[i]                               # (R-1,)
        cur_others = st.robots[idx]                       # (R-1, ns)
        pred_others = st.pred[idx]                        # (R-1, N, ns)
        pad = cfg.Nother - 1 - (R - 1)
        others0 = jnp.concatenate([
            st.robots[i][None], cur_others,
            jnp.broadcast_to(far_state, (pad, ns))], axis=0)
        others_pred = jnp.concatenate([
            jnp.broadcast_to(far_state, (1, N, ns)), pred_others,
            jnp.broadcast_to(far_state, (pad, N, ns))], axis=0)
        return MpcParams(
            u_prev=st.u_prev[i], s0=st.robots[i], sN=window[-1], q=q_vec,
            ref_states=window,
            ref_speed=jnp.full((N,), base_speed, dtype),
            others0=others0, others_pred=others_pred,
            stc_obs=closest_obstacle_halfspaces(sc.all_polys, sc.all_stc,
                                                st.robots[i], cfg.Nstcobs),
            dyn_obs=dyn,
            q_stc=jnp.full((N,), 10.0, dtype),
            q_dyn=jnp.full((N,), 10.0, dtype),
        )

    def fleet_step(sc: FleetScenario, st: FleetState):
        H = st.humans.shape[0]
        windows, ref_idx = jax.vmap(
            lambda traj, length, idx, state: ref_window_select(
                traj, length, idx, state, N, cfg.action_steps)
        )(sc.ref_trajs, sc.ref_lens, st.ref_idx, st.robots)

        prediction = predict_fn(st.human_hist)
        dyn = assemble_dyn_obstacles(st.humans, prediction, cfg.Ndynobs,
                                     cfg.ndynobs, N, dtype)

        params = jax.vmap(
            lambda i, w: assemble_one(sc, st, i, w, dyn)
        )(jnp.arange(R), windows)
        u = jax.vmap(solve_one)(params, st.u_warm)        # (R, nu*N)

        actions = u[:, :2]
        actions = jnp.where(actions[:, :1] < 0, 0.0, actions)  # no reverse
        robots_new = jax.vmap(lambda s, a: unicycle_step(s, a, ts))(
            st.robots, actions)
        pred_new = jax.vmap(
            lambda s, uu: costs.rollout_states(s, uu.reshape(N, cfg.nu), ts)
        )(robots_new, u)

        if H > 0:
            humans_new, wp_new, rng = human_waypoint_step(
                st.humans, st.human_wp, sc.human_paths, sc.human_path_len,
                st.rng, human_vmax, human_stagger, ts)
            hist_new = jnp.concatenate(
                [st.human_hist[1:], humans_new[None]], axis=0)
            d_humans = jnp.min(jnp.linalg.norm(
                robots_new[:, None, :2] - humans_new[None], axis=-1), axis=1)
        else:
            humans_new, wp_new, rng = st.humans, st.human_wp, st.rng
            hist_new = st.human_hist
            d_humans = jnp.full((R,), jnp.inf, dtype)

        # Pairwise robot-robot distances (diagonal masked).
        dmat = jnp.linalg.norm(
            robots_new[:, None, :2] - robots_new[None, :, :2], axis=-1)
        dmat = jnp.where(jnp.eye(R, dtype=bool), jnp.inf, dmat)
        d_robot = jnp.min(dmat, axis=1) if R > 1 else jnp.full((R,), jnp.inf,
                                                               dtype)
        collided_now = (d_humans <= HUMAN_SIZE) | (d_robot <= collide_dist)

        dist_goal = jnp.linalg.norm(robots_new[:, :2] - sc.goals[:, :2],
                                    axis=-1)
        done_now = (dist_goal < 0.5) & (jnp.abs(actions[:, 0]) < 0.4)

        frozen = st.done | st.collided
        keepR = lambda new, old: jnp.where(frozen[:, None], old, new)
        warm = jnp.concatenate([u[:, 2:], u[:, -2:]], axis=1)
        # Parked robots repel as a static plan: broadcast current state.
        parked_pred = jnp.broadcast_to(st.robots[:, None, :], (R, N, ns))
        st_new = FleetState(
            robots=keepR(robots_new, st.robots),
            pred=jnp.where(frozen[:, None, None], parked_pred, pred_new),
            u_prev=keepR(actions, st.u_prev),
            u_warm=keepR(warm, st.u_warm),
            ref_idx=jnp.where(frozen, st.ref_idx, ref_idx),
            done=st.done | (done_now & ~frozen),
            collided=st.collided | (collided_now & ~frozen),
            min_inter=jnp.minimum(st.min_inter, jnp.min(dmat)),
            min_clearance=jnp.where(frozen, st.min_clearance,
                                    jnp.minimum(st.min_clearance, d_humans)),
            humans=humans_new, human_wp=wp_new, human_hist=hist_new,
            rng=rng,
        )
        return st_new

    def run_scenario(sc: FleetScenario, seed):
        H = sc.human_starts.shape[0]
        st = FleetState(
            robots=sc.robot_starts.astype(dtype),
            pred=jnp.broadcast_to(sc.robot_starts.astype(dtype)[:, None, :],
                                  (R, N, ns)),
            u_prev=jnp.zeros((R, 2), dtype),
            u_warm=jnp.tile(jnp.array([base_speed, 0.0], dtype), (R, N)).reshape(R, -1),
            ref_idx=jnp.zeros((R,), jnp.int32),
            done=jnp.zeros((R,), bool), collided=jnp.zeros((R,), bool),
            min_inter=jnp.array(jnp.inf, dtype),
            min_clearance=jnp.full((R,), jnp.inf, dtype),
            humans=sc.human_starts.astype(dtype),
            human_wp=jnp.zeros((H,), jnp.int32),
            human_hist=jnp.broadcast_to(sc.human_starts.astype(dtype),
                                        (5, H, 2)),
            rng=jax.random.PRNGKey(seed),
        )

        if cold_solve_one is not None:
            windows0, _ = jax.vmap(
                lambda traj, length, idx, state: ref_window_select(
                    traj, length, idx, state, N, cfg.action_steps)
            )(sc.ref_trajs, sc.ref_lens, st.ref_idx, st.robots)
            dyn0 = assemble_dyn_obstacles(st.humans,
                                          predict_fn(st.human_hist),
                                          cfg.Ndynobs, cfg.ndynobs, N, dtype)
            params0 = jax.vmap(
                lambda i, w: assemble_one(sc, st, i, w, dyn0)
            )(jnp.arange(R), windows0)
            st = st._replace(u_warm=jax.vmap(cold_solve_one)(params0,
                                                             st.u_warm))

        def body(st, _):
            st2 = fleet_step(sc, st)
            return st2, jnp.all(st2.done | st2.collided)

        st, finished = jax.lax.scan(body, st, jnp.arange(n_steps))
        return st, jnp.sum(~finished)

    @jax.jit
    def run(batch: FleetScenario, seeds: jnp.ndarray) -> FleetResult:
        st, steps = jax.vmap(run_scenario)(batch, seeds)
        return FleetResult(
            success=jnp.all(st.done, axis=1) & ~jnp.any(st.collided, axis=1),
            done=st.done, collided=st.collided,
            min_inter_robot=st.min_inter,
            min_clearance=st.min_clearance,
            final_states=st.robots, steps_used=steps,
        )

    return run
