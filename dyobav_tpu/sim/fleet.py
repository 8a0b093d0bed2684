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
from ..ops.params import MpcParams, tuning_vector
from .batch import (FAR_COORD, HUMAN_SIZE, assemble_dyn_obstacles,
                    build_lane_solvers, closest_obstacle_halfspaces,
                    cv_predict_horizon, human_waypoint_step,
                    point_in_any_quad, polygon_edge_distances,
                    ref_window_select)


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
    collided: jnp.ndarray       # (R,) bool (human, robot-robot, or static)
    min_inter: jnp.ndarray      # () min inter-robot center distance so far
    min_clearance: jnp.ndarray  # (R,) min robot-human distance so far
    min_static: jnp.ndarray     # (R,) min static-boundary distance so far
    solver_fails: jnp.ndarray   # (R,) int32 non-converged steps per robot
    overflow_steps: jnp.ndarray # (R,) int32 multistart cold-cap overflows
    u_prev2: jnp.ndarray        # (R, 2) action two steps back
    n_actions: jnp.ndarray      # (R,) int32 actions applied while active
    sum_jerk: jnp.ndarray       # (R, 2) Σ|Δ²(v, ω)|
    sum_dev: jnp.ndarray        # (R,) Σ per-step min ref-path distance
    max_dev: jnp.ndarray        # (R,) max of the same
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
    min_static_clearance: jnp.ndarray  # (B, R)
    solver_fail_steps: jnp.ndarray     # (B, R)
    # Reference eval-protocol metrics (main_pre.py:34-53), per robot.
    smoothness: jnp.ndarray     # (B, R, 2) mean |Δ²v|, |Δ²ω|
    deviation_mean: jnp.ndarray # (B, R)
    deviation_max: jnp.ndarray  # (B, R)
    escalation_overflow_steps: jnp.ndarray  # (B, R)


def build_fleet_sim(cfg: MpcConfiguration,
                    robot_cfg: CircularRobotSpecification,
                    solver_cfg: SolverConfiguration | None = None,
                    n_robots: int = 2, n_steps: int = 120,
                    human_vmax: float = 1.5, human_stagger: float = 0.5,
                    predictor=None, escalate: bool = True,
                    multistart: bool = True,
                    dtype=jnp.float32):
    """Returns run(batch: FleetScenario[B], seeds) -> FleetResult (jitted).

    n_robots must be <= cfg.Nother + 1 (solver other-robot slot capacity;
    slot 0 is reserved for the ego, see module docstring).

    Collision and solver semantics match `build_batch_sim`: per-step static
    polygon containment + human proximity + robot-robot disks, and the
    production escalation ladder over the flattened B*R solve lanes.
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

    # Row i lists the other robots' indices for robot i (static shape).
    others_idx = jnp.asarray(
        np.stack([[j for j in range(R) if j != i] for i in range(R)])
        if R > 1 else np.zeros((R, 0), np.int32), jnp.int32)

    # Shared production solver closures (warm profile + cold pre-solve +
    # the lax.cond-gated escalation ladder); the per-step ladder gathers
    # across ALL B*R lanes of the batch, which is why the episode loop is
    # a scan over time of a batch-level step (see build_batch_sim).
    _, cold_solve_one, solve_batch, solve_batch_ms = build_lane_solvers(
        cfg, robot_cfg, scfg, escalate=escalate, dtype=dtype)

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

    def assemble_step(sc: FleetScenario, st: FleetState):
        """Per-scenario pre-solve work: windows + prediction + R param sets."""
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
        return params, ref_idx

    def apply_step(sc: FleetScenario, st: FleetState, u, solver_ok, overflow,
                   ref_idx):
        """Per-scenario post-solve work (u: (R, nu*N))."""
        H = st.humans.shape[0]
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
        # Static polygons — same harness semantics as build_batch_sim.
        d_static = jax.vmap(lambda p: jnp.min(
            polygon_edge_distances(sc.all_polys, p)))(robots_new[:, :2])
        inside_static = jax.vmap(lambda p: point_in_any_quad(
            p, sc.all_polys))(robots_new[:, :2])
        collided_now = ((d_humans <= HUMAN_SIZE) | (d_robot <= collide_dist)
                        | inside_static)

        # Box termination test, matching the tracker (see sim.batch).
        done_now = (jnp.all(jnp.abs(robots_new[:, :2] - sc.goals[:, :2])
                            <= 0.5, axis=-1)
                    & (jnp.abs(actions[:, 0]) < 0.4))

        # Reference eval-protocol accumulators (see sim.batch.apply_step).
        jerk = jnp.abs(actions - 2.0 * st.u_prev + st.u_prev2)   # (R, 2)
        jerk_valid = st.n_actions >= 2                           # (R,)
        P = sc.ref_trajs.shape[1]
        dev_all = jnp.linalg.norm(
            robots_new[:, None, :2] - sc.ref_trajs[:, :, :2], axis=-1)
        dev = jnp.min(jnp.where(jnp.arange(P)[None] < sc.ref_lens[:, None],
                                dev_all, jnp.inf), axis=1)       # (R,)

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
            min_static=jnp.where(frozen, st.min_static,
                                 jnp.minimum(st.min_static, d_static)),
            solver_fails=st.solver_fails
            + jnp.where(frozen, 0, (~solver_ok).astype(jnp.int32)),
            overflow_steps=st.overflow_steps
            + jnp.where(frozen, 0, overflow.astype(jnp.int32)),
            u_prev2=keepR(st.u_prev, st.u_prev2),
            n_actions=st.n_actions + jnp.where(frozen, 0, 1),
            sum_jerk=jnp.where((frozen | ~jerk_valid)[:, None], st.sum_jerk,
                               st.sum_jerk + jerk),
            sum_dev=jnp.where(frozen, st.sum_dev, st.sum_dev + dev),
            max_dev=jnp.where(frozen, st.max_dev,
                              jnp.maximum(st.max_dev, dev)),
            humans=humans_new, human_wp=wp_new, human_hist=hist_new,
            rng=rng,
        )
        return st_new

    def init_state(sc: FleetScenario, seed) -> FleetState:
        H = sc.human_starts.shape[0]
        return FleetState(
            robots=sc.robot_starts.astype(dtype),
            pred=jnp.broadcast_to(sc.robot_starts.astype(dtype)[:, None, :],
                                  (R, N, ns)),
            u_prev=jnp.zeros((R, 2), dtype),
            u_warm=jnp.tile(jnp.array([base_speed, 0.0], dtype), (R, N)).reshape(R, -1),
            ref_idx=jnp.zeros((R,), jnp.int32),
            done=jnp.zeros((R,), bool), collided=jnp.zeros((R,), bool),
            min_inter=jnp.array(jnp.inf, dtype),
            min_clearance=jnp.full((R,), jnp.inf, dtype),
            min_static=jnp.full((R,), jnp.inf, dtype),
            solver_fails=jnp.zeros((R,), jnp.int32),
            overflow_steps=jnp.zeros((R,), jnp.int32),
            u_prev2=jnp.zeros((R, 2), dtype),
            n_actions=jnp.zeros((R,), jnp.int32),
            sum_jerk=jnp.zeros((R, 2), dtype),
            sum_dev=jnp.zeros((R,), dtype),
            max_dev=jnp.zeros((R,), dtype),
            humans=sc.human_starts.astype(dtype),
            human_wp=jnp.zeros((H,), jnp.int32),
            human_hist=jnp.broadcast_to(sc.human_starts.astype(dtype),
                                        (5, H, 2)),
            rng=jax.random.PRNGKey(seed),
        )

    def flat_solve(P, U0, solver):
        """Flatten the (B, R) solve lanes into one batch for the ladder."""
        B = U0.shape[0]
        Pf = jax.tree.map(lambda x: x.reshape((B * R,) + x.shape[2:]), P)
        res = solver(Pf, U0.reshape(B * R, -1))
        return (res.u.reshape(B, R, -1),
                res.converged.reshape(B, R))

    @jax.jit
    def run(batch: FleetScenario, seeds: jnp.ndarray) -> FleetResult:
        st = jax.vmap(init_state)(batch, seeds)

        if cold_solve_one is not None:
            P0, _ = jax.vmap(assemble_step)(batch, st)
            u0, _ = flat_solve(P0, st.u_warm,
                               lambda Pf, Uf: jax.vmap(cold_solve_one)(Pf,
                                                                       Uf))
            st = st._replace(u_warm=u0)

        def body(st, _):
            P, ref_idx = jax.vmap(assemble_step)(batch, st)
            if multistart:
                # Tracker decision rule per robot lane (build_batch_sim's
                # multistart semantics) over the flattened (B*R) batch.
                B = st.u_warm.shape[0]
                Pf = jax.tree.map(
                    lambda x: x.reshape((B * R,) + x.shape[2:]), P)
                res, ovf = solve_batch_ms(Pf, st.u_warm.reshape(B * R, -1),
                                          st.u_prev.reshape(B * R, -1))
                u = res.u.reshape(B, R, -1)
                ok = res.converged.reshape(B, R)
                overflow = ovf.reshape(B, R)
            else:
                u, ok = flat_solve(P, st.u_warm, solve_batch)
                overflow = jnp.zeros(ok.shape, bool)
            st2 = jax.vmap(apply_step)(batch, st, u, ok, overflow, ref_idx)
            return st2, jnp.all(st2.done | st2.collided, axis=1)

        st, finished = jax.lax.scan(body, st, None, length=n_steps)
        steps_used = jnp.sum(~finished, axis=0)
        return FleetResult(
            success=jnp.all(st.done, axis=1) & ~jnp.any(st.collided, axis=1),
            done=st.done, collided=st.collided,
            min_inter_robot=st.min_inter,
            min_clearance=st.min_clearance,
            final_states=st.robots, steps_used=steps_used,
            min_static_clearance=st.min_static,
            solver_fail_steps=st.solver_fails,
            smoothness=st.sum_jerk
            / jnp.maximum(st.n_actions - 2, 1)[..., None].astype(dtype),
            deviation_mean=st.sum_dev
            / jnp.maximum(st.n_actions, 1).astype(dtype),
            deviation_max=st.max_dev,
            escalation_overflow_steps=st.overflow_steps,
        )

    return run
