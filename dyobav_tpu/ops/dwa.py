"""Dynamic-Window-Approach engine: the whole search as one jitted program.

The reference DWA (`pkg_dwa_tracker/trajectory_tracker.py:94-355`) runs a
Python double loop over the (v, ω) window, rolling out and scoring each
candidate with numpy.  Here the full candidate grid × N_hor rollout × cost
evaluation is a single vmapped XLA program: a fixed-size padded grid (masked
`arange` semantics) keeps shapes static so the same compiled function serves
every step, batches over scenarios, and shards over meshes.

Cost semantics match the reference exactly, including:
  * per-obstacle hard-collision (<0.05 m) → inf,
  * the √(i+1) later-step weighting in the per-step dynamic cost and its
    off-by-one pairing of rollout point i with prediction step i+1
    (trajectory_tracker.py:162-176),
  * the "stuck" rule rewriting ω of a slow best candidate.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import CircularRobotSpecification, DwaConfiguration
from ..motion.models import unicycle_step

# Sentinel coordinate for padded obstacles: far enough that every distance
# test is inert, small enough to stay exact in float32.
FAR = 1.0e6


class DwaGridSpec(NamedTuple):
    """Static grid dimensions derived from config (padded upper bounds)."""
    n_v: int
    n_w: int


def grid_spec(cfg: DwaConfiguration, robot: CircularRobotSpecification) -> DwaGridSpec:
    # Window width is min(2*acc*ts, full velocity range); arange needs +2 to
    # cover endpoint/rounding behavior.
    full_v = (robot.lin_vel_max - robot.lin_vel_min) / cfg.vel_resolution
    acc_v = 2.0 * robot.lin_acc_max * cfg.ts / cfg.vel_resolution
    full_w = 2.0 * robot.ang_vel_max / cfg.ang_resolution
    acc_w = 2.0 * robot.ang_acc_max * cfg.ts / cfg.ang_resolution
    return DwaGridSpec(n_v=int(min(full_v, acc_v)) + 2,
                       n_w=int(min(full_w, acc_w)) + 2)


class DwaResult(NamedTuple):
    best_u: jnp.ndarray          # (2,)
    best_trajectory: jnp.ndarray # (N_hor+1, 3) incl. the current state row
    min_cost: jnp.ndarray        # scalar
    all_trajectories: jnp.ndarray  # (n_cand, N_hor+1, 3)
    costs: jnp.ndarray           # (n_cand,) inf for colliding/padded
    valid: jnp.ndarray           # (n_cand,) grid-membership mask


def build_dwa_engine(cfg: DwaConfiguration, robot: CircularRobotSpecification,
                     max_static_obs: int = 64, max_dyn_obs: int = 16):
    """Returns (jitted step, grid spec) where step has signature
    step(state, u_all, valid, goal, ref_path, base_speed, static_obs,
    dyn_obs_steps) -> DwaResult.

    u_all / valid: the host-built float64-exact candidate grid and its
        membership mask — build them with `candidate_grid(cfg, robot, spec,
        last_u)` each control step (see step_fn for why the grid cannot be
        built in-graph).
    static_obs: (max_static_obs, 4, 2) polygon vertices, FAR-padded.
    dyn_obs_steps: (N_hor+1, max_dyn_obs, 2) predicted positions per step,
        FAR-padded (step 0 = current positions).
    ref_path: (n_ref, 2) waypoint path, last point repeated to pad.
    """
    spec = grid_spec(cfg, robot)
    N = cfg.N_hor
    ts = cfg.ts

    def rollout(state, u):
        def step(s, _):
            s2 = unicycle_step(s, u, ts)
            return s2, s2
        _, traj = jax.lax.scan(step, state, None, length=N, unroll=True)
        return jnp.concatenate([state[None], traj], axis=0)   # (N+1, 3)

    def seg_dists(points, a, b):
        d = b - a
        len_sq = jnp.sum(d * d, axis=-1) + 1e-16
        rel = points[:, None, :] - a[None]
        t = jnp.clip(jnp.sum(rel * d[None], axis=-1) / len_sq, 0.0, 1.0)
        closest = a[None] + t[..., None] * d[None]
        return jnp.linalg.norm(points[:, None, :] - closest, axis=-1)

    def candidate_cost(traj, u, goal, ref_path, base_speed, static_obs,
                       dyn_obs_steps):
        # Speed cost (trajectory_tracker.py:178-179).
        cost = jnp.abs(u[0] - base_speed) * cfg.q_speed

        # Goal-direction cost (:128-136).
        dx = goal[0] - traj[-1, 0]
        dy = goal[1] - traj[-1, 1]
        err = jnp.arctan2(dy, dx) - traj[-1, 2]
        cost += jnp.abs(jnp.arctan2(jnp.sin(err), jnp.cos(err))) * cfg.q_goal_dir

        # Reference-path deviation of the final point (:181-184).
        d_ref = seg_dists(traj[-1:, :2], ref_path[:-1], ref_path[1:])
        cost += jnp.min(d_ref) * cfg.q_ref_deviation

        # Static obstacles (:138-148): per-obstacle min distance over the
        # whole trajectory; any < 0.05 → inf; else 1/min * q if min < 0.5.
        def per_obs(poly):
            a = poly
            b = jnp.roll(poly, -1, axis=0)
            return jnp.min(seg_dists(traj[:, :2], a, b))
        obs_min = jax.vmap(per_obs)(static_obs)              # (Ms,)
        hard_hit = jnp.any(obs_min < 0.05)
        min_dist = jnp.min(obs_min)
        stc_cost = jnp.where(min_dist > 0.5, 0.0,
                             1.0 / jnp.maximum(min_dist, 1e-9) * cfg.q_stc_obstacle)
        cost += stc_cost

        # Dynamic obstacles, flat variant on current positions (:150-160).
        d_cur = jnp.linalg.norm(
            traj[:, None, :2] - dyn_obs_steps[0][None], axis=-1)
        min_cur = jnp.min(d_cur)
        hard_hit |= min_cur < 0.2
        cost += jnp.where(min_cur > 0.5, 0.0,
                          1.0 / jnp.maximum(min_cur, 1e-9) * cfg.q_dyn_obstacle)

        # Per-step variant on predicted positions (:162-176): rollout point i
        # vs prediction step i+1, weighted by sqrt(i+1).
        steps = dyn_obs_steps[1:]                            # (N, Md, 2)
        d_step = jnp.linalg.norm(traj[:N, None, :2] - steps, axis=-1)  # (N, Md)
        min_step = jnp.min(d_step, axis=1) * jnp.sqrt(jnp.arange(1, N + 1, dtype=traj.dtype))
        hard_hit |= jnp.any(min_step < 0.2)
        overall = jnp.min(min_step)
        cost += jnp.where(overall > 0.5, 0.0,
                          1.0 / jnp.maximum(overall, 1e-9) * cfg.q_dyn_obstacle)

        return jnp.where(hard_hit, jnp.inf, cost)

    def step_fn(state, u_all, valid, goal, ref_path, base_speed, static_obs,
                dyn_obs_steps) -> DwaResult:
        # The candidate grid is built HOST-side in float64 with numpy-arange
        # semantics (see `candidate_grid`) because the reference's window
        # membership is knife-edge: the acceleration window is exactly
        # 2*acc*ts/resolution grid steps wide, so whether `np.arange`
        # includes the top candidate depends on float noise in last_u —
        # an in-graph float32 grid made the opposite call on ~15% of steps
        # (scripts/reference_parity.py lockstep study: du_max exactly one
        # resolution notch).  Passing the grid in keeps membership exact.
        trajs = jax.vmap(lambda u: rollout(state, u))(u_all)
        costs = jax.vmap(lambda tr, u: candidate_cost(
            tr, u, goal, ref_path, base_speed, static_obs, dyn_obs_steps)
        )(trajs, u_all)
        costs = jnp.where(valid, costs, jnp.inf)

        best = jnp.argmin(costs)
        best_u = u_all[best]
        # Stuck-escape (:345-346): slow best → spin at max angular speed.
        best_u = jnp.where(jnp.abs(best_u[0]) < cfg.stuck_threshold,
                           jnp.array([best_u[0], -robot.ang_vel_max]), best_u)
        # All candidates invalid or inf-cost (fully boxed in, or an empty
        # arange window): the reference never updates best_u and returns
        # zeros (stop), skipping the stuck rewrite (trajectory_tracker.py:
        # 304-355 leaves best_u at its zero init when no candidate improves
        # inf).  argmin over all-inf would otherwise pick padded candidate 0
        # and the stuck rule could rewrite it into a spin command.
        any_finite = jnp.any(jnp.isfinite(costs))
        best_u = jnp.where(any_finite, best_u, jnp.zeros_like(best_u))
        return DwaResult(
            best_u=best_u, best_trajectory=trajs[best], min_cost=costs[best],
            all_trajectories=trajs, costs=costs, valid=valid,
        )

    return jax.jit(step_fn), spec


def candidate_grid(cfg: DwaConfiguration, robot: CircularRobotSpecification,
                   spec: DwaGridSpec, last_u: "np.ndarray"):
    """(u_all (n_v*n_w, 2), valid (n_v*n_w,)) — float64 host-side grid with
    the reference's exact `np.arange` semantics
    (trajectory_tracker.py:94-108 window + :131-132 loops)."""
    import numpy as np
    ts = cfg.ts
    v_lo = max(robot.lin_vel_min, float(last_u[0]) - robot.lin_acc_max * ts)
    v_hi = min(robot.lin_vel_max, float(last_u[0]) + robot.lin_acc_max * ts)
    w_lo = max(-robot.ang_vel_max, float(last_u[1]) - robot.ang_acc_max * ts)
    w_hi = min(robot.ang_vel_max, float(last_u[1]) + robot.ang_acc_max * ts)
    v = np.arange(v_lo, v_hi, cfg.vel_resolution)
    w = np.arange(w_lo, w_hi, cfg.ang_resolution)
    if len(v) > spec.n_v or len(w) > spec.n_w:
        raise ValueError(f"grid spec too small: ({len(v)},{len(w)}) vs {spec}")
    v_pad = np.full(spec.n_v, v[0] if len(v) else 0.0)
    w_pad = np.full(spec.n_w, w[0] if len(w) else 0.0)
    v_pad[:len(v)] = v
    w_pad[:len(w)] = w
    v_ok = np.arange(spec.n_v) < len(v)
    w_ok = np.arange(spec.n_w) < len(w)
    vv, ww = np.meshgrid(v_pad, w_pad, indexing="ij")
    u_all = np.stack([vv.reshape(-1), ww.reshape(-1)], axis=1)
    valid = (v_ok[:, None] & w_ok[None, :]).reshape(-1)
    return u_all.astype(np.float32), valid
