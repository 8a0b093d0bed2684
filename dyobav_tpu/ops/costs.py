"""NMPC objective + constraint functions, fully vectorized (L3b core).

Reproduces the objective built symbolically by the reference's
`MpcModule.build` (mpc_builder.py:28-174) — every term, weight, margin and
accumulation quirk — but as one traced JAX function:

  * the horizon rollout is a `lax.scan` over the unicycle RK4 step
    (no 20x unrolled symbolic graph);
  * all obstacle/fleet terms are computed as (N_hor, ...) tensor ops;
  * `jax.grad` provides exact derivatives (replacing CasADi AD);
  * the function is vmap-able over scenario batches and shardable.

Semantics notes (verified against the reference expression graph):
  - `cost_refpath_deviation` takes the min over a *shrinking* segment window:
    state k only sees reference segments j >= k (mpc_builder.py:81).
    Implemented with a triangular mask over the full (N, N) distance matrix.
  - The "current" fleet-collision term skips other-robot slot 0
    (mpc_builder.py:86-87 slices start at index ns).
  - The "current" dynamic-obstacle term reuses horizon-step 0 of o_d at every
    k; the predictive term uses step k+1 (mpc_builder.py:111-143).
  - The penalty-constraint vector F2 has Ndynobs components, each equal to
    [shared static-obstacle violation sum] + [that obstacle's own dynamic
    violation sum] — a consequence of CasADi scalar+vector broadcast in
    `penalty_constraints += ...` (mpc_builder.py:106,119,137) that the
    reference solver actually optimizes, so we reproduce it exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import CircularRobotSpecification, MpcConfiguration
from ..motion.models import unicycle_step
from .params import MpcParams

import os
# Rollout unroll factor.  Measured: unroll=4 left TPU throughput unchanged
# (1,718 solves/s either way — the solve is bound by the sequential Newton
# iterations, not scan-step overhead) while ~2.5x-ing the remote TPU
# compile; full unroll (20) blew CPU compiles from ~90 s to >10 min via the
# jacfwd Hessian.  Default 1 (While loop) for fast compiles; the env knob
# remains for experiments.
_ROLLOUT_UNROLL = max(1, int(os.environ.get("DYOBAV_ROLLOUT_UNROLL", "1")))


def rollout_states(s0: jnp.ndarray, u: jnp.ndarray, ts: float) -> jnp.ndarray:
    """Roll the unicycle model over the horizon.

    Args:
        s0: (ns,) initial state.  u: (N, nu) actions.  ts: sampling time.
    Returns:
        (N, ns) states after each action (t = 1..N).
    """
    def step(s, a):
        s_next = unicycle_step(s, a, ts)
        return s_next, s_next

    _, states = jax.lax.scan(step, s0, u, unroll=_ROLLOUT_UNROLL)
    return states


def refpath_deviation_cost(states_xy: jnp.ndarray, ref_pts: jnp.ndarray,
                           weight: jnp.ndarray) -> jnp.ndarray:
    """Sum_k weight * min_{j>=k} dist²(state_k, segment_j).

    ref_pts is (N+1, 2): the N reference states' positions with the last one
    repeated (mpc_builder.py:68-69), giving N segments.
    """
    N = states_xy.shape[0]
    seg_a, seg_b = ref_pts[:-1], ref_pts[1:]              # (N, 2) each
    d = seg_b - seg_a
    len_sq = jnp.sum(d * d, axis=-1) + 1e-16
    rel = states_xy[:, None, :] - seg_a[None, :, :]        # (N, N, 2)
    t = jnp.clip(jnp.sum(rel * d[None], axis=-1) / len_sq, 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * d[None]
    dist_sq = jnp.sum((states_xy[:, None, :] - closest) ** 2, axis=-1)  # (N, N)
    k_idx = jnp.arange(N)[:, None]
    j_idx = jnp.arange(N)[None, :]
    masked = jnp.where(j_idx >= k_idx, dist_sq, jnp.inf)
    return jnp.sum(weight * jnp.min(masked, axis=1))


def fleet_collision_cost(states_xy: jnp.ndarray, others_xy: jnp.ndarray,
                         safe_distance: float, weight: float,
                         per_step: bool) -> jnp.ndarray:
    """Hinge on squared clearance to other robots (mpc_cost.py:65-76).

    others_xy: (M, 2) if the same set applies at every step (per_step=False),
    or (N, M, 2) with one set per horizon step (per_step=True).
    """
    if per_step:
        diff = states_xy[:, None, :] - others_xy           # (N, M, 2)
    else:
        diff = states_xy[:, None, :] - others_xy[None]     # (N, M, 2)
    dist_sq = jnp.sum(diff * diff, axis=-1)
    return weight * jnp.sum(jnp.maximum(0.0, safe_distance ** 2 - dist_sq))


def _polygon_residuals(states_xy: jnp.ndarray, stc_obs: jnp.ndarray,
                       n_edges: int) -> jnp.ndarray:
    """Per-(step, obstacle) inside-indicator, (N, Nstcobs).

    stc_obs packs (b | a0 | a1), n_edges each (mpc_builder.py:100-103).
    Indicator = prod_edges relu(b - a0 x - a1 y)  >= 0, >0 iff inside.
    """
    b = stc_obs[:, :n_edges]
    a0 = stc_obs[:, n_edges:2 * n_edges]
    a1 = stc_obs[:, 2 * n_edges:]
    res = (b[None] - a0[None] * states_xy[:, 0, None, None]
           - a1[None] * states_xy[:, 1, None, None])       # (N, Nobs, E)
    return jnp.prod(jnp.maximum(0.0, res), axis=-1)


def _ellipse_indicator(states_xy: jnp.ndarray, ell: jnp.ndarray,
                       extra_margin: float) -> jnp.ndarray:
    """Inside-indicator for per-step ellipse sets.

    ell: (N, M, 6) rows (x, y, rx, ry, ang, alpha) aligned with states (N, 2).
    Returns (N, M) signed indicators (>0 inside), radii enlarged by
    `extra_margin` with the reference's 1e-6 regularizer.
    """
    dx = states_xy[:, None, 0] - ell[..., 0]
    dy = states_xy[:, None, 1] - ell[..., 1]
    rx = ell[..., 2] + extra_margin + 1e-6
    ry = ell[..., 3] + extra_margin + 1e-6
    c, s = jnp.cos(ell[..., 4]), jnp.sin(ell[..., 4])
    u = (dx * c + dy * s) / rx
    v = (dx * s - dy * c) / ry
    return 1.0 - u * u - v * v


class CostBreakdown(NamedTuple):
    objective: jnp.ndarray      # scalar f(u; z)
    f1: jnp.ndarray             # (2 N_hor,) acceleration ALM constraint values
    f2: jnp.ndarray             # (Ndynobs,) penalty-constraint vector
    states: jnp.ndarray         # (N_hor, ns) rolled-out states


def evaluate(u_flat: jnp.ndarray, p: MpcParams, cfg: MpcConfiguration,
             robot: CircularRobotSpecification) -> CostBreakdown:
    """Full objective + constraint evaluation for one problem instance.

    u_flat: (nu*N_hor,) decision variables in [v0, w0, v1, w1, ...] order,
    identical to the reference solver's decision vector.
    """
    states = rollout_states(p.s0, u_flat.reshape(cfg.N_hor, cfg.nu), cfg.ts)
    return evaluate_states(states, u_flat, p, cfg, robot)


def evaluate_states(states: jnp.ndarray, u_flat: jnp.ndarray, p: MpcParams,
                    cfg: MpcConfiguration,
                    robot: CircularRobotSpecification) -> CostBreakdown:
    """`evaluate` with the rolled-out states passed in as an independent
    input — the state-space objective φ(X, u).

    This split is what the structured Hessian exploits (`ops.newton`):
    every cost/constraint term here is a PARALLEL tensor op over the
    horizon, so ∇²φ over the (N·ns + N·nu)-dim (X, u) vector contains no
    sequential scan; the rollout's curvature is reassembled separately
    from per-step dynamics derivatives.  `evaluate(u) ==
    evaluate_states(rollout(u), u)` exactly (same ops, same tie-breaks).
    """
    N, nu = cfg.N_hor, cfg.nu
    u = u_flat.reshape(N, nu)
    ts = cfg.ts

    (qpos, qvel, qtheta, rv, rw, qN, qthetaN, qrpd,
     acc_penalty, w_acc_penalty) = [p.q[i] for i in range(10)]

    states_xy = states[:, :2]

    # Reference path: N states' positions, last repeated -> N segments.
    ref_pts = jnp.concatenate([p.ref_states[:, :2], p.ref_states[-1:, :2]], axis=0)

    cost = refpath_deviation_cost(states_xy, ref_pts, qrpd)
    cost += jnp.sum(qvel * (u[:, 0] - p.ref_speed) ** 2)
    cost += jnp.sum(rv * u[:, 0] ** 2 + rw * u[:, 1] ** 2)

    # Fleet collision: current positions (skip slot 0) weight 1000;
    # predictive positions (all slots, step k) weight 10.
    cost += fleet_collision_cost(states_xy, p.others0[1:, :2],
                                 robot.vehicle_width, 1000.0, per_step=False)
    others_k = jnp.swapaxes(p.others_pred[..., :2], 0, 1)  # (N, Nother, 2)
    cost += fleet_collision_cost(states_xy, others_k,
                                 robot.vehicle_width, 10.0, per_step=True)

    # Static polygon obstacles.
    n_edges = cfg.nstcobs // 3
    inside_stc = _polygon_residuals(states_xy, p.stc_obs, n_edges)  # (N, Nobs)
    cost += jnp.sum(p.q_stc[:, None] * inside_stc ** 2)
    static_violation = jnp.sum(inside_stc)                # scalar S (>=0)

    # Dynamic ellipse obstacles: "current" block repeats step 0 at every k.
    margin_soft = robot.vehicle_margin + robot.social_margin
    ell_cur = jnp.broadcast_to(p.dyn_obs[:, 0, :],
                               (N,) + p.dyn_obs[:, 0, :].shape)  # (N, M, 6)
    ind_cur_raw = _ellipse_indicator(states_xy, ell_cur, 0.0)
    ind_cur_soft = _ellipse_indicator(states_xy, ell_cur, margin_soft)
    alpha_cur = ell_cur[..., 5]
    cost += 1000.0 * jnp.sum(alpha_cur * jnp.maximum(0.0, ind_cur_soft) ** 2)

    # Predictive block: step k+1 for state k.
    ell_pred = jnp.swapaxes(p.dyn_obs[:, 1:, :], 0, 1)    # (N, M, 6)
    ind_pred_raw = _ellipse_indicator(states_xy, ell_pred, 0.0)
    ind_pred_soft = _ellipse_indicator(states_xy, ell_pred,
                                       robot.vehicle_margin)
    alpha_pred = ell_pred[..., 5]
    cost += jnp.sum(p.q_dyn[:, None] * alpha_pred
                    * jnp.maximum(0.0, ind_pred_soft) ** 2)

    # Terminal cost on the final rolled-out state (mpc_builder.py:148).
    sT = states[-1]
    cost += qN * ((sT[0] - p.sN[0]) ** 2 + (sT[1] - p.sN[1]) ** 2)
    cost += qthetaN * (sT[2] - p.sN[2]) ** 2

    # Acceleration cost + ALM constraint values (mpc_builder.py:155-169).
    v, w = u[:, 0], u[:, 1]
    acc = (v - jnp.concatenate([p.u_prev[:1], v[:-1]])) / ts
    w_acc = (w - jnp.concatenate([p.u_prev[1:2], w[:-1]])) / ts
    cost += acc_penalty * jnp.sum(acc ** 2)
    cost += w_acc_penalty * jnp.sum(w_acc ** 2)
    f1 = jnp.concatenate([acc, w_acc])

    # Penalty-constraint vector F2 (Ndynobs,), see module docstring.
    dyn_violation = (jnp.sum(jnp.maximum(0.0, ind_cur_raw), axis=0)
                     + jnp.sum(jnp.maximum(0.0, ind_pred_raw), axis=0))
    f2 = static_violation + dyn_violation

    return CostBreakdown(objective=cost, f1=f1, f2=f2, states=states)


def split_objective(p: MpcParams, cfg: MpcConfiguration,
                    robot: CircularRobotSpecification):
    """(phi, rollout, step, s0, blocks) — the structured form of the NMPC
    objective consumed by `ops.newton`'s structured/block Hessians.

    phi(X, u)  : state-space objective (no rollout inside; all-parallel ops)
    rollout(u) : (nu*N,) -> (N, ns) horizon states
    step(x, a) : one dynamics step (the scan body), for per-step Jacobian /
                 curvature extraction
    s0         : (ns,) initial state
    blocks     : `make_block_curvature(p, cfg, robot)` (block mode)
    """
    from ..motion.models import unicycle_step

    N, nu, ts = cfg.N_hor, cfg.nu, cfg.ts

    def phi(states, u_flat):
        br = evaluate_states(states, u_flat, p, cfg, robot)
        return br.objective, br.f1, br.f2

    def roll(u_flat):
        return rollout_states(p.s0, u_flat.reshape(N, nu), ts)

    def step(x, a):
        return unicycle_step(x, a, ts)

    return phi, roll, step, p.s0, make_block_curvature(p, cfg, robot)


def make_block_curvature(p: MpcParams, cfg: MpcConfiguration,
                         robot: CircularRobotSpecification):
    """Per-horizon-step curvature of the ALM merit — the "block" Hessian
    mode's workhorse (see `ops.newton.make_structured_hessian`).

    Every merit term except the squared penalty channel Σᵢ F_i² is
    separable per step k over the 7 variables (x_k, u_k, u_{k-1}); its
    curvature is N vmapped 7×7 Hessians — tangent width 7 through 1/N of
    the objective each, ~6x less derivative work than 40 Hessian-vector
    products of the full φ.  The penalty channel's curvature splits exactly
    into (a) per-step blocks of the WEIGHTED-linearized hinges
    c·Σᵢ wᵢ∇²F_i (weights wᵢ = F_i frozen at the evaluation point, folded
    into the same 7×7 blocks) and (b) the rank-M_dyn outer-product part
    c·Σᵢ ∇F_i∇F_iᵀ returned as per-step hinge gradients.

    Returns block_fn(X, u_flat, y, c) -> (C7 (N, 7, 7), gF (N, M, ns)):
      C7: per-step Hessians over (x_k, u_k, u_{k-1})
      gF: ∇_{x_k} F_i rows (the rank part, projected by the caller)
    Exactness: Σ_k S7ᵀC7S7 + c·Σᵢ(Jᵀg_i)(Jᵀg_i)ᵀ == Gᵀ(∇²φ_merit)G to
    float tolerance (tests/test_hessian.py).
    """
    N, nu, ns = cfg.N_hor, cfg.nu, cfg.ns
    ts = cfg.ts
    n_edges = cfg.nstcobs // 3
    margin_soft = robot.vehicle_margin + robot.social_margin
    vw2 = robot.vehicle_width ** 2
    (qpos, qvel, qtheta, rv, rw, qN, qthetaN, qrpd,
     acc_pen, w_acc_pen) = [p.q[i] for i in range(10)]
    c_lo, c_hi = acceleration_bounds(cfg, robot, p.ref_states.dtype)

    ref_pts = jnp.concatenate([p.ref_states[:, :2], p.ref_states[-1:, :2]],
                              axis=0)
    seg_a, seg_b = ref_pts[:-1], ref_pts[1:]
    seg_d = seg_b - seg_a
    seg_len_sq = jnp.sum(seg_d * seg_d, axis=-1) + 1e-16
    others_k_all = jnp.swapaxes(p.others_pred[..., :2], 0, 1)  # (N, No, 2)
    ell_cur = p.dyn_obs[:, 0, :]                               # (M, 6)
    ell_pred_all = jnp.swapaxes(p.dyn_obs[:, 1:, :], 0, 1)     # (N, M, 6)

    def hinges_k(x_k, k):
        """(s_k, d_k (M,)): step k's contributions to S and D_i."""
        xy = x_k[:2][None]
        stc = _polygon_residuals(xy, p.stc_obs, n_edges)[0]
        cur = _ellipse_indicator(xy, ell_cur[None], 0.0)[0]
        prd = _ellipse_indicator(xy, ell_pred_all[k][None], 0.0)[0]
        return jnp.sum(stc), (jnp.maximum(0.0, cur) + jnp.maximum(0.0, prd))

    def phi_k(zz, k, y, c, w, wtot):
        """Step k's slice of the merit (each original term appears in
        exactly one phi_k; the penalty channel enters weight-linearized)."""
        x_k, u_k, u_km1 = zz[:ns], zz[ns:ns + nu], zz[ns + nu:]
        xy = x_k[:2]
        # refpath: min over segments j >= k (shrinking window, evaluate()).
        rel = xy[None] - seg_a
        t = jnp.clip(jnp.sum(rel * seg_d, axis=-1) / seg_len_sq, 0.0, 1.0)
        closest = seg_a + t[:, None] * seg_d
        dist_sq = jnp.sum((xy[None] - closest) ** 2, axis=-1)
        masked = jnp.where(jnp.arange(N) >= k, dist_sq, jnp.inf)
        cost = qrpd * jnp.min(masked)
        cost += qvel * (u_k[0] - p.ref_speed[k]) ** 2
        cost += rv * u_k[0] ** 2 + rw * u_k[1] ** 2
        # fleet: current (skip slot 0, weight 1000) + predictive (step k).
        dcur = xy[None] - p.others0[1:, :2]
        cost += 1000.0 * jnp.sum(jnp.maximum(
            0.0, vw2 - jnp.sum(dcur * dcur, axis=-1)))
        dprd = xy[None] - others_k_all[k]
        cost += 10.0 * jnp.sum(jnp.maximum(
            0.0, vw2 - jnp.sum(dprd * dprd, axis=-1)))
        # static polygons.
        stc_prod = _polygon_residuals(xy[None], p.stc_obs, n_edges)[0]
        cost += p.q_stc[k] * jnp.sum(stc_prod ** 2)
        # dynamic ellipses: current (soft margin, weight 1000·α) +
        # predictive (vehicle margin, weight q_dyn·α).
        ind_cur_soft = _ellipse_indicator(xy[None], ell_cur[None],
                                          margin_soft)[0]
        cost += 1000.0 * jnp.sum(ell_cur[:, 5]
                                 * jnp.maximum(0.0, ind_cur_soft) ** 2)
        ind_prd_soft = _ellipse_indicator(xy[None], ell_pred_all[k][None],
                                          robot.vehicle_margin)[0]
        cost += p.q_dyn[k] * jnp.sum(ell_pred_all[k][:, 5]
                                     * jnp.maximum(0.0, ind_prd_soft) ** 2)
        # terminal (k = N-1 only).
        term = (qN * ((x_k[0] - p.sN[0]) ** 2 + (x_k[1] - p.sN[1]) ** 2)
                + qthetaN * (x_k[2] - p.sN[2]) ** 2)
        cost += jnp.where(k == N - 1, term, 0.0)
        # acceleration cost + this step's ALM components.
        acc = (u_k[0] - u_km1[0]) / ts
        wacc = (u_k[1] - u_km1[1]) / ts
        cost += acc_pen * acc ** 2 + w_acc_pen * wacc ** 2
        sh_a = acc + y[k] / c
        sh_w = wacc + y[N + k] / c
        alm_a = sh_a - jnp.clip(sh_a, c_lo[k], c_hi[k])
        alm_w = sh_w - jnp.clip(sh_w, c_lo[N + k], c_hi[N + k])
        cost += 0.5 * c * (alm_a ** 2 + alm_w ** 2)
        # penalty channel, weight-linearized: c·Σᵢ wᵢ (s_k + d_ik).
        s_k, d_k = hinges_k(x_k, k)
        cost += c * (wtot * s_k + jnp.dot(w, d_k))
        return cost

    def block_fn(X, u_flat, y, c):
        U = u_flat.reshape(N, nu)
        U_km1 = jnp.concatenate([p.u_prev[None].astype(U.dtype), U[:-1]],
                                axis=0)
        ZZ = jnp.concatenate([X, U, U_km1], axis=1)          # (N, 7)
        ks = jnp.arange(N)
        s_all, d_all = jax.vmap(hinges_k)(X, ks)             # (N,), (N, M)
        w = jax.lax.stop_gradient(jnp.sum(s_all) + jnp.sum(d_all, axis=0))
        wtot = jnp.sum(w)
        C7 = jax.vmap(lambda zz, k: jax.hessian(
            lambda z_: phi_k(z_, k, y, c, w, wtot))(zz))(ZZ, ks)
        gs, gd = jax.vmap(jax.jacfwd(hinges_k, argnums=0))(X, ks)
        gF = gs[:, None, :] + gd                             # (N, M, ns)
        return C7, gF

    return block_fn


def constraint_residuals(u_flat: jnp.ndarray, p: MpcParams,
                         cfg: MpcConfiguration,
                         robot: CircularRobotSpecification):
    """Disaggregated smooth constraint residuals (feasible iff all <= 0).

    The solver's penalty channel F2 (sum of hinges, see `evaluate`) equals
    zero exactly when every one of these residuals is non-positive, so
    {F2 = 0} == {all residuals <= 0}: this is the same NLP with its
    constraints exposed individually and smoothly — what an independent
    NLP solver (scripts/parity_check.py) needs to navigate the feasible
    set reliably (the aggregated hinge sum has zero gradient outside).

    Returns (f1, stc, dyn):
      f1  (2 N_hor,)        acceleration values, bounded by C
      stc (N_hor * Nstcobs,) polygon inside-products (>0 inside)
      dyn (2 * N_hor * Ndynobs,) ellipse indicators, current + predictive
    """
    N, nu = cfg.N_hor, cfg.nu
    u = u_flat.reshape(N, nu)
    states = rollout_states(p.s0, u, cfg.ts)
    states_xy = states[:, :2]

    n_edges = cfg.nstcobs // 3
    stc = _polygon_residuals(states_xy, p.stc_obs, n_edges)      # (N, Nobs)

    ell_cur = jnp.broadcast_to(p.dyn_obs[:, 0, :],
                               (N,) + p.dyn_obs[:, 0, :].shape)
    ind_cur = _ellipse_indicator(states_xy, ell_cur, 0.0)        # (N, M)
    ell_pred = jnp.swapaxes(p.dyn_obs[:, 1:, :], 0, 1)
    ind_pred = _ellipse_indicator(states_xy, ell_pred, 0.0)      # (N, M)

    v, w = u[:, 0], u[:, 1]
    acc = (v - jnp.concatenate([p.u_prev[:1], v[:-1]])) / cfg.ts
    w_acc = (w - jnp.concatenate([p.u_prev[1:2], w[:-1]])) / cfg.ts
    f1 = jnp.concatenate([acc, w_acc])

    return f1, stc.reshape(-1), jnp.concatenate(
        [ind_cur.reshape(-1), ind_pred.reshape(-1)])


def action_bounds(cfg: MpcConfiguration, robot: CircularRobotSpecification,
                  dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard box bounds on the flat decision vector (mpc_builder.py:151-153)."""
    lo = jnp.tile(jnp.array([robot.lin_vel_min, -robot.ang_vel_max], dtype), cfg.N_hor)
    hi = jnp.tile(jnp.array([robot.lin_vel_max, robot.ang_vel_max], dtype), cfg.N_hor)
    return lo, hi


def acceleration_bounds(cfg: MpcConfiguration, robot: CircularRobotSpecification,
                        dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rectangle C for the ALM acceleration constraints (mpc_builder.py:162-166)."""
    lo = jnp.concatenate([
        jnp.full(cfg.N_hor, robot.lin_acc_min, dtype),
        jnp.full(cfg.N_hor, -robot.ang_acc_max, dtype),
    ])
    hi = jnp.concatenate([
        jnp.full(cfg.N_hor, robot.lin_acc_max, dtype),
        jnp.full(cfg.N_hor, robot.ang_acc_max, dtype),
    ])
    return lo, hi
