"""In-graph PANOC/ALM NMPC solver (the TPU-native replacement for OpEn).

The reference offloads its NMPC to a Rust PANOC/ALM solver generated offline
by opengen (`solver_build/mpc_builder.py:171-203`, loaded at
`trajectory_tracker.py:54-66`).  Here the *entire* solve is a jitted JAX
program:

  outer loop  — augmented-Lagrangian on the acceleration rectangle F1 ∈ C
                plus quadratic penalty on the obstacle violations F2 = 0,
                penalty c multiplied by 5 per stage from an initial 10
                (matching `with_initial_penalty(10)` and OpEn's default
                `penalty_weight_update_factor = 5.0`);
  inner loop  — PANOC: projected-gradient fixed-point iterations accelerated
                by L-BFGS directions, globalized with a forward-backward-
                envelope (FBE) line search.

Design for TPU/XLA:
  * All loops have static trip counts (`lax.scan`); converged lanes are
    frozen by masking, keeping vmapped batches rectangular.
  * The FBE line search evaluates its τ-candidates in parallel with `vmap`
    and selects the first acceptable one — no data-dependent backtracking.
  * The step size γ adapts multiplicatively: an iteration whose local
    quadratic bound fails shrinks γ and stays put, so every accepted move is
    a guaranteed FBE descent step.
  * The whole solver vmaps over batched parameter vectors: thousands of
    scenarios solve as one device program, and shard over chip meshes.

Exit statuses mirror the OpEn vocabulary ("Converged",
"NotConvergedIterations") so the tracker's bad-exit handling carries over
(`config/mpc_default.yaml` bad_exit_codes).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import SolverConfiguration

# τ ladder for the parallel FBE line search.  τ=1 is the full L-BFGS step,
# τ=0 the pure proximal-gradient step (accepted whenever γ is valid).
_TAU_LADDER = (1.0, 0.5, 0.0)


class PanocResult(NamedTuple):
    u: jnp.ndarray             # (n,) solution
    cost: jnp.ndarray          # scalar: raw objective f(u) (no penalty terms)
    residual: jnp.ndarray      # scalar: final fixed-point residual (inf-norm)
    infeasibility: jnp.ndarray # scalar: final constraint violation (inf-norm)
    penalty: jnp.ndarray       # scalar: final penalty weight
    converged: jnp.ndarray     # bool


class _LbfgsBuf(NamedTuple):
    s: jnp.ndarray       # (m, n) displacement history
    y: jnp.ndarray       # (m, n) residual-difference history
    rho: jnp.ndarray     # (m,)   1/(s·y); 0 marks an empty/rejected slot
    head: jnp.ndarray    # scalar int: next write position


def _lbfgs_init(m: int, n: int, dtype) -> _LbfgsBuf:
    return _LbfgsBuf(
        s=jnp.zeros((m, n), dtype), y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), head=jnp.array(0, jnp.int32),
    )


def _lbfgs_push(buf: _LbfgsBuf, s: jnp.ndarray, y: jnp.ndarray,
                enabled: jnp.ndarray) -> _LbfgsBuf:
    sy = jnp.dot(s, y)
    ok = enabled & (sy > 1e-12 * (jnp.dot(y, y) + 1e-30))
    rho_new = jnp.where(ok, 1.0 / jnp.where(ok, sy, 1.0), 0.0)
    i = buf.head % buf.s.shape[0]
    return _LbfgsBuf(
        s=jnp.where(ok, buf.s.at[i].set(s), buf.s),
        y=jnp.where(ok, buf.y.at[i].set(y), buf.y),
        rho=jnp.where(ok, buf.rho.at[i].set(rho_new), buf.rho),
        head=buf.head + ok.astype(jnp.int32),
    )


def _lbfgs_direction(buf: _LbfgsBuf, r: jnp.ndarray) -> jnp.ndarray:
    """Two-loop recursion: d ≈ -H r with H the inverse-Jacobian estimate."""
    m = buf.s.shape[0]
    idx_newest_first = (buf.head - 1 - jnp.arange(m)) % m

    def bwd(carry, i):
        q, alphas = carry
        alpha = buf.rho[i] * jnp.dot(buf.s[i], q)
        return (q - alpha * buf.y[i], alphas.at[i].set(alpha)), None

    (q, alphas), _ = jax.lax.scan(bwd, (r, jnp.zeros(m, r.dtype)),
                                  idx_newest_first)

    i0 = (buf.head - 1) % m
    ys = jnp.dot(buf.s[i0], buf.y[i0])
    yy = jnp.dot(buf.y[i0], buf.y[i0])
    gamma0 = jnp.where((buf.rho[i0] > 0) & (yy > 1e-30), ys / (yy + 1e-30), 1.0)
    q = gamma0 * q

    def fwd(q, i):
        beta = buf.rho[i] * jnp.dot(buf.y[i], q)
        return q + (alphas[i] - beta) * buf.s[i], None

    q, _ = jax.lax.scan(fwd, q, idx_newest_first[::-1])
    return -q


def make_panoc_solver(
    objective: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    u_lo: jnp.ndarray,
    u_hi: jnp.ndarray,
    c_lo: jnp.ndarray,
    c_hi: jnp.ndarray,
    solver_cfg: SolverConfiguration,
):
    """Build the jittable solve function for a box-constrained ALM problem.

    Args:
        objective: u -> (f, F1, F2): f scalar smooth cost; F1 (p,) ALM
            constraint values with target rectangle [c_lo, c_hi]; F2 (q,)
            penalty-constraint values with target 0.
        u_lo/u_hi: (n,) hard box on the decision variables.
    Returns:
        solve(u0) -> PanocResult.  Close over problem parameters inside
        `objective`; vmap `solve` over them for batched solves.
    """
    scfg = solver_cfg
    sigma_fbe = 0.1

    def proj_box(u):
        return jnp.clip(u, u_lo, u_hi)

    def proj_rect(x):
        return jnp.clip(x, c_lo, c_hi)

    def merit_and_grad(u, y, c):
        def merit(u_):
            f, f1, f2 = objective(u_)
            shifted = f1 + y / c
            alm = shifted - proj_rect(shifted)
            return f + 0.5 * c * (jnp.sum(alm * alm) + jnp.sum(f2 * f2))
        return jax.value_and_grad(merit)(u)

    def prox_point(u, g, gamma):
        u_half = proj_box(u - gamma * g)
        r = (u - u_half) / gamma
        return u_half, r

    def fbe_value(psi_u, g_u, u, u_half, gamma):
        diff = u_half - u
        return psi_u + jnp.dot(g_u, diff) + jnp.sum(diff * diff) / (2 * gamma)

    taus = jnp.array(_TAU_LADDER)

    def inner_solve(u0, y, c, n_iters: int):
        """Fixed-iteration PANOC minimizing the ALM merit over the box."""
        dtype = u0.dtype
        psi0, g0 = merit_and_grad(u0, y, c)

        # Step-size init from a finite-difference curvature estimate.
        delta = 1e-4 * (jnp.abs(u0) + 1.0)
        _, g_d = merit_and_grad(u0 + delta, y, c)
        lip = jnp.linalg.norm(g_d - g0) / (jnp.linalg.norm(delta) + 1e-30)
        gamma_init = jnp.clip(0.95 / jnp.maximum(lip, 1e-12), 1e-8, 1e4)

        buf0 = _lbfgs_init(scfg.lbfgs_memory, u0.shape[0], dtype)

        def iteration(carry, _):
            u, psi_u, g_u, gamma, buf, done = carry

            u_half, r = prox_point(u, g_u, gamma)
            r_norm = jnp.max(jnp.abs(r))
            phi_u = fbe_value(psi_u, g_u, u, u_half, gamma)
            d = _lbfgs_direction(buf, r)

            def candidate(tau):
                u_c = proj_box(u + (1.0 - tau) * (u_half - u) + tau * d)
                psi_c, g_c = merit_and_grad(u_c, y, c)
                u_half_c, r_c = prox_point(u_c, g_c, gamma)
                phi_c = fbe_value(psi_c, g_c, u_c, u_half_c, gamma)
                return u_c, psi_c, g_c, r_c, phi_c

            cu, cpsi, cg, cr, cphi = jax.vmap(candidate)(taus.astype(dtype))

            # γ validity: quadratic upper bound at the prox point (τ=0 slot).
            diff0 = u_half - u
            ub = (psi_u + jnp.dot(g_u, diff0)
                  + jnp.sum(diff0 * diff0) / (2 * gamma))
            gamma_ok = cpsi[-1] <= ub + 1e-6 * jnp.abs(ub) + 1e-9

            accept = cphi <= phi_u - sigma_fbe * gamma * jnp.sum(r * r)
            accept = accept.at[-1].set(True)      # prox step: fallback
            pick = jnp.argmax(accept)             # first (largest τ) accepted

            move = gamma_ok & jnp.logical_not(done)
            u_new = jnp.where(move, cu[pick], u)
            psi_new = jnp.where(move, cpsi[pick], psi_u)
            g_new = jnp.where(move, cg[pick], g_u)
            gamma_new = jnp.where(gamma_ok, gamma, gamma * 0.5)

            buf = _lbfgs_push(buf, u_new - u, cr[pick] - r, move)
            done_new = done | (r_norm <= scfg.tol)

            return (u_new, psi_new, g_new, gamma_new, buf, done_new), r_norm

        init = (u0, psi0, g0, gamma_init, buf0, jnp.array(False))
        (u, _, _, _, _, done), r_hist = jax.lax.scan(
            iteration, init, None, length=n_iters)
        return u, r_hist[-1], done

    n_stage_iters = [scfg.max_inner_iters] + [
        max(scfg.inner_iters_later, 8)
    ] * (scfg.max_outer_iters - 1)

    def solve(u0: jnp.ndarray) -> PanocResult:
        dtype = u0.dtype
        u = proj_box(u0)
        y = jnp.zeros_like(c_lo).astype(dtype)
        c = jnp.asarray(scfg.initial_penalty, dtype)
        # prev_inf starts at 0 so the first stage never counts as "improved":
        # the penalty escalates every stage until infeasibility actually
        # drops 10x stage-over-stage (OpEn's sufficient-decrease rule).
        prev_inf = jnp.array(0.0, dtype)
        outer_done = jnp.array(False)
        r_final = jnp.array(jnp.inf, dtype)

        # ALM stages: statically unrolled (few stages, different inner
        # lengths), each warm-started from the previous stage's solution.
        for stage, n_iters in enumerate(n_stage_iters):
            u_new, r_norm, _ = inner_solve(u, y, c, n_iters)

            _, f1, f2 = objective(u_new)
            shifted = f1 + y / c
            y_new = y + c * (f1 - proj_rect(shifted))
            viol1 = jnp.max(jnp.abs(f1 - proj_rect(f1)))
            viol2 = jnp.max(jnp.abs(f2))
            inf_new = jnp.maximum(viol1, viol2)

            improved = inf_new <= 0.1 * prev_inf
            c_new = jnp.where(improved, c, c * scfg.penalty_update_factor)

            keep = outer_done
            u = jnp.where(keep, u, u_new)
            y = jnp.where(keep, y, y_new)
            c = jnp.where(keep, c, c_new)
            prev_inf = jnp.where(keep, prev_inf, inf_new)
            r_final = jnp.where(keep, r_final, r_norm)
            outer_done = outer_done | (inf_new <= scfg.constraint_tol)

        f, f1, f2 = objective(u)
        viol1 = jnp.max(jnp.abs(f1 - proj_rect(f1)))
        infeas = jnp.maximum(viol1, jnp.max(jnp.abs(f2)))
        return PanocResult(
            u=u, cost=f, residual=r_final, infeasibility=infeas, penalty=c,
            converged=(infeas <= scfg.constraint_tol)
            & (r_final <= 10 * scfg.tol),
        )

    return solve
