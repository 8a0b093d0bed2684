"""Second-order ALM solver: two-metric projected Levenberg–Marquardt Newton.

Why this exists: the OpEn-style penalty formulation squares the *summed*
horizon violations, giving the merit function directional curvatures of 1e8+
once the penalty weight escalates.  A first-order method (PANOC included)
needs step sizes ~1e-10 and crawls; the reference's Rust solver simply burns
thousands of cheap CPU iterations inside its 100-500 ms budget.  On TPU the
right design is the opposite: the decision vector is tiny (nu*N_hor = 40),
so we compute the *exact dense Hessian* of the ALM merit with
forward-over-reverse autodiff and take damped projected Newton steps —
40x40 linear solves are ideal batched MXU work, and the solver converges in
tens of iterations instead of tens of thousands.

Structure (mirrors `panoc.make_panoc_solver`'s contract):
  outer — augmented Lagrangian on F1 ∈ C (rectangle) + quadratic penalty on
          F2 = 0, penalty x5 escalation from 10 (OpEn semantics).
  inner — LM-Newton: at each iteration build H = ∇²ψ, mask the active box
          set (two-metric projection), and try a ladder of damping values in
          parallel, keeping the best merit decrease.

Everything is static-shaped: `lax.scan` iterations, masked convergence,
vmap-able over batched problem parameters.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import SolverConfiguration

# Damping multipliers tried in parallel each iteration (relative to carried λ).
_LM_LADDER = (0.2, 1.0, 5.0, 50.0)


def _vzero(v):
    """Varying scalar zero derived from `v` (shard_map compatibility).

    Under `jax.shard_map` every value carries a manual-axes variance type;
    a `lax.scan` carry initialized from closure constants is UNVARYING
    while the body's outputs (functions of the sharded inputs) are
    VARYING, which is a type error.  Adding this zero (free after
    constant folding of everything but the variance) makes an init
    inherit the input's variance; outside shard_map it is a no-op.
    """
    return v.reshape(-1)[0] * 0


def _vfalse(v):
    """Varying boolean False derived from `v` (see `_vzero`)."""
    return _vzero(v) != 0


def schulz_spd_solve(A: jnp.ndarray, g: jnp.ndarray,
                     iters: int = 14) -> jnp.ndarray:
    """SPD solve A⁻¹g via Newton–Schulz inverse iteration — matmuls only.

    XLA lowers `jax.scipy.linalg.solve(assume_a="pos")` to a "Cholesky"
    TPU custom call that serializes per matrix: a device trace
    (scripts/trace_solver.py) measured it at 88% of the whole ALM-Newton
    solve (242 of 290 ms per B=1024 chord solve batch, ~5 GFLOP/s).
    Newton–Schulz replaces it with 2 batched 40×40 matmuls per iteration —
    native MXU work that vmaps over both the problem batch and the LM
    damping ladder.

    X₀ = I/λ̄ with λ̄ the Gershgorin row-sum bound guarantees
    ‖I − X₀A‖ < 1 for SPD A; each iteration squares the error.  The
    returned step is inexact at float32 level for ill-conditioned rungs,
    which the LM ladder's merit comparison absorbs (a slightly-off
    candidate direction loses the ladder, nothing breaks).
    """
    n = A.shape[-1]
    eye_n = jnp.eye(n, dtype=A.dtype)
    lam = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)
    X = eye_n / lam[..., None, None]

    def body(X, _):
        AX = A @ X
        X = X @ (2.0 * eye_n - AX)
        # NO symmetrization: the (4096, 40, 40) transposes it would need
        # are sublane shuffles that measured 2.3x slower end-to-end
        # (scripts/schulz_tune.py: 10,683 vs 4,693 solves/s), while f32
        # asymmetry drift stays below the step-quality noise the LM
        # ladder's merit test already absorbs.
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return jnp.einsum("...ij,...j->...i", X, g)


class NewtonResult(NamedTuple):
    u: jnp.ndarray
    cost: jnp.ndarray
    residual: jnp.ndarray
    infeasibility: jnp.ndarray
    penalty: jnp.ndarray
    converged: jnp.ndarray


def make_structured_hessian(split, proj_rect, mode: str = "structured"):
    """Exact merit Hessian assembled from the PROBLEM STRUCTURE instead of
    forward-over-reverse AD through the rollout scan.

    jacfwd(grad(merit)) pushes n=40 tangents through the sequential N=20
    forward scan AND its transposed backward scan — 40 scan steps of
    tangent-widened work that a device trace (scripts/trace_solver.py)
    measured as the dominant per-iteration cost once linear solves moved to
    the Pallas kernel (ROADMAP #6/#28).  The chain structure gives the same
    matrix with no tangents through any scan:

        ψ(u) = φ(X(u), u)  with  X_k = f(X_{k-1}, u_k)
        ∇²ψ  = Gᵀ (∇²φ) G  +  Σ_k S_kᵀ (q_k · ∇²f_k) S_k

    where G = [J; I] (J the trajectory Jacobian dX/du), S_k = [J_{k-1}; E_k]
    the input map of step k, and q_k the second-order adjoint
    q_k = λ_k + A_{k+1}ᵀ q_{k+1}, λ = ∂φ/∂X.  The pieces:

      * ∇²φ: φ is all-parallel horizon tensor ops (`costs.evaluate_states`)
        — its (N·ns+n)-dim Hessian traces with zero sequential steps;
      * A_k, B_k, ∇²f_k: per-step dynamics derivatives of ONE RK4 step,
        vmapped over the horizon (parallel);
      * J, q: two length-N scans carrying (ns, n) / (ns,) — tiny;
      * the final contractions are batched matmuls (MXU work).

    Exactness (not Gauss-Newton): the Σ q·∇²f term carries ALL the rollout
    curvature, so this equals jacfwd(grad(merit)) to float tolerance
    (tests/test_newton.py::test_structured_hessian_matches_jacfwd).
    """
    phi, roll, step, s0 = split[:4]
    blocks = split[4] if len(split) > 4 and mode == "block" else None

    def merit_x(X, u, y, c):
        f, f1, f2 = phi(X, u)
        shifted = f1 + y / c
        alm = shifted - proj_rect(shifted)
        return f + 0.5 * c * (jnp.sum(alm * alm) + jnp.sum(f2 * f2))

    def hess(u, y, c):
        dtype = u.dtype
        X = roll(u)                                    # (N, ns)
        N, ns = X.shape
        n = u.shape[0]
        nu = n // N

        def merit_z(zf):
            return merit_x(zf[:N * ns].reshape(N, ns), zf[N * ns:], y, c)

        z = jnp.concatenate([X.reshape(-1), u])

        prevs = jnp.concatenate([s0[None].astype(dtype), X[:-1]], axis=0)
        zk = jnp.concatenate([prevs, u.reshape(N, nu)], axis=1)  # (N, ns+nu)

        def step_z(zz):
            return step(zz[:ns], zz[ns:])

        AB = jax.vmap(jax.jacfwd(step_z))(zk)          # (N, ns, ns+nu)
        Hf = jax.vmap(jax.jacfwd(jax.jacfwd(step_z)))(zk)
        A, Bm = AB[..., :ns], AB[..., ns:]

        # E_k: (nu, n) one-hot selector of u_k's slice of the flat decision
        # vector — eye(n) reshaped lists exactly those rows in order.
        E = jnp.eye(n, dtype=dtype).reshape(N, nu, n)

        def jbody(Jprev, inp):
            Ak, Bk, Ek = inp
            Jk = Ak @ Jprev + Bk @ Ek
            return Jk, Jk

        _, J = jax.lax.scan(jbody, jnp.zeros((ns, n), dtype) + _vzero(u),
                            (A, Bm, E))
        G = jnp.concatenate([J.reshape(N * ns, n),
                             jnp.eye(n, dtype=dtype)], axis=0)  # (N·ns+n, n)

        if blocks is None:
            # Gᵀ(∇²φ)G without materializing the (N·ns+n)² matrix: n
            # Hessian-vector products of φ along G's columns — the same
            # tangent count as jacfwd-of-grad(merit), but through the
            # ALL-PARALLEL φ instead of the rollout scan + its transpose.
            gz, hvp = jax.linearize(jax.grad(merit_z), z)
            W = jax.vmap(hvp)(G.T)                     # (n, N·ns+n)
            H_cost = W @ G                             # (n, n)
        else:
            # Block mode: ∇²φ assembled from N per-step 7×7 Hessians (the
            # merit is separable over (x_k, u_k, u_{k-1}) except for the
            # penalty channel, whose curvature splits into weight-
            # linearized per-step blocks + a rank-M outer-product part) —
            # tangent width 7 through 1/N of φ each instead of n=40 HVPs
            # through all of it.  See costs.make_block_curvature.
            gz = jax.grad(merit_z)(z)
            C7, gF = blocks(X, u, y, c)
            E_prev = jnp.concatenate(
                [jnp.zeros((1, nu, n), dtype), E[:-1]], axis=0)
            S7 = jnp.concatenate([J, E, E_prev], axis=1)   # (N, ns+2nu, n)
            H_cost = jnp.einsum("kpi,kpq,kqj->ij", S7, C7, S7)
            V = jnp.einsum("kri,kmr->mi", J, gF)           # (M, n)
            H_cost = H_cost + c * (V.T @ V)
        lam = gz[:N * ns].reshape(N, ns)

        def qbody(qnext, inp):
            lamk, Anext = inp
            qk = lamk + Anext.T @ qnext
            return qk, qk

        _, q_rev = jax.lax.scan(qbody, lam[N - 1],
                                (lam[:-1][::-1], A[1:][::-1]))
        q = jnp.concatenate([q_rev[::-1], lam[N - 1:]], axis=0)   # (N, ns)

        M = jnp.einsum("ki,kipq->kpq", q, Hf)          # (N, ns+nu, ns+nu)
        Jprev_full = jnp.concatenate(
            [jnp.zeros((1, ns, n), dtype), J[:-1]], axis=0)
        S = jnp.concatenate([Jprev_full, E], axis=1)   # (N, ns+nu, n)
        H_dyn = jnp.einsum("kpi,kpq,kqj->ij", S, M, S)

        H = H_cost + H_dyn
        return 0.5 * (H + H.T)

    return hess


def make_alm_newton_solver(
    objective: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    u_lo: jnp.ndarray,
    u_hi: jnp.ndarray,
    c_lo: jnp.ndarray,
    c_hi: jnp.ndarray,
    solver_cfg: SolverConfiguration,
    split=None,
):
    """Build the jittable ALM-Newton solve (same contract as PANOC builder).

    split: optional `(phi, rollout, step, s0)` from `costs.split_objective`;
    with `solver_cfg.hessian_mode == "structured"` (the default) it swaps
    the jacfwd-of-grad merit Hessian for the structure-exploiting assembly
    (`make_structured_hessian`) — same matrix, no tangents through scans.
    """
    scfg = solver_cfg
    n = u_lo.shape[0]
    # Pin constant dtypes to the problem dtype so the solver also traces
    # correctly under jax_enable_x64 (default-dtype constants would promote
    # the scan carry and break the fixed-point structure).
    eye = jnp.eye(n, dtype=u_lo.dtype)
    bound_eps = 1e-9

    if scfg.linear_solver == "schulz":
        lin_solve = lambda A, g: schulz_spd_solve(A, g, scfg.schulz_iters)
    elif scfg.linear_solver == "pallas":
        from .pallas_spd import spd_solve
        lin_solve = spd_solve
    else:
        lin_solve = lambda A, g: jax.scipy.linalg.solve(A, g, assume_a="pos")

    def proj_box(u):
        return jnp.clip(u, u_lo, u_hi)

    def proj_rect(x):
        return jnp.clip(x, c_lo, c_hi)

    def merit_fn(u, y, c):
        f, f1, f2 = objective(u)
        shifted = f1 + y / c
        alm = shifted - proj_rect(shifted)
        return f + 0.5 * c * (jnp.sum(alm * alm) + jnp.sum(f2 * f2))

    merit_grad = jax.value_and_grad(merit_fn)
    hmode = getattr(scfg, "hessian_mode", "structured")
    if split is not None and hmode in ("structured", "block"):
        # Structure-exploiting exact Hessian: no tangents through any scan.
        merit_hess = make_structured_hessian(split, proj_rect, hmode)
    else:
        # Forward-over-reverse: n JVP columns through the rollout scan.
        merit_hess = jax.jacfwd(jax.grad(merit_fn))

    lm_ladder = jnp.array(_LM_LADDER)

    n_substeps = max(int(getattr(scfg, "newton_substeps", 1)), 1)

    def scaled_residual(u, y, c):
        """Diagonal-Newton stationarity residual, in CONTROL units.

        The raw projected-gradient residual max|u - Π(u - ∇ψ)| scales with
        the merit curvature — the penalty terms reach directional curvatures
        of 1e6+ once c escalates, so in float32 it bottoms out orders of
        magnitude above any fixed tolerance even at machine-precision
        optima (round-1's exit_ok=0.001 at zero infeasibility was exactly
        this mislabeling).  Scaling each coordinate by the Hessian diagonal
        measures how far (in action units, m/s / rad/s) any coordinate
        could still profitably move: curvature- and penalty-invariant, and
        the quantity a control user actually cares about.
        """
        _, g = merit_grad(u, y, c)
        H = merit_hess(u, y, c)
        scale = jnp.maximum(jnp.abs(jnp.diag(H)), 1.0)
        return jnp.max(jnp.abs(u - proj_box(u - g / scale)))

    def stationarity_probe(u, y, c):
        """(scaled residual, settled) at the returned iterate.

        Gradient-based residuals cannot certify optima of this merit
        everywhere: the cost is nonsmooth (min-over-segments ref-path
        deviation, mpc_cost.py:84-95) and a solution ON a kink keeps a
        finite projected-gradient residual no matter the budget — the
        round-2 triage (scripts/triage_tail.py) measured ~4% of warm
        solves sitting at points where a 24x larger iteration budget
        reproduces the SAME iterate (residual medians matching to 6
        digits) yet the residual reads 0.1-0.6.  `settled` is the direct
        operational test instead: one more full Newton iteration (exact
        Hessian, 4-rung LM ladder, fresh damping) — if no candidate
        improves the merit while moving any control coordinate by more
        than `tol`, the solve cannot make further progress that matters
        for control, which is what "converged" must mean for an MPC.
        Truncated lanes fail this probe (their next iteration still
        moves), so it cannot relabel under-iterated solves.
        """
        psi_u, g_u = merit_grad(u, y, c)
        H = merit_hess(u, y, c)
        scale = jnp.maximum(jnp.abs(jnp.diag(H)), 1.0)
        r = jnp.max(jnp.abs(u - proj_box(u - g_u / scale)))

        at_lo = (u <= u_lo + bound_eps) & (g_u > 0)
        at_hi = (u >= u_hi - bound_eps) & (g_u < 0)
        free = jnp.logical_not(at_lo | at_hi).astype(u.dtype)
        M = free[:, None] * free[None, :]
        H_free = H * M + (1.0 - jnp.diag(free)) * eye
        g_free = g_u * free
        diag_scale = jnp.maximum(jnp.abs(jnp.diag(H_free)), 1.0)

        def candidate(mult):
            A = H_free + (1e-3 * mult) * jnp.diag(diag_scale)
            d = -lin_solve(A, g_free)
            u_c = proj_box(u + d)
            psi_c = merit_fn(u_c, y, c)
            psi_c = jnp.where(jnp.all(jnp.isfinite(u_c))
                              & jnp.isfinite(psi_c), psi_c, jnp.inf)
            return psi_c, jnp.max(jnp.abs(u_c - u))

        psis, dus = jax.vmap(candidate)(lm_ladder.astype(u.dtype))
        improves = psis < psi_u - 1e-6 * (1.0 + jnp.abs(psi_u))
        settled = jnp.logical_not(jnp.any(improves & (dus > scfg.tol)))
        return r, settled

    def inner_solve(u0, y, c, n_iters: int):
        dtype = u0.dtype
        psi0, g0 = merit_grad(u0, y, c)

        def iteration(carry, _):
            u, psi_u, g_u, lam, done = carry

            # One exact Hessian per iteration; `newton_substeps` damped
            # updates share it (chord method) — same semantics as the fused
            # path, so fused=False is not a silently weaker solver.
            H = merit_hess(u, y, c)

            def substep(u, psi_u, g_u, lam):
                # Two-metric projection: freeze coordinates pressed against
                # an active bound with the gradient pointing outward.
                at_lo = (u <= u_lo + bound_eps) & (g_u > 0)
                at_hi = (u >= u_hi - bound_eps) & (g_u < 0)
                free = jnp.logical_not(at_lo | at_hi).astype(dtype)
                M = free[:, None] * free[None, :]
                H_free = H * M + (1.0 - jnp.diag(free)) * eye
                g_free = g_u * free

                # Scale-aware damping: λ multiplies the Hessian diag scale.
                diag_scale = jnp.maximum(jnp.abs(jnp.diag(H_free)), 1.0)

                def candidate(mult):
                    lam_c = lam * mult
                    A = H_free + lam_c * jnp.diag(diag_scale)
                    d = -lin_solve(A, g_free)
                    u_c = proj_box(u + d)
                    psi_c = merit_fn(u_c, y, c)
                    valid = jnp.all(jnp.isfinite(u_c)) & jnp.isfinite(psi_c)
                    return u_c, jnp.where(valid, psi_c, jnp.inf), lam_c

                cu, cpsi, clam = jax.vmap(candidate)(lm_ladder.astype(dtype))
                best = jnp.argmin(cpsi)
                improved = cpsi[best] < psi_u - 1e-12
                move = improved & jnp.logical_not(done)
                u_new = jnp.where(move, cu[best], u)
                lam_new = jnp.where(
                    improved,
                    jnp.maximum(clam[best] * 0.5, 1e-10),
                    jnp.minimum(lam * 100.0, 1e10),
                )
                return u_new, lam_new, improved

            u_new, lam_new, improved = substep(u, psi_u, g_u, lam)
            for _ in range(n_substeps - 1):
                psi_mid, g_mid = merit_grad(u_new, y, c)
                u_new, lam_new, improved = substep(u_new, psi_mid, g_mid,
                                                   lam_new)
            psi_new, g_new = merit_grad(u_new, y, c)

            # Projected-gradient stationarity residual.
            r = u_new - proj_box(u_new - g_new)
            r_norm = jnp.max(jnp.abs(r))
            done_new = done | (r_norm <= scfg.tol) | (
                jnp.logical_not(improved) & (lam >= 1e8))

            return (u_new, psi_new, g_new, lam_new, done_new), r_norm

        init = (u0, psi0, g0, jnp.asarray(1e-3, u0.dtype) + _vzero(u0),
                _vfalse(u0))
        (u, _, g, _, _), r_hist = jax.lax.scan(
            iteration, init, None, length=n_iters)
        return u, scaled_residual(u, y, c)

    n_stage_iters = [scfg.max_inner_iters] + [
        max(scfg.inner_iters_later, 4)
    ] * (scfg.max_outer_iters - 1)

    def alm_update(u, y, c, prev_inf):
        """One multiplier/penalty update from the current iterate (OpEn
        semantics: escalate c by the update factor unless infeasibility
        dropped 10x)."""
        _, f1, f2 = objective(u)
        shifted = f1 + y / c
        y_new = y + c * (f1 - proj_rect(shifted))
        viol1 = jnp.max(jnp.abs(f1 - proj_rect(f1)))
        inf_new = jnp.maximum(viol1, jnp.max(jnp.abs(f2)))
        improved = inf_new <= 0.1 * prev_inf
        c_new = jnp.where(improved, c, c * scfg.penalty_update_factor)
        return y_new, c_new, inf_new

    def solve_fused(u0: jnp.ndarray) -> NewtonResult:
        """Single-scan ALM: all stages fused into one `lax.scan` with the
        multiplier/penalty updates applied at masked stage boundaries.

        Numerically equivalent to the staged path (same iteration budget,
        same update points); the (ψ, g) refresh each stage needs rides the
        gradient evaluation the Newton step already ends with, so the only
        extra per-iteration work is one gradient-free objective eval.  The
        HLO is one scan body instead of `max_outer_iters` unrolled copies.
        """
        dtype = u0.dtype
        total = sum(n_stage_iters)
        boundary = np.zeros(total, bool)
        boundary[np.cumsum(n_stage_iters) - 1] = True

        u = proj_box(u0)
        vz = _vzero(u)
        y0 = jnp.zeros_like(c_lo).astype(dtype) + vz
        c0 = jnp.asarray(scfg.initial_penalty, dtype) + vz
        psi0, g0 = merit_grad(u, y0, c0)

        def body(carry, is_boundary):
            (u, psi_u, g_u, lam, done, y, c, prev_inf, outer_done,
             y_solved, c_solved) = carry
            frozen = done | outer_done

            # One exact Hessian per scan iteration; `newton_substeps` damped
            # updates share it (chord method).  The active-set mask and the
            # gradient ARE refreshed each substep — only curvature is stale.
            H = merit_hess(u, y, c)

            def substep(u, psi_u, g_u, lam):
                at_lo = (u <= u_lo + bound_eps) & (g_u > 0)
                at_hi = (u >= u_hi - bound_eps) & (g_u < 0)
                free = jnp.logical_not(at_lo | at_hi).astype(dtype)
                M = free[:, None] * free[None, :]
                H_free = H * M + (1.0 - jnp.diag(free)) * eye
                g_free = g_u * free
                diag_scale = jnp.maximum(jnp.abs(jnp.diag(H_free)), 1.0)

                def candidate(mult):
                    lam_c = lam * mult
                    A = H_free + lam_c * jnp.diag(diag_scale)
                    d = -lin_solve(A, g_free)
                    u_c = proj_box(u + d)
                    psi_c = merit_fn(u_c, y, c)
                    valid = jnp.all(jnp.isfinite(u_c)) & jnp.isfinite(psi_c)
                    return u_c, jnp.where(valid, psi_c, jnp.inf), lam_c

                cu, cpsi, clam = jax.vmap(candidate)(lm_ladder.astype(dtype))
                best = jnp.argmin(cpsi)
                improved = cpsi[best] < psi_u - 1e-12
                move = improved & jnp.logical_not(frozen)
                u_new = jnp.where(move, cu[best], u)
                lam_new = jnp.where(
                    improved,
                    jnp.maximum(clam[best] * 0.5, 1e-10),
                    jnp.minimum(lam * 100.0, 1e10),
                )
                return u_new, lam_new, improved

            u_new, lam_new, improved = substep(u, psi_u, g_u, lam)
            for _ in range(n_substeps - 1):
                psi_mid, g_mid = merit_grad(u_new, y, c)
                u_new, lam_new, improved = substep(u_new, psi_mid, g_mid,
                                                   lam_new)

            # Masked ALM stage-boundary update.
            y_b, c_b, inf_b = alm_update(u_new, y, c, prev_inf)
            upd = is_boundary & jnp.logical_not(outer_done)
            y_new = jnp.where(upd, y_b, y)
            c_new = jnp.where(upd, c_b, c)
            prev_inf_new = jnp.where(upd, inf_b, prev_inf)
            outer_done_new = outer_done | (upd
                                           & (inf_b <= scfg.constraint_tol))

            # Gradient at the new iterate under the (possibly updated)
            # multipliers — doubles as the next stage's fresh start.
            psi_new, g_new = merit_grad(u_new, y_new, c_new)
            r = u_new - proj_box(u_new - g_new)
            r_norm = jnp.max(jnp.abs(r))
            done_new = done | (r_norm <= scfg.tol) | (
                jnp.logical_not(improved) & (lam >= 1e8))
            # Reset the inner state for the next stage.
            done_new = jnp.where(upd, False, done_new)
            lam_new = jnp.where(upd, jnp.asarray(1e-3, dtype), lam_new)
            # Track the multipliers the accepted iterate was solved UNDER:
            # the stationarity residual must be judged against that
            # subproblem, not the freshly escalated (y, c) of the next stage
            # (which is large by construction right after an update).
            y_solved_new = jnp.where(outer_done, y_solved, y)
            c_solved_new = jnp.where(outer_done, c_solved, c)

            return (u_new, psi_new, g_new, lam_new, done_new, y_new, c_new,
                    prev_inf_new, outer_done_new, y_solved_new,
                    c_solved_new), None

        init = (u, psi0, g0, jnp.asarray(1e-3, dtype) + vz, _vfalse(u),
                y0, c0, jnp.array(0.0, dtype) + vz, _vfalse(u),
                y0, c0)
        carry, _ = jax.lax.scan(body, init, jnp.asarray(boundary))
        u, c = carry[0], carry[6]
        y_solved, c_solved = carry[9], carry[10]

        # Fresh Newton-scaled residual + one-iteration settledness probe at
        # the returned iterate, under the subproblem that produced it (one
        # extra gradient + Hessian + 4 ladder trials, amortized over the
        # whole solve).
        r_final, settled = stationarity_probe(u, y_solved, c_solved)

        f, f1, f2 = objective(u)
        viol1 = jnp.max(jnp.abs(f1 - proj_rect(f1)))
        infeas = jnp.maximum(viol1, jnp.max(jnp.abs(f2)))
        return NewtonResult(
            u=u, cost=f, residual=r_final, infeasibility=infeas, penalty=c,
            converged=(infeas <= scfg.constraint_tol)
            & ((r_final <= scfg.tol) | settled),
        )

    def solve(u0: jnp.ndarray) -> NewtonResult:
        dtype = u0.dtype
        u = proj_box(u0)
        y = jnp.zeros_like(c_lo).astype(dtype)
        c = jnp.asarray(scfg.initial_penalty, dtype)
        prev_inf = jnp.array(0.0, dtype)
        outer_done = jnp.array(False)
        r_final = jnp.array(jnp.inf, dtype)

        y_solved, c_solved = y, c
        for n_iters in n_stage_iters:
            u_new, r_norm = inner_solve(u, y, c, n_iters)
            y_new, c_new, inf_new = alm_update(u_new, y, c, prev_inf)
            keep = outer_done
            y_solved = jnp.where(keep, y_solved, y)
            c_solved = jnp.where(keep, c_solved, c)
            u = jnp.where(keep, u, u_new)
            y = jnp.where(keep, y, y_new)
            c = jnp.where(keep, c, c_new)
            prev_inf = jnp.where(keep, prev_inf, inf_new)
            r_final = jnp.where(keep, r_final, r_norm)
            outer_done = outer_done | (inf_new <= scfg.constraint_tol)

        r_final, settled = stationarity_probe(u, y_solved, c_solved)
        f, f1, f2 = objective(u)
        viol1 = jnp.max(jnp.abs(f1 - proj_rect(f1)))
        infeas = jnp.maximum(viol1, jnp.max(jnp.abs(f2)))
        return NewtonResult(
            u=u, cost=f, residual=r_final, infeasibility=infeas, penalty=c,
            converged=(infeas <= scfg.constraint_tol)
            & ((r_final <= scfg.tol) | settled),
        )

    return solve_fused if scfg.fused else solve
