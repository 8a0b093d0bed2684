"""NMPC engine: config → jitted (and batch-vmapped) solve functions.

The TPU-native analogue of the reference's offline build phase
(`solver_build.py` + `mpc_builder.MpcModule.build`): instead of emitting a
Rust crate, `build_mpc_solver` closes the cost library over the configuration
and returns functions that jit-compile on first call.  The "parameter vector"
interface is kept byte-compatible with the generated OpEn solver (see
`ops.params`), so the same assembly code drives both.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..configs import (CircularRobotSpecification, MpcConfiguration,
                       SolverConfiguration)
from . import costs
from .newton import make_alm_newton_solver
from .panoc import make_panoc_solver
from .params import unpack


class MpcSolve(NamedTuple):
    u: jnp.ndarray              # (N_hor * nu,) optimal action sequence
    cost: jnp.ndarray           # scalar objective at the solution
    pred_states: jnp.ndarray    # (N_hor, ns) predicted states under u
    exit_ok: jnp.ndarray        # bool: converged within tolerances
    infeasibility: jnp.ndarray  # scalar constraint violation
    residual: jnp.ndarray       # scalar stationarity residual (control units)


class MpcSolverBundle(NamedTuple):
    solve: Callable             # (z, u0) -> MpcSolve              [jitted]
    solve_batch: Callable       # (Z[B,n], U0[B,m]) -> MpcSolve    [jitted vmap]
                                # NOTE: runs the WARM profile only.  With
                                # the default pre-escalated-penalty config
                                # it converges ~99% of warm-started
                                # receding-horizon problems but only ~42%
                                # of COLD ones (BENCH_r03 exit_ok_cold) —
                                # cold/distressed solves belong on
                                # solve_batch_escalated or a cold-profile
                                # bundle (see trackers/mpc_tracker.py).
    objective: Callable         # (u, z) -> CostBreakdown (diagnostics)
    n_params: int
    n_decision: int
    solve_batch_escalated: Callable | None = None
                                # production batch solve: warm profile for
                                # every lane + in-graph deep re-solve of the
                                # non-converged tail (requires cold_profile)


def build_mpc_solver(
    cfg: MpcConfiguration,
    robot: CircularRobotSpecification,
    solver_cfg: SolverConfiguration | None = None,
    dtype=jnp.float32,
    method: str = "newton",
) -> MpcSolverBundle:
    """Construct the jitted NMPC solve for one (MPC config, robot spec) pair.

    method: "newton" (default — dense-Hessian ALM, see `ops.newton`) or
            "panoc" (first-order, see `ops.panoc`).

    Bundles are memoized on the full configuration: every tracker built for
    the same (cfg, robot, solver) triple shares ONE set of jitted closures.
    Without this, each evaluation episode's fresh tracker re-traced the
    solver at its first step (~10 s re-trace + cache load), which is where
    the round-2 eval table's 9-14 s solve_time_max came from — the
    reference never pays this because its Rust solver is one process-wide
    .so (trajectory_tracker.py:54-66).
    """
    # Dataclass reprs enumerate every field deterministically; configs with
    # list-valued fields (bad_exit_codes) are not hashable directly.
    key = repr((cfg, robot, solver_cfg, dtype, method))
    cached = _BUNDLE_CACHE.get(key)
    if cached is not None:
        return cached
    _check_cold_safety(solver_cfg)
    bundle = _build_mpc_solver_uncached(cfg, robot, solver_cfg, dtype, method)
    _BUNDLE_CACHE[key] = bundle
    return bundle


_BUNDLE_CACHE: dict = {}
_COLD_WARNED = False


def _check_cold_safety(scfg: SolverConfiguration | None) -> None:
    """One-time warning for the one genuinely unsafe configuration: a
    penalty-pre-escalated warm profile with NO cold escalation path.  Such a
    bundle's `solve_batch` converges only ~42% of COLD (no-warm-start)
    problems (BENCH_r03.json exit_ok_cold) — production paths cover this
    via `cold_profile` / `solve_batch_escalated`, but a direct consumer
    would silently inherit it.  From-scratch penalty ramps (initial_penalty
    < 100, e.g. `strong_configuration()` or explicit deep profiles) are
    self-sufficient and stay silent."""
    global _COLD_WARNED
    if scfg is None or _COLD_WARNED:
        return
    if scfg.cold_profile is None and scfg.initial_penalty >= 100.0:
        import warnings
        warnings.warn(
            "SolverConfiguration has a pre-escalated warm penalty "
            f"(initial_penalty={scfg.initial_penalty}) but cold_profile="
            "None: bundle.solve_batch will converge only ~42% of cold "
            "(no-warm-start) problems.  Set cold_profile (default) and "
            "route cold/distressed solves through solve_batch_escalated "
            "or a cold bundle, or use strong_configuration().",
            stacklevel=3)
        _COLD_WARNED = True


def _build_mpc_solver_uncached(
    cfg: MpcConfiguration,
    robot: CircularRobotSpecification,
    solver_cfg: SolverConfiguration | None = None,
    dtype=jnp.float32,
    method: str = "newton",
) -> MpcSolverBundle:
    scfg = solver_cfg or SolverConfiguration()
    if scfg.dtype is not None:
        dtype = scfg.dtype

    u_lo, u_hi = costs.action_bounds(cfg, robot, dtype)
    c_lo, c_hi = costs.acceleration_bounds(cfg, robot, dtype)
    make_solver = (make_alm_newton_solver if method == "newton"
                   else make_panoc_solver)

    def objective_with_params(u_flat, z):
        p = unpack(z.astype(dtype), cfg)
        return costs.evaluate(u_flat, p, cfg, robot)

    def _solve_one(z: jnp.ndarray, u0: jnp.ndarray) -> MpcSolve:
        z = z.astype(dtype)
        p = unpack(z, cfg)

        def obj(u_flat):
            br = costs.evaluate(u_flat, p, cfg, robot)
            return br.objective, br.f1, br.f2

        kw = ({"split": costs.split_objective(p, cfg, robot)}
              if method == "newton" else {})
        res = make_solver(obj, u_lo, u_hi, c_lo, c_hi, scfg,
                          **kw)(u0.astype(dtype))
        br = objective_with_params(res.u, z)
        return MpcSolve(
            u=res.u, cost=res.cost, pred_states=br.states,
            exit_ok=res.converged, infeasibility=res.infeasibility,
            residual=res.residual,
        )

    solve = jax.jit(_solve_one)
    solve_batch = jax.jit(jax.vmap(_solve_one))

    # Escalated batch solve — the PRODUCTION semantics at scale: every lane
    # gets the warm profile; lanes that fail the convergence test are
    # gathered (static tail slots, zero-padded), re-solved from their
    # original guesses with an escalation LADDER of budgets
    # (scfg.escalation_ladder; default one 51-refresh 2-substep stage with
    # the full 10-outer penalty ramp — the measured r4 frontier knee, see
    # configs.py) and merged back where the re-solve converged.
    # Mirrors the tracker's distress escalation (trackers/mpc_tracker.py)
    # in one jitted program.  Measured basis: 75% of the chord profile's
    # non-converged bench lanes converge under a stronger budget
    # (docs/triage_tail_r3_b1024.json); a from-scratch penalty ramp is
    # what recovers them — continuation at the pre-escalated warm penalty
    # recovers almost nothing (r4 ladder sweep).
    solve_batch_escalated = None
    if scfg.cold_profile:
        import dataclasses

        def _make_stage(prof):
            ci, co, cl, cs = tuple(prof)[:4]
            pen = prof[4] if len(tuple(prof)) > 4 else 10.0
            stage_cfg = dataclasses.replace(
                scfg, max_inner_iters=ci, max_outer_iters=co,
                inner_iters_later=cl, newton_substeps=cs,
                initial_penalty=pen, cold_profile=None)

            def _solve_stage(z: jnp.ndarray, u0: jnp.ndarray) -> MpcSolve:
                z = z.astype(dtype)
                p = unpack(z, cfg)

                def obj(u_flat):
                    br = costs.evaluate(u_flat, p, cfg, robot)
                    return br.objective, br.f1, br.f2

                kw = ({"split": costs.split_objective(p, cfg, robot)}
                      if method == "newton" else {})
                res = make_solver(obj, u_lo, u_hi, c_lo, c_hi,
                                  stage_cfg, **kw)(u0.astype(dtype))
                br = objective_with_params(res.u, z)
                return MpcSolve(
                    u=res.u, cost=res.cost, pred_states=br.states,
                    exit_ok=res.converged, infeasibility=res.infeasibility,
                    residual=res.residual,
                )

            return _solve_stage

        ladder = (list(tuple(p) for p in scfg.escalation_ladder)
                  if scfg.escalation_ladder
                  else [tuple(scfg.cold_profile), (30, 10, 10, 1, 10.0)])
        # Optional 6th profile element: from_iterate.  Truthy → the stage
        # CONTINUES from the failing lane's returned iterate instead of
        # re-solving from the original guess.  75% of warm-profile failures
        # are pure iteration truncation (docs/triage_tail_r3_b1024.json),
        # for which resuming costs a fraction of a from-scratch deep solve
        # (the ALM multiplier/penalty state restarts at the stage's
        # initial_penalty — keep it pre-escalated for continuation stages).
        stages = [_make_stage(p[:5]) for p in ladder]
        from_iterate = [bool(p[5]) if len(p) > 5 else False for p in ladder]
        divisors = tuple(scfg.escalation_slots)
        if len(divisors) < len(stages):     # pad: later stages reuse last
            divisors = divisors + (divisors[-1],) * (len(stages)
                                                     - len(divisors))

        res_tol = getattr(scfg, "escalation_residual_tol", None)

        def _needs_escalation(sol: MpcSolve):
            """Non-converged lanes PLUS the settled-but-rough residual band
            (residual > escalation_residual_tol): the r5 band study
            (docs/residual_band_r5.json) measured first-action deviations
            up to 0.21 control units vs a deep re-solve on band lanes, so
            they are re-solved too; the stage is latency-bound and the
            extra slots are nearly free."""
            fail = jnp.logical_not(sol.exit_ok)
            if res_tol is not None:
                fail = fail | (sol.residual > res_tol)
            return fail

        def _run_stage(stage, K, Z, U0, sol, cont: bool) -> MpcSolve:
            B = Z.shape[0]
            fail = _needs_escalation(sol)
            # Static-size gather of failing lanes (extras beyond K stay
            # unescalated; fill slots re-solve lane 0 harmlessly).
            idx = jnp.nonzero(fail, size=K, fill_value=0)[0]
            u_start = sol.u[idx] if cont else U0[idx]
            deep = jax.vmap(stage)(Z[idx], u_start)
            # Gather-only merge (scatter with fill-duplicated indices
            # has undefined write order): lane b's escalation slot is
            # its rank among failing lanes; take the deep result where
            # the lane is in-slot and the re-solve converged — and, for
            # band lanes that were already "ok", only when the re-solve's
            # residual is no worse.
            rank = jnp.cumsum(fail) - 1                # (B,)
            slot = jnp.clip(rank, 0, K - 1)
            in_slot = fail & (rank < K)
            # Band lanes (already "ok"): take the re-solve on a CLEAR cost
            # improvement (the lane was stuck in a worse basin — the r5
            # band study's bimodal tail, cost gaps up to 1.7×), or on a
            # residual improvement that doesn't regress cost (same basin,
            # polished).  Cost is the decision metric, mirroring the
            # tracker's feasibility-gated ranking.
            cost_eps = 1e-6 * (1.0 + jnp.abs(sol.cost))
            cost_gain = deep.cost[slot] <= sol.cost - 1e3 * cost_eps
            band_better = cost_gain | (
                (deep.residual[slot] <= sol.residual)
                & (deep.cost[slot] <= sol.cost + cost_eps))
            take = in_slot & deep.exit_ok[slot] & (
                jnp.logical_not(sol.exit_ok) | band_better)

            def merge(old, new):
                mask = take.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new[slot], old)

            return MpcSolve(
                u=merge(sol.u, deep.u),
                cost=merge(sol.cost, deep.cost),
                pred_states=merge(sol.pred_states, deep.pred_states),
                exit_ok=merge(sol.exit_ok, deep.exit_ok),
                infeasibility=merge(sol.infeasibility,
                                    deep.infeasibility),
                residual=merge(sol.residual, deep.residual),
            )

        def _solve_batch_escalated(Z: jnp.ndarray, U0: jnp.ndarray
                                   ) -> MpcSolve:
            B = Z.shape[0]
            sol = jax.vmap(_solve_one)(Z, U0)
            for stage, div, cont in zip(stages, divisors, from_iterate):
                # Slot floor: at small batches the divisor rule would leave
                # most failing lanes unescalated (B=8 → 0-1 slots); 8 slots
                # cost nothing at that scale.
                K = max(B // div, min(B, 16), 1)
                # Gate the whole stage on any-fail: lax.cond under jit (no
                # surrounding vmap) executes ONE branch, so a batch whose
                # lanes all converged pays nothing for the ladder — the
                # common case for warm in-scan solves at sim batch sizes.
                sol = jax.lax.cond(
                    jnp.any(_needs_escalation(sol)),
                    lambda s, stage=stage, K=K, cont=cont: _run_stage(
                        stage, K, Z, U0, s, cont),
                    lambda s: s,
                    sol)
            return sol

        solve_batch_escalated = jax.jit(_solve_batch_escalated)

    return MpcSolverBundle(
        solve=solve,
        solve_batch=solve_batch,
        objective=jax.jit(objective_with_params),
        n_params=cfg.n_params,
        n_decision=cfg.nu * cfg.N_hor,
        solve_batch_escalated=solve_batch_escalated,
    )
