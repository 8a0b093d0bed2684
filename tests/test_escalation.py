"""Escalation-path tests: the production tail-recovery semantics.

Covers `engine.solve_batch_escalated` (batched deep→strong ladder) and the
tracker's distress escalation — the machinery that closed the round-2
basin hops (scripts/diagnose_hops.py) and lifted warm exit_ok to ≥0.99
(BENCH_r03).  Budgets here are tiny to keep CPU compiles fast; semantics,
not convergence strength, are under test.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from dyobav_tpu.configs import (CircularRobotSpecification, MpcConfiguration,
                                SolverConfiguration)
from dyobav_tpu.ops.engine import build_mpc_solver
from dyobav_tpu.ops.params import empty_params, pack, tuning_vector

CFG = MpcConfiguration()
ROBOT = CircularRobotSpecification()
# Deliberately under-budgeted warm profile + modest escalation so some
# lanes fail raw and recover escalated, with cheap compiles.
SCFG = SolverConfiguration(max_inner_iters=1, max_outer_iters=1,
                           inner_iters_later=1, newton_substeps=1,
                           initial_penalty=1250.0,
                           cold_profile=(8, 4, 4, 1, 10.0))


def _problem_batch(B: int = 32):
    N = CFG.N_hor
    rng = np.random.default_rng(0)
    zs = []
    for _ in range(B):
        p = empty_params(CFG)
        ref = np.zeros((N, 3), np.float32)
        ref[:, 0] = 0.24 * np.arange(1, N + 1)
        ell = np.zeros((CFG.Ndynobs, N + 1, CFG.ndynobs), np.float32)
        ell[0, :, :] = [2.2, rng.uniform(-0.4, 0.4), 0.4, 0.4, 0.0, 1.0]
        p = p._replace(
            u_prev=jnp.array([1.2, 0.0]), s0=jnp.zeros(3),
            sN=jnp.asarray(ref[-1]),
            q=jnp.asarray(tuning_vector(CFG), jnp.float32),
            ref_states=jnp.asarray(ref),
            ref_speed=jnp.full((N,), 1.2, jnp.float32),
            dyn_obs=jnp.asarray(ell),
            q_stc=jnp.full((N,), 10.0, jnp.float32),
            q_dyn=jnp.full((N,), 10.0, jnp.float32))
        zs.append(np.asarray(pack(p)))
    Z = jnp.asarray(np.stack(zs))
    U0 = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], N), jnp.float32), (B, 1))
    return Z, U0


def test_escalated_recovers_tail_and_preserves_converged():
    bundle = build_mpc_solver(CFG, ROBOT, SCFG)
    assert bundle.solve_batch_escalated is not None
    Z, U0 = _problem_batch()
    raw = bundle.solve_batch(Z, U0)
    esc = bundle.solve_batch_escalated(Z, U0)
    raw_ok = float(jnp.mean(raw.exit_ok))
    esc_ok = float(jnp.mean(esc.exit_ok))
    # The under-budgeted warm profile must leave a tail; escalation must
    # strictly recover some of it.
    assert raw_ok < 1.0
    assert esc_ok > raw_ok
    # Converged lanes BELOW the residual band are returned untouched;
    # converged lanes in the band (residual > escalation_residual_tol) may
    # be replaced by a deep re-solve, but only with a residual-no-worse,
    # cost-no-worse solution (r5 band escalation, engine._run_stage).
    res_tol = SCFG.escalation_residual_tol or 0.0
    clean = raw.exit_ok & (raw.residual <= res_tol)
    touched = jnp.where(clean[:, None], jnp.abs(esc.u - raw.u), 0.0)
    assert float(jnp.max(touched)) == 0.0
    band_changed = raw.exit_ok & jnp.any(jnp.abs(esc.u - raw.u) > 0, axis=1)
    polished = ((esc.residual <= raw.residual + 1e-6)
                & (esc.cost <= raw.cost + 1e-5 * (1 + jnp.abs(raw.cost))))
    basin_fix = esc.cost <= raw.cost - 5e-4 * (1 + jnp.abs(raw.cost))
    assert bool(jnp.all(jnp.where(band_changed, polished | basin_fix,
                                  True)))
    # Escalated lanes must not be worse than raw where both are feasible.
    both_feas = (raw.infeasibility <= 1e-3) & (esc.infeasibility <= 1e-3)
    gap = jnp.where(both_feas, esc.cost - raw.cost, 0.0)
    assert float(jnp.max(gap)) <= 1e-3


def test_continuation_stage_recovers_truncation_tail():
    """A from_iterate ladder stage (6th profile element) resumes failing
    lanes from their returned iterate: for truncation failures — 75% of the
    warm profile's tail (docs/triage_tail_r3_b1024.json) — this recovers
    convergence at a fraction of a from-scratch deep solve."""
    scfg = dataclasses.replace(
        SCFG, escalation_ladder=((3, 2, 2, 3, 1250.0, 1),))
    bundle = build_mpc_solver(CFG, ROBOT, scfg)
    Z, U0 = _problem_batch()
    raw = bundle.solve_batch(Z, U0)
    esc = bundle.solve_batch_escalated(Z, U0)
    assert float(jnp.mean(raw.exit_ok)) < 1.0
    assert float(jnp.mean(esc.exit_ok)) > float(jnp.mean(raw.exit_ok))
    # Converged lanes untouched.
    touched = jnp.where(raw.exit_ok[:, None], jnp.abs(esc.u - raw.u), 0.0)
    assert float(jnp.max(touched)) == 0.0


def test_escalated_without_cold_profile_is_absent():
    scfg = dataclasses.replace(SCFG, cold_profile=None)
    bundle = build_mpc_solver(CFG, ROBOT, scfg)
    assert bundle.solve_batch_escalated is None


def test_cold_safety_warning():
    """A pre-escalated warm profile with NO cold path is the one unsafe
    direct-engine configuration (warm-profile cold exit_ok ~0.42,
    BENCH_r03): building such a bundle must warn once; safe configs must
    stay silent (VERDICT r3 weak #6)."""
    import warnings

    import pytest

    from dyobav_tpu.ops import engine

    engine._COLD_WARNED = False
    bad = SolverConfiguration(cold_profile=None, lbfgs_memory=9)  # fresh key
    with pytest.warns(UserWarning, match="cold"):
        build_mpc_solver(CFG, ROBOT, bad)
    # Default config (cold_profile set) and from-scratch penalty ramps
    # (strong/deep semantics) build silently.
    engine._COLD_WARNED = False
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_mpc_solver(CFG, ROBOT,
                         SolverConfiguration(lbfgs_memory=9))
        build_mpc_solver(CFG, ROBOT,
                         SolverConfiguration(cold_profile=None,
                                             initial_penalty=10.0,
                                             lbfgs_memory=9))


def test_tracker_distress_escalation_fires():
    """A landscape-shift step (obstacle newly blocking the warm basin)
    must trigger the deep re-solve and return a feasible control."""
    from dyobav_tpu.trackers.mpc_tracker import TrajectoryTracker

    tracker = TrajectoryTracker(CFG, ROBOT, solver_config=SCFG)
    start = np.array([0.0, 0.0, 0.0])
    goal = np.array([10.0, 0.0, 0.0])
    tracker.load_init_states(start, goal)
    tracker.set_ref_trajectory([(0.0, 0.0), (10.0, 0.0)])

    calls = []
    orig_cold = tracker.cold_bundle.solve_batch

    def spy(Z, U0):
        calls.append(Z.shape[0])
        return orig_cold(Z, U0)

    tracker.cold_bundle = tracker.cold_bundle._replace(solve_batch=spy)

    # Step 1: free space (uses cold bundle anyway — first solve).
    tracker.run_step(None, None, mode="work")
    n_cold_calls = len(calls)
    # Step 2: an obstacle ellipse appears dead ahead — the warm chord
    # budget (1 iteration here) cannot re-converge, so distress must fire.
    N = CFG.N_hor
    dyn = np.zeros((CFG.Ndynobs, N + 1, CFG.ndynobs), np.float32)
    dyn[0, :, :] = [1.2, 0.0, 0.6, 0.6, 0.0, 1.0]
    tracker.run_step(None, dyn.reshape(-1).tolist(), mode="work")
    assert len(calls) > n_cold_calls, "distress escalation did not fire"
