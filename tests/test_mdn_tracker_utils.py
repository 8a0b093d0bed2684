"""MDN head shapes + tracker reference-trajectory helpers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dyobav_tpu.models.mdn import (ClassicMixtureDensityModule,
                                   SamplingMixtureDensityModule,
                                   take_good_components, take_main_components)
from dyobav_tpu.trackers.mpc_tracker import TrajectoryTracker


def test_classic_mdn_shapes():
    mod = ClassicMixtureDensityModule(dim_output=2, num_components=5)
    x = jnp.ones((3, 16))
    variables = mod.init(jax.random.PRNGKey(0), x)
    alpha, mu, sigma = mod.apply(variables, x)
    assert alpha.shape == (3, 5)
    assert mu.shape == (3, 5, 2)
    assert sigma.shape == (3, 5, 2)
    np.testing.assert_allclose(np.asarray(alpha.sum(axis=1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(sigma) > 0)


def test_sampling_mdn_soft_gmm():
    mod = SamplingMixtureDensityModule(dim_input=2, num_hypos=6, num_gaus=3)
    hypos = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12)),
                        jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), hypos)
    alpha, mu, sigma = mod.apply(variables, hypos)
    assert alpha.shape == (2, 3) and mu.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(alpha.sum(axis=1)), 1.0, rtol=1e-5)
    # Component means are convex combinations of the hypotheses.
    pts = np.asarray(hypos).reshape(2, 6, 2)
    assert np.all(np.asarray(mu) <= pts.max(axis=1, keepdims=True) + 1e-5)
    assert np.all(np.asarray(mu) >= pts.min(axis=1, keepdims=True) - 1e-5)


def test_component_selection():
    alp = jnp.array([[0.5, 0.3, 0.15, 0.05]])
    mu = jnp.arange(8.0).reshape(1, 4, 2)
    sigma = jnp.ones((1, 4, 2))
    a, m, s = take_main_components(alp, mu, sigma, main=2)
    assert a.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(a[0]), [0.5, 0.3])

    ga, gm, gs = take_good_components(np.array([0.5, 0.3, 0.01]),
                                      np.zeros((3, 2)), np.ones((3, 2)),
                                      thre=0.1)
    assert ga.shape == (2,)


def test_get_ref_traj_constant_speed():
    """Straight path: points spaced exactly speed*ts apart."""
    traj = TrajectoryTracker.get_ref_traj(
        ts=0.2, ref_path=[(10.0, 0.0)], state=np.array([0.0, 0.0, 0.0]),
        speed=1.0)
    arr = np.asarray(traj)
    # 0.2 m per step along +x until the node is reached.
    np.testing.assert_allclose(arr[0][:2], [0.2, 0.0], atol=1e-9)
    steps = np.diff(arr[:, 0])
    np.testing.assert_allclose(steps[:-1], 0.2, atol=1e-9)
    assert arr[-1][0] <= 10.0 + 1e-9
    np.testing.assert_allclose(arr[:, 2], 0.0, atol=1e-9)


def test_get_ref_traj_node_crossing_quirk():
    """At a waypoint crossing the walker gets a fresh full ts (reference
    semantics, trajectory_tracker.py:215-237): the crossing step travels
    farther than speed*ts."""
    traj = TrajectoryTracker.get_ref_traj(
        ts=1.0, ref_path=[(1.5, 0.0), (10.0, 0.0)],
        state=np.array([0.0, 0.0, 0.0]), speed=1.0)
    arr = np.asarray(traj)
    # Step 1: x=1.0.  Step 2 crosses the node at 1.5 and then advances a
    # full extra ts -> x=2.5 (not 2.0).
    np.testing.assert_allclose(arr[0][0], 1.0, atol=1e-9)
    np.testing.assert_allclose(arr[1][0], 2.5, atol=1e-9)


def test_solver_exit_status_vocabulary():
    """run_step maps the in-graph result onto OpEn's exit-status strings and
    records them per step, honoring the config's `bad_exit_codes` vocabulary
    (ref config/mpc_default.yaml; trajectory_tracker.py:334-335)."""
    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration, SolverConfiguration)

    cfg = MpcConfiguration()
    tracker = TrajectoryTracker(
        cfg, CircularRobotSpecification(),
        solver_config=SolverConfiguration(max_inner_iters=3,
                                          max_outer_iters=2,
                                          inner_iters_later=2),
        use_multistart=False, verbose=False)
    tracker.load_init_states(np.array([0.0, 0.0, 0.0]),
                             np.array([5.0, 0.0, 0.0]))
    tracker.set_ref_trajectory([(5.0, 0.0)])
    out = tracker.run_step(None, None, mode="work")
    assert out != -1
    assert len(tracker.solver_status_timelist) == 1
    status = tracker.solver_status_timelist[0]
    assert status in ("Converged", "NotConvergedIterations",
                      "NotConvergedOutOfTime")
    # The reference's bad-code vocabulary is config data, not hardcoded.
    assert set(cfg.bad_exit_codes) == {"NotConvergedIterations",
                                       "NotConvergedOutOfTime"}
    assert (status == "Converged") == (status not in cfg.bad_exit_codes)


def test_get_ref_states_window_and_padding():
    ref_traj = [(i * 0.2, 0.0, 0.0) for i in range(30)]
    state = np.array([1.05, 0.0, 0.0])  # closest to index 5
    ref_states, idx = TrajectoryTracker.get_ref_states(
        idx_ref_traj=4, ref_traj=ref_traj, state=state, action_steps=1,
        horizon=20)
    assert idx == 5
    assert ref_states.shape == (20, 3)
    np.testing.assert_allclose(ref_states[0][0], 1.0, atol=1e-9)
    # Near the end the window pads with the final state.
    ref_states2, idx2 = TrajectoryTracker.get_ref_states(
        idx_ref_traj=28, ref_traj=ref_traj, state=np.array([5.75, 0.0, 0.0]),
        horizon=20)
    assert ref_states2.shape == (20, 3)
    np.testing.assert_allclose(ref_states2[-1][0], ref_traj[-1][0], atol=1e-9)
