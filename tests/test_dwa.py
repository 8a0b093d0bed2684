"""DWA engine unit tests (hand-computed cost semantics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.configs import CircularRobotSpecification, DwaConfiguration
from dyobav_tpu.ops.dwa import (FAR, build_dwa_engine, candidate_grid,
                                grid_spec)

CFG = DwaConfiguration()
ROBOT = CircularRobotSpecification()


def _grid(last_u):
    u_all, valid = candidate_grid(CFG, ROBOT, grid_spec(CFG, ROBOT),
                                  np.asarray(last_u))
    return jnp.asarray(u_all), jnp.asarray(valid)


def _inputs(static_far=True, dyn_far=True):
    state = jnp.array([0.0, 0.0, 0.0])
    u_all, valid = _grid([0.8, 0.0])
    goal = jnp.array([10.0, 0.0])
    ref = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    base_speed = jnp.asarray(1.2)
    stc = jnp.full((64, 4, 2), FAR, jnp.float32)
    dyn = jnp.full((CFG.N_hor + 1, 16, 2), FAR, jnp.float32)
    return state, u_all, valid, goal, ref, base_speed, stc, dyn


def test_grid_spec_static_bounds():
    spec = grid_spec(CFG, ROBOT)
    # Window limited by accel: 2*1*0.2/0.1 = 4 (+2); ang: min(10, 12)+2.
    assert spec.n_v == 6
    assert spec.n_w == 12


def test_free_space_drives_forward():
    engine, _ = build_dwa_engine(CFG, ROBOT)
    res = engine(*_inputs())
    u = np.asarray(res.best_u)
    # Best candidate: highest admissible v toward base speed, w == 0.
    # The window is [0.6, 1.0) and (reference-faithful) arange semantics
    # exclude the upper endpoint, so the fastest candidate is 0.9.
    assert u[0] == pytest.approx(0.9, abs=1e-6)
    assert u[1] == pytest.approx(0.0, abs=1e-6)
    traj = np.asarray(res.best_trajectory)
    assert traj.shape == (21, 3)
    np.testing.assert_allclose(traj[0], [0, 0, 0], atol=1e-7)
    assert traj[-1, 0] == pytest.approx(0.9 * 0.2 * 20, rel=1e-5)


def test_blocking_obstacle_is_inf():
    engine, _ = build_dwa_engine(CFG, ROBOT)
    state, u_all, valid_m, goal, ref, base_speed, stc, dyn = _inputs()
    # Wall dead ahead at x=1: any forward trajectory comes within 0.05 m.
    stc = stc.at[0].set(jnp.array([[1.0, -5.0], [1.2, -5.0],
                                   [1.2, 5.0], [1.0, 5.0]]))
    res = engine(state, u_all, valid_m, goal, ref, base_speed, stc, dyn)
    costs = np.asarray(res.costs)
    valid = np.asarray(res.valid)
    # Fast-forward candidates are all inf; the best action backs off.
    assert np.isinf(costs[valid]).any()
    assert np.asarray(res.best_u)[0] < 1.0


def test_dynamic_obstacle_steps_weighting():
    engine, _ = build_dwa_engine(CFG, ROBOT)
    state, u_all, valid_m, goal, ref, base_speed, stc, dyn = _inputs()
    # Pedestrian predicted right on the path at step 10 (x = 10*0.2*v).
    dyn = dyn.at[10, 0].set(jnp.array([2.0, 0.0]))
    res = engine(state, u_all, valid_m, goal, ref, base_speed, stc, dyn)
    # The best trajectory must keep clearance >= 0.2 from the predicted
    # position at the paired step (the reference's hard threshold).
    traj = np.asarray(res.best_trajectory)
    d = np.hypot(traj[9, 0] - 2.0, traj[9, 1] - 0.0)  # rollout i=9 ↔ step 10
    assert d > 0.2
    assert np.isfinite(float(res.min_cost))


def test_stuck_escape_rule():
    engine, _ = build_dwa_engine(CFG, ROBOT)
    state, _, _, goal, ref, base_speed, stc, dyn = _inputs()
    # Boxed in: obstacles everywhere ahead and behind.
    stc = stc.at[0].set(jnp.array([[0.1, -5.0], [0.3, -5.0],
                                   [0.3, 5.0], [0.1, 5.0]]))
    stc = stc.at[1].set(jnp.array([[-0.3, -5.0], [-0.1, -5.0],
                                   [-0.1, 5.0], [-0.3, 5.0]]))
    u_all, valid_m = _grid([0.0, 0.0])
    res = engine(state, u_all, valid_m, goal, ref, base_speed, stc, dyn)
    u = np.asarray(res.best_u)
    if abs(u[0]) < CFG.stuck_threshold:
        assert u[1] == pytest.approx(-ROBOT.ang_vel_max)
