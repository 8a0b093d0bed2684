"""Motion model, parameter layout, and cost-function tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dyobav_tpu.configs import (CircularRobotSpecification, MpcConfiguration,
                                SolverConfiguration)
from dyobav_tpu.motion.models import unicycle_step, omnidirectional_step
from dyobav_tpu.ops import costs
from dyobav_tpu.ops.params import MpcParams, empty_params, pack, unpack, tuning_vector


CFG = MpcConfiguration()
ROBOT = CircularRobotSpecification()


def test_unicycle_rk4_straight_line():
    s = jnp.array([0.0, 0.0, 0.0])
    s1 = unicycle_step(s, jnp.array([1.0, 0.0]), 0.2)
    np.testing.assert_allclose(np.asarray(s1), [0.2, 0.0, 0.0], atol=1e-9)


def test_unicycle_rk4_turn_matches_numpy_reference():
    """Independent numpy RK4 of the same ODE must agree to float tolerance."""
    def d(s, a):
        return np.array([a[0] * np.cos(s[2]), a[0] * np.sin(s[2]), a[1]])

    s = np.array([0.3, -0.2, 0.7])
    a = np.array([1.2, 0.5])
    ts = 0.2
    k1 = ts * d(s, a)
    k2 = ts * d(s + 0.5 * k1, a)
    k3 = ts * d(s + 0.5 * k2, a)
    k4 = ts * d(s + k3, a)
    expected = s + (k1 + 2 * k2 + 2 * k3 + k4) / 6
    out = unicycle_step(jnp.array(s), jnp.array(a), ts)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_omnidirectional_step():
    out = omnidirectional_step(jnp.array([1.0, 2.0, 0.0]),
                               jnp.array([0.5, -0.5, 0.1]), 0.2)
    np.testing.assert_allclose(np.asarray(out), [1.1, 1.9, 0.02], atol=1e-7)


def test_params_roundtrip():
    assert CFG.n_params == 2778  # reference problem size (BASELINE.md)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=CFG.n_params), dtype=jnp.float32)
    p = unpack(z, CFG)
    z2 = pack(p)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=0)
    assert p.ref_states.shape == (20, 3)
    assert p.dyn_obs.shape == (15, 21, 6)
    assert p.others_pred.shape == (10, 20, 3)


def test_refpath_deviation_shrinking_window():
    """State k must only see reference segments j >= k."""
    N = 4
    # Reference path along x-axis; states offset in y by k+1.
    ref_pts = jnp.array([[float(i), 0.0] for i in range(N + 1)])
    states_xy = jnp.array([[10.0, 1.0]] * N)  # x=10 beyond all segment ends
    cost = costs.refpath_deviation_cost(states_xy, ref_pts, jnp.array(1.0))
    # For every k the closest admissible segment endpoint is (N, 0) = (4, 0):
    # dist² = (10-4)² + 1 = 37 each, total 4 * 37.
    assert float(cost) == pytest.approx(4 * 37.0, rel=1e-6)

    # Now place a state near segment 0 only; at k=3 that segment is masked.
    states2 = jnp.array([[0.5, 0.1]] * N)
    c2 = costs.refpath_deviation_cost(states2, ref_pts, jnp.array(1.0))
    # k=0: dist²=0.01; k=1: closest segment start (1,0) → (0.5-1)²+0.01=0.26;
    # k=2: (0.5-2)²+0.01=2.26; k=3: (0.5-3)²+0.01=6.26
    assert float(c2) == pytest.approx(0.01 + 0.26 + 2.26 + 6.26, rel=1e-5)


def test_fleet_collision_hinge():
    states = jnp.array([[0.0, 0.0], [5.0, 5.0]])
    others = jnp.array([[0.3, 0.0]])
    c = costs.fleet_collision_cost(states, others, 0.5, 1000.0, per_step=False)
    assert float(c) == pytest.approx(1000.0 * (0.25 - 0.09), rel=1e-5)


def _scene_params(dtype=jnp.float32) -> MpcParams:
    """A small single-robot scene: straight reference, one obstacle."""
    # Scene sits away from the exact origin: zero-padded (inactive) obstacles
    # live at (0,0) with micron-scale radii — the same convention as the
    # reference zero-fill (trajectory_tracker.py:291-296) — so a state at
    # exactly (0,0) would graze them.
    N = CFG.N_hor
    p = empty_params(CFG, dtype)
    ref = np.zeros((N, 3))
    ref[:, 0] = 1.0 + np.linspace(0.3, 0.3 * N, N)  # straight line along +x
    ref[:, 1] = 0.5
    base_speed = 1.5 * 0.8
    p = p._replace(
        s0=jnp.array([1.0, 0.5, 0.0], dtype),
        sN=jnp.array([ref[-1, 0], 0.5, 0.0], dtype),
        q=jnp.asarray(tuning_vector(CFG), dtype),
        ref_states=jnp.asarray(ref, dtype),
        ref_speed=jnp.full((N,), base_speed, dtype),
        q_stc=jnp.full((N,), 10.0, dtype),
        q_dyn=jnp.full((N,), 10.0, dtype),
    )
    return p


def test_cost_zero_actions_positive():
    p = _scene_params()
    u = jnp.zeros(CFG.nu * CFG.N_hor)
    br = costs.evaluate(u, p, CFG, ROBOT)
    assert br.states.shape == (20, 3)
    assert float(br.objective) > 0  # speed deviation + path deviation
    assert br.f1.shape == (40,)
    assert br.f2.shape == (15,)
    np.testing.assert_allclose(np.asarray(br.f2), 0.0, atol=1e-6)


def test_cost_tracking_actions_near_zero():
    """Driving exactly along the reference at ref speed ⇒ tiny cost."""
    p = _scene_params()
    u = jnp.tile(jnp.array([1.2, 0.0]), CFG.N_hor)  # 0.3 m / 0.25... no: ts=0.2
    # ref spacing 0.3 per step / ts 0.2 = 1.5 m/s; use that and matching speed.
    p = p._replace(ref_speed=jnp.full((CFG.N_hor,), 1.5),
                   u_prev=jnp.array([1.5, 0.0]))  # no accel jump at k=0
    u = jnp.tile(jnp.array([1.5, 0.0]), CFG.N_hor)
    br = costs.evaluate(u, p, CFG, ROBOT)
    assert float(br.objective) == pytest.approx(0.0, abs=1e-3)


def test_gradient_flows():
    p = _scene_params()
    u = jnp.zeros(CFG.nu * CFG.N_hor)
    g = jax.grad(lambda uu: costs.evaluate(uu, p, CFG, ROBOT).objective)(u)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_dynamic_obstacle_raises_cost_and_f2():
    p = _scene_params()
    # Obstacle sitting on the reference path at x=3, all horizon steps.
    ell = np.zeros((CFG.Ndynobs, CFG.N_hor + 1, CFG.ndynobs), np.float32)
    ell[0, :, :] = [4.0, 0.5, 0.5, 0.5, 0.0, 1.0]
    p_obs = p._replace(dyn_obs=jnp.asarray(ell))
    u = jnp.tile(jnp.array([1.5, 0.0]), CFG.N_hor)
    br_free = costs.evaluate(u, p, CFG, ROBOT)
    br_obs = costs.evaluate(u, p_obs, CFG, ROBOT)
    assert float(br_obs.objective) > float(br_free.objective) + 1.0
    assert float(jnp.max(br_obs.f2)) > 0  # rollout passes through the ellipse


def test_reciprocating_model_round_trip():
    """Preset back-and-forth agent (reference motion_model.py:165-186):
    starts at p1, reaches p2 at half period, returns to p1."""
    from dyobav_tpu.motion.models import ReciprocatingModel
    m = ReciprocatingModel(0.2, (0.0, 0.0), (2.0, 0.0), speed=1.0)
    period = int(2 * 2.0 / 1.0 / 0.2) + 1
    s0 = np.asarray(m(0))
    s_half = np.asarray(m(period // 2))
    s_full = np.asarray(m(period))
    np.testing.assert_allclose(s0[:2], [0, 0], atol=1e-6)
    assert s_half[0] > 1.5
    np.testing.assert_allclose(s_full[:2], [0, 0], atol=1e-5)
    # heading flips after the turnaround
    assert abs(np.asarray(m(1))[2]) < 1e-6
    assert abs(abs(np.asarray(m(period - 2))[2]) - np.pi) < 1e-6
