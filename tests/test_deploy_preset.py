"""Deployment node + preset map tests."""
import numpy as np

from dyobav_tpu.maps.geometric import GeometricMap
from dyobav_tpu.maps.preset import PRESETS, get_preset
from dyobav_tpu.predictors.cvmp import CvmpInterface
from dyobav_tpu.sim.deploy import LocalTransport, NavigationNode


def test_preset_maps_build_geometric():
    for name in PRESETS:
        boundary, obstacles = get_preset(name)
        geo = GeometricMap(boundary, obstacles or [[(1, 1), (1.2, 1),
                                                    (1.2, 1.2), (1, 1.2)]],
                           inflate_margin=0.2)
        assert len(geo.processed_obstacle_list) >= 1


class _StubTracker:
    """Records run_step calls; returns a constant forward action."""

    def __init__(self):
        self.calls = []

    def set_current_state(self, state):
        self.state = state

    def run_step(self, mode, dyn, map_updated=True):
        self.calls.append((mode, dyn))
        actions = [np.array([0.7, 0.1])]
        pred = [np.array([1.0, 2.0, 0.0])] * 20
        return actions, pred, 3.5, [], np.zeros((20, 3))


def test_navigation_node_loop():
    transport = LocalTransport()
    node = NavigationNode(transport, _StubTracker(),
                          predictor=CvmpInterface(), n_hor=20)
    # No pose yet -> no-op.
    assert node.control_tick() is None

    transport.publish("robot_pose", {"x": 1.0, "y": 2.0, "theta": 0.0})
    for t in range(3):
        transport.publish("actor_poses",
                          {"poses": {"a1": (5.0 + 0.3 * t, 2.0)}})
    action = node.control_tick(mode="super")
    assert action is not None
    assert transport.published["cmd_vel"][-1] == {"v": 0.7, "w": 0.1}
    mode, dyn = node.tracker.calls[-1]
    assert mode == "super"
    # Dynamic obstacles assembled: 1 actor, N_hor+1 steps, 6 params each.
    assert len(dyn) == 1 and len(dyn[0]) == 21 and len(dyn[0][0]) == 6
    # Prediction extrapolates the actor's +x motion.
    assert dyn[0][5][0] > dyn[0][1][0]
    # Backward-velocity safety override.
    node.tracker.run_step = lambda *a, **k: ([np.array([-0.5, 0.0])],
                                             [np.zeros(3)] * 20, 0.0, [],
                                             np.zeros((20, 3)))
    action = node.control_tick()
    assert action[0] == 0.0 and action[1] == 0.0


def test_ros_adapter_pure_conversions():
    """ROS adapter's message math is testable without rospy."""
    import math
    from types import SimpleNamespace

    from dyobav_tpu.sim.ros_adapter import odometry_to_pose, quaternion_yaw

    # yaw=pi/2 quaternion
    yaw = quaternion_yaw(0.0, 0.0, math.sin(math.pi / 4), math.cos(math.pi / 4))
    assert abs(yaw - math.pi / 2) < 1e-9

    msg = SimpleNamespace(pose=SimpleNamespace(pose=SimpleNamespace(
        position=SimpleNamespace(x=1.5, y=-2.0),
        orientation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0))))
    pose = odometry_to_pose(msg)
    assert pose == {"x": 1.5, "y": -2.0, "theta": 0.0}


def test_scene_maps_geometry():
    """Scene presets reproduce the reference's scene_maps.py:1-46 geometry
    and run through GeometricMap (the FTD boundary is non-convex)."""
    import numpy as np
    from dyobav_tpu.maps.preset import (crossing_map, crosswalk_map, ftd_map,
                                        get_preset)
    from dyobav_tpu.maps.geometric import GeometricMap
    from dyobav_tpu.utils.geometry import signed_polygon_distance

    boundary, obstacles = ftd_map()
    assert len(boundary) == 16 and len(obstacles) == 1
    gm = GeometricMap(boundary, obstacles, inflate_margin=0.3)
    deflated = np.array(gm.processed_boundary_coords)
    # True Euclidean deflation of the E-shaped boundary.
    d = signed_polygon_distance(deflated, np.array(boundary))
    assert np.all(d < -0.25) and np.abs(d + 0.3).max() < 0.05

    b, obs, crossing_area = crosswalk_map()
    assert len(obs) == 5 and len(crossing_area) == 4
    b2, obs2, walks, areas = crossing_map()
    assert len(obs2) == 4 and len(walks) == 4 and len(areas) == 4
    # Registry exposure.
    for name in ("ftd", "crosswalk", "crossing_scene"):
        bb, oo = get_preset(name)
        assert len(bb) >= 4


def test_navigation_node_fused_step():
    """Fused mode: the node drives the one-device-program control step
    (build_step_program) — the certified-latency deployment path."""
    import jax.numpy as jnp

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.sim.batch import Scenario, build_step_program
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import build_scenario

    base = MainBase(max_run_time_step=3, evaluation=True, seed=0)
    sc = build_scenario(base, scenario_index=0)
    scenario = Scenario(*[jnp.asarray(x) for x in sc])
    fused = build_step_program(
        base.config_mpc, base.config_robot,
        SolverConfiguration(max_inner_iters=3, max_outer_iters=2,
                            inner_iters_later=2,
                            cold_profile=(4, 3, 2, 1, 10.0),
                            escalation_ladder=((4, 3, 2, 1, 10.0),)))

    transport = LocalTransport()
    node = NavigationNode(transport, fused_step=fused, scenario=scenario,
                          n_humans=int(sc.human_starts.shape[0]))
    assert node.control_tick() is None          # no pose yet

    r = np.asarray(sc.robot_start, float)
    h = np.asarray(sc.human_starts, float)
    transport.publish("robot_pose", {"x": r[0], "y": r[1], "theta": r[2]})
    transport.publish("actor_poses", {
        "poses": {f"a{i}": (p[0], p[1]) for i, p in enumerate(h)}})
    actions = [node.control_tick() for _ in range(3)]
    for a in actions:
        assert a is not None and np.all(np.isfinite(a))
        assert a[0] >= 0.0                       # no-reverse override
    assert len(transport.published["cmd_vel"]) == 3
    assert "converged" in transport.published["viz"][-1]
