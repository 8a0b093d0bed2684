"""End-to-end simulation tests on the real warehouse scene (headless).

The framework-level analogue of the reference's interface tests
(`src/tests/test_interfaces_1.py` / `_2.py`): real map + agents + predictor
+ tracker, a handful of receding-horizon steps, asserting result arity and
sane behavior.
"""
import os

import numpy as np
import pytest

from dyobav_tpu.configs import SolverConfiguration
from dyobav_tpu.sim.harness import MainBase

DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "warehouse_sim_original")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "mymap.pgm")),
    reason="warehouse data not imported")

# Small iteration budget keeps CI fast; quality asserted loosely.
FAST_SOLVER = SolverConfiguration(max_inner_iters=15, max_outer_iters=4,
                                  inner_iters_later=6)


def test_mpc_cvmp_steps():
    base = MainBase(max_run_time_step=6, evaluation=True, seed=1,
                    solver_config=FAST_SOLVER)
    robot, humans = base._prepare_agents()
    tracker, predictor = base._prepare_interfaces(robot, "cvmp", "mpc")
    start = robot.state.copy()
    for _ in range(5):
        collision, complete, solve_time, clearance = base.run_one_step(
            robot, humans, tracker, predictor)
        assert not collision
    # The robot moved toward its goal (node 32 at world (1.0, 2.3)).
    goal = np.array(robot.path[-1])[:2]
    assert (np.linalg.norm(start[:2] - goal)
            > np.linalg.norm(robot.state[:2] - goal)), "robot did not progress"
    # Humans moved too.
    assert np.linalg.norm(humans[0].state[:2] - humans[0].past_traj[0][:2]) > 0.1


def test_mpc_kfmp_step_arity():
    base = MainBase(max_run_time_step=3, evaluation=False, seed=0,
                    solver_config=FAST_SOLVER)
    robot, humans = base._prepare_agents()
    tracker, predictor = base._prepare_interfaces(robot, "kfmp", "mpc")
    out = base.run_one_step(robot, humans, tracker, predictor)
    (action, pred_states, cost, mu_list_list, std_list_list,
     hypos_clusters_list, the_obs_list, others) = out
    assert len(pred_states) == base.config_mpc.N_hor
    assert len(mu_list_list) == base.config_mpc.N_hor + 1
    assert len(the_obs_list) <= base.config_mpc.Nstcobs
    assert np.isfinite(cost)


def test_dwa_tracker_steps():
    base = MainBase(max_run_time_step=4, evaluation=True, seed=2)
    robot, humans = base._prepare_agents()
    tracker, predictor = base._prepare_interfaces(robot, "cvmp", "dwa")
    for _ in range(3):
        collision, complete, solve_time, clearance = base.run_one_step(
            robot, humans, tracker, predictor)
        assert not collision
    assert len(tracker.traj_tracker.past_actions) == 3
    v, w = tracker.traj_tracker.past_actions[-1]
    assert -0.5 - 1e-6 <= v <= 1.5 + 1e-6
    assert abs(w) <= 0.5 + 1e-6


def test_no_predictor_mpc():
    base = MainBase(max_run_time_step=2, evaluation=True, seed=3,
                    solver_config=FAST_SOLVER)
    robot, humans = base._prepare_agents()
    tracker, _ = base._prepare_interfaces(robot, None, "mpc")
    collision, complete, solve_time, clearance = base.run_one_step(
        robot, humans, tracker, None)
    assert not collision
    assert clearance > 0
