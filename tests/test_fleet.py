"""Decentralized multi-robot fleet sim tests (virtual 8-device CPU mesh).

Covers the other-robot solver parameters (others0/others_pred) the reference
defines but never exercises in-tree (mpc_builder.py:52-53,
cost_fleet_collision mpc_cost.py:65-76).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.configs import (CircularRobotSpecification, MpcConfiguration,
                                SolverConfiguration)
from dyobav_tpu.sim.fleet import FleetScenario, build_fleet_sim
from dyobav_tpu.sim.scenarios import synthetic_fleet_scenario

# Cheap warm profile + a cheap single-stage ladder: the in-scan
# escalation/gather/merge path stays exercised (it is the new sharding-
# sensitive code) without the production deep+strong budgets that would
# dominate CPU test time.
FAST = SolverConfiguration(max_inner_iters=8, max_outer_iters=2,
                           inner_iters_later=4,
                           escalation_ladder=((4, 2, 2, 1, 10.0),),
                           escalation_slots=(4,))


def _head_on_scenario(lateral: float = 0.2):
    """Two robots swapping ends of an 8 m corridor, slightly offset
    laterally so the encounter is not perfectly symmetric."""
    starts = [[0.0, lateral, 0.0], [8.0, -lateral, np.pi]]
    goals = [[8.0, lateral], [0.0, -lateral]]
    robot = CircularRobotSpecification()
    return synthetic_fleet_scenario(starts, goals,
                                    base_speed=robot.lin_vel_max * 0.8,
                                    ts=MpcConfiguration().ts)


def _stack(sc: FleetScenario, b: int) -> FleetScenario:
    return FleetScenario(*[jnp.stack([x] * b) for x in sc])


def test_fleet_head_on_avoidance():
    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    sc = _head_on_scenario()
    run = build_fleet_sim(cfg, robot, FAST, n_robots=2, n_steps=60)
    res = run(_stack(sc, 2), jnp.arange(2))
    collided = np.asarray(res.collided)
    min_inter = np.asarray(res.min_inter_robot)
    done = np.asarray(res.done)
    # The decentralized plan exchange must keep the robots apart: the
    # reference's soft fleet cost (safe_distance = vehicle_width)
    # equilibrates the pass at ~vehicle_width center distance.
    assert not collided.any(), f"fleet collision, min_inter={min_inter}"
    assert (min_inter > 0.95 * robot.vehicle_width).all()
    # ...while still letting both finish the swap.
    assert done.all(), f"robots did not reach goals: done={done}"
    # And they genuinely interacted: the straight-line replay gap (2*0.2 m)
    # is below the cost's safe distance, so the pass distance must have
    # been actively widened.
    straight_gap = 2 * 0.2
    assert straight_gap < 0.95 * robot.vehicle_width  # scenario sanity
    assert (min_inter > straight_gap + 0.05).all()


def test_fleet_capacity_guard():
    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    with pytest.raises(ValueError):
        build_fleet_sim(cfg, robot, FAST, n_robots=cfg.Nother + 2)


def test_fleet_with_human():
    """One robot + one crossing pedestrian through the fleet code path
    (H > 0 branch): clearance bookkeeping live, no collision."""
    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    sc = synthetic_fleet_scenario(
        [[0.0, 0.0, 0.0]], [[6.0, 0.0]],
        base_speed=robot.lin_vel_max * 0.8, ts=cfg.ts,
        human_starts=[[3.0, 4.0]], human_goals=[[3.0, -4.0]])
    run = build_fleet_sim(cfg, robot, FAST, n_robots=1, n_steps=50,
                          human_stagger=0.0)
    res = run(_stack(sc, 1), jnp.arange(1))
    assert not np.asarray(res.collided).any()
    assert np.isfinite(np.asarray(res.min_clearance)).all()
    assert np.asarray(res.done).all()
