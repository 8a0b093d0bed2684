"""Scenario-batched closed-loop simulator tests (virtual 8-device mesh)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.configs import SolverConfiguration
from dyobav_tpu.parallel.mesh import make_mesh, shard_batch
from dyobav_tpu.sim.batch import Scenario, build_batch_sim
from dyobav_tpu.sim.harness import MainBase
from dyobav_tpu.sim.scenarios import build_scenario, random_scenarios

DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "warehouse_sim_original")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "mymap.pgm")),
    reason="warehouse data not imported")

FAST = SolverConfiguration(max_inner_iters=8, max_outer_iters=2,
                           inner_iters_later=4)


def test_batched_sim_sharded_progress():
    base = MainBase(max_run_time_step=10, evaluation=True, seed=0)
    sc = build_scenario(base, scenario_index=0)
    assert int(sc.ref_len) > 20
    batch = Scenario(*[jnp.stack([x] * 8) for x in sc])
    run = build_batch_sim(base.config_mpc, base.config_robot, FAST,
                          n_steps=10)
    mesh = make_mesh(8)
    batch = shard_batch(mesh, batch)
    res = run(batch, jnp.arange(8))
    # No collisions in 10 steps; robot moved toward the goal in every lane.
    assert not np.any(np.asarray(res.collided))
    start = np.asarray(sc.robot_start[:2])
    goal = np.asarray(sc.goal[:2])
    d_start = np.linalg.norm(start - goal)
    finals = np.asarray(res.final_state)[:, :2]
    d_final = np.linalg.norm(finals - goal[None], axis=1)
    assert np.all(d_final < d_start - 0.3)
    # Different pedestrian seeds → lanes diverge (stagger noise is live).
    assert np.asarray(res.min_clearance).std() > 0


def test_random_scenarios_batch_shapes():
    base = MainBase(max_run_time_step=5, evaluation=True, seed=0)
    rs = random_scenarios(base, 4, seed=3)
    assert rs.robot_start.shape == (4, 3)
    assert rs.all_stc.shape[0] == 4
    assert rs.human_paths.shape[0] == 4
    # Reference trajectories are non-degenerate.
    assert np.all(np.asarray(rs.ref_len) > 3)
