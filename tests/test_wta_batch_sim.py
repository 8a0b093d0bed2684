"""Neural (SWTA + on-device CGF) batched closed loop — checkpoint-gated."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.configs import SolverConfiguration, WtaNetConfiguration

REPO = os.path.join(os.path.dirname(__file__), "..")
CKPT = os.path.abspath(os.path.join(REPO, "Model", "wsd_1t20_full"))
DATA = os.path.join(REPO, "data", "warehouse_sim_original")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.exists(os.path.join(DATA, "mymap.pgm"))),
    reason="trained checkpoint or map data absent")


def test_neural_batched_closed_loop():
    from dyobav_tpu.models.manager import NetworkManager
    from dyobav_tpu.predictors.mmp import ObstacleSnapper
    from dyobav_tpu.sim.batch import (Scenario, build_batch_sim,
                                      make_wta_predictor)
    from dyobav_tpu.sim.harness import MainBase
    from dyobav_tpu.sim.scenarios import build_scenario

    base = MainBase(max_run_time_step=3, evaluation=True, seed=0)
    sc = build_scenario(base, scenario_index=0)

    mgr = NetworkManager(WtaNetConfiguration(), verbose=False)
    mgr.build_network()
    mgr.load_checkpoint(CKPT)
    variables = {"params": mgr.state.params,
                 "batch_stats": mgr.state.batch_stats}
    net_apply = lambda v, images: mgr.state.apply_fn(v, images, train=False)

    snapper = ObstacleSnapper(255.0 - base.ref_map)
    pred = make_wta_predictor(net_apply, variables, base.ref_map,
                              base.ct2real, n_hor=base.config_mpc.N_hor,
                              snap_nearest=snapper.tables(),
                              scale2nn=base.sim_config.scale2nn)

    # Standalone predictor sanity in world coordinates.
    hist = jnp.asarray(
        np.stack([np.array([[1.0, 9.3 - 0.3 * (4 - i)]]) for i in range(5)]),
        jnp.float32)                                        # (5, 1, 2) moving
    mu, std, alpha = pred(hist)
    assert mu.shape == (20, 8, 2) and alpha.shape == (20, 8)
    active = np.asarray(alpha[0]) > 0
    assert active.sum() >= 1
    centroid = np.asarray(mu[0])[active].mean(axis=0)
    # Clusters land within a few meters of the pedestrian (world frame).
    assert np.linalg.norm(centroid - np.array([1.0, 9.3])) < 6.0, centroid

    # Two-scenario batched closed loop with the neural predictor.
    scfg = SolverConfiguration(max_inner_iters=6, max_outer_iters=2,
                               inner_iters_later=3,
                               escalation_ladder=((4, 2, 2, 1, 10.0),),
                               escalation_slots=(4,))
    run = build_batch_sim(base.config_mpc, base.config_robot, scfg,
                          n_steps=2, predictor=pred)
    batch = Scenario(*[jnp.stack([x] * 2) for x in sc])
    res = run(batch, jnp.arange(2))
    assert not np.any(np.asarray(res.collided))
    assert np.all(np.isfinite(np.asarray(res.final_state)))
