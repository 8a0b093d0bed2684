"""SWTA (MMP) predictor end-to-end tests — require a trained checkpoint."""
import os

import numpy as np
import pytest

from dyobav_tpu.configs import SolverConfiguration, WtaNetConfiguration

REPO = os.path.join(os.path.dirname(__file__), "..")
CKPT = os.path.abspath(os.path.join(REPO, "Model", "wsd_1t20_full"))
DATA = os.path.join(REPO, "data", "warehouse_sim_original")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.exists(os.path.join(DATA, "mymap.pgm"))),
    reason="trained checkpoint or map data absent")


@pytest.fixture(scope="module")
def mmp():
    from dyobav_tpu.predictors.mmp import MmpInterface
    return MmpInterface(WtaNetConfiguration(), checkpoint_path=CKPT)


def test_mmp_prediction_shapes(mmp):
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(DATA, "label.png")))
    ref = img[:, :, :3].astype(np.float64).sum(axis=2) / 3.0
    traj = [(160.0, 50.0), (160.0, 53.0), (160.0, 56.0)]
    hypos = mmp.get_motion_prediction(traj, ref, pred_offset=20, rescale=1.0)
    assert len(hypos) == 20
    assert hypos[0].shape == (20, 2)
    # Predictions land inside the map bounds...
    allh = np.concatenate(hypos)
    assert allh[:, 0].min() > -50 and allh[:, 0].max() < 400
    assert allh[:, 1].min() > -50 and allh[:, 1].max() < 350
    # ...and near the pedestrian (quality gate: the mean hypothesis at the
    # first offset stays within 60 px of the current position; catches the
    # BatchNorm running-stat failure mode where eval-mode drifted ~200 px).
    near = np.linalg.norm(hypos[0].mean(axis=0) - np.array([160.0, 56.0]))
    assert near < 60.0, f"offset-1 hypothesis centroid {near:.0f}px away"


def test_sim_step_with_mmp(mmp):
    from dyobav_tpu.sim.harness import MainBase
    base = MainBase(max_run_time_step=2, evaluation=True, seed=5,
                    solver_config=SolverConfiguration(
                        max_inner_iters=10, max_outer_iters=2,
                        inner_iters_later=4))
    robot, humans = base._prepare_agents()
    tracker, _ = base._prepare_interfaces(robot, None, "mpc")
    collision, complete, solve_time, clearance = base.run_one_step(
        robot, humans, tracker, mmp)
    assert not collision
    assert clearance > 0
