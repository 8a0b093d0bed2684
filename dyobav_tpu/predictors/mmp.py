"""Multimodal (SWTA network) motion predictor adapter (L4).

Mirrors `interfaces/mmp_interface.MmpInterface` (mmp_interface.py:14-70):
uniform `get_motion_prediction(input_traj, ref_image, pred_offset, rescale,
batch_size)` returning one (K-hypothesis, 2) array per horizon offset.

TPU-first redesign of the hot path:
  * all `pred_offset` inputs are rasterized on-device in one call (they
    share 6 of 7 channels; only the scalar T channel differs) and the CNN
    runs them as ONE batch — the reference rasterizes each 7-channel stack
    in numpy and micro-batches 5 at a time through torch
    (mmp_interface.py:44-58);
  * the obstacle-snap post-processing (`utils_np.get_closest_edge_point`,
    utils_np.py:109-140 — which rebuilds full-map distance fields per
    query) becomes a one-off per-map nearest-edge lookup table (scipy EDT)
    plus O(1) gathers per point.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..configs import WtaNetConfiguration
from ..models.heatmap import pad_traj, traj_to_input_stack
from ..models.manager import NetworkManager


class ObstacleSnapper:
    """Per-map snap table: for every occupied cell, the nearest free-edge
    cell (precomputed once; the reference recomputes a full-map distance
    field per predicted point)."""

    def __init__(self, occupancy: np.ndarray):
        from scipy import ndimage
        occ = np.asarray(occupancy, dtype=np.float64)
        occ = occ / max(occ.max(), 1e-9)
        occupied = occ > 0
        # Edge = boundary ring of the dilated obstacle mask
        # (utils_np.py:131-133 uses dilation + roberts edge filter).
        dilated = ndimage.binary_dilation(occupied, np.ones((3, 3)))
        eroded = ndimage.binary_erosion(dilated)
        edge = dilated & ~eroded
        if not edge.any():
            self.occupied = occupied
            self.nearest = None
            return
        # For every pixel, index of the nearest edge pixel.
        _, idx = ndimage.distance_transform_edt(~edge, return_indices=True)
        self.occupied = occupied
        self.nearest = idx          # (2, H, W): row/col of nearest edge cell

    def tables(self) -> Optional[np.ndarray]:
        """(3, H, W) stacked gather tables (nearest row, nearest col,
        occupied mask) for the in-graph snap used by the batched sim."""
        if self.nearest is None:
            return None
        return np.stack([self.nearest[0], self.nearest[1],
                         self.occupied.astype(self.nearest.dtype)])

    def snap(self, points: np.ndarray) -> np.ndarray:
        """Move points lying inside obstacles to the nearest edge (order
        preserved, unlike the reference which reorders snapped points)."""
        if self.nearest is None:
            return points
        pts = np.array(points, dtype=np.float64)
        H, W = self.occupied.shape
        cols = np.clip(pts[:, 0].astype(int), 0, W - 1)
        rows = np.clip(pts[:, 1].astype(int), 0, H - 1)
        inside = self.occupied[rows, cols]
        snapped_rows = self.nearest[0][rows, cols]
        snapped_cols = self.nearest[1][rows, cols]
        pts[inside, 0] = snapped_cols[inside]
        pts[inside, 1] = snapped_rows[inside]
        return pts


# Promoted round 3: the full-coverage 20-epoch checkpoint (oracle error
# 1.30 px vs 5.99 for the 8-epoch `wsd_1t20`; TPU protocol success
# 0.9/1.0/... vs 0.7/0.7/0.8 — docs/predictor_ab_r3.log,
# docs/eval_protocol_tpu_mmp_*.json).
DEFAULT_CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "Model", "wsd_1t20_full")


class MmpInterface:
    def __init__(self, config: WtaNetConfiguration | None = None,
                 checkpoint_path: Optional[str] = None,
                 network_manager: NetworkManager | None = None):
        self.config = config or WtaNetConfiguration()
        if checkpoint_path is None and os.path.exists(DEFAULT_CKPT):
            checkpoint_path = DEFAULT_CKPT   # repo-trained SWTA weights
        if network_manager is not None:
            self.network_manager = network_manager
        else:
            self.network_manager = NetworkManager(self.config, verbose=False)
            self.network_manager.build_network()
            if checkpoint_path:
                self.network_manager.load_checkpoint(checkpoint_path)
        self._snapper: ObstacleSnapper | None = None
        self._snapper_src: np.ndarray | None = None
        self._dev_map = None          # device-resident ref_map cache
        self._dev_map_src: np.ndarray | None = None

    def _get_snapper(self, ref_image: np.ndarray) -> ObstacleSnapper:
        # Cache keyed on object identity, holding a strong reference to the
        # keyed array so a GC'd id can never alias a different map.
        if self._snapper is None or self._snapper_src is not ref_image:
            self._snapper = ObstacleSnapper(255.0 - np.asarray(ref_image))
            self._snapper_src = ref_image
        return self._snapper

    def get_motion_prediction(self, input_traj: List[tuple],
                              ref_image: np.ndarray, pred_offset: int,
                              rescale: float = 1.0, batch_size: int = 5
                              ) -> List[np.ndarray] | None:
        """One (num_hypos, 2) array per offset 1..pred_offset (px coords)."""
        if input_traj is None:
            return None
        import jax.numpy as jnp
        traj = [[c * rescale for c in p[:2]] for p in input_traj]
        traj = np.asarray(pad_traj(traj, self.config.obsv_len), np.float32)

        offsets = jnp.arange(1, pred_offset + 1, dtype=jnp.float32)
        # Upload the (H, W) map once per map, not per step (identity-keyed
        # like the snapper cache).
        if self._dev_map is None or self._dev_map_src is not ref_image:
            self._dev_map = jnp.asarray(ref_image, jnp.float32)
            self._dev_map_src = ref_image
        stack = traj_to_input_stack(jnp.asarray(traj), self._dev_map,
                                    offsets, obsv_len=self.config.obsv_len)
        hypos = self.network_manager.inference(stack)        # (T, M, 2)

        snapper = self._get_snapper(ref_image)
        return [snapper.snap(hypos[t]) / rescale for t in range(pred_offset)]
