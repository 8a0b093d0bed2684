"""Training-data pipeline for the SWTA predictor.

The reference consumes a pre-generated index CSV (`all_data.csv` with
columns p0..p4 / T) through a torch `ImageStackDataset`
(`data_handle/dataset.py:24-134`) and a `DataHandler` with an 80/20 split
(`data_handle/data_handler.py:10-31`).  The shipped dataset
(`data/WSD_1t20_*`) contains only the *raw* per-video trajectory CSVs
(t, id, index, x, y) plus each video's `label.png`; the index file is built
offline upstream.  `build_index` reproduces that step: sliding windows of
`obsv_len` past positions and one future position at every offset
1..pred_offset_max per trajectory.

Batches are assembled host-side as (traj, offset, label, video) records;
the heavy 7-channel rasterization runs on-device per batch
(`models.heatmap.traj_to_input_stack`'s single-offset sibling below), so
HBM never holds the full rasterized dataset.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np


@dataclass
class Sample:
    video: str          # video folder name (holds label.png)
    traj: np.ndarray    # (obsv_len, 2) past positions (px)
    offset: int         # prediction offset T (steps ahead)
    label: np.ndarray   # (2,) future position (px)


class WsdDataset:
    """Warehouse-simulation dataset over raw per-video trajectory CSVs."""

    def __init__(self, root_dir: str, obsv_len: int = 5,
                 pred_offset_max: int = 20):
        self.root_dir = root_dir
        self.obsv_len = obsv_len
        self.pred_offset_max = pred_offset_max
        self.samples: List[Sample] = []
        self._map_cache: Dict[str, np.ndarray] = {}
        self._build_index()

    def _build_index(self):
        for video in sorted(os.listdir(self.root_dir)):
            vdir = os.path.join(self.root_dir, video)
            csv_path = os.path.join(vdir, "data.csv")
            if not os.path.isdir(vdir) or not os.path.exists(csv_path):
                continue
            raw = np.genfromtxt(csv_path, delimiter=",", names=True)
            ids = np.unique(raw["id"])
            for pid in ids:
                rows = raw[raw["id"] == pid]
                order = np.argsort(rows["t"])
                xy = np.stack([rows["x"][order], rows["y"][order]], axis=1)
                T = xy.shape[0]
                L = self.obsv_len
                for start in range(T - L + 1):
                    past = xy[start:start + L]
                    for off in range(1, self.pred_offset_max + 1):
                        tgt = start + L - 1 + off
                        if tgt >= T:
                            break
                        self.samples.append(Sample(
                            video=video, traj=past.astype(np.float32),
                            offset=off, label=xy[tgt].astype(np.float32)))

    def __len__(self) -> int:
        return len(self.samples)

    def ref_map(self, video: str) -> np.ndarray:
        if video not in self._map_cache:
            from PIL import Image
            img = np.asarray(Image.open(
                os.path.join(self.root_dir, video, "label.png")))
            if img.ndim == 3:
                img = img[:, :, :3].astype(np.float64).sum(axis=2) / 3.0
            self._map_cache[video] = img.astype(np.float32)
        return self._map_cache[video]

    def image_shape(self) -> Tuple[int, int]:
        return self.ref_map(self.samples[0].video).shape


class DataHandler:
    """Shuffled train/val split + infinite batch iterator
    (data_handler.py:10-63 semantics: random 80/20 split, epoch reshuffle)."""

    def __init__(self, dataset: WsdDataset, batch_size: int = 20,
                 val_fraction: float = 0.2, seed: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(dataset))
        n_val = int(len(dataset) * val_fraction)
        self.val_idx = idx[:n_val]
        self.train_idx = idx[n_val:]
        self.rng = rng
        self._pos = 0
        self._order = self.rng.permutation(self.train_idx)

    def batches_per_epoch(self) -> int:
        return max(1, len(self.train_idx) // self.batch_size)

    def _gather(self, indices) -> dict:
        samples = [self.ds.samples[i] for i in indices]
        return {
            "traj": np.stack([s.traj for s in samples]),
            "offset": np.array([s.offset for s in samples], np.float32),
            "label": np.stack([s.label for s in samples]),
            "video": [s.video for s in samples],
        }

    def next_batch(self) -> dict:
        if self._pos + self.batch_size > len(self._order):
            self._order = self.rng.permutation(self.train_idx)
            self._pos = 0
        batch = self._gather(self._order[self._pos:self._pos + self.batch_size])
        self._pos += self.batch_size
        return batch

    def val_batches(self, max_batches: int = 10):
        for i in range(0, min(len(self.val_idx),
                              max_batches * self.batch_size), self.batch_size):
            yield self._gather(self.val_idx[i:i + self.batch_size])


def rasterize_batch(batch: dict, ds: WsdDataset) -> Tuple[np.ndarray, np.ndarray]:
    """Batch records → (B, H, W, 7) inputs + (B, 2) labels.

    One jitted on-device call per map group (with a single warehouse map,
    one call for the whole batch).
    """
    import jax.numpy as jnp
    from .heatmap import traj_to_input_batch

    videos = batch["video"]
    H, W = ds.image_shape()
    out = np.zeros((len(videos), H, W, ds.obsv_len + 2), np.float32)
    by_video: Dict[str, List[int]] = {}
    for i, v in enumerate(videos):
        by_video.setdefault(v, []).append(i)
    for video, idxs in by_video.items():
        ref = jnp.asarray(ds.ref_map(video))
        stack = traj_to_input_batch(
            jnp.asarray(batch["traj"][idxs]), ref,
            jnp.asarray(batch["offset"][idxs]), obsv_len=ds.obsv_len)
        out[np.asarray(idxs)] = np.asarray(stack)
    return out, batch["label"]
