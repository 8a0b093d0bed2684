#!/usr/bin/env python
"""Predictor quality report: oracle error + hypothesis spread on held-out data.

For a trained SWTA checkpoint, samples batches from the WSD test split and
reports (all in pixels, the net's native frame):

  oracle_err  — mean over samples of min_m ||hypo_m - label||  (the WTA
                "a good mode exists" metric; the reference's eval uses the
                same idea via loss_MaDist, loss_functions.py:206)
  mean_err    — mean over samples of ||mean_m hypo_m - label|| (central
                oracle, loss_functions.py:226)
  spread      — mean over samples of RMS distance of hypotheses from their
                centroid: drives the CGF ellipse size, hence how much of
                the corridor the MPC must avoid.

Usage: python scripts/eval_predictor.py --ckpt Model/wsd_1t20 \
           [--data /root/reference/data/WSD_1t20_test] [--batches 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="Model/wsd_1t20")
    ap.add_argument("--data", default="/root/reference/data/WSD_1t20_test")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from dyobav_tpu.configs import WtaNetConfiguration
    from dyobav_tpu.models.data import DataHandler, WsdDataset
    from dyobav_tpu.models.heatmap import traj_to_input_batch
    from dyobav_tpu.models.manager import NetworkManager

    ds = WsdDataset(args.data)
    H, W = ds.image_shape()
    cfg = WtaNetConfiguration(x_max_px=W, y_max_px=H)
    mgr = NetworkManager(cfg, verbose=False)
    mgr.build_network(input_shape=(1, H, W, cfg.input_channel))
    mgr.load_checkpoint(args.ckpt)

    # Group sample indices by video so every device batch shares one map
    # (multi-video test splits would otherwise never yield a clean batch).
    by_video = {}
    for i, s in enumerate(ds.samples):
        by_video.setdefault(s.video, []).append(i)
    ref_maps = {v: jnp.asarray(ds.ref_map(v)) for v in by_video}
    rng = np.random.default_rng(args.seed)
    plan = []
    videos = sorted(by_video, key=lambda v: -len(by_video[v]))
    for bi in range(args.batches):
        v = videos[bi % len(videos)]
        if len(by_video[v]) < args.batch_size:
            continue
        plan.append((v, rng.choice(by_video[v], args.batch_size,
                                   replace=False)))
    if not plan:
        print(f"error: no video in {args.data} has >= {args.batch_size} "
              "samples; lower --batch-size", file=sys.stderr)
        return 1
    dh = DataHandler(ds, batch_size=args.batch_size, seed=args.seed)

    @jax.jit
    def metrics(state, trajs, offsets, labels, ref_map):
        images = traj_to_input_batch(trajs, ref_map, offsets)
        hypos = state.apply_fn({"params": state.params,
                                "batch_stats": state.batch_stats},
                               images, train=False)         # (B, M, 2)
        d = jnp.linalg.norm(hypos - labels[:, None, :], axis=-1)  # (B, M)
        oracle = jnp.min(d, axis=1)
        centroid = jnp.mean(hypos, axis=1)
        mean_err = jnp.linalg.norm(centroid - labels, axis=-1)
        spread = jnp.sqrt(jnp.mean(
            jnp.sum((hypos - centroid[:, None, :]) ** 2, axis=-1), axis=1))
        return oracle, mean_err, spread

    oracle_all, mean_all, spread_all, offset_all = [], [], [], []
    for video, idx in plan:
        batch = dh._gather(idx)
        o, m, s = metrics(mgr.state, jnp.asarray(batch["traj"]),
                          jnp.asarray(batch["offset"]),
                          jnp.asarray(batch["label"]),
                          ref_maps[video])
        oracle_all.append(np.asarray(o))
        mean_all.append(np.asarray(m))
        spread_all.append(np.asarray(s))
        offset_all.append(np.asarray(batch["offset"]).reshape(-1))

    oracle = np.concatenate(oracle_all)
    meane = np.concatenate(mean_all)
    spread = np.concatenate(spread_all)
    offsets = np.concatenate(offset_all)

    # Oracle-ADE/FDE over the prediction horizon (displacement-error
    # convention of the trajectory-prediction literature, oracle = best of
    # the M hypotheses — "minADE_M/minFDE_M").  Each WSD sample is one
    # (past, offset) pair, so per-offset bucket means ARE the per-horizon
    # displacement errors; ADE averages them over offsets 1..T, FDE is the
    # final offset's bucket.  Px → meters via the warehouse map scale
    # (0.1 m/px, ScaleOffsetReverseTransform(scale=0.1)).
    uniq = np.unique(offsets)
    per_offset = {int(k): float(oracle[offsets == k].mean()) for k in uniq}
    ade_px = float(np.mean(list(per_offset.values())))
    fde_px = per_offset[int(uniq.max())]
    print(json.dumps({
        "ckpt": args.ckpt,
        "n": int(oracle.size),
        "oracle_err_px_mean": round(float(oracle.mean()), 2),
        "oracle_err_px_p90": round(float(np.percentile(oracle, 90)), 2),
        "mean_err_px_mean": round(float(meane.mean()), 2),
        "spread_px_mean": round(float(spread.mean()), 2),
        "oracle_ade_px": round(ade_px, 2),
        "oracle_fde_px": round(fde_px, 2),
        "oracle_ade_m": round(ade_px * 0.1, 3),
        "oracle_fde_m": round(fde_px * 0.1, 3),
        "per_offset_oracle_px": {k: round(v, 2)
                                 for k, v in sorted(per_offset.items())},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
