#!/usr/bin/env python
"""Export a trained Flax SWTA checkpoint as a reference-loadable torch
artifact, and certify it end-to-end (VERDICT r3 next-step #5).

The reference repo does not distribute its trained weights (no `Model/`
in-tree; the README points at an external download, unreachable here), so
the planned "reference-trained torch checkpoint vs wsd_1t20_full" A/B is
environmental.  This script certifies the converse direction at protocol
scale instead — that a REFERENCE USER can consume OUR trained artifact:

  1. load the Flax checkpoint (default Model/wsd_1t20_full),
  2. convert with `models.port.flax_to_torch` and torch.save it,
  3. reload the .pt into the REFERENCE'S OWN `ConvMultiHypoNet`
     (strict load_state_dict, /root/reference/src), and
  4. run both nets over held-out WSD samples, reporting max hypothesis
     deviation plus oracle-error metrics for each side.

Writes Model/<name>_torch.pt and docs/port_artifact_r4.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_SRC = "/root/reference/src"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="Model/wsd_1t20_full")
    ap.add_argument("--data", default="/root/reference/data/WSD_1t20_test")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import torch

    from dyobav_tpu.configs import WtaNetConfiguration
    from dyobav_tpu.models.data import WsdDataset
    from dyobav_tpu.models.heatmap import traj_to_input_batch
    from dyobav_tpu.models.manager import NetworkManager
    from dyobav_tpu.models.port import flax_to_torch

    ds = WsdDataset(args.data)
    H, W = ds.image_shape()
    cfg = WtaNetConfiguration(x_max_px=W, y_max_px=H)
    mgr = NetworkManager(cfg, verbose=False)
    mgr.build_network(input_shape=(1, H, W, cfg.input_channel))
    mgr.load_checkpoint(os.path.join(REPO, args.ckpt))
    variables = {"params": mgr.state.params,
                 "batch_stats": mgr.state.batch_stats}

    # --- export ---
    sd = flax_to_torch(variables)
    out_pt = os.path.join(REPO, args.ckpt + "_torch.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               out_pt)

    # --- reload through the reference's own net class (strict) ---
    sys.path.insert(0, REF_SRC)
    try:
        from pkg_motion_prediction.net_module.net import (
            ConvMultiHypoNet as TorchNet)
    finally:
        sys.path.remove(REF_SRC)
    tnet = TorchNet(input_channel=cfg.input_channel, dim_output=cfg.dim_out,
                    fc_input=cfg.fc_input, num_components=cfg.num_hypos)
    missing = tnet.load_state_dict(torch.load(out_pt), strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys
    tnet.eval()

    # --- held-out forward A/B ---
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=min(args.samples, len(ds)), replace=False)
    samples = [ds.samples[int(i)] for i in idx]
    trajs = np.stack([s.traj for s in samples])
    labels = np.stack([s.label for s in samples])
    offsets = np.asarray([s.offset for s in samples], np.float32)
    ref_map = ds.ref_map(samples[0].video)  # single warehouse map

    images = np.asarray(traj_to_input_batch(
        np.asarray(trajs, np.float32), np.asarray(ref_map, np.float32),
        offsets, obsv_len=cfg.obsv_len))

    flax_out = np.asarray(jax.jit(
        lambda v, im: mgr.state.apply_fn(v, im, train=False)
    )(variables, images))                                  # (B, M, 2)
    with torch.no_grad():
        torch_out = tnet(torch.from_numpy(np.ascontiguousarray(
            images.transpose(0, 3, 1, 2)))).numpy().reshape(flax_out.shape)

    dev_max = float(np.abs(flax_out - torch_out).max())

    def oracle_err(hypos):
        d = np.linalg.norm(hypos - labels[:, None, :], axis=-1)
        return float(d.min(axis=1).mean())

    out = {
        "ckpt": args.ckpt,
        "artifact": os.path.relpath(out_pt, REPO),
        "samples": int(len(idx)),
        "hypo_dev_max_px": dev_max,
        "oracle_err_px_flax": oracle_err(flax_out),
        "oracle_err_px_torch_artifact": oracle_err(torch_out),
        "strict_load": True,
    }
    doc = os.path.join(REPO, "docs", "port_artifact_r4.json")
    with open(doc, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {doc}")
    assert dev_max < 1e-2, dev_max
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
