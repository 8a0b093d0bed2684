"""Torch ↔ Flax weight porting for the SWTA predictor.

Converts a reference-trained `ConvMultiHypoNet` checkpoint
(`pkg_motion_prediction/net_module/net.py:106-143`, saved as a torch
`state_dict` — network_manager.py:219-234, pre_load.py:84-97) into this
package's Flax variables, and back.  This lets reference-trained weights
run on TPU for validation, and TPU-trained weights be exported for the
reference stack.

Layout conversions:
  * Conv kernels: torch OIHW → flax HWIO.
  * Linear weights: torch (out, in) → flax (in, out).
  * BatchNorm: weight→scale, bias→bias; running_mean/var→batch_stats.
  * fc1's input dimension: the torch model flattens NCHW feature maps
    (channel-major, net.py:138), ours flattens NHWC — the fc1 weight's
    input axis is permuted between (C, Hs, Ws) and (Hs, Ws, C) ordering.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _module_pairs(lite: bool, blocks=(3, 4, 6, 3),
                  channels=(16, 32, 64, 128)) -> list:
    """Ordered (flax_path, torch_prefix, kind) for every weighted module.

    kind: 'conv' | 'bn' | 'dense'.  flax_path is '/'-joined module names
    under variables['params'] (batch_stats mirrors the bn entries).
    """
    bb = "ResNet34Lite_0" if lite else "ResNet34_0"
    pairs = []
    if lite:
        pairs += [(f"{bb}/ConvBNLeaky_0/Conv_0", "resnet34.stem.conv1.0", "conv"),
                  (f"{bb}/ConvBNLeaky_0/BatchNorm_0", "resnet34.stem.conv1.1", "bn")]
        stem_out = 64
    else:
        for i in range(3):
            pairs += [(f"{bb}/ConvBNLeaky_{i}/Conv_0",
                       f"resnet34.stem.conv{i + 1}.0", "conv"),
                      (f"{bb}/ConvBNLeaky_{i}/BatchNorm_0",
                       f"resnet34.stem.conv{i + 1}.1", "bn")]
        stem_out = 64
        channels = (64, 128, 256, 512)

    b = 0
    in_ch = stem_out
    for stage, (ch, nb) in enumerate(zip(channels, blocks)):
        stride = 1 if stage == 0 else 2
        for i in range(nb):
            fx = f"{bb}/BasicBlock_{b}"
            tp = f"resnet34.layer{stage + 1}.{i}"
            pairs += [(f"{fx}/ConvBNLeaky_0/Conv_0", f"{tp}.conv1.0", "conv"),
                      (f"{fx}/ConvBNLeaky_0/BatchNorm_0", f"{tp}.conv1.1", "bn"),
                      (f"{fx}/ConvBNLeaky_1/Conv_0", f"{tp}.conv2.0", "conv"),
                      (f"{fx}/ConvBNLeaky_1/BatchNorm_0", f"{tp}.conv2.1", "bn")]
            has_shortcut = (i == 0 and (stride != 1 or in_ch != ch))
            if has_shortcut:
                pairs += [(f"{fx}/Conv_0", f"{tp}.downsample.0", "conv"),
                          (f"{fx}/BatchNorm_0", f"{tp}.downsample.1", "bn")]
            b += 1
            in_ch = ch
    pairs += [("Dense_0", "fc1", "dense"),
              ("Dense_1", "swarm.layer_hypos", "dense")]
    return pairs


def _fc1_perm(fc_input: int, n_channels: int) -> np.ndarray:
    """Permutation mapping flax (NHWC-flat) input indices to torch
    (NCHW-flat) indices: perm[i_flax] = i_torch."""
    spatial = fc_input // n_channels
    hs = int(round(np.sqrt(spatial)))
    assert hs * hs == spatial, f"non-square feature map: {spatial}"
    idx = np.arange(fc_input).reshape(n_channels, hs, hs)   # torch order CHW
    return idx.transpose(1, 2, 0).reshape(-1)               # flax order HWC


def _set(tree: dict, path: str, leaf: str, value: np.ndarray) -> None:
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def _get(tree: dict, path: str, leaf: str) -> np.ndarray:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return np.asarray(node[leaf])


def torch_to_flax(state_dict: Dict[str, "np.ndarray"], lite: bool = True
                  ) -> dict:
    """Reference torch `state_dict` → Flax variables
    {'params': ..., 'batch_stats': ...} for `models.wta_net.ConvMultiHypoNet`.

    Accepts torch tensors or numpy arrays as values.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    last_channels = None
    for fx, tp, kind in _module_pairs(lite):
        if kind == "conv":
            w = sd[f"{tp}.weight"]                       # OIHW
            _set(params, fx, "kernel", w.transpose(2, 3, 1, 0))
            if f"{tp}.bias" in sd:
                _set(params, fx, "bias", sd[f"{tp}.bias"])
            last_channels = w.shape[0]
        elif kind == "bn":
            _set(params, fx, "scale", sd[f"{tp}.weight"])
            _set(params, fx, "bias", sd[f"{tp}.bias"])
            _set(stats, fx, "mean", sd[f"{tp}.running_mean"])
            _set(stats, fx, "var", sd[f"{tp}.running_var"])
        else:                                            # dense
            w = sd[f"{tp}.weight"]                       # (out, in)
            if tp == "fc1":
                perm = _fc1_perm(w.shape[1], last_channels)
                w = w[:, perm]
            _set(params, fx, "kernel", w.T)
            _set(params, fx, "bias", sd[f"{tp}.bias"])
    return {"params": params, "batch_stats": stats}


def flax_to_torch(variables: dict, lite: bool = True) -> Dict[str, np.ndarray]:
    """Flax variables → a reference-schema torch `state_dict` (numpy values;
    wrap with `torch.from_numpy` to load into the reference model)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    last_channels = None
    for fx, tp, kind in _module_pairs(lite):
        if kind == "conv":
            k = _get(params, fx, "kernel")               # HWIO
            sd[f"{tp}.weight"] = k.transpose(3, 2, 0, 1)
            node = params
            for part in fx.split("/"):
                node = node[part]
            if "bias" in node:
                sd[f"{tp}.bias"] = np.asarray(node["bias"])
            last_channels = k.shape[3]
        elif kind == "bn":
            sd[f"{tp}.weight"] = _get(params, fx, "scale")
            sd[f"{tp}.bias"] = _get(params, fx, "bias")
            sd[f"{tp}.running_mean"] = _get(stats, fx, "mean")
            sd[f"{tp}.running_var"] = _get(stats, fx, "var")
            sd[f"{tp}.num_batches_tracked"] = np.asarray(0)
        else:
            w = _get(params, fx, "kernel").T             # (out, in)
            if tp == "fc1":
                perm = _fc1_perm(w.shape[1], last_channels)
                inv = np.empty_like(perm)
                inv[perm] = np.arange(perm.size)
                w = w[:, inv]
            sd[f"{tp}.weight"] = w
            sd[f"{tp}.bias"] = _get(params, fx, "bias")
    return sd


def load_torch_checkpoint(path: str, lite: bool = True) -> dict:
    """Load a reference `.pt`/state-dict file from disk → Flax variables."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model_state_dict" in sd:   # epoch checkpoint
        sd = sd["model_state_dict"]
    return torch_to_flax(sd, lite=lite)
