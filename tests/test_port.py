"""Torch ↔ Flax weight-porting parity for the SWTA net.

The strongest architecture check in the suite: a randomly initialized
*reference* torch ConvMultiHypoNet, ported to Flax variables, must produce
the same hypotheses on the same input (and round-trip back bit-exactly).
"""
import os
import sys

import numpy as np
import jax
import pytest

from dyobav_tpu.models.port import flax_to_torch, torch_to_flax
from dyobav_tpu.models.wta_net import ConvMultiHypoNet

REF_SRC = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_SRC),
                                reason="reference absent")


def _load_reference_net():
    import torch  # noqa: F401
    sys.path.insert(0, REF_SRC)
    try:
        from pkg_motion_prediction.net_module.net import (
            ConvMultiHypoNet as TorchNet)
    finally:
        sys.path.remove(REF_SRC)
    return TorchNet


def test_torch_to_flax_forward_parity():
    import torch
    TorchNet = _load_reference_net()
    torch.manual_seed(0)
    tnet = TorchNet(input_channel=7, dim_output=2, fc_input=3200,
                    num_components=20)
    tnet.eval()
    # Non-trivial running stats so the BN port is actually exercised.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    variables = torch_to_flax(tnet.state_dict())
    fnet = ConvMultiHypoNet(dim_out=2, num_hypos=20)

    rng = np.random.default_rng(1)
    # fc_input=3200 = 128 ch x 5x5 spatial → 320x320 input (/64 reduction).
    x = rng.normal(size=(2, 7, 320, 320)).astype(np.float32)  # NCHW
    with torch.no_grad():
        out_t = tnet(torch.from_numpy(x)).numpy().reshape(2, 20, 2)
    out_f = np.asarray(jax.jit(
        lambda v, im: fnet.apply(v, im, train=False)
    )(variables, x.transpose(0, 2, 3, 1)))                    # NHWC

    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


def test_roundtrip_is_exact():
    import torch
    TorchNet = _load_reference_net()
    torch.manual_seed(3)
    tnet = TorchNet(input_channel=7, dim_output=2, fc_input=3200,
                    num_components=20)
    sd = tnet.state_dict()
    back = flax_to_torch(torch_to_flax(sd))
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)
