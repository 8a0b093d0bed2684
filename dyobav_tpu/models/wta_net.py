"""SWTA multimodal motion-prediction network in Flax.

Re-implements the reference's predictor architecture exactly
(`pkg_motion_prediction/net_module/net.py`):

  ConvMultiHypoNet (net.py:106-143)
    = ResNet34Lite backbone (net.py:63-82: stem conv7x7/s2 + maxpool3x3/s2,
      channels [16, 32, 64, 128], blocks [3, 4, 6, 3], LeakyReLU(0.1) in
      conv layers / LeakyReLU(0.01) after residual adds, avgpool 2x2)
    → FC(fc_input → 128) + LeakyReLU
    → MultiHypothesisModule linear head (module_wta.py:18-43):
      128 → dim_out * num_hypos.

Input is the 7-channel image stack (5 past-position Gaussian heat-maps +
map channel + scalar pred-offset channel) in NHWC layout; output is
(B, num_hypos, dim_out) hypotheses.

TPU notes: NHWC convolutions map directly onto the MXU; inference callers
may run the backbone in bfloat16 (`compute_dtype`) with float32 params.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

LEAKY_CONV = 0.1    # slope inside compact conv layers (submodules.py:24)
LEAKY_POST = 0.01   # torch nn.LeakyReLU default (block output, net.py:52)


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bn: bool = True
    activate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    use_bias=not self.use_bn, dtype=self.dtype)(x)
        if self.use_bn:
            # momentum 0.9 matches torch's BatchNorm2d default (0.1 "new"
            # fraction); flax's 0.99 default left running stats lagging the
            # trained parameters by ~100 steps — enough to break eval mode
            # on this depth of residual BN stack.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        if self.activate:
            x = nn.leaky_relu(x, LEAKY_CONV)
        return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNLeaky(self.features, 3, self.stride, 1, self.use_bn,
                          dtype=self.dtype)(x, train)
        out = ConvBNLeaky(self.features, 3, 1, 1, self.use_bn,
                          activate=False, dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(identity)
        return nn.leaky_relu(out + identity, LEAKY_POST)


class ResNet34Lite(nn.Module):
    channels: Sequence[int] = (16, 32, 64, 128)
    blocks: Sequence[int] = (3, 4, 6, 3)
    stem_features: int = 64
    deep_stem: bool = False
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deep_stem:
            # Deep stem (net.py:29-33): 3x3/s2 + 3x3 + 3x3, 32/32/64 ch.
            x = ConvBNLeaky(32, 3, 2, 1, self.use_bn, dtype=self.dtype)(x, train)
            x = ConvBNLeaky(32, 3, 1, 1, self.use_bn, dtype=self.dtype)(x, train)
            x = ConvBNLeaky(self.stem_features, 3, 1, 1, self.use_bn,
                            dtype=self.dtype)(x, train)
        else:
            x = ConvBNLeaky(self.stem_features, 7, 2, 3, self.use_bn,
                            dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (ch, nb) in enumerate(zip(self.channels, self.blocks)):
            stride = 1 if stage == 0 else 2
            x = BasicBlock(ch, stride, self.use_bn, self.dtype)(x, train)
            for _ in range(nb - 1):
                x = BasicBlock(ch, 1, self.use_bn, self.dtype)(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResNet34(ResNet34Lite):
    """Full-width variant (net.py:85-105): deep stem, channels 64..512."""
    channels: Sequence[int] = (64, 128, 256, 512)
    deep_stem: bool = True


class ConvMultiHypoNet(nn.Module):
    """Backbone → FC → multi-hypothesis linear head.

    lite=True (default) uses ResNet34Lite + FC(128); lite=False the
    full-width ResNet34 + FC(1024), matching net.py:113-131.
    """

    dim_out: int = 2
    num_hypos: int = 20
    lite: bool = True
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNet34Lite if self.lite else ResNet34
        fc_features = 128 if self.lite else 1024
        feat = backbone(use_bn=self.use_bn, dtype=self.dtype)(x, train)
        feat = feat.reshape(feat.shape[0], -1)
        feat = nn.leaky_relu(nn.Dense(fc_features, dtype=self.dtype)(feat),
                             LEAKY_POST)
        hypos = nn.Dense(self.dim_out * self.num_hypos, dtype=self.dtype)(feat)
        return hypos.reshape(hypos.shape[0], self.num_hypos, self.dim_out)
