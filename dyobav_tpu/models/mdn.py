"""Mixture-density network variants of the predictor head.

Re-implements the reference's MDN alternatives
(`pkg_motion_prediction/net_module/module_mdn.py` and the MDN nets in
`net.py:145-226`):

  * `ClassicMixtureDensityModule` — linear head emitting (α, μ, σ) for M
    diagonal Gaussians (module_mdn.py:6-22);
  * `SamplingMixtureDensityModule` — soft-assignment GMM fit over the K WTA
    hypotheses: responsibilities from a learned K×M mapping, then weighted
    mean/variance per component (module_mdn.py:24-58), vectorized here
    (no per-component Python loop);
  * component-selection helpers `take_main_components` /
    `take_good_components` (module_mdn.py:60-103);
  * `ConvMixtureDensityNet` / `ConvMixtureDensityFit` /
    `ConvMultiHypoMixtureDensityFit` assemblies (net.py:145-226).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .wta_net import LEAKY_POST, ResNet34Lite


class ClassicMixtureDensityModule(nn.Module):
    dim_output: int
    num_components: int

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        M, C = self.num_components, self.dim_output
        p = nn.Dense((2 * C + 1) * M)(x)
        alpha = nn.softmax(p[:, :M], axis=1)
        mu = p[:, M:(C + 1) * M].reshape(-1, M, C)
        sigma = jnp.exp(p[:, (C + 1) * M:]).reshape(-1, M, C)
        return alpha, mu, sigma


class SamplingMixtureDensityModule(nn.Module):
    dim_input: int       # per-hypothesis dimension (C)
    num_hypos: int       # K
    num_gaus: int        # M

    @nn.compact
    def __call__(self, hypos_flat: jnp.ndarray):
        """hypos_flat: (B, K*C) WTA hypotheses → (α (B,M), μ (B,M,C),
        σ² (B,M,C)) soft-fit GMM."""
        K, M, C = self.num_hypos, self.num_gaus, self.dim_input
        z = nn.Dense(K * M)(hypos_flat).reshape(-1, K, M)
        xK = hypos_flat.reshape(-1, K, C)
        gamma = nn.softmax(z, axis=2)                     # (B, K, M)
        alpha = jnp.sum(gamma, axis=1) / K                # (B, M)
        w = gamma / jnp.maximum(jnp.sum(gamma, axis=1, keepdims=True), 1e-12)
        mu = jnp.einsum("bkm,bkc->bmc", w, xK)
        diff_sq = (xK[:, :, None, :] - mu[:, None, :, :]) ** 2
        sigma = jnp.einsum("bkm,bkmc->bmc", w, diff_sq)
        return alpha, mu, sigma


def take_main_components(alp, mu, sigma, main: int = 3):
    """Largest-weight components of one GMM (module_mdn.py:60-86)."""
    alp, mu, sigma = alp[0], mu[0], sigma[0]
    if alp.shape[0] <= main:
        return alp[None], mu[None], sigma[None]
    order = jnp.argsort(-alp)[:main]
    return alp[order][None], mu[order][None], sigma[order][None]


def take_good_components(alp, mu, sigma, thre: float = 0.1):
    """Components above a fraction of the max weight (module_mdn.py:88-103).

    Returns numpy-style boolean-filtered arrays (host-side utility; the
    output length is data-dependent).
    """
    import numpy as np
    alp = np.asarray(alp)
    mu = np.asarray(mu)
    sigma = np.asarray(sigma)
    if alp.shape[0] <= 1:
        return alp, mu, sigma
    idx = alp > thre * alp.max()
    return alp[idx], mu[idx], sigma[idx]


class ConvMixtureDensityNet(nn.Module):
    """Backbone → FC → classic MDN head (net.py:145-171)."""
    dim_out: int = 2
    num_components: int = 20
    fc_features: int = 128
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet34Lite(use_bn=self.use_bn, dtype=self.dtype)(x, train)
        feat = feat.reshape(feat.shape[0], -1)
        feat = nn.leaky_relu(nn.Dense(self.fc_features)(feat), LEAKY_POST)
        return ClassicMixtureDensityModule(self.dim_out,
                                           self.num_components)(feat)


class ConvMultiHypoMixtureDensityFit(nn.Module):
    """Backbone → FC → WTA hypotheses → sampling-MDN fit (net.py:194-226)."""
    dim_out: int = 2
    num_hypos: int = 20
    num_gaus: int = 5
    fc_features: int = 128
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet34Lite(use_bn=self.use_bn, dtype=self.dtype)(x, train)
        feat = feat.reshape(feat.shape[0], -1)
        feat = nn.leaky_relu(nn.Dense(self.fc_features)(feat), LEAKY_POST)
        hypos = nn.Dense(self.dim_out * self.num_hypos)(feat)
        return SamplingMixtureDensityModule(self.dim_out, self.num_hypos,
                                            self.num_gaus)(hypos)


def conv_mixture_density_fit(wta_apply, smdn_module, smdn_variables):
    """Two-stage `ConvMixtureDensityFit` (net.py:174-191): a frozen trained
    WTA net + a trainable sampling-MDN head.  Returns apply(x) -> (α, μ, σ²).
    """
    def apply(wta_variables, x):
        hypos = wta_apply(wta_variables, x)               # (B, K, C)
        flat = hypos.reshape(hypos.shape[0], -1)
        return smdn_module.apply(smdn_variables, flat)
    return apply
