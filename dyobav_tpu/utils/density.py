"""Density-estimation utilities for evaluating multimodal predictions.

Mirrors the evaluation helpers in the reference's `src/utils_test.py`:
Gaussian kernel + Parzen-window density (:16-30), per-component Gaussian
probabilities and mixture evaluation (:43-77) — as vectorized jnp usable on
batches of hypotheses.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def gaussian_kernel(x: jnp.ndarray, mu=None, sigma: float = 0.05) -> jnp.ndarray:
    """Isotropic 2-D Gaussian kernel value(s) at x (..., 2)."""
    x = jnp.asarray(x, jnp.float32)
    if mu is not None:
        x = x - jnp.asarray(mu, jnp.float32)
    det = sigma * sigma
    quad = jnp.sum(x * x, axis=-1) / sigma
    return jnp.exp(-quad / 2.0) / (2.0 * math.pi * math.sqrt(det))


def parzen_density(x: jnp.ndarray, data: jnp.ndarray,
                   bandwidth: float = 1.0, sigma: float = 0.05) -> jnp.ndarray:
    """Parzen-window density estimate of `data` (n, 2) at points x (..., 2)."""
    x = jnp.asarray(x, jnp.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    diff = (flat[:, None, :] - data[None, :, :]) / bandwidth
    k = gaussian_kernel(diff, sigma=sigma)
    return (jnp.mean(k, axis=-1) / bandwidth).reshape(lead)


def gau_prob(mu: jnp.ndarray, sigma: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-component diagonal-Gaussian probability: (B,G,C),(B,G,C),(B,C)→(B,G)."""
    x = x[:, None, :]
    p = (jnp.exp(-((x - mu) / sigma) ** 2 / 2)
         / (sigma * math.sqrt(2.0 * math.pi)))
    return jnp.prod(p, axis=2)


def multi_gau_prob(alp, mu, sigma, x) -> jnp.ndarray:
    """Mixture probability at x: weights (B,G) → (B,)."""
    return jnp.sum(alp * gau_prob(mu, sigma, x), axis=1)


def multi_gau_grid(alp, mu, sigma, xx: jnp.ndarray, yy: jnp.ndarray,
                   floor_ratio: float = 0.1) -> jnp.ndarray:
    """Mixture density over a meshgrid, floored at `floor_ratio`·max
    (utils_test.cal_multiGauProbDistr semantics)."""
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)
    p = multi_gau_prob(alp, mu, sigma, pts)
    p = jnp.where(p < jnp.max(p) * floor_ratio, 0.0, p)
    return p.reshape(xx.shape)
