"""Winner-takes-all meta-loss family and MDN losses (pure jnp).

Re-implements the reference loss zoo
(`pkg_motion_prediction/net_module/loss_functions.py`):
  - `meta_loss` (:6-37): vanilla WTA (min over hypotheses), relaxed WTA,
    and evolving top-k WTA;
  - `ameta_loss` (:39-76): adaptive threshold-based clustering loss;
  - base per-hypothesis losses `loss_mse` / `loss_mae` / `loss_nll`
    (:236-263) — including the reference's 1/B batch-size scaling quirk;
  - Gaussian-mixture utilities `cal_gau_prob`, `loss_nll_mdn` (:190-204),
    `loss_mahalanobis` (:206-224), `loss_central_oracle` (:226-233).

All functions are shape-polymorphic jnp and jit/vmap/grad-safe (top-k uses
`jax.lax.top_k` on negated distances).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- base losses
def loss_mse(data: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(B, M, C) vs (B, M, C) → (B, M); includes the reference's /B scaling
    (loss_functions.py:236-241)."""
    return jnp.sum((data - labels) ** 2, axis=2) / data.shape[0]


def loss_mae(data: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(data - labels), axis=2) / data.shape[0]


def loss_msle(data: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((jnp.log(data) - jnp.log(labels)) ** 2, axis=2) / data.shape[0]


def cal_gau_prob(mu: jnp.ndarray, sigma: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """P(x) per diagonal Gaussian component: (B,M,C),(B,M,C),(B,C) → (B,M)."""
    x = x[:, None, :]
    prob = (jax.lax.rsqrt(jnp.asarray(2.0 * math.pi))
            * jnp.exp(-((x - mu) / sigma) ** 2 / 2) / sigma)
    return jnp.prod(prob, axis=2)


def loss_nll(data: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-hypothesis NLL where data rows are (x, y, sx, sy) (:255-263)."""
    mu, sigma = data[:, :, :2], data[:, :, 2:]
    return -jnp.log(cal_gau_prob(mu, sigma, labels[:, 0, :]) + 1e-6)


# -------------------------------------------------------------- meta losses
def meta_loss(hypos: jnp.ndarray, labels: jnp.ndarray,
              base_loss: Callable = loss_mse, k_top: int = 1,
              relax: float = 0.0) -> jnp.ndarray:
    """WTA meta-loss (loss_functions.py:6-37).

    Args:
        hypos: (B, M, C) hypotheses.  labels: (B, C) ground truth.
        k_top=1, relax=0   → vanilla WTA (min over hypotheses)
        k_top=1, relax>0   → relaxed WTA
        k_top=n>1, relax=0 → evolving WTA (mean of n smallest)
    """
    assert k_top >= 0 and 0 <= relax < 1
    M = hypos.shape[1]
    k_top = min(k_top, M)
    gts = jnp.repeat(labels[:, None, :], M, axis=1)
    D = base_loss(hypos, gts)                      # (B, M)

    if relax == 0.0 and k_top == 1:
        return jnp.mean(jnp.min(D, axis=1))
    if relax > 0.0 and k_top == 1:
        loss = (1 - 2 * relax) * jnp.mean(jnp.min(D, axis=1))
        loss += relax / (M - 1) * jnp.sum(jnp.mean(D, axis=0))
        return loss
    if relax == 0.0 and k_top > 1:
        topk = -jax.lax.top_k(-D, k_top)[0]        # k smallest
        return jnp.mean(jnp.sum(topk, axis=1)) / k_top
    raise ValueError("Unknown meta-loss mode; check relax/k_top.")


def ameta_loss(hypos: jnp.ndarray, labels: jnp.ndarray,
               base_loss: Callable = loss_mse, k_top: int = 1) -> jnp.ndarray:
    """Adaptive meta-loss (loss_functions.py:39-76): hypotheses within 10% of
    the min-max distance band share the gradient."""
    M = hypos.shape[1]
    gts = jnp.repeat(labels[:, None, :], M, axis=1)
    D = base_loss(hypos, gts)

    if k_top > 1:
        topk = -jax.lax.top_k(-D, min(k_top, M))[0]
        return jnp.mean(jnp.sum(topk, axis=1)) / min(k_top, M)

    d_min = jnp.min(D, axis=1)
    d_max = jnp.max(D, axis=1)
    thresh = d_min + 0.1 * (d_max - d_min)
    active = D <= thresh[:, None]
    if k_top == 0:
        D = jnp.tile(d_min[:, None], (1, M))
    return jnp.sum(jnp.mean(D * active, axis=0)) / M


# ------------------------------------------------------------ MDN utilities
def cal_multi_gau_prob(alp, mu, sigma, x):
    return jnp.sum(alp * cal_gau_prob(mu, sigma, x), axis=1)


def loss_nll_mdn(alp, mu, sigma, data):
    """Mixture NLL (loss_functions.py:190-204)."""
    alp = alp / jnp.sum(alp, axis=1, keepdims=True)
    return jnp.mean(-jnp.log(cal_multi_gau_prob(alp, mu, sigma, data)))


def loss_mahalanobis(alp, mu, sigma, data):
    """Weighted Mahalanobis distance (loss_functions.py:206-224)."""
    alp = alp / jnp.sum(alp, axis=1, keepdims=True)
    diff = data[:, None, :] - mu
    md = jnp.sqrt(diff[:, :, 0] ** 2 / sigma[:, :, 0]
                  + diff[:, :, 1] ** 2 / sigma[:, :, 1])
    return md, jnp.sum(md * alp, axis=1)


def loss_central_oracle(mu, data):
    """Best-component squared error (loss_functions.py:226-233)."""
    mse = jnp.sum((mu - data[:, None, :]) ** 2, axis=2)
    return jnp.min(mse, axis=1)


# ------------------------------------------------- manager loss adapters
# `NetworkManager` is net/loss-agnostic (the reference injects a loss dict,
# network_manager.py:21-64); adapters share one signature
# (outputs, labels, k_top, relax) -> scalar so any net/loss pair trains.

def wta_meta_loss(outputs, labels, k_top: int = 1, relax: float = 0.0):
    """Default SWTA objective: evolving/relaxed WTA over (B, M, C) hypos."""
    return meta_loss(outputs, labels, loss_mse, k_top=k_top, relax=relax)


def mdn_nll_loss(outputs, labels, k_top: int = 1, relax: float = 0.0):
    """Classic-MDN objective: mixture NLL; outputs = (α, μ, σ) with σ a
    standard deviation (ClassicMixtureDensityModule)."""
    del k_top, relax
    alp, mu, sigma = outputs
    return loss_nll_mdn(alp, mu, sigma, labels)


def smdn_nll_loss(outputs, labels, k_top: int = 1, relax: float = 0.0):
    """Sampling-MDN objective: mixture NLL; outputs = (α, μ, σ²) with a
    VARIANCE third element (SamplingMixtureDensityModule)."""
    del k_top, relax
    alp, mu, var = outputs
    return loss_nll_mdn(alp, mu, jnp.sqrt(var + 1e-6), labels)


def default_k_top_schedule(num_epochs: int, num_hypos: int) -> list:
    """Evolving-WTA schedule: anneal k from M → 1 over training.

    The reference passes `k_top_list` in from the caller
    (network_manager.py:129, pre_load.main_train); this default reproduces
    the paper's coarse-to-fine recipe.
    """
    if num_epochs <= 1:
        return [1] * num_epochs
    ks = []
    for ep in range(num_epochs):
        frac = ep / (num_epochs - 1)
        k = max(1, int(round(num_hypos * (1.0 - frac) ** 2)))
        ks.append(k)
    return ks
