"""Cluster-Gaussian-Fit (CGF) post-processing of WTA hypotheses.

The reference clusters the 20 predicted hypotheses per horizon step with
sklearn DBSCAN (eps=1, min_samples=2) and fits an axis-aligned Gaussian per
cluster (`utils_test.fit_DBSCAN`/`fit_cluster2gaussian`, utils_test.py:133-151,
invoked at main_base.py:201-207).

With min_samples=2, DBSCAN degenerates exactly to: connected components of
the eps-adjacency graph, discarding singleton components as noise.  That is
a few small matrix ops — so the on-device version (`cluster_gaussian_fit`)
computes the transitive closure of the adjacency matrix with log2(n) boolean
matmul squarings and masked segment statistics, producing fixed-size padded
(μ, σ, alpha) tensors that flow straight into the MPC parameter assembly
without leaving the device.  `fit_dbscan_np` is the host-side exact mirror
used for parity tests.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fit_dbscan_np(data: np.ndarray, eps: float, min_sample: int
                  ) -> List[np.ndarray]:
    """Host-side DBSCAN for min_sample<=2 semantics: eps-graph components,
    singletons dropped.  Matches sklearn on the CGF workload."""
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[0]
    if n == 0:
        return []
    d2 = np.sum((data[:, None] - data[None]) ** 2, axis=-1)
    adj = d2 <= eps * eps
    labels = -np.ones(n, dtype=int)
    current = 0
    for i in range(n):
        if labels[i] >= 0:
            continue
        # BFS over the eps graph.
        stack, comp = [i], [i]
        labels[i] = current
        while stack:
            j = stack.pop()
            for k in np.where(adj[j])[0]:
                if labels[k] < 0:
                    labels[k] = current
                    stack.append(k)
                    comp.append(k)
        current += 1
    clusters = []
    for c in range(current):
        members = np.where(labels == c)[0]
        if members.size >= min_sample:
            clusters.append(data[members])
    return clusters


def fit_cluster2gaussian(clusters: List[np.ndarray], enlarge: float = 1.0,
                         extra_margin: float = 0.0
                         ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Per-cluster mean and (enlarged) std (utils_test.py:145-151)."""
    mu_list, std_list = [], []
    for cluster in clusters:
        mu_list.append(np.mean(cluster, axis=0))
        std_list.append(np.std(cluster, axis=0) * enlarge + extra_margin)
    return mu_list, std_list


@partial(jax.jit, static_argnames=("max_clusters",))
def cluster_gaussian_fit(points: jnp.ndarray, eps: float = 1.0,
                         enlarge: float = 2.0, extra_margin: float = 0.0,
                         max_clusters: int = 8
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device CGF for one step's hypothesis set.

    Args:
        points: (n, 2) hypotheses (n static, typically 20).
    Returns:
        mu:    (max_clusters, 2) cluster means (zeros when inactive)
        std:   (max_clusters, 2) enlarged stds (zeros when inactive)
        alpha: (max_clusters,) 1.0 for active clusters else 0.0
    Clusters are ordered by their smallest member index (deterministic).
    """
    n = points.shape[0]
    d2 = jnp.sum((points[:, None] - points[None]) ** 2, axis=-1)
    adj = d2 <= eps * eps                                  # (n, n) bool, refl.

    # Transitive closure by repeated boolean squaring: ceil(log2(n)) rounds.
    reach = adj
    n_rounds = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for _ in range(n_rounds):
        hop = (reach.astype(jnp.float32) @ reach.astype(jnp.float32)) > 0
        reach = reach | hop

    # Component label = smallest reachable index.
    idx = jnp.arange(n)
    label = jnp.min(jnp.where(reach, idx[None, :], n), axis=1)  # (n,)
    comp_size = jnp.sum(label[:, None] == label[None, :], axis=1)
    valid_pt = comp_size >= 2                              # singleton = noise

    # Roots (label == own index, valid), ranked by index into cluster slots.
    is_root = (label == idx) & valid_pt
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1        # root order
    slot_of_point = jnp.where(is_root, rank, -1)
    # Every point inherits its root's slot.
    root_slot = slot_of_point[label]                        # (n,)

    slots = jnp.arange(max_clusters)
    member = (root_slot[None, :] == slots[:, None]) & valid_pt[None, :]
    count = jnp.sum(member, axis=1)
    alpha = (count > 0).astype(points.dtype)
    safe = jnp.maximum(count, 1).astype(points.dtype)

    mu = (member.astype(points.dtype) @ points) / safe[:, None]
    sq = (member.astype(points.dtype) @ (points * points)) / safe[:, None]
    var = jnp.maximum(sq - mu * mu, 0.0)
    std = jnp.sqrt(var) * enlarge + extra_margin
    mu = mu * alpha[:, None]
    std = std * alpha[:, None]
    return mu, std, alpha


@partial(jax.jit, static_argnames=("max_clusters",))
def cluster_gaussian_fit_horizon(points_t: jnp.ndarray, eps: float = 1.0,
                                 enlarge: float = 2.0,
                                 extra_margin: float = 0.0,
                                 max_clusters: int = 8):
    """vmap of `cluster_gaussian_fit` over the horizon axis.

    points_t: (T, n, 2) hypotheses per horizon step →
    (T, max_clusters, 2/2/·) padded Gaussian params.
    """
    return jax.vmap(lambda p: cluster_gaussian_fit(
        p, eps=eps, enlarge=enlarge, extra_margin=extra_margin,
        max_clusters=max_clusters))(points_t)
