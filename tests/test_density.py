"""Density-estimation utility tests."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.utils.density import (gaussian_kernel, multi_gau_grid,
                                      multi_gau_prob, parzen_density)


def test_parzen_density_orders_points():
    data = jnp.asarray(np.random.default_rng(0).normal(size=(50, 2)),
                       jnp.float32)
    near = float(parzen_density(jnp.array([0.0, 0.0]), data, sigma=1.0))
    far = float(parzen_density(jnp.array([50.0, 50.0]), data, sigma=1.0))
    assert near > far >= 0.0
    batch = parzen_density(jnp.zeros((3, 2)), data, sigma=1.0)
    assert batch.shape == (3,)


def test_multi_gau_prob_unit_gaussian():
    alp = jnp.array([[0.5, 0.5]])
    mu = jnp.zeros((1, 2, 2))
    sigma = jnp.ones((1, 2, 2))
    p = float(multi_gau_prob(alp, mu, sigma, jnp.zeros((1, 2)))[0])
    assert p == pytest.approx(1.0 / (2 * math.pi), rel=1e-5)


def test_multi_gau_grid_floor():
    xx, yy = jnp.meshgrid(jnp.linspace(-3, 3, 21), jnp.linspace(-3, 3, 21))
    alp = jnp.array([[1.0]])
    mu = jnp.zeros((1, 1, 2))
    sigma = jnp.full((1, 1, 2), 0.5)
    grid = multi_gau_grid(alp, mu, sigma, xx, yy)
    assert grid.shape == xx.shape
    assert float(grid[0, 0]) == 0.0          # floored far from the mode
    assert float(grid[10, 10]) > 0.0         # peak at the center
