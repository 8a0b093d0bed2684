"""Pallas batched-SPD-solve kernel tests (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dyobav_tpu.ops.pallas_linalg import batched_spd_solve


def _spd_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", M, M) + 3 * np.eye(n, dtype=np.float32)
    b = rng.normal(size=(B, n)).astype(np.float32)
    return A, b


@pytest.mark.parametrize("B", [8, 128, 200])
def test_pallas_solve_matches_numpy(B):
    n = 40
    A, b = _spd_batch(B, n)
    x_ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
    x = np.asarray(batched_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                     force_pallas=True))
    assert x.shape == (B, n)
    rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert rel < 1e-4, rel


def test_fallback_matches_numpy():
    A, b = _spd_batch(16, 12, seed=1)
    x_ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(16)])
    x = np.asarray(batched_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                     force_pallas=False))
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=1e-4)
