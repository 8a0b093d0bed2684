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


# ---------------------------------------------------------------------------
# Tile-parallel SPD solve (ops/pallas_spd.py) — the element-per-tile layout
# that fixes round 1's lanes-only negative result.  Interpret mode on CPU;
# the TPU timing lives in bench.py (BENCH_LINSOLVE=pallas).
# ---------------------------------------------------------------------------

def _spd(B, n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    A = (M @ M.transpose(0, 2, 1) + 3 * np.eye(n)).astype(np.float32)
    g = rng.normal(size=(B, n)).astype(np.float32)
    return A, g


def test_pallas_spd_solve_interpret_exact():
    from dyobav_tpu.ops import pallas_spd
    old = pallas_spd._INTERPRET
    pallas_spd._INTERPRET = True
    try:
        A, g = _spd(40, 12)
        x_ref = np.stack([np.linalg.solve(A[i], g[i]) for i in range(40)])
        x = np.asarray(pallas_spd.spd_solve(jnp.asarray(A), jnp.asarray(g)))
        rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
        assert rel < 1e-5, rel
    finally:
        pallas_spd._INTERPRET = old


def test_pallas_spd_solve_nested_vmap():
    import jax
    """The solver calls spd_solve per-problem under vmap(ladder) inside
    vmap(batch); the custom_vmap rule must flatten both levels into the
    kernel's batch dimension."""
    from dyobav_tpu.ops import pallas_spd
    old = pallas_spd._INTERPRET
    pallas_spd._INTERPRET = True
    try:
        A, g = _spd(40, 12, seed=1)
        x_ref = np.stack([np.linalg.solve(A[i], g[i]) for i in range(40)])
        A2 = jnp.asarray(A.reshape(8, 5, 12, 12))
        g2 = jnp.asarray(g.reshape(8, 5, 12))
        f = jax.vmap(jax.vmap(pallas_spd.spd_solve))
        x = np.asarray(f(A2, g2)).reshape(40, 12)
        rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
        assert rel < 1e-5, rel
    finally:
        pallas_spd._INTERPRET = old


def test_pallas_spd_cpu_fallback_in_solver():
    """linear_solver='pallas' on a CPU backend routes to the batched-LU
    fallback, so the same SolverConfiguration runs everywhere."""
    from dyobav_tpu.ops import pallas_spd
    A, g = _spd(16, 12, seed=2)
    x_ref = np.stack([np.linalg.solve(A[i], g[i]) for i in range(16)])
    x = np.asarray(pallas_spd.spd_solve(jnp.asarray(A), jnp.asarray(g)))
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=1e-4)
