"""Pallas batched-SPD-solve kernel tests (interpreter mode on CPU).

Tile-parallel SPD solve (ops/pallas_spd.py) — the element-per-tile layout
that fixes round 1's lanes-only negative result (that superseded kernel is
archived at docs/negative_results/pallas_linalg_lanes.py).  Interpret mode
on CPU; the TPU timing lives in bench.py (BENCH_LINSOLVE=pallas).
"""
import numpy as np
import jax.numpy as jnp

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
