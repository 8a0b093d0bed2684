"""Pallas TPU kernel: batched small-SPD solve with batch-in-lanes layout.

The Newton inner loop factors thousands of small damped-Hessian systems
(A + λD) d = -g with A of size n=40.  XLA lowers batched `cholesky`/`solve`
on TPU to sequential loops over scalar-ish ops — poor lane utilization.
This kernel transposes the problem: the BATCH dimension lives in the 128
vector lanes, so every scalar step of the textbook Cholesky /
forward-substitution / back-substitution becomes one (128,)-wide VPU op.
One grid program factors 128 systems simultaneously; the n² sequential
steps are Python-unrolled (n is small and static).

Layout: A (B, n, n) → blocks (n, n, 128);  b (B, n) → (n, 128).
Non-multiple batches are padded with identity systems.

`batched_spd_solve` dispatches to the kernel on TPU and to
`jax.scipy.linalg.solve(assume_a="pos")` elsewhere (and under vmap
batching rules the fallback also serves as the reference in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _spd_solve_kernel(a_ref, b_ref, out_ref, *, n: int):
    """Solve A x = b for 128 systems: a_ref (n, n, 128), b_ref (n, 128)."""
    # Load the full blocks once.
    A = a_ref[0]                      # (n, n, L)
    rhs = b_ref[0]                    # (n, L)

    # Cholesky: A = L Lᵀ, unrolled over the static n.
    # L columns collected as rows of a list of (n, L) slabs.
    L_cols = []                       # L_cols[j] : (n, L) column j of L
    for j in range(n):
        # ljj = sqrt(A[j,j] - sum_k<j L[j,k]^2)
        acc = A[j, j]
        for k in range(j):
            acc = acc - L_cols[k][j] * L_cols[k][j]
        acc = jnp.maximum(acc, 1e-20)
        ljj = jnp.sqrt(acc)
        inv_ljj = 1.0 / ljj
        # Column below the diagonal: L[i,j] = (A[i,j] - Σ L[i,k]L[j,k])/ljj
        col = A[:, j]                 # (n, L)
        for k in range(j):
            col = col - L_cols[k] * L_cols[k][j][None, :]
        col = col * inv_ljj
        # Zero the upper part implicitly by never reading it.
        L_cols.append(col)

    # Forward substitution: L y = b.
    y = []
    for i in range(n):
        acc = rhs[i]
        for k in range(i):
            acc = acc - L_cols[k][i] * y[k]
        y.append(acc / L_cols[i][i])

    # Back substitution: Lᵀ x = y.
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L_cols[i][k] * x[k]
        x[i] = acc / L_cols[i][i]

    out_ref[0] = jnp.stack(x, axis=0)


def _pallas_spd_solve(A: jnp.ndarray, b: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """A (B, n, n) SPD, b (B, n) → x (B, n) via the lanes kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = A.shape
    pad = (-B) % LANES
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
    nb = A.shape[0] // LANES
    At = A.reshape(nb, LANES, n, n).transpose(0, 2, 3, 1)   # (nb, n, n, L)
    bt = b.reshape(nb, LANES, n).transpose(0, 2, 1)          # (nb, n, L)

    out = pl.pallas_call(
        functools.partial(_spd_solve_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((nb, n, LANES), A.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n, n, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, bt)
    x = out.transpose(0, 2, 1).reshape(-1, n)
    return x[:B]


def batched_spd_solve(A: jnp.ndarray, b: jnp.ndarray,
                      force_pallas: bool | None = None) -> jnp.ndarray:
    """Batched SPD solve.

    Measured on a v5e chip (B=512, n=40): the XLA batched solve runs in
    ~9 ms while this lanes kernel takes ~4.4 s — the 2400 unrolled
    sublane-indexed vector ops serialize badly under Mosaic.  The kernel is
    kept (correct to ~1e-12) as a documented negative result and a base for
    a future blocked formulation; the default is XLA everywhere.
    """
    use_pallas = bool(force_pallas)
    if use_pallas:
        return _pallas_spd_solve(A, b, interpret=(jax.default_backend() != "tpu"))
    return jax.vmap(lambda a, rhs: jax.scipy.linalg.solve(
        a, rhs, assume_a="pos"))(A, b)
