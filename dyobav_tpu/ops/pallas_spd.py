"""Tile-parallel batched SPD solve (Pallas TPU kernel).

The NMPC Newton step solves thousands of independent 40×40 SPD systems per
iteration (problem batch × LM damping ladder).  XLA's TPU path lowers this
to a "Cholesky" custom call that serializes per matrix — measured at 88% of
total solve wall time (`scripts/trace_solver.py`).  The Newton–Schulz
fallback (`ops.newton.schulz_spd_solve`) already replaces it with batched
matmuls; this kernel goes further: an exact batched Cholesky factor + solve
where EVERY matrix element is one native (8, 128) vector tile holding 1024
batch lanes, so each scalar step of the factorization is a full-width VPU
operation across 1024 problems.

Round-1's negative result (`ops/pallas_linalg.py`: 500× slower) batched in
lanes only and indexed sublanes element-wise, serializing under Mosaic.
The fix is the layout: (block, n, n, 8, 128) — the trailing (8, 128) IS
the batch, matrix indices are leading (untiled) dims, and the trailing
update is expressed as column slabs, never sublane shuffles.

Integration: `spd_solve` is a `jax.custom_batching.custom_vmap` function —
unbatched calls fall back to XLA, and every `vmap` level simply feeds the
batch into the kernel's flattened leading dimension, so the solver's nested
vmaps (LM ladder inside scenario batch) compose without Pallas batching
rules.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE          # 1024 systems per kernel instance

# Tests flip this to run the kernel through the Pallas interpreter on CPU.
_INTERPRET = False


def _kernel_available() -> bool:
    return _INTERPRET or jax.default_backend() == "tpu"


def _spd_kernel(a_ref, g_ref, d_ref, chol_ref, y_ref, *, n: int):
    """One batch block: Cholesky factor + forward/back substitution.

    a_ref: (1, n, n, 8, 128)   SPD matrices, element-per-tile layout
    g_ref: (1, n, 8, 128)      right-hand sides
    d_ref: (1, n, 8, 128)      solutions (output)
    chol_ref: (n, n, 8, 128)   scratch: in-place Cholesky factor
    y_ref: (n, 8, 128)         scratch: substitution vector
    """
    chol_ref[:, :] = a_ref[0]

    # Right-looking Cholesky, column-slab trailing updates.  All indices
    # are static (python-unrolled), every op is a (m, 8, 128) slab op.
    for j in range(n):
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(chol_ref[j, j], 1e-30))
        col = chol_ref[j:, j] * inv_sqrt[None]          # (n-j, 8, 128)
        chol_ref[j:, j] = col
        for k in range(j + 1, n):
            # Update column k, rows k..n-1:  A[i,k] -= L[i,j] * L[k,j]
            chol_ref[k:, k] = chol_ref[k:, k] - col[k - j:] * col[k - j][None]

    # Forward substitution  L y = g.
    y_ref[:] = g_ref[0]
    for j in range(n):
        yj = y_ref[j] / chol_ref[j, j]
        y_ref[j] = yj
        if j + 1 < n:
            y_ref[j + 1:] = y_ref[j + 1:] - chol_ref[j + 1:, j] * yj[None]

    # Back substitution  Lᵀ d = y.
    for j in range(n - 1, -1, -1):
        xj = y_ref[j] / chol_ref[j, j]
        y_ref[j] = xj
        if j > 0:
            y_ref[:j] = y_ref[:j] - chol_ref[j, :j] * xj[None]
    d_ref[0] = y_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spd_solve_blocked(A: jnp.ndarray, g: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, n, n), (B, n) -> (B, n) via the tile-parallel kernel.

    B is padded to a multiple of 1024 (identity systems in the pad lanes).
    """
    B, n = g.shape
    nb = -(-B // _BLOCK)
    pad = nb * _BLOCK - B
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye_pad], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, n), g.dtype)], axis=0)

    # (nb*1024, n, n) -> (nb, n, n, 8, 128): batch into the trailing tile.
    At = A.reshape(nb, _SUB, _LANE, n, n).transpose(0, 3, 4, 1, 2)
    gt = g.reshape(nb, _SUB, _LANE, n).transpose(0, 3, 1, 2)

    dt = pl.pallas_call(
        functools.partial(_spd_kernel, n=n),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n, n, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n, _SUB, _LANE), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, _SUB, _LANE), A.dtype),
            pltpu.VMEM((n, _SUB, _LANE), A.dtype),
        ],
        # Steady-state VMEM = input block (n²·1024·4B ≈ 6.6 MB at n=40)
        # + its double-buffered successor + the chol scratch ≈ 20 MB,
        # over the 16 MB default scoped limit once the grid pipelines
        # (measured: grid 8 = 8192 systems OOMs the default, grid ≤ 4
        # fits).  v5e VMEM is 128 MB; raise the cap so batch size never
        # changes kernel feasibility.
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)),
        interpret=interpret,
    )(At, gt)

    d = dt.transpose(0, 2, 3, 1).reshape(nb * _BLOCK, n)
    return d[:B]


@jax.custom_batching.custom_vmap
def spd_solve(A: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve A d = g for SPD A; any leading batch dims; TPU-kernel backed.

    Unbatched (n, n) calls use XLA's solve; batched calls flatten all
    leading dims into the kernel's 1024-lane blocks.
    """
    if A.ndim == 2:
        return jax.scipy.linalg.solve(A, g, assume_a="pos")
    lead = A.shape[:-2]
    n = A.shape[-1]
    if not _kernel_available():
        # Non-TPU backends (CPU test runs): batched LU via XLA.
        return jnp.linalg.solve(A, g[..., None])[..., 0]
    d = _spd_solve_blocked(A.reshape(-1, n, n), g.reshape(-1, n),
                           interpret=_INTERPRET)
    return d.reshape(*lead, n)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, A, g):
    # Feed every vmap level straight into the kernel's flat batch.  The
    # recursive call re-enters this rule for outer vmap levels, so nested
    # vmaps (LM ladder inside scenario batch) accumulate leading dims.
    a_b, g_b = in_batched
    if not a_b or not g_b:
        # Broadcast the unbatched operand; keeps semantics, rare path.
        if not a_b:
            A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
        if not g_b:
            g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
    return spd_solve(A, g), True
