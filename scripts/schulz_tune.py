#!/usr/bin/env python
"""One-off: tune the Newton–Schulz SPD solve on real hardware.

Benches the chord-profile batched solve end-to-end under several Schulz
variants (iteration count / symmetrization cadence / bf16 matmuls) and
reports throughput plus control deviation vs the Cholesky reference on the
same problems.  Findings feed ops/newton.schulz_spd_solve defaults.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dyobav_tpu.configs import SolverConfiguration
    from dyobav_tpu.ops import newton
    from dyobav_tpu.ops.engine import build_mpc_solver
    from tests.test_newton_fused import CFG, ROBOT, _problem

    batch = int(os.environ.get("TUNE_BATCH", "1024"))
    iters_timed = int(os.environ.get("TUNE_ITERS", "5"))

    Z = jnp.stack([_problem(seed) for seed in range(batch)][:batch]) \
        if batch <= 64 else None
    if Z is None:
        # Large batch: tile 64 base problems.
        base = np.stack([np.asarray(_problem(s)) for s in range(64)])
        Z = jnp.asarray(np.tile(base, (batch // 64, 1)))
    U0 = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], CFG.N_hor), jnp.float32),
                  (batch, 1))

    base_cfg = dict(max_inner_iters=3, max_outer_iters=2, inner_iters_later=2,
                    newton_substeps=2, initial_penalty=1250.0)

    def bench(name, scfg, ref_u=None):
        bundle = build_mpc_solver(CFG, ROBOT, SolverConfiguration(**scfg))
        sol = bundle.solve_batch(Z, U0)
        sol.u.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters_timed):
            sol = bundle.solve_batch(Z, U0)
        sol.u.block_until_ready()
        dt = time.perf_counter() - t0
        out = {
            "variant": name,
            "solves_per_s": round(batch * iters_timed / dt, 1),
            "exit_ok": round(float(np.mean(np.asarray(sol.exit_ok))), 3),
        }
        if ref_u is not None:
            out["dev_vs_cholesky"] = float(
                np.max(np.abs(np.asarray(sol.u) - ref_u)))
        print(json.dumps(out), flush=True)
        return np.asarray(sol.u)

    ref_u = bench("cholesky", dict(linear_solver="cholesky", **base_cfg))

    orig = newton.schulz_spd_solve

    def make_variant(sym_every: int, bf16_until: int):
        def schulz(A, g, iters):
            n = A.shape[-1]
            eye_n = jnp.eye(n, dtype=A.dtype)
            lam = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)
            X = eye_n / lam[..., None, None]
            for k in range(iters):
                if k < bf16_until:
                    Ab = A.astype(jnp.bfloat16)
                    Xb = X.astype(jnp.bfloat16)
                    AX = jax.lax.dot_general(
                        Ab, Xb, (((Ab.ndim - 1,), (Xb.ndim - 2,)), ((), ())),
                        preferred_element_type=jnp.float32) \
                        if A.ndim == 2 else (Ab @ Xb).astype(jnp.float32)
                else:
                    AX = A @ X
                X = X @ (2.0 * eye_n - AX)
                if sym_every and (k + 1) % sym_every == 0:
                    X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
            return jnp.einsum("...ij,...j->...i", X, g)
        return schulz

    variants = [
        ("schulz16_sym1", 16, 1, 0),
        ("schulz16_nosym", 16, 0, 0),
        ("schulz12_sym4", 12, 4, 0),
        ("schulz10_nosym", 10, 0, 0),
        ("schulz16_bf16x12", 16, 4, 12),
    ]
    for name, iters, sym_every, bf16_until in variants:
        newton.schulz_spd_solve = lambda A, g, it, _v=make_variant(
            sym_every, bf16_until), _i=iters: _v(A, g, _i)
        bench(name, dict(linear_solver="schulz", schulz_iters=iters,
                         **base_cfg), ref_u)
    newton.schulz_spd_solve = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
