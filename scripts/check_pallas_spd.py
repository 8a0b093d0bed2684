#!/usr/bin/env python
"""On-hardware exactness check of the tile-parallel Pallas SPD kernel.

The kernel is interpreter-exact in tests (tests/test_pallas_spd.py); this
script certifies the MOSAIC-COMPILED kernel on the real chip against XLA's
Cholesky custom call on production-shaped problems (the Newton solve's
(batch, ladder, 40, 40) SPD systems with realistic conditioning), and times
both.

  python scripts/check_pallas_spd.py [--batch 4096] [--n 40] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cond", type=float, default=1e4,
                    help="target condition number (the ALM merit Hessian "
                    "reaches ~1e4-1e6 once the penalty escalates)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from dyobav_tpu.ops.pallas_spd import spd_solve

    B, n = args.batch, args.n
    rng = np.random.default_rng(0)
    # SPD with controlled conditioning: Q diag(lams) Q^T, lams log-uniform.
    qs, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    lams = np.exp(rng.uniform(0.0, np.log(args.cond), (B, n)))
    A = np.einsum("bij,bj,bkj->bik", qs, lams, qs).astype(np.float32)
    g = rng.standard_normal((B, n)).astype(np.float32)
    Aj, gj = jnp.asarray(A), jnp.asarray(g)

    pallas_fn = jax.jit(jax.vmap(spd_solve))
    chol_fn = jax.jit(jax.vmap(
        lambda a, b: jax.scipy.linalg.solve(a, b, assume_a="pos")))

    d_p = np.asarray(pallas_fn(Aj, gj))
    d_c = np.asarray(chol_fn(Aj, gj))

    # Residual-based comparison (the honest metric: both are f32 direct
    # methods, so judge each against A d = g, not against each other).
    def rel_residual(d):
        r = np.einsum("bij,bj->bi", A, d) - g
        return np.linalg.norm(r, axis=1) / np.linalg.norm(g, axis=1)

    res_p, res_c = rel_residual(d_p), rel_residual(d_c)
    dd = np.linalg.norm(d_p - d_c, axis=1) / np.maximum(
        np.linalg.norm(d_c, axis=1), 1e-30)

    def timed(fn):
        fn(Aj, gj).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(Aj, gj)
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    t_p, t_c = timed(pallas_fn), timed(chol_fn)

    print(json.dumps({
        "backend": jax.default_backend(),
        "batch": B, "n": n, "cond": args.cond,
        "pallas_rel_residual_p50": float(np.percentile(res_p, 50)),
        "pallas_rel_residual_max": float(res_p.max()),
        "cholesky_rel_residual_p50": float(np.percentile(res_c, 50)),
        "cholesky_rel_residual_max": float(res_c.max()),
        "solution_rel_diff_p50": float(np.percentile(dd, 50)),
        "solution_rel_diff_max": float(dd.max()),
        "pallas_ms": round(t_p * 1000, 3),
        "cholesky_ms": round(t_c * 1000, 3),
        "speedup": round(t_c / t_p, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
