#!/usr/bin/env python
"""Component-level timing of the batched Newton solve on the current device.

Times, at a given batch size:
  - merit value+grad            (1 per iteration)
  - merit Hessian (jacfwd∘grad) (1 per iteration; dominant flops)
  - 4-candidate damped solves   (jax.scipy vs the Pallas lanes kernel)
  - full solve_batch            (end to end)

Usage: python scripts/profile_solver.py [--batch 1024] [--platform '']
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def jax_block(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration, SolverConfiguration)
    from dyobav_tpu.ops import costs
    from dyobav_tpu.ops.engine import build_mpc_solver
    from dyobav_tpu.ops.params import empty_params, pack, tuning_vector, unpack

    cfg = MpcConfiguration()
    robot = CircularRobotSpecification()
    B = args.batch
    N = cfg.N_hor

    p = empty_params(cfg)
    ref = np.zeros((N, 3), np.float32)
    ref[:, 0] = 1.0 + 0.24 * np.arange(1, N + 1)
    ref[:, 1] = 0.5
    p = p._replace(
        u_prev=jnp.array([1.2, 0.0]), s0=jnp.array([1.0, 0.5, 0.0]),
        sN=jnp.asarray(ref[-1]), q=jnp.asarray(tuning_vector(cfg), jnp.float32),
        ref_states=jnp.asarray(ref), ref_speed=jnp.full((N,), 1.2, jnp.float32),
        q_stc=jnp.full((N,), 10.0, jnp.float32),
        q_dyn=jnp.full((N,), 10.0, jnp.float32))
    z = pack(p)
    Z = jnp.broadcast_to(z, (B, z.shape[0]))
    U = jnp.tile(jnp.asarray(np.tile([1.2, 0.0], N), jnp.float32), (B, 1))

    clo, chi = costs.acceleration_bounds(cfg, robot)

    def merit(u, zz):
        br = costs.evaluate(u, unpack(zz, cfg), cfg, robot)
        alm = br.f1 - jnp.clip(br.f1, clo, chi)
        return br.objective + 5.0 * (jnp.sum(alm * alm) + jnp.sum(br.f2 ** 2))

    vg = jax.jit(jax.vmap(jax.value_and_grad(merit)))
    hess = jax.jit(jax.vmap(jax.jacfwd(jax.grad(merit))))

    t_vg = timeit(lambda: vg(U, Z))
    print(f"value_and_grad  B={B}: {t_vg*1e3:8.2f} ms "
          f"({B/t_vg:,.0f}/s)", flush=True)
    t_h = timeit(lambda: hess(U, Z))
    print(f"hessian         B={B}: {t_h*1e3:8.2f} ms ({B/t_h:,.0f}/s)",
          flush=True)

    from dyobav_tpu.ops import pallas_spd

    H = hess(U, Z) + 10.0 * jnp.eye(40)[None]
    g = vg(U, Z)[1]
    xla_solve = jax.jit(
        lambda A, b: jax.scipy.linalg.cho_solve(
            (jax.lax.linalg.cholesky(A), True), b[..., None])[..., 0])
    t_solve_xla = timeit(lambda: xla_solve(H, g))
    print(f"lin solve (XLA) B={B}: {t_solve_xla*1e3:8.2f} ms", flush=True)
    try:
        pl_solve = jax.jit(pallas_spd.spd_solve)
        t_solve_pl = timeit(lambda: pl_solve(H, g))
        err = float(jnp.max(jnp.abs(pl_solve(H, g) - xla_solve(H, g))))
        print(f"lin solve (Pallas) B={B}: {t_solve_pl*1e3:8.2f} ms "
              f"(max dev {err:.2e})", flush=True)
    except Exception as e:
        print(f"pallas solve failed: {type(e).__name__}: {e}", flush=True)

    scfg = SolverConfiguration(max_inner_iters=12, max_outer_iters=4,
                               inner_iters_later=5)
    bundle = build_mpc_solver(cfg, robot, scfg)
    t_full = timeit(lambda: bundle.solve_batch(Z, U), iters=3)
    print(f"full solve      B={B}: {t_full*1e3:8.2f} ms "
          f"({B/t_full:,.0f} solves/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
