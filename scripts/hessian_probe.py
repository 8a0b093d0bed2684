#!/usr/bin/env python
"""Time the solver's per-iteration components on the current backend:
merit eval, merit grad, and the merit Hessian in each implementation
(jacfwd vs structured) at bench batch sizes — the direct evidence behind
the Hessian-optimization work (VERDICT r4 #2 / ROADMAP #28).

    python scripts/hessian_probe.py --batch 1024
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dyobav_tpu.configs import (CircularRobotSpecification,
                                    MpcConfiguration)
    from dyobav_tpu.ops import costs
    from dyobav_tpu.ops.newton import make_structured_hessian
    from dyobav_tpu.ops.params import empty_params, pack, tuning_vector, unpack

    CFG = MpcConfiguration()
    ROBOT = CircularRobotSpecification()
    N = CFG.N_hor

    p0 = empty_params(CFG)
    ref = np.zeros((N, 3), np.float32)
    ref[:, 0] = 0.24 * np.arange(1, N + 1)
    ell = np.zeros((CFG.Ndynobs, N + 1, CFG.ndynobs), np.float32)
    ell[0, :, :] = [2.2, 0.3, 0.4, 0.4, 0.0, 1.0]
    p0 = p0._replace(
        u_prev=jnp.array([1.2, 0.0]), s0=jnp.zeros(3),
        sN=jnp.asarray(ref[-1]),
        q=jnp.asarray(tuning_vector(CFG), jnp.float32),
        ref_states=jnp.asarray(ref),
        ref_speed=jnp.full((N,), 1.2, jnp.float32),
        dyn_obs=jnp.asarray(ell),
        q_stc=jnp.full((N,), 10.0, jnp.float32),
        q_dyn=jnp.full((N,), 10.0, jnp.float32))
    z = jnp.asarray(np.asarray(pack(p0)))
    p = unpack(z, CFG)
    c_lo, c_hi = costs.acceleration_bounds(CFG, ROBOT)

    def proj_rect(x):
        return jnp.clip(x, c_lo, c_hi)

    def merit_fn(u, y, c):
        br = costs.evaluate(u, p, CFG, ROBOT)
        shifted = br.f1 + y / c
        alm = shifted - proj_rect(shifted)
        return br.objective + 0.5 * c * (jnp.sum(alm * alm)
                                         + jnp.sum(br.f2 * br.f2))

    split = costs.split_objective(p, CFG, ROBOT)
    B = args.batch
    rng = np.random.default_rng(0)
    U = jnp.asarray(np.tile(np.tile([1.2, 0.0], N), (B, 1)).astype(np.float32)
                    + rng.normal(0, 0.1, (B, 2 * N)).astype(np.float32))
    y = jnp.zeros(c_lo.shape[0])
    c = jnp.float32(1250.0)

    fns = {
        "merit": jax.jit(jax.vmap(lambda u: merit_fn(u, y, c))),
        "grad": jax.jit(jax.vmap(lambda u: jax.grad(merit_fn)(u, y, c))),
        "hess_jacfwd": jax.jit(jax.vmap(
            lambda u: jax.jacfwd(jax.grad(merit_fn))(u, y, c))),
        "hess_structured": jax.jit(jax.vmap(
            lambda u: make_structured_hessian(split, proj_rect)(u, y, c))),
        "hess_block": jax.jit(jax.vmap(
            lambda u: make_structured_hessian(split, proj_rect,
                                              "block")(u, y, c))),
    }
    out = {"batch": B, "platform": jax.devices()[0].platform}
    for name, f in fns.items():
        r = f(U)
        jax.tree.leaves(r)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(U)
        jax.tree.leaves(r)[0].block_until_ready()
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        out[f"{name}_ms"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms / batch {B}", file=sys.stderr)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
