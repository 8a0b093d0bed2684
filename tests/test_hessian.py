"""Structured merit Hessian vs forward-over-reverse AD (ops.newton).

The structured assembly (`make_structured_hessian`) must produce the SAME
matrix as jacfwd(grad(merit)) — it is an exact-Hessian reformulation, not an
approximation — and the solver built on it must reproduce the jacfwd
solver's controls.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyobav_tpu.configs import (CircularRobotSpecification, MpcConfiguration,
                                SolverConfiguration)
from dyobav_tpu.ops import costs
from dyobav_tpu.ops.engine import build_mpc_solver
from dyobav_tpu.ops.newton import make_structured_hessian
from dyobav_tpu.ops.params import empty_params, pack, tuning_vector, unpack

CFG = MpcConfiguration()
ROBOT = CircularRobotSpecification()


def _problem(seed: int):
    rng = np.random.default_rng(seed)
    N = CFG.N_hor
    p = empty_params(CFG)
    x0, y0 = rng.uniform(-5, 5, 2)
    heading = rng.uniform(-np.pi, np.pi)
    ref = np.zeros((N, 3), np.float32)
    ref[:, 0] = x0 + np.cos(heading) * 0.24 * np.arange(1, N + 1)
    ref[:, 1] = y0 + np.sin(heading) * 0.24 * np.arange(1, N + 1)
    ref[:, 2] = heading
    ell = np.zeros((CFG.Ndynobs, N + 1, CFG.ndynobs), np.float32)
    ox = x0 + np.cos(heading) * 2.2 - np.sin(heading) * 0.3
    oy = y0 + np.sin(heading) * 2.2 + np.cos(heading) * 0.3
    ell[0, :, :] = [ox, oy, 0.4, 0.4, 0.0, 1.0]
    p = p._replace(
        u_prev=jnp.array([1.2, 0.0]),
        s0=jnp.array([x0, y0, heading], jnp.float32),
        sN=jnp.asarray(ref[-1], jnp.float32),
        q=jnp.asarray(tuning_vector(CFG), jnp.float32),
        ref_states=jnp.asarray(ref),
        ref_speed=jnp.full((N,), 1.2, jnp.float32),
        dyn_obs=jnp.asarray(ell),
        q_stc=jnp.full((N,), 10.0, jnp.float32),
        q_dyn=jnp.full((N,), 10.0, jnp.float32),
    )
    return jnp.asarray(np.asarray(pack(p)))


def _merit_pieces(z):
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
    return merit_fn, split, proj_rect, c_lo


def test_structured_hessian_matches_jacfwd():
    n = CFG.nu * CFG.N_hor
    for seed in range(3):
        z = _problem(seed)
        merit_fn, split, proj_rect, c_lo = _merit_pieces(z)
        hessians = {
            "structured": jax.jit(make_structured_hessian(split, proj_rect)),
            "block": jax.jit(make_structured_hessian(split, proj_rect,
                                                     "block")),
        }
        hess_jacfwd = jax.jit(jax.jacfwd(jax.grad(merit_fn)))

        rng = np.random.default_rng(100 + seed)
        u = jnp.asarray(
            np.tile([1.2, 0.0], CFG.N_hor).astype(np.float32)
            + rng.normal(0, 0.1, n).astype(np.float32))
        y = jnp.asarray(rng.normal(0, 1.0, c_lo.shape[0]).astype(np.float32))
        for c in (10.0, 1250.0):
            Hj = np.asarray(hess_jacfwd(u, y, jnp.float32(c)))
            scale = max(np.abs(Hj).max(), 1.0)
            for name, hess in hessians.items():
                Hs = np.asarray(hess(u, y, jnp.float32(c)))
                # Same matrix up to f32 accumulation-order noise; penalty
                # terms reach curvature ~1e6, so tolerance is scale-aware.
                np.testing.assert_allclose(
                    Hs, Hj, rtol=5e-4, atol=5e-5 * scale,
                    err_msg=f"{name} c={c}")


def test_structured_solver_matches_jacfwd_solver():
    base = dict(max_inner_iters=6, max_outer_iters=3, inner_iters_later=3,
                newton_substeps=2, initial_penalty=10.0, cold_profile=None)
    b_jacfwd = build_mpc_solver(
        CFG, ROBOT, SolverConfiguration(hessian_mode="jacfwd", **base))
    for mode in ("structured", "block"):
        b_mode = build_mpc_solver(
            CFG, ROBOT, SolverConfiguration(hessian_mode=mode, **base))
        u0 = jnp.tile(jnp.array([1.2, 0.0], jnp.float32), CFG.N_hor)
        for seed in range(3):
            z = _problem(seed)
            a = b_mode.solve(z, u0)
            b = b_jacfwd.solve(z, u0)
            # Identical Hessians (to f32 noise) → same LM trajectory;
            # controls agree well below the 1e-3 fidelity target.
            np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                                       atol=5e-3, err_msg=mode)
            np.testing.assert_allclose(float(a.cost), float(b.cost),
                                       rtol=1e-3, atol=1e-4, err_msg=mode)
