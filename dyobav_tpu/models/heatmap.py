"""On-device Gaussian heat-map rasterization for predictor inputs.

The reference builds each 7-channel input on the CPU with numpy
(`utils_np.np_gaudist_map`, utils_np.py:76-99, called from
`pre_load.traj_to_input` :119-136 and the dataset __getitem__): five
normalized Gaussian bumps at the past positions (σ=20 px), the grayscale
map channel, and a constant pred-offset channel.

Here the whole stack is a single jitted jnp function, so inference-time
input building happens on-device and batches over horizon offsets — the 20
per-offset inputs differ only in the scalar T channel, so we rasterize the
base 6 channels once and broadcast.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gaussian_map(center_xy: jnp.ndarray, height: int, width: int,
                 sigma: float = 20.0) -> jnp.ndarray:
    """Normalized Gaussian bump image (H, W), peak 1 at `center_xy` (x, y)."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    gx = (x[None, :] - center_xy[0]) ** 2
    gy = (y[:, None] - center_xy[1]) ** 2
    z = jnp.exp(-(gx + gy) / (2.0 * sigma ** 2))
    return z / jnp.maximum(jnp.max(z), 1e-12)


@partial(jax.jit, static_argnames=("obsv_len",))
def traj_to_input_stack(traj: jnp.ndarray, ref_map: jnp.ndarray,
                        offsets: jnp.ndarray, sigma: float = 20.0,
                        obsv_len: int = 5) -> jnp.ndarray:
    """Build the batched input stack for all horizon offsets at once.

    Args:
        traj: (obsv_len, 2) past positions in pixel coords (pre-padded: the
            caller repeats the last point if fewer observations exist,
            mirroring pre_load.traj_to_input:120-122).
        ref_map: (H, W) grayscale map channel.
        offsets: (K,) prediction offsets (1..N_hor).
    Returns:
        (K, H, W, obsv_len + 2) NHWC input batch.
    """
    H, W = ref_map.shape
    heat = jax.vmap(lambda c: gaussian_map(c, H, W, sigma))(traj)  # (L, H, W)
    base = jnp.concatenate([jnp.moveaxis(heat, 0, -1),
                            ref_map[:, :, None].astype(jnp.float32)], axis=-1)
    base = jnp.broadcast_to(base[None], (offsets.shape[0],) + base.shape)
    t_chan = jnp.broadcast_to(
        offsets.astype(jnp.float32)[:, None, None, None],
        (offsets.shape[0], H, W, 1))
    return jnp.concatenate([base, t_chan], axis=-1)


@partial(jax.jit, static_argnames=("obsv_len",))
def traj_to_input_batch(trajs: jnp.ndarray, ref_map: jnp.ndarray,
                        offsets: jnp.ndarray, sigma: float = 20.0,
                        obsv_len: int = 5) -> jnp.ndarray:
    """Training-batch rasterization: B independent (traj, offset) samples
    sharing one map → (B, H, W, obsv_len + 2).

    trajs: (B, obsv_len, 2); offsets: (B,).
    """
    H, W = ref_map.shape

    def one(traj, offset):
        heat = jax.vmap(lambda c: gaussian_map(c, H, W, sigma))(traj)
        base = jnp.concatenate([jnp.moveaxis(heat, 0, -1),
                                ref_map[:, :, None].astype(jnp.float32),
                                jnp.full((H, W, 1), offset, jnp.float32)],
                               axis=-1)
        return base

    return jax.vmap(one)(trajs, offsets.astype(jnp.float32))


def pad_traj(traj, obsv_len: int = 5):
    """Repeat-first / crop-last so exactly `obsv_len` positions remain
    (pre_load.traj_to_input:120-122 semantics: pad with the last point,
    then keep the most recent obsv_len)."""
    traj = list(traj)
    if len(traj) < obsv_len:
        traj = traj + [traj[-1]] * (obsv_len - len(traj))
    return traj[-obsv_len:]
