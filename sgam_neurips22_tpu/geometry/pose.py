"""Pose parameterizations: euler / quaternion / 6-DoF vector -> matrices.

Rebuild of reference sgam/point_rendering/warp.py:72-152 (euler2mat,
quat2mat, pose_vec2mat). Batched, pure jnp.
"""
from __future__ import annotations

import jax.numpy as jnp


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] (rx, ry, rz) radians -> [B, 3, 3], R = Rx @ Ry @ Rz
    (reference warp.py:72-109)."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)

    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1
    ).reshape(-1, 3, 3)

    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1
    ).reshape(-1, 3, 3)

    return xmat @ ymat @ zmat


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] imaginary quaternion coeffs (w recovered for unit norm)
    -> [B, 3, 3] (reference warp.py:112-133)."""
    ones = jnp.ones_like(quat[:, :1])
    q = jnp.concatenate([ones, quat], axis=1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(-1, 3, 3)


def pose_vec2mat(vec: jnp.ndarray, rotation_mode: str = "euler") -> jnp.ndarray:
    """[B, 6] (tx, ty, tz, rx, ry, rz) -> [B, 3, 4]
    (reference warp.py:136-152)."""
    translation = vec[:, :3, None]
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler2mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat2mat(rot)
    else:
        raise ValueError(rotation_mode)
    return jnp.concatenate([rot_mat, translation], axis=2)
