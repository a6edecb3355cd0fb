"""Unit-quaternion algebra for the quaternion floating-base root.

The reference parameterizes its floating base with Euler angles
(Px,Py,Pz,Rx,Ry,Rz "six joints", RBDReference.py:634-638), which is singular
at pitch = +-pi/2; SURVEY.md §7 calls for a quaternion root (nq != nv) as the
TPU-first design.  This module provides the closed-form batched primitives:
all ops are elementwise/small-matmul (VPU-friendly), vmap-closed, and free of
data-dependent control flow (singularity-free small-angle branches use
jnp.where on Taylor fallbacks, which XLA fuses).

Convention: quaternions are (..., 4) arrays in **wxyz** order, Hamilton
product, unit norm, acting as ACTIVE rotations: R(q) rotates body-frame
vectors into the parent/world frame.  Tangent vectors are body-frame rotation
vectors phi (radians, axis*angle): retraction q' = q (x) exp(phi/2).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-12  # squared-angle threshold for the Taylor branches


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    """Hamilton product a (x) b: (..., 4), (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_to_R(q):
    """Active rotation matrix of a UNIT quaternion: (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_exp(phi):
    """Rotation vector -> unit quaternion: q = [cos(|phi|/2), sin(|phi|/2) n].

    Singularity-free at phi = 0 via the sinc Taylor branch (jnp.where on both
    computed values — no control flow, safe under AD because the fallback is
    exact at the switch point).
    """
    n2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _EPS2))
    half = 0.5 * n
    small = n2 < _EPS2
    w = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(half))
    s = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / n)
    return jnp.concatenate([w, s * phi], axis=-1)


def quat_log(q):
    """Unit quaternion -> rotation vector (inverse of quat_exp), (..., 4) ->
    (..., 3).  Returns the MINIMAL rotation (angle in [0, pi]) by sign-fixing
    the scalar part."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _EPS2))
    angle = 2.0 * jnp.arctan2(n, w)
    small = n2 < _EPS2
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / n)
    return scale * v


def quat_from_rpy(rpy):
    """URDF extrinsic-XYZ rpy -> quaternion (for converting rpy-root states)."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def so3_right_jacobian_inv(phi):
    """Inverse right Jacobian Jr(phi)^-1 of SO(3): d/dt log(exp(phi) exp(t b))
    = Jr(phi)^-1 b.  Jr^-1 = I + phi^/2 + c phi^^2 with
    c = 1/|phi|^2 - (1 + cos)/(2 |phi| sin); Taylor branch at 0.  Used for the
    exact tangent gradient of log-based tracking costs (solver/costs.py)."""
    from .ops import skew

    n2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    n = jnp.sqrt(jnp.maximum(n2, _EPS2))
    small = n2 < _EPS2
    s = jnp.sin(n)
    c = jnp.where(
        small,
        1.0 / 12.0 + n2 / 720.0,
        1.0 / n2 - (1.0 + jnp.cos(n)) / (2.0 * n * jnp.maximum(s, _EPS2)),
    )
    K = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + 0.5 * K + c * (K @ K)


def so3_right_jacobian(phi):
    """Right Jacobian Jr(phi) of SO(3): d/dt log(exp(phi)^-1 exp(phi + t b))
    = Jr(phi) b.  Jr = I - c1 phi^ + c2 phi^^2 with c1 = (1-cos)/|phi|^2,
    c2 = (|phi|-sin)/|phi|^3; Taylor branches at 0.  (..., 3) -> (..., 3, 3).
    Used by the tangent-space step Jacobians (solver/integrate.py)."""
    from .ops import skew

    n2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    n = jnp.sqrt(jnp.maximum(n2, _EPS2))
    small = n2 < _EPS2
    c1 = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / n2)
    c2 = jnp.where(small, 1.0 / 6.0 - n2 / 120.0, (n - jnp.sin(n)) / (n2 * n))
    K = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - c1 * K + c2 * (K @ K)
