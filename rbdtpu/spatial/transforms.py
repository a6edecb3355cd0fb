"""Batched spatial & homogeneous transform builders.

TPU-native replacement for the reference's per-joint transform *closures*
(``robot.get_Xmat_Func_by_id(i)`` / ``get_Xmat_hom_Func_by_id`` /
``get_dXmat_hom_Func_by_id`` / ``get_d2Xmat_hom_Func_by_id``; see SURVEY.md §1.1
and call sites like ``RBDReference.py:574,229,294,438``).  Here the robot's joint
geometry lives in stacked tensors (axis, fixed tree transform) and one vectorized
builder produces transforms for *all* joints of *all* batch elements at once.

Conventions:
  - Spatial motion transform ``X`` maps motion vectors from PARENT to CHILD
    coordinates (Featherstone's ``{}^iX_{parent}``): ``X = XJ(q) @ Xtree``.
  - Homogeneous transform ``T`` maps points from CHILD to PARENT coordinates
    (the convention required by the reference's FK chaining,
    ``RBDReference.py:234-241``): ``T = Ttree @ TJ(q)``.
  - ``E`` below always denotes a *coordinate rotation* (E = R^T for the usual
    active rotation R), per Featherstone.

Joint types (integer codes shared with rbdtpu.model):
  0 = revolute (about ``axis``), 1 = prismatic (along ``axis``),
  2 = floating 6-DoF root (translation xyz + rotation rpy), 3 = fixed.
"""
from __future__ import annotations

import jax.numpy as jnp

from .ops import skew

REVOLUTE = 0
PRISMATIC = 1
FLOATING = 2
FIXED = 3


def rot_axis(axis, q):
    """Active rotation matrix about a unit axis (Rodrigues).  (...,3), (...) -> (...,3,3)."""
    k = skew(axis)
    s = jnp.sin(q)[..., None, None]
    c = jnp.cos(q)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    return eye + s * k + (1.0 - c) * (k @ k)


def drot_axis(axis, q):
    """d/dq of rot_axis."""
    k = skew(axis)
    s = jnp.sin(q)[..., None, None]
    c = jnp.cos(q)[..., None, None]
    return c * k + s * (k @ k)


def d2rot_axis(axis, q):
    """d2/dq2 of rot_axis."""
    k = skew(axis)
    s = jnp.sin(q)[..., None, None]
    c = jnp.cos(q)[..., None, None]
    return -s * k + c * (k @ k)


def rpy_to_R(rpy):
    """URDF rpy (roll-pitch-yaw, extrinsic XYZ) to active rotation: R = Rz Ry Rx."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def plux(E, r):
    """Spatial motion transform from coordinate rotation E and origin offset r.

    plux(E, r) = [[E, 0], [-E skew(r), E]]  (Featherstone eq. 2.24-2.27).
    (...,3,3), (...,3) -> (...,6,6).
    """
    zero = jnp.zeros_like(E)
    top = jnp.concatenate([E, zero], axis=-1)
    bot = jnp.concatenate([-E @ skew(r), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def hom(R, p):
    """Homogeneous transform from active rotation R and translation p: (...,4,4)."""
    Rp = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.concatenate(
        [jnp.zeros_like(p), jnp.ones_like(p[..., :1])], axis=-1
    )[..., None, :]
    return jnp.concatenate([Rp, bottom], axis=-2)


def hom_zero_row(R):
    """Homogeneous 'transform' with zero translation row used for derivatives."""
    p = jnp.zeros(R.shape[:-2] + (3,), R.dtype)
    Rp = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), R.dtype)
    return jnp.concatenate([Rp, bottom], axis=-2)


# --------------------------------------------------------------------------- #
# Per-joint transforms (vectorized over joints AND batch).                    #
# --------------------------------------------------------------------------- #

def joint_spatial_x(jtype, axis, Xtree, q):
    """Spatial transform X_i = XJ(q_i) @ Xtree_i for a 1-DoF joint.

    Replaces the reference's closure evaluation ``get_Xmat_Func_by_id(i)(q_i)``
    (``RBDReference.py:574``) with a branch-free builder usable under vmap over
    joints: revolute and prismatic variants are computed and selected with
    ``jnp.where`` (XLA fuses the select; no data-dependent control flow).

    jtype: (...), axis: (...,3), Xtree: (...,6,6), q: (...) -> (...,6,6)
    """
    E = jnp.swapaxes(rot_axis(axis, q), -1, -2)  # coordinate rotation = R^T
    zero3 = jnp.zeros_like(E)
    XJ_rev = jnp.concatenate(
        [jnp.concatenate([E, zero3], -1), jnp.concatenate([zero3, E], -1)], -2
    )
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), E.shape)
    r = axis * q[..., None]
    XJ_pris = jnp.concatenate(
        [jnp.concatenate([eye3, zero3], -1), jnp.concatenate([-skew(r), eye3], -1)],
        -2,
    )
    is_pris = (jtype == PRISMATIC)[..., None, None]
    XJ = jnp.where(is_pris, XJ_pris, XJ_rev)
    return XJ @ Xtree


def joint_hom_T(jtype, axis, Ttree, q):
    """Homogeneous child->parent transform T_i = Ttree_i @ TJ(q_i).

    Replaces ``get_Xmat_hom_Func_by_id(i)`` (``RBDReference.py:229``)."""
    R = rot_axis(axis, q)
    TJ_rev = hom(R, jnp.zeros(R.shape[:-2] + (3,), R.dtype))
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), R.shape)
    TJ_pris = hom(eyeR, axis * q[..., None])
    is_pris = (jtype == PRISMATIC)[..., None, None]
    TJ = jnp.where(is_pris, TJ_pris, TJ_rev)
    return Ttree @ TJ


def joint_hom_dT(jtype, axis, Ttree, q):
    """d/dq of joint_hom_T (replaces ``get_dXmat_hom_Func_by_id``,
    ``RBDReference.py:294``)."""
    dR = drot_axis(axis, q)
    dTJ_rev = hom_zero_row(dR)
    zeroR = jnp.zeros_like(dR)
    dTJ_pris = hom_zero_row(zeroR).at[..., :3, 3].set(axis)
    is_pris = (jtype == PRISMATIC)[..., None, None]
    dTJ = jnp.where(is_pris, dTJ_pris, dTJ_rev)
    return Ttree @ dTJ


def joint_hom_d2T(jtype, axis, Ttree, q):
    """d2/dq2 of joint_hom_T (replaces ``get_d2Xmat_hom_Func_by_id``,
    ``RBDReference.py:438``)."""
    d2R = d2rot_axis(axis, q)
    d2TJ_rev = hom_zero_row(d2R)
    d2TJ_pris = jnp.zeros_like(d2TJ_rev)
    is_pris = (jtype == PRISMATIC)[..., None, None]
    d2TJ = jnp.where(is_pris, d2TJ_pris, d2TJ_rev)
    return Ttree @ d2TJ


def floating_spatial_x(Xtree, q6):
    """Spatial transform for the 6-DoF floating root: q6 = [x, y, z, rx, ry, rz].

    The root pose is Trans(xyz) @ Rot(rpy) relative to the world (the reference
    models the floating base as Px,Py,Pz,Rx,Ry,Rz joints, SURVEY.md §1.1);
    motion transform is world->body: plux(R^T, xyz) @ Xtree.
    """
    R = rpy_to_R(q6[..., 3:6])
    E = jnp.swapaxes(R, -1, -2)
    return plux(E, q6[..., 0:3]) @ Xtree


def floating_hom_T(Ttree, q6):
    """Homogeneous body->world transform for the floating root."""
    R = rpy_to_R(q6[..., 3:6])
    return Ttree @ hom(R, q6[..., 0:3])


def floating_quat_spatial_x(Xtree, q7):
    """Spatial transform for the QUATERNION floating root:
    q7 = [x, y, z, qw, qx, qy, qz] (position + wxyz unit quaternion).

    The singularity-free root parameterization (SURVEY.md §7 hard parts; the
    reference's rpy root is singular at pitch = +-pi/2).  Motion transform is
    world->body: plux(R^T, xyz) @ Xtree.
    """
    from .quat import quat_to_R

    R = quat_to_R(q7[..., 3:7])
    E = jnp.swapaxes(R, -1, -2)
    return plux(E, q7[..., 0:3]) @ Xtree


def floating_quat_hom_T(Ttree, q7):
    """Homogeneous body->world transform for the quaternion floating root."""
    from .quat import quat_to_R

    R = quat_to_R(q7[..., 3:7])
    return Ttree @ hom(R, q7[..., 0:3])
