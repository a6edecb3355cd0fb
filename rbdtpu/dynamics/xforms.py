"""Per-joint transform computation shared by all dynamics algorithms.

Replaces the reference's per-body closure evaluations inside every pass
(``Xmat = robot.get_Xmat_Func_by_id(i)(q_i)`` at ``RBDReference.py:574,617,718``)
with ONE vectorized builder: all NB joint transforms are computed in a single
batched tensor op (the q-gather + Rodrigues + compose pipeline), which XLA maps
onto the VPU/MXU across bodies x batch (SURVEY.md §7 key idiom #1).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.transforms import (
    PRISMATIC,
    floating_spatial_x,
    floating_hom_T,
    floating_quat_spatial_x,
    floating_quat_hom_T,
    joint_hom_T,
    rot_axis,
)
from ..spatial.ops import skew
from ..spatial.batched import mm


def q_per_joint(model: RobotModel, q):
    """Gather the scalar coordinate of each 1-DoF joint: (..., nq) -> (..., NB).

    For a floating base the root slot is filled with 0 (it is handled separately);
    joint i>0 reads q[..., i+5] (the reference's `matrix_ind = ind + 5` shift,
    ``RBDReference.py:634-638`` — here applied once, in the model layer) or
    q[..., i+6] for a quaternion root (7 root coordinates).
    """
    if model.floating_base:
        off = 6 if model.root_quat else 5
        idx = jnp.array([0] + [i + off for i in range(1, model.nb)])
        qj = q[..., idx]
        return qj.at[..., 0].set(0.0)
    return q


def _joint_x_single(jtype: int, axis, Xtree, q):
    """Spatial transform of ONE joint with STATIC type dispatch: the joint type
    is a compile-time constant (model.joint_type is a static tuple), so only
    the needed variant is built — no traced select (unlike the generic
    ``joint_spatial_x``, which computes both and jnp.where-selects)."""
    if jtype == PRISMATIC:
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=Xtree.dtype), q.shape + (3, 3))
        zero3 = jnp.zeros_like(eye3)
        r = axis * q[..., None]
        XJ = jnp.concatenate(
            [
                jnp.concatenate([eye3, zero3], -1),
                jnp.concatenate([-skew(r), eye3], -1),
            ],
            -2,
        )
    else:
        E = jnp.swapaxes(rot_axis(axis, q), -1, -2)
        zero3 = jnp.zeros_like(E)
        XJ = jnp.concatenate(
            [jnp.concatenate([E, zero3], -1), jnp.concatenate([zero3, E], -1)],
            -2,
        )
    return mm(XJ, Xtree)


def joint_transforms_list(model: RobotModel, q):
    """Per-body spatial transforms as a LIST of (..., 6, 6) arrays.

    The hot-path form: no (NB, 6, 6) stack (stack + per-body slicing costs
    layout copies on TPU), and per-joint static type dispatch.  Replaces the
    reference's closure evaluations (``RBDReference.py:574``)."""
    qj = q_per_joint(model, q)
    out = []
    for i in range(model.nb):
        if model.floating_base and i == 0:
            if model.root_quat:
                out.append(
                    floating_quat_spatial_x(model.Xtree[0], q[..., 0:7])
                )
            else:
                out.append(floating_spatial_x(model.Xtree[0], q[..., 0:6]))
        else:
            out.append(
                _joint_x_single(
                    model.joint_type[i], model.axis[i], model.Xtree[i],
                    qj[..., i],
                )
            )
    return out


def joint_transforms(model: RobotModel, q):
    """All parent->child spatial motion transforms Xup: (..., nq) -> (..., NB, 6, 6)."""
    return jnp.stack(joint_transforms_list(model, q), axis=-3)


def joint_transforms_hom(model: RobotModel, q):
    """All child->parent homogeneous transforms T: (..., nq) -> (..., NB, 4, 4)."""
    qj = q_per_joint(model, q)
    jtype = jnp.array(model.joint_type)
    T = joint_hom_T(jtype, model.axis, model.Ttree, qj)
    if model.floating_base:
        if model.root_quat:
            T0 = floating_quat_hom_T(model.Ttree[0], q[..., 0:7])
        else:
            T0 = floating_hom_T(model.Ttree[0], q[..., 0:6])
        T = T.at[..., 0, :, :].set(T0)
    return T


def x_force_inv_T(X):
    """Force-coordinate transform X^{-T} from a motion transform X, computed
    structurally (no linear solve): for X = [[E, 0], [-E rx, E]],
    X^{-T} = [[E, -E rx], [0, E]] — a block rearrangement.

    Used by the corrected external-force application (the reference's
    ``apply_external_forces`` at RBDReference.py:529-557 inverts Xa.T with
    np.linalg.inv and carries a latent bug; see SURVEY.md §2.1).
    """
    E = X[..., :3, :3]
    LL = X[..., 3:, :3]  # = -E rx
    zero = jnp.zeros_like(E)
    top = jnp.concatenate([E, LL], axis=-1)
    bot = jnp.concatenate([zero, E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
