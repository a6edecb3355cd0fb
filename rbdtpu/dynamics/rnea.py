"""RNEA — recursive Newton-Euler inverse dynamics, batched & jit-compiled.

Reimplements the reference's C3 component (``rnea_fpass`` RBDReference.py:559-598,
``rnea_bpass`` :600-621, ``rnea`` :623-628) TPU-first:

  - topology is static, so the two tree sweeps unroll over bodies at trace time
    (SURVEY.md §3.1: "on TPU this becomes a scan over topological levels ... or
    unrolled for n<=30, batched over thousands of states via vmap");
  - per-body transforms are an UNSTACKED list (no (NB,6,6) gather/slice
    round-trips) and every small contraction uses the VPU-friendly
    broadcast-multiply-reduce primitives of spatial.batched — measured ~2.6x
    over batched dot_general lowering on v5e;
  - everything is closed under vmap: q/qd/qdd may carry arbitrary leading batch
    dimensions.

Also provides the *corrected* external-force application (reference C8,
``apply_external_forces`` RBDReference.py:529-557 — reimplemented from the
spatial_v2 algorithm because the reference passes the joint id as the joint
angle and aliases its input; SURVEY.md §2.1).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.ops import cross_motion, cross_force
from ..spatial.batched import mm, mv, mtv
from .xforms import joint_transforms_list, x_force_inv_T


def gravity_accel(gravity: float, dtype=jnp.float32):
    """Fictitious base acceleration encoding gravity: [0,0,0,0,0,-GRAVITY]
    (reference ``RBDReference.py:565-566``)."""
    g = jnp.zeros((6,), dtype)
    return g.at[5].set(-gravity)


def _joint_vel(model: RobotModel, i: int, u):
    """Joint-space spatial velocity/acceleration contribution S_i * u_i: (..., 6)."""
    if model.floating_base and i == 0:
        return u[..., 0:6]
    return model.S[i] * u[..., model.v_index(i), None]


def apply_external_forces(model: RobotModel, Xs, f_list, f_ext):
    """Subtract world-frame external wrenches from per-body forces.

    Xs: list of per-body transforms; f_list: list of (..., 6); f_ext
    (..., NB, 6), world coordinates.  Per spatial_v2:
    f[i] -= Xa[i]^{-T} f_ext[i] with Xa[i] = Xup[i] @ Xa[parent].
    (Corrected reimplementation of reference C8; SURVEY.md §2.1.)
    """
    Xa = [None] * model.nb
    out = list(f_list)
    for i in range(model.nb):
        p = model.parent[i]
        Xa[i] = Xs[i] if p == -1 else mm(Xs[i], Xa[p])
        out[i] = out[i] - mv(x_force_inv_T(Xa[i]), f_ext[..., i, :])
    return out


def rnea_fpass(model: RobotModel, Xs, q, qd, qdd=None, gravity: float = -9.81):
    """Forward (root->leaf) sweep: body velocities, accelerations, forces.

    Xs is the per-body transform list from ``joint_transforms_list``.  Returns
    (v, a, f) as lists of (..., 6).  Mirrors reference ``rnea_fpass``
    (RBDReference.py:559-598) including the floating-base root case (:585-593).
    """
    nb = model.nb
    a_grav = gravity_accel(gravity, Xs[0].dtype)
    v_l, a_l, f_l = [], [], []
    for i in range(nb):
        p = model.parent[i]
        Xi = Xs[i]
        vJ = _joint_vel(model, i, qd)
        if p == -1:
            v = vJ
            a = mv(Xi, jnp.broadcast_to(a_grav, vJ.shape))
        else:
            v = mv(Xi, v_l[p]) + vJ
            a = mv(Xi, a_l[p])
        a = a + cross_motion(v, vJ)
        if qdd is not None:
            a = a + _joint_vel(model, i, qdd)
        Iv = mv(model.I[i], v)
        f = mv(model.I[i], a) + cross_force(v, Iv)
        v_l.append(v)
        a_l.append(a)
        f_l.append(f)
    return v_l, a_l, f_l


def rnea_bpass(model: RobotModel, Xs, f_list):
    """Backward (leaf->root) sweep: joint torques c = S^T f and force propagation
    f[parent] += X^T f (reference ``rnea_bpass`` RBDReference.py:600-621).

    Returns (c, f_acc): c is (..., nv); f_acc a list of accumulated forces.
    """
    nb = model.nb
    f_l = list(f_list)
    c_cols = [None] * nb
    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        if model.floating_base and i == 0:
            c_cols[i] = f_l[i]  # S = eye(6)
        else:
            c_cols[i] = (model.S[i] * f_l[i]).sum(-1)[..., None]
        if p != -1:
            f_l[p] = f_l[p] + mtv(Xs[i], f_l[i])
    c = jnp.concatenate(c_cols, axis=-1)
    return c, f_l


def rnea(
    model: RobotModel,
    q,
    qd,
    qdd=None,
    gravity: float = -9.81,
    f_ext: Optional[jnp.ndarray] = None,
):
    """Inverse dynamics: joint forces c such that tau = c for the given motion.

    Matches reference ``rnea`` (RBDReference.py:623-628) with one deliberate fix:
    ``f_ext`` is actually applied here (the reference accepts it and ignores it;
    SURVEY.md §2.1).

    Returns (c, v, a, f): c (..., nv), others (..., NB, 6).
    """
    Xs = joint_transforms_list(model, q)
    v_l, a_l, f_l = rnea_fpass(model, Xs, q, qd, qdd, gravity)
    if f_ext is not None:
        f_l = apply_external_forces(model, Xs, f_l, f_ext)
    c, f_l = rnea_bpass(model, Xs, f_l)
    stack = lambda xs: jnp.stack(xs, axis=-2)
    return c, stack(v_l), stack(a_l), stack(f_l)


def inverse_dynamics(model, q, qd, qdd=None, gravity=-9.81, f_ext=None):
    """Convenience wrapper returning just the torque vector."""
    return rnea(model, q, qd, qdd, gravity, f_ext)[0]
