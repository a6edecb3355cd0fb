"""ABA — articulated-body forward dynamics, O(NB) per state.

Reimplements reference C7 (``aba`` RBDReference.py:817-1024).  The reference
carries two fully separate branches (floating :821-939, fixed :940-1023) with
per-branch quirks (its fb variant pre-transforms Ia/pa, computes-and-discards a
temp, and pulls gravity in with a different sign path).  Here one generic
textbook 3-sweep recursion handles both: the floating root is simply a 6-wide
joint (S = eye(6), 6x6 articulated D solved exactly), and gravity enters as the
standard fictitious base acceleration, identical to RNEA.  External forces hook
in between sweep 1 and 2 as in the reference (:877-878), via the corrected
world->body transform.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.ops import cross_motion, vxIv
from .rnea import apply_external_forces, gravity_accel, _joint_vel
from .xforms import joint_transforms


def aba(
    model: RobotModel,
    q,
    qd,
    tau,
    f_ext: Optional[jnp.ndarray] = None,
    gravity: float = -9.81,
):
    """Forward dynamics via the articulated-body algorithm.

    q (..., nq), qd/tau (..., nv) -> qdd (..., nv).
    """
    nb = model.nb
    Xup = joint_transforms(model, q)
    batch = Xup.shape[:-3]
    a_grav = gravity_accel(gravity, Xup.dtype)

    # ---- sweep 1 (root->leaf): velocities, bias accelerations, bias forces ----
    v_l, c_l, pA = [], [], []
    IA = [jnp.broadcast_to(model.I[i], batch + (6, 6)) for i in range(nb)]
    for i in range(nb):
        p = model.parent[i]
        vJ = _joint_vel(model, i, qd)
        if p == -1:
            v = vJ
            c = jnp.zeros_like(vJ)
        else:
            v = jnp.einsum("...ij,...j->...i", Xup[..., i, :, :], v_l[p]) + vJ
            c = cross_motion(v, vJ)
        v_l.append(v)
        c_l.append(c)
        pA.append(vxIv(v, model.I[i]))

    if f_ext is not None:
        pA_stack = apply_external_forces(
            model, Xup, jnp.stack(pA, axis=-2), f_ext
        )
        pA = [pA_stack[..., i, :] for i in range(nb)]

    # ---- sweep 2 (leaf->root): articulated inertias ----
    U_l = [None] * nb  # (..., 6) or (..., 6, 6) at fb root
    d_l = [None] * nb  # (...,)   or (..., 6, 6) at fb root
    u_l = [None] * nb  # (...,)   or (..., 6)    at fb root
    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        Xi = Xup[..., i, :, :]
        if model.floating_base and i == 0:
            U_l[i] = IA[i]  # IA @ S with S = eye
            d_l[i] = IA[i]
            u_l[i] = tau[..., 0:6] - pA[i]
        else:
            S = model.S[i]
            U = jnp.einsum("...ij,j->...i", IA[i], S)
            d = jnp.einsum("j,...j->...", S, U)
            u = tau[..., model.v_index(i)] - jnp.einsum("j,...j->...", S, pA[i])
            U_l[i], d_l[i], u_l[i] = U, d, u
            if p != -1:
                Ia = IA[i] - (U[..., :, None] * U[..., None, :]) / d[..., None, None]
                pa = (
                    pA[i]
                    + jnp.einsum("...ij,...j->...i", Ia, c_l[i])
                    + U * (u / d)[..., None]
                )
                IA[p] = IA[p] + jnp.einsum("...ji,...jk,...kl->...il", Xi, Ia, Xi)
                pA[p] = pA[p] + jnp.einsum("...ji,...j->...i", Xi, pa)

    # ---- sweep 3 (root->leaf): accelerations ----
    qdd_cols = [None] * nb
    a_l = [None] * nb
    for i in range(nb):
        p = model.parent[i]
        Xi = Xup[..., i, :, :]
        if p == -1:
            a = jnp.einsum("...ij,j->...i", Xi, a_grav) + c_l[i]
        else:
            a = jnp.einsum("...ij,...j->...i", Xi, a_l[p]) + c_l[i]
        if model.floating_base and i == 0:
            rhs = u_l[i] - jnp.einsum("...ij,...i->...j", U_l[i], a)
            qdd_i = jnp.linalg.solve(d_l[i], rhs[..., None])[..., 0]
            a = a + qdd_i  # S = eye(6)
            qdd_cols[i] = qdd_i
        else:
            qdd_i = (u_l[i] - jnp.einsum("...j,...j->...", U_l[i], a)) / d_l[i]
            a = a + model.S[i] * qdd_i[..., None]
            qdd_cols[i] = qdd_i[..., None]
        a_l[i] = a

    return jnp.concatenate(qdd_cols, axis=-1)
