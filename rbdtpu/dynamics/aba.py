"""ABA — articulated-body forward dynamics, O(NB) per state.

Reimplements reference C7 (``aba`` RBDReference.py:817-1024).  The reference
carries two fully separate branches (floating :821-939, fixed :940-1023) with
per-branch quirks (its fb variant pre-transforms Ia/pa, computes-and-discards a
temp, and pulls gravity in with a different sign path).  Here one generic
textbook 3-sweep recursion handles both: the floating root is simply a 6-wide
joint (S = eye(6), 6x6 articulated D solved exactly), and gravity enters as the
standard fictitious base acceleration, identical to RNEA.  External forces hook
in between sweep 1 and 2 as in the reference (:877-878), via the corrected
world->body transform.  All contractions use the VPU broadcast-multiply-reduce
primitives (spatial.batched).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.ops import cross_motion, cross_force
from ..spatial.batched import (
    mv, mtv, outer, xtax, cholesky_small, cholesky_solve_small,
)
from .rnea import apply_external_forces, gravity_accel, _joint_vel
from .xforms import joint_transforms_list


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
    Xs = joint_transforms_list(model, q)
    batch = Xs[0].shape[:-2]
    a_grav = gravity_accel(gravity, Xs[0].dtype)

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
            v = mv(Xs[i], v_l[p]) + vJ
            c = cross_motion(v, vJ)
        v_l.append(v)
        c_l.append(c)
        pA.append(cross_force(v, mv(model.I[i], v)))

    if f_ext is not None:
        pA = apply_external_forces(model, Xs, pA, f_ext)

    # ---- sweep 2 (leaf->root): articulated inertias ----
    U_l = [None] * nb  # (..., 6) or (..., 6, 6) at fb root
    d_l = [None] * nb  # (...,)   or (..., 6, 6) at fb root
    u_l = [None] * nb  # (...,)   or (..., 6)    at fb root
    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        Xi = Xs[i]
        if model.floating_base and i == 0:
            U_l[i] = IA[i]  # IA @ S with S = eye
            d_l[i] = IA[i]
            u_l[i] = tau[..., 0:6] - pA[i]
        else:
            S = model.S[i]
            U = mv(IA[i], S)
            d = (S * U).sum(-1)
            u = tau[..., model.v_index(i)] - (S * pA[i]).sum(-1)
            U_l[i], d_l[i], u_l[i] = U, d, u
            if p != -1:
                Ia = IA[i] - outer(U, U) / d[..., None, None]
                pa = pA[i] + mv(Ia, c_l[i]) + U * (u / d)[..., None]
                IA[p] = IA[p] + xtax(Xi, Ia)
                pA[p] = pA[p] + mtv(Xi, pa)

    # ---- sweep 3 (root->leaf): accelerations ----
    qdd_cols = [None] * nb
    a_l = [None] * nb
    for i in range(nb):
        p = model.parent[i]
        Xi = Xs[i]
        if p == -1:
            a = mv(Xi, jnp.broadcast_to(a_grav, batch + (6,))) + c_l[i]
        else:
            a = mv(Xi, a_l[p]) + c_l[i]
        if model.floating_base and i == 0:
            rhs = u_l[i] - mtv(U_l[i], a)
            # SPD articulated root block: unrolled batched Cholesky solve
            qdd_i = cholesky_solve_small(cholesky_small(d_l[i]), rhs)
            a = a + qdd_i  # S = eye(6)
            qdd_cols[i] = qdd_i
        else:
            qdd_i = (u_l[i] - (U_l[i] * a).sum(-1)) / d_l[i]
            a = a + model.S[i] * qdd_i[..., None]
            qdd_cols[i] = qdd_i[..., None]
        a_l[i] = a

    return jnp.concatenate(qdd_cols, axis=-1)
