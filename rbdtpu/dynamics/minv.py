"""Minv — direct analytical inverse of the joint-space inertia matrix.

Reimplements the reference's C5 component (Carpentier-style analytical M^-1;
``minv_bpass`` RBDReference.py:630-735, ``minv_fpass`` :737-783, ``minv``
:785-806) as a functional batched up-down tree sweep:

  - the reference's ragged ``get_subtree_by_id`` indexed updates
    (RBDReference.py:666,720-726) disappear: zero-initialized dense F rows make
    the subtree restriction implicit (columns outside a body's subtree are zero
    by construction), so every update is a dense batched op (SURVEY.md §7
    key idiom #2);
  - all small contractions use spatial.batched broadcast-multiply-reduce
    primitives (VPU path; batched dot_general lowers poorly on TPU);
  - the floating-base root is handled as one 6-wide joint block with an exact
    6x6 solve (reference :665-691), and the dense symmetrization runs over the
    full nv x nv matrix — fixing the reference's NB-only fill bug for floating
    base (SURVEY.md §2.1).

All functions are vmap-closed over leading batch dims of q.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.batched import (
    mm, mtm, mv, outer, xtax, cholesky_small, cholesky_solve_small,
)
from .xforms import joint_transforms_list


def minv_bpass(model: RobotModel, Xs):
    """Backward (leaf->root) sweep building articulated inertias and the upper
    rows of M^-1.  Xs: per-body transform list.  Returns
    (Minv, F, U, Dinv, fb_Dinv): Minv (..., n, n); F list of (..., 6, n);
    U list of (..., 6); Dinv list of (...,); fb_Dinv (..., 6, 6) or None."""
    nb, n = model.nb, model.nv
    batch = Xs[0].shape[:-2]
    dt = Xs[0].dtype
    Minv = jnp.zeros(batch + (n, n), dt)
    F = [jnp.zeros(batch + (6, n), dt) for _ in range(nb)]
    U_l = [None] * nb
    Dinv_l = [None] * nb
    IA = [jnp.broadcast_to(model.I[i], batch + (6, 6)) for i in range(nb)]
    fb_Dinv = None

    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        Xi = Xs[i]
        if model.floating_base and i == 0:
            # 6-wide root block: U = IA (S=eye), D = S^T U = IA; the inverse
            # of the SPD articulated root inertia via the unrolled batched
            # Cholesky (jnp.linalg.inv of tiny batched matrices lowers badly
            # on TPU)
            L0 = cholesky_small(IA[0])
            eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dt), IA[0].shape)
            fb_Dinv = cholesky_solve_small(L0, eye6)
            Minv = Minv.at[..., 0:6, 0:6].add(fb_Dinv)
            # Minv[0:6, :] -= fb_Dinv @ (S^T F[0]) ; F[0] is zero outside subtree
            Minv = Minv.at[..., 0:6, :].add(-mm(fb_Dinv, F[0]))
        else:
            mi = model.v_index(i)
            S = model.S[i]
            U = mv(IA[i], S)
            Dinv = 1.0 / (S * U).sum(-1)
            U_l[i], Dinv_l[i] = U, Dinv
            row = -Dinv[..., None] * (S[:, None] * F[i]).sum(-2)
            row = row.at[..., mi].add(Dinv)
            Minv = Minv.at[..., mi, :].add(row)
            if p != -1:
                # F[i] += U (x) Minv[i, :]  (only subtree columns are nonzero)
                Fi = F[i] + outer(U, Minv[..., mi, :])
                F[i] = Fi
                F[p] = F[p] + mtm(Xi, Fi)
                Ia = IA[i] - Dinv[..., None, None] * outer(U, U)
                IA[p] = IA[p] + xtax(Xi, Ia)

    return Minv, F, U_l, Dinv_l, fb_Dinv


def minv_fpass(model: RobotModel, Xs, Minv, F, U_l, Dinv_l):
    """Forward (root->leaf) sweep completing the rows of M^-1
    (reference ``minv_fpass`` RBDReference.py:737-783)."""
    nb = model.nb
    for i in range(nb):
        p = model.parent[i]
        Xi = Xs[i]
        if p == -1:
            if model.floating_base:
                F[i] = Minv[..., 0:6, :]  # S = eye(6)
            else:
                F[i] = outer(model.S[i], Minv[..., i, :])
        else:
            mi = model.v_index(i)
            S = model.S[i]
            XF = mm(Xi, F[p])
            delta = -Dinv_l[i][..., None] * (U_l[i][..., :, None] * XF).sum(-2)
            Minv = Minv.at[..., mi, :].add(delta)
            F[i] = XF + outer(S, Minv[..., mi, :])
    return Minv


def minv(model: RobotModel, q, output_dense: bool = True):
    """Analytical M^-1(q): (..., nq) -> (..., nv, nv).

    output_dense=True symmetrizes the upper-triangular result over the FULL nv
    (reference ``minv`` RBDReference.py:785-806; its dense fill loops only NB for
    floating base — fixed here per SURVEY.md §2.1)."""
    Xs = joint_transforms_list(model, q)
    Minv, F, U_l, Dinv_l, _ = minv_bpass(model, Xs)
    Minv = minv_fpass(model, Xs, Minv, F, U_l, Dinv_l)
    if output_dense:
        upper = jnp.triu(Minv)
        strict = jnp.triu(Minv, 1)
        Minv = upper + jnp.swapaxes(strict, -1, -2)
    return Minv
