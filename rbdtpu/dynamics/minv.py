"""Minv — direct analytical inverse of the joint-space inertia matrix.

Reimplements the reference's C5 component (Carpentier-style analytical M^-1;
``minv_bpass`` RBDReference.py:630-735, ``minv_fpass`` :737-783, ``minv``
:785-806) as a functional batched up-down tree sweep:

  - the reference's ragged ``get_subtree_by_id`` indexed updates
    (RBDReference.py:666,720-726) disappear: zero-initialized dense F rows make
    the subtree restriction implicit (columns outside a body's subtree are zero
    by construction), so every update is a dense batched matmul (SURVEY.md §7
    key idiom #2);
  - the floating-base root is handled as one 6-wide joint block with an exact
    6x6 solve (reference :665-691), and the dense symmetrization runs over the
    full nv x nv matrix — fixing the reference's NB-only fill bug for floating
    base (SURVEY.md §2.1).

All functions are vmap-closed over leading batch dims of q.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from .xforms import joint_transforms


def minv_bpass(model: RobotModel, Xup):
    """Backward (leaf->root) sweep building articulated inertias and the upper
    rows of M^-1.  Returns (Minv, F, U, Dinv_diag, fb_Dinv):
      Minv (..., n, n); F list of (..., 6, n) per body; U (..., NB, 6);
      Dinv_diag (..., NB) scalar D^-1 per 1-DoF joint; fb_Dinv (..., 6, 6) or None.
    """
    nb, n = model.nb, model.nv
    batch = Xup.shape[:-3]
    dt = Xup.dtype
    Minv = jnp.zeros(batch + (n, n), dt)
    F = [jnp.zeros(batch + (6, n), dt) for _ in range(nb)]
    U_l = [jnp.zeros(batch + (6,), dt) for _ in range(nb)]
    Dinv_l = [jnp.zeros(batch, dt) for _ in range(nb)]
    IA = [jnp.broadcast_to(model.I[i], batch + (6, 6)) for i in range(nb)]
    fb_Dinv = None

    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        Xi = Xup[..., i, :, :]
        if model.floating_base and i == 0:
            # 6-wide root block: U = IA (S=eye), D = S^T U = IA
            fb_Dinv = jnp.linalg.inv(IA[0])
            Minv = Minv.at[..., 0:6, 0:6].add(fb_Dinv)
            # Minv[0:6, :] -= fb_Dinv @ (S^T F[0]) ; F[0] is zero outside subtree
            Minv = Minv.at[..., 0:6, :].add(-(fb_Dinv @ F[0]))
        else:
            mi = model.v_index(i)
            S = model.S[i]
            U = jnp.einsum("...ij,j->...i", IA[i], S)
            D = jnp.einsum("j,...j->...", S, U)
            Dinv = 1.0 / D
            U_l[i], Dinv_l[i] = U, Dinv
            row = -Dinv[..., None] * jnp.einsum("j,...jc->...c", S, F[i])
            row = row.at[..., mi].add(Dinv)
            Minv = Minv.at[..., mi, :].add(row)
            if p != -1:
                # F[i] += U (x) Minv[i, :]  (only subtree columns are nonzero)
                Fi = F[i] + U[..., :, None] * Minv[..., mi, :][..., None, :]
                F[i] = Fi
                F[p] = F[p] + jnp.einsum("...ji,...jc->...ic", Xi, Fi)
                Ia = IA[i] - Dinv[..., None, None] * (
                    U[..., :, None] * U[..., None, :]
                )
                IA[p] = IA[p] + jnp.einsum("...ji,...jk,...kl->...il", Xi, Ia, Xi)

    U = jnp.stack(U_l, axis=-2)
    Dinv_diag = jnp.stack(Dinv_l, axis=-1)
    return Minv, F, U, Dinv_diag, fb_Dinv


def minv_fpass(model: RobotModel, Xup, Minv, F, U, Dinv_diag):
    """Forward (root->leaf) sweep completing the rows of M^-1
    (reference ``minv_fpass`` RBDReference.py:737-783)."""
    nb = model.nb
    for i in range(nb):
        p = model.parent[i]
        Xi = Xup[..., i, :, :]
        if p == -1:
            if model.floating_base:
                F[i] = Minv[..., 0:6, :]  # S = eye(6)
            else:
                F[i] = model.S[i][:, None] * Minv[..., i, :][..., None, :]
        else:
            mi = model.v_index(i)
            S = model.S[i]
            XF = jnp.einsum("...ij,...jc->...ic", Xi, F[p])
            delta = -Dinv_diag[..., i, None] * jnp.einsum(
                "...j,...jc->...c", U[..., i, :], XF
            )
            Minv = Minv.at[..., mi, :].add(delta)
            F[i] = XF + S[:, None] * Minv[..., mi, :][..., None, :]
    return Minv


def minv(model: RobotModel, q, output_dense: bool = True):
    """Analytical M^-1(q): (..., nq) -> (..., nv, nv).

    output_dense=True symmetrizes the upper-triangular result over the FULL nv
    (reference ``minv`` RBDReference.py:785-806; its dense fill loops only NB for
    floating base — fixed here per SURVEY.md §2.1)."""
    Xup = joint_transforms(model, q)
    Minv, F, U, Dinv_diag, _ = minv_bpass(model, Xup)
    Minv = minv_fpass(model, Xup, Minv, F, U, Dinv_diag)
    if output_dense:
        upper = jnp.triu(Minv)
        strict = jnp.triu(Minv, 1)
        Minv = upper + jnp.swapaxes(strict, -1, -2)
    return Minv
