"""CRBA — composite-rigid-body mass matrix H(q).

Reimplements reference C6 (``crba`` RBDReference.py:1029-1124; fixed-base branch
:1090-1123 per Featherstone p.182, floating-base branch :1045-1089) as one
generic batched sweep: composite inertias accumulate leaf->root, then each body's
force vector ``fh`` is dragged up its (static) ancestor chain, filling H rows with
dense batched ops.  The floating-base root contributes a 6x6 block (S = eye(6)).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from .xforms import joint_transforms


def crba(model: RobotModel, q):
    """Mass matrix H: (..., nq) -> (..., nv, nv)."""
    nb, n = model.nb, model.nv
    Xup = joint_transforms(model, q)
    batch = Xup.shape[:-3]
    dt = Xup.dtype

    IC = [jnp.broadcast_to(model.I[i], batch + (6, 6)) for i in range(nb)]
    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        if p != -1:
            Xi = Xup[..., i, :, :]
            IC[p] = IC[p] + jnp.einsum("...ji,...jk,...kl->...il", Xi, IC[i], Xi)

    H = jnp.zeros(batch + (n, n), dt)
    for i in range(nb):
        if model.floating_base and i == 0:
            H = H.at[..., 0:6, 0:6].add(IC[0])  # S^T IC S with S = eye(6)
            continue
        mi = model.v_index(i)
        S = model.S[i]
        fh = jnp.einsum("...ij,j->...i", IC[i], S)
        H = H.at[..., mi, mi].add(jnp.einsum("j,...j->...", S, fh))
        j = i
        while model.parent[j] != -1:
            Xj = Xup[..., j, :, :]
            fh = jnp.einsum("...ji,...j->...i", Xj, fh)
            j = model.parent[j]
            if model.floating_base and j == 0:
                H = H.at[..., mi, 0:6].add(fh)
                H = H.at[..., 0:6, mi].add(fh)
            else:
                mj = model.v_index(j)
                hij = jnp.einsum("j,...j->...", model.S[j], fh)
                H = H.at[..., mi, mj].add(hij)
                H = H.at[..., mj, mi].add(hij)
    return H
