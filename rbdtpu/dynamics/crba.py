"""CRBA — composite-rigid-body mass matrix H(q).

Reimplements reference C6 (``crba`` RBDReference.py:1029-1124; fixed-base branch
:1090-1123 per Featherstone p.182, floating-base branch :1045-1089) as one
generic batched sweep: composite inertias accumulate leaf->root, then each body's
force vector ``fh`` is dragged up its (static) ancestor chain, filling H rows
with dense batched ops (VPU broadcast-multiply-reduce; spatial.batched).  The
floating-base root contributes a 6x6 block (S = eye(6)).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..spatial.batched import mv, mtv, xtax
from .xforms import joint_transforms_list


def crba(model: RobotModel, q):
    """Mass matrix H: (..., nq) -> (..., nv, nv)."""
    nb, n = model.nb, model.nv
    Xs = joint_transforms_list(model, q)
    batch = Xs[0].shape[:-2]
    dt = Xs[0].dtype

    IC = [jnp.broadcast_to(model.I[i], batch + (6, 6)) for i in range(nb)]
    for i in range(nb - 1, -1, -1):
        p = model.parent[i]
        if p != -1:
            IC[p] = IC[p] + xtax(Xs[i], IC[i])

    H = jnp.zeros(batch + (n, n), dt)
    for i in range(nb):
        if model.floating_base and i == 0:
            H = H.at[..., 0:6, 0:6].add(IC[0])  # S^T IC S with S = eye(6)
            continue
        mi = model.v_index(i)
        S = model.S[i]
        fh = mv(IC[i], S)
        H = H.at[..., mi, mi].add((S * fh).sum(-1))
        j = i
        while model.parent[j] != -1:
            fh = mtv(Xs[j], fh)
            j = model.parent[j]
            if model.floating_base and j == 0:
                H = H.at[..., mi, 0:6].add(fh)
                H = H.at[..., 0:6, mi].add(fh)
            else:
                mj = model.v_index(j)
                hij = (model.S[j] * fh).sum(-1)
                H = H.at[..., mi, mj].add(hij)
                H = H.at[..., mj, mi].add(hij)
    return H
