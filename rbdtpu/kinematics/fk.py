"""Forward kinematics: end-effector pose, analytic gradient and Hessian.

Reimplements reference C11-C13 (``end_effector_pose`` RBDReference.py:220-274,
``end_effector_pose_gradient`` :286-386, ``end_effector_pose_hessian``
:392-527) TPU-first:

  - the reference re-chains the whole leaf->root product once per derivative
    index (O(n * depth) 4x4 chains) and, in the Hessian, once per (i, j) pair
    (O(n^2 * depth)); here ONE forward pass computes world prefix transforms and
    ONE backward pass computes suffix transforms per chain, so each derivative is
    prefix[k] @ dT_k @ suffix[k] — O(depth) products total for the gradient and
    O(depth^2) for the Hessian (SURVEY.md §3.6);
  - rpy extraction and its analytic d(atan2)/quotient-rule derivatives follow
    the reference formulas (:250-258, :328-342, :487-519) in batched form;
  - the reference's duplicated forward-then-overwritten chain blocks
    (SURVEY.md §2.1) are not reproduced — only the effective (backward) variant.

Everything is vmap-closed over leading batch dims of q.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..model.robot import RobotModel
from ..dynamics.xforms import joint_transforms_hom, q_per_joint
from ..spatial.transforms import joint_hom_dT, joint_hom_d2T


def fk_world_hom(model: RobotModel, q):
    """World (base-frame) homogeneous transform of every body:
    (..., nq) -> (..., NB, 4, 4).  Tw[i] = Tw[parent] @ T_i."""
    T = joint_transforms_hom(model, q)
    Tw = [None] * model.nb
    for i in range(model.nb):
        p = model.parent[i]
        Ti = T[..., i, :, :]
        Tw[i] = Ti if p == -1 else Tw[p] @ Ti
    return jnp.stack(Tw, axis=-3)


def _pose_from_T(T, offset):
    """6-vec [xyz, roll, pitch, yaw] from a world transform (reference
    ``eePos_from_Xmat_hom``, RBDReference.py:245-258)."""
    xyz = jnp.einsum("...ij,j->...i", T, offset)[..., :3]
    roll = jnp.arctan2(T[..., 2, 1], T[..., 2, 2])
    pitch_sq = jnp.sqrt(T[..., 2, 2] ** 2 + T[..., 2, 1] ** 2)
    pitch = jnp.arctan2(-T[..., 2, 0], pitch_sq)
    yaw = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.concatenate(
        [xyz, roll[..., None], pitch[..., None], yaw[..., None]], axis=-1
    )


def _resolve_ee(model: RobotModel, ee_names: Optional[Sequence[str]]):
    """Joint-id / fixed-frame selection (reference
    ``select_end_effector_joints``, RBDReference.py:190-210)."""
    if ee_names is None:
        return [(jid, None) for jid in model.leaves()]
    out = []
    for name in ee_names:
        if name in model.joint_names:
            out.append((model.joint_names.index(name), None))
        elif name in model.fixed_frame_names:
            fid = model.fixed_frame_names.index(name)
            out.append((model.fixed_frame_parent[fid], fid))
        else:
            raise ValueError(f"no joint or fixed frame named {name!r}")
    return out


def _default_offset(model):
    return jnp.array([0.0, 0.0, 0.0, 1.0], model.Ttree.dtype)


def ee_pose(model: RobotModel, q, ee_names=None, offset=None):
    """End-effector pose(s): (..., nq) -> (..., n_ee, 6).

    Defaults to all leaf joints (reference behavior); fixed-frame names append
    their static mount transform (reference :268-273)."""
    offset = _default_offset(model) if offset is None else offset
    Tw = fk_world_hom(model, q)
    poses = []
    for jid, fid in _resolve_ee(model, ee_names):
        T = Tw[..., jid, :, :]
        if fid is not None:
            T = T @ model.T_fixed[fid]
        poses.append(_pose_from_T(T, offset))
    return jnp.stack(poses, axis=-2)


def _chain_transforms(model: RobotModel, q, jid: int, fid: Optional[int]):
    """Per-chain building blocks for derivatives.

    Returns (chain, T_list, dT_list, d2T_list, prefix, suffix):
      chain: static tuple of joint ids root->jid;
      prefix[k]: world transform of parent(chain[k]) (identity at root);
      suffix[k]: transform from the EE frame to chain[k]'s frame successor
                 (i.e. product of T over chain joints after k, incl. fixed frame).
    """
    chain = model.chain(jid)
    T = joint_transforms_hom(model, q)
    qj = q_per_joint(model, q)
    jtype = jnp.array(model.joint_type)
    dT = joint_hom_dT(jtype, model.axis, model.Ttree, qj)
    d2T = joint_hom_d2T(jtype, model.axis, model.Ttree, qj)

    eye = jnp.broadcast_to(jnp.eye(4, dtype=T.dtype), T[..., 0, :, :].shape)
    prefix = []
    acc = eye
    for k in chain:
        prefix.append(acc)
        acc = acc @ T[..., k, :, :]
    tail = model.T_fixed[fid] if fid is not None else jnp.eye(4, dtype=T.dtype)
    suffix = [None] * len(chain)
    acc = jnp.broadcast_to(tail, eye.shape)
    for idx in range(len(chain) - 1, -1, -1):
        suffix[idx] = acc
        acc = T[..., chain[idx], :, :] @ acc
    return chain, T, dT, d2T, prefix, suffix


def _datan2(y, x, yp, xp):
    """d/dz atan2(y(z), x(z)) (reference :328-329)."""
    return (-xp * y + x * yp) / (x * x + y * y)


def _dpose_cols(T, dT, offset):
    """Analytic pose derivative column from (T, dT) (reference
    ``deePos_col_from_Xmat_hom``, RBDReference.py:319-342)."""
    dxyz = jnp.einsum("...ij,j->...i", dT, offset)[..., :3]
    droll = _datan2(T[..., 2, 1], T[..., 2, 2], dT[..., 2, 1], dT[..., 2, 2])
    psq = jnp.sqrt(T[..., 2, 2] ** 2 + T[..., 2, 1] ** 2)
    dpsq = (T[..., 2, 2] * dT[..., 2, 2] + T[..., 2, 1] * dT[..., 2, 1]) / psq
    dpitch = _datan2(-T[..., 2, 0], psq, -dT[..., 2, 0], dpsq)
    dyaw = _datan2(T[..., 1, 0], T[..., 0, 0], dT[..., 1, 0], dT[..., 0, 0])
    return jnp.concatenate(
        [dxyz, droll[..., None], dpitch[..., None], dyaw[..., None]], axis=-1
    )


def ee_pose_gradient(model: RobotModel, q, ee_names=None, offset=None):
    """Analytic d(pose)/dq: (..., nq) -> (..., n_ee, 6, nv).

    Columns for joints off the EE's chain are zero (reference :356-359)."""
    offset = _default_offset(model) if offset is None else offset
    n = model.nv
    grads = []
    for jid, fid in _resolve_ee(model, ee_names):
        chain, T, dT, d2T, prefix, suffix = _chain_transforms(model, q, jid, fid)
        Tw = prefix[-1] @ T[..., chain[-1], :, :] @ suffix[-1]
        batch = Tw.shape[:-2]
        G = jnp.zeros(batch + (6, n), Tw.dtype)
        for idx, k in enumerate(chain):
            dTw = prefix[idx] @ dT[..., k, :, :] @ suffix[idx]
            col = _dpose_cols(Tw, dTw, offset)
            G = G.at[..., :, model.v_index(k)].set(col)
        grads.append(G)
    return jnp.stack(grads, axis=-3)


def _d2atan2(y, x, ypi, xpi, ypj, xpj, ypp, xpp, same):
    """Second derivative of atan2 via the reference's quotient-rule assembly
    (RBDReference.py:490-499).  `same` is the static i==j flag."""
    top = -xpi * y + x * ypi
    dtop = -xpp * y + x * ypp
    if not same:
        dtop = dtop + (-xpi * ypj + xpj * ypi)
    bottom = x * x + y * y
    dbottom = 2 * x * xpj + 2 * y * ypj
    return (bottom * dtop - top * dbottom) / (bottom * bottom)


def _d2pose_cols(T, dTi, dTj, d2T, offset, same):
    """Second-derivative pose column (reference :481-524)."""
    d2xyz = jnp.einsum("...ij,j->...i", d2T, offset)[..., :3]
    d2roll = _d2atan2(
        T[..., 2, 1], T[..., 2, 2], dTi[..., 2, 1], dTi[..., 2, 2],
        dTj[..., 2, 1], dTj[..., 2, 2], d2T[..., 2, 1], d2T[..., 2, 2], same,
    )
    psq = jnp.sqrt(T[..., 2, 2] ** 2 + T[..., 2, 1] ** 2)
    dpsq_i_top = T[..., 2, 2] * dTi[..., 2, 2] + T[..., 2, 1] * dTi[..., 2, 1]
    dpsq_i = dpsq_i_top / psq
    dpsq_j_top = T[..., 2, 2] * dTj[..., 2, 2] + T[..., 2, 1] * dTj[..., 2, 1]
    dpsq_j = dpsq_j_top / psq
    dpsq_i_top_dj = (
        dTj[..., 2, 2] * dTi[..., 2, 2] + T[..., 2, 2] * d2T[..., 2, 2]
        + dTj[..., 2, 1] * dTi[..., 2, 1] + T[..., 2, 1] * d2T[..., 2, 1]
    )
    d2psq = (psq * dpsq_i_top_dj - dpsq_i * dpsq_j_top) / (psq * psq)
    d2pitch = _d2atan2(
        -T[..., 2, 0], psq, -dTi[..., 2, 0], dpsq_i,
        -dTj[..., 2, 0], dpsq_j, -d2T[..., 2, 0], d2psq, same,
    )
    d2yaw = _d2atan2(
        T[..., 1, 0], T[..., 0, 0], dTi[..., 1, 0], dTi[..., 0, 0],
        dTj[..., 1, 0], dTj[..., 0, 0], d2T[..., 1, 0], d2T[..., 0, 0], same,
    )
    return jnp.concatenate(
        [d2xyz, d2roll[..., None], d2pitch[..., None], d2yaw[..., None]], axis=-1
    )


def ee_pose_hessian(model: RobotModel, q, ee_names=None, offset=None):
    """Analytic d2(pose)/dq2: (..., nq) -> (..., n_ee, 6, nv, nv).

    Entries where either index is off the EE chain are zero (reference :478)."""
    offset = _default_offset(model) if offset is None else offset
    n = model.nv
    hessians = []
    for jid, fid in _resolve_ee(model, ee_names):
        chain, T, dT, d2T, prefix, suffix = _chain_transforms(model, q, jid, fid)
        depth = len(chain)
        Tw = prefix[-1] @ T[..., chain[-1], :, :] @ suffix[-1]
        batch = Tw.shape[:-2]
        Hs = jnp.zeros(batch + (6, n, n), Tw.dtype)
        # first derivatives per chain position
        dTw = [
            prefix[idx] @ dT[..., chain[idx], :, :] @ suffix[idx]
            for idx in range(depth)
        ]
        # mid-segment products between chain positions i < j:
        # M = T_{chain[i+1]} ... T_{chain[j-1]} (identity when j == i+1),
        # maintained incrementally along the inner loop.
        eye = jnp.broadcast_to(jnp.eye(4, dtype=Tw.dtype), Tw.shape)
        for ii in range(depth):
            ki = chain[ii]
            vi = model.v_index(ki)
            # diagonal term: second derivative of one joint
            d2Tw = prefix[ii] @ d2T[..., ki, :, :] @ suffix[ii]
            col = _d2pose_cols(Tw, dTw[ii], dTw[ii], d2Tw, offset, same=True)
            Hs = Hs.at[..., :, vi, vi].set(col)
            # off-diagonal terms ii < jj
            pre_d = prefix[ii] @ dT[..., ki, :, :]
            M = eye
            for jj in range(ii + 1, depth):
                kj = chain[jj]
                vj = model.v_index(kj)
                d2Tw = pre_d @ M @ dT[..., kj, :, :] @ suffix[jj]
                col = _d2pose_cols(Tw, dTw[ii], dTw[jj], d2Tw, offset, same=False)
                Hs = Hs.at[..., :, vi, vj].set(col)
                Hs = Hs.at[..., :, vj, vi].set(col)
                M = M @ T[..., kj, :, :]
        hessians.append(Hs)
    return jnp.stack(hessians, axis=-4)
