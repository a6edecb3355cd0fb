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
from ..spatial.transforms import (
    joint_hom_dT,
    joint_hom_d2T,
    rot_axis,
    drot_axis,
    d2rot_axis,
)


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


def _hom_R_block(M):
    """Embed a (..., 3, 3) block as [[M, 0], [0, 0]] (4x4)."""
    z = jnp.zeros(M.shape[:-2] + (3, 1), M.dtype)
    top = jnp.concatenate([M, z], -1)
    bot = jnp.zeros(M.shape[:-2] + (1, 4), M.dtype)
    return jnp.concatenate([top, bot], -2)


def _root_hom_derivs(model: RobotModel, q):
    """Exact first/second derivatives of the rpy floating root's homogeneous
    transform T0 = Ttree0 @ [[R(rpy), xyz], [0, 1]] wrt the 6 root
    coordinates [x, y, z, roll, pitch, yaw] (R = Rz(y) Ry(p) Rx(r),
    spatial.transforms.rpy_to_R).

    The generic per-joint derivative tables (joint_hom_dT/d2T) treat every
    non-prismatic joint as 1-DoF revolute, which is wrong for the 6-DoF root
    — this supplies the root's derivative columns for ee_pose_gradient /
    ee_pose_hessian on floating-base models (the reference's EE derivative
    stack, RBDReference.py:286-527, has no floating-base support at all).

    Returns (dT0 list[6] of (..., 4, 4), d2T0 dict[(i, j) i<=j] -> (...,4,4)).
    Translation rows: dT0[t] = Ttree0 @ [[0, e_t], [0, 0]]; all second
    derivatives involving a translation vanish (T0 is affine in xyz).
    """
    dtype = q.dtype
    r, p, y = q[..., 3], q[..., 4], q[..., 5]
    ex, ey, ez = (jnp.array(v, dtype)
                  for v in ((1, 0, 0), (0, 1, 0), (0, 0, 1)))
    Rx, Ry, Rz = rot_axis(ex, r), rot_axis(ey, p), rot_axis(ez, y)
    dRx, dRy, dRz = drot_axis(ex, r), drot_axis(ey, p), drot_axis(ez, y)
    d2Rx, d2Ry, d2Rz = d2rot_axis(ex, r), d2rot_axis(ey, p), d2rot_axis(ez, y)
    Tt = model.Ttree[0].astype(dtype)

    batch = Rx.shape[:-2]
    dT0 = []
    for t in range(3):
        D = jnp.zeros(batch + (4, 4), dtype).at[..., t, 3].set(1.0)
        dT0.append(Tt @ D)
    dR = {3: Rz @ Ry @ dRx, 4: Rz @ dRy @ Rx, 5: dRz @ Ry @ Rx}
    for c in (3, 4, 5):
        dT0.append(Tt @ _hom_R_block(dR[c]))

    d2R = {
        (3, 3): Rz @ Ry @ d2Rx,
        (3, 4): Rz @ dRy @ dRx,
        (3, 5): dRz @ Ry @ dRx,
        (4, 4): Rz @ d2Ry @ Rx,
        (4, 5): dRz @ dRy @ Rx,
        (5, 5): d2Rz @ Ry @ Rx,
    }
    zero4 = jnp.zeros(batch + (4, 4), dtype)
    d2T0 = {}
    for i in range(6):
        for j in range(i, 6):
            if i < 3 or j < 3:
                d2T0[(i, j)] = zero4
            else:
                d2T0[(i, j)] = Tt @ _hom_R_block(d2R[(i, j)])
    return dT0, d2T0


def _check_fb_chain(model: RobotModel, chain):
    """Static root-handling dispatch for the EE derivative sweeps: True when
    the chain starts at a floating rpy root (handled analytically); raises
    for the quaternion root (whose pose derivatives live in the solver's
    tangent chart, not configuration coordinates — use AD in tangent space,
    solver.costs.quadratize_trajectory)."""
    if not (model.floating_base and chain[0] == 0):
        return False
    if model.root_quat:
        raise ValueError(
            "ee_pose_gradient/hessian cover fixed-base and rpy-root models; "
            "the quaternion root's pose derivatives are chart-dependent — "
            "differentiate in the solver tangent space instead"
        )
    return True


def ee_position_jacobian_tangent(model: RobotModel, q, ee_names=None,
                                 offset=None):
    """d(EE position)/d(solver tangent): (..., nq) -> (..., n_ee, 3, nv).

    The position-row Jacobian in the SOLVER'S chart — what Gauss-Newton
    cost quadratization consumes (solver.costs.ee_reaching_cost):
      - fixed base / rpy root: the chart is configuration coordinates, so
        this equals ee_pose_gradient's position rows (rpy root columns via
        the exact root-transform derivatives);
      - quaternion root: the chart is the body-twist tangent of
        solver.integrate.config_retract (xi = [body rotation vec; body
        translation; joint deltas]).  Geometric closed form at xi = 0:
        with a_i = world images of the root body axes (columns of the
        root's world rotation) and o_root the root origin,
           d p_ee / d xi_rot,i   = a_i x (p_ee - o_root)
           d p_ee / d xi_trans,i = a_i
        (from p -> p + R dp, R -> R exp([dth]x):
         d(R exp([dth]x) s)/ddth_i = R (e_i x s) = a_i x (p_ee - o_root)).
        Joint columns are the usual geometric revolute/prismatic columns.
    """
    if not (model.floating_base and model.root_quat):
        G = ee_pose_gradient(model, q, ee_names=ee_names, offset=offset)
        return G[..., :3, :]
    offset = _default_offset(model) if offset is None else offset
    n = model.nv
    Tw = fk_world_hom(model, q)
    from ..spatial.transforms import PRISMATIC

    jacs = []
    for jid, fid in _resolve_ee(model, ee_names):
        T = Tw[..., jid, :, :]
        if fid is not None:
            T = T @ model.T_fixed[fid]
        p_ee = jnp.einsum("...ij,j->...i", T, offset)[..., :3]
        batch = p_ee.shape[:-1]
        J = jnp.zeros(batch + (3, n), p_ee.dtype)
        chain = model.chain(jid)
        assert chain[0] == 0, "floating root must head the EE chain"
        R0 = Tw[..., 0, :3, :3]
        o0 = Tw[..., 0, :3, 3]
        rel = p_ee - o0
        for i in range(3):
            a = R0[..., :, i]
            J = J.at[..., :, i].set(jnp.cross(a, rel))
            J = J.at[..., :, 3 + i].set(a)
        for k in chain[1:]:
            a = jnp.einsum(
                "...ij,j->...i", Tw[..., k, :3, :3],
                model.axis[k].astype(p_ee.dtype),
            )
            if model.joint_type[k] == PRISMATIC:
                col = a
            else:
                col = jnp.cross(a, p_ee - Tw[..., k, :3, 3])
            J = J.at[..., :, model.v_index(k)].set(col)
        jacs.append(J)
    return jnp.stack(jacs, axis=-3)


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

    Columns for joints off the EE's chain are zero (reference :356-359).
    Floating rpy root: the 6 root columns use the exact root-transform
    derivatives (_root_hom_derivs) — beyond the reference's fixed-base-only
    scope."""
    offset = _default_offset(model) if offset is None else offset
    n = model.nv
    grads = []
    for jid, fid in _resolve_ee(model, ee_names):
        chain, T, dT, d2T, prefix, suffix = _chain_transforms(model, q, jid, fid)
        fb_root = _check_fb_chain(model, chain)
        Tw = prefix[-1] @ T[..., chain[-1], :, :] @ suffix[-1]
        batch = Tw.shape[:-2]
        G = jnp.zeros(batch + (6, n), Tw.dtype)
        if fb_root:
            dT0, _ = _root_hom_derivs(model, q)
            for c in range(6):
                dTw = dT0[c] @ suffix[0]
                G = G.at[..., :, c].set(_dpose_cols(Tw, dTw, offset))
        for idx, k in enumerate(chain):
            if fb_root and idx == 0:
                continue
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

    Entries where either index is off the EE chain are zero (reference :478).
    Floating rpy root: root-root and root-joint blocks use the exact root
    second derivatives (_root_hom_derivs)."""
    offset = _default_offset(model) if offset is None else offset
    n = model.nv
    hessians = []
    for jid, fid in _resolve_ee(model, ee_names):
        chain, T, dT, d2T, prefix, suffix = _chain_transforms(model, q, jid, fid)
        fb_root = _check_fb_chain(model, chain)
        Tw = prefix[-1] @ T[..., chain[-1], :, :] @ suffix[-1]
        batch = Tw.shape[:-2]
        Hs = jnp.zeros(batch + (6, n, n), Tw.dtype)
        # derivative SLOTS (vi, chain_pos, local dT): one per 1-DoF joint,
        # six for the floating root (all at chain position 0)
        slots = []
        if fb_root:
            dT0, d2T0 = _root_hom_derivs(model, q)
            for c in range(6):
                slots.append((c, 0, dT0[c]))
        for idx, k in enumerate(chain):
            if fb_root and idx == 0:
                continue
            slots.append((model.v_index(k), idx, dT[..., k, :, :]))
        dTw = [prefix[pos] @ dloc @ suffix[pos] for _, pos, dloc in slots]

        def _d2local(si, sj):
            """Local second-derivative block for two slots at the SAME chain
            position — only the root qualifies (joints are 1-DoF)."""
            ci, cj = slots[si][0], slots[sj][0]
            if fb_root and slots[si][1] == 0:
                return d2T0[(min(ci, cj), max(ci, cj))]
            return d2T[..., chain[slots[si][1]], :, :]

        # mid-segment products between chain positions i < j:
        # M = T_{chain[i+1]} ... T_{chain[j-1]} (identity when j == i+1),
        # maintained incrementally along the inner loop.
        eye = jnp.broadcast_to(jnp.eye(4, dtype=Tw.dtype), Tw.shape)
        for si, (vi, pi, dli) in enumerate(slots):
            d2Tw = prefix[pi] @ _d2local(si, si) @ suffix[pi]
            col = _d2pose_cols(Tw, dTw[si], dTw[si], d2Tw, offset, same=True)
            Hs = Hs.at[..., :, vi, vi].set(col)
            pre_d = prefix[pi] @ dli
            M = eye
            last = pi
            for sj in range(si + 1, len(slots)):
                vj, pj, dlj = slots[sj]
                if pj == pi:  # root-root pair
                    d2Tw = prefix[pi] @ _d2local(si, sj) @ suffix[pi]
                else:
                    while last < pj - 1:
                        last += 1
                        M = M @ T[..., chain[last], :, :]
                    d2Tw = pre_d @ M @ dlj @ suffix[pj]
                col = _d2pose_cols(Tw, dTw[si], dTw[sj], d2Tw, offset,
                                   same=False)
                Hs = Hs.at[..., :, vi, vj].set(col)
                Hs = Hs.at[..., :, vj, vi].set(col)
        hessians.append(Hs)
    return jnp.stack(hessians, axis=-4)
