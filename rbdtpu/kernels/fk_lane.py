"""Fused FK / cost-quadratization kernel (colvec layout).

The DDP cost quadratization for end-effector reaching (solver.costs.
ee_reaching_cost — the consumer the reference's EE gradients exist to feed,
RBDReference.py:286-386) was the second-largest slice of the arm MPC
iteration after the backward sweep (~3 ms of 9 at the arm bench): per knot
it ran the jnp FK chain (C11), the prefix/suffix Jacobian chains (C12) and
two small batched matmuls (J^T e, J^T J), each a separate XLA op with HBM
round-trips.

Here ONE Pallas kernel per batch tile computes, entirely in VMEM:

  - the world FK chain of the EE (homogeneous, lane scalars),
  - the POSITION Jacobian by the geometric method (world joint axis a_k and
    origin o_k: dp/dq_k = a_k x (p - o_k) for revolute, a_k for prismatic) —
    algebraically identical to the analytic chain derivative the jnp path
    computes, but one forward pass instead of prefix/suffix products,
  - the Gauss-Newton terms g0 = J^T e and H0 = J^T J with the Jacobian held
    as colscalars (columns in sublanes, kernels.colvec layout), so the tiny
    matmuls never touch the MXU-hostile (B, n, m) batched-dot path.

Outputs are UNWEIGHTED (e, g0, H0); the cost applies its stage/terminal
weights as fusible XLA elementwise ops.  ALL root types: the rpy root
contributes 6 configuration-coordinate columns, the quaternion root 6
body-twist TANGENT columns (solver chart — see
kinematics.fk.ee_position_jacobian_tangent, the jnp twin).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.robot import RobotModel
from ..spatial.transforms import PRISMATIC
from . import lanescalar as ls
from .colvec import _pad8, _make_oh
from .fused import ModelStatic, get_static, _on_tpu


def _mat3_static(M):
    return [[float(M[i][j]) for j in range(3)] for i in range(3)]


def _m3v(R, v):
    """3x3 @ 3-vec on mixed static/lane entries."""
    return [
        ls._add(ls._add(ls._mul(R[i][0], v[0]), ls._mul(R[i][1], v[1])),
                ls._mul(R[i][2], v[2]))
        for i in range(3)
    ]


def _m3m(A, B):
    return [
        [
            ls._add(ls._add(ls._mul(A[i][0], B[0][j]),
                            ls._mul(A[i][1], B[1][j])),
                    ls._mul(A[i][2], B[2][j]))
            for j in range(3)
        ]
        for i in range(3)
    ]


def _v3add(a, b):
    return [ls._add(a[i], b[i]) for i in range(3)]


def _v3sub(a, b):
    return [ls._add(a[i], ls._mul(-1.0, b[i])) for i in range(3)]


def _v3cross(a, b):
    return [
        ls._add(ls._mul(a[1], b[2]), ls._mul(-1.0, ls._mul(a[2], b[1]))),
        ls._add(ls._mul(a[2], b[0]), ls._mul(-1.0, ls._mul(a[0], b[2]))),
        ls._add(ls._mul(a[0], b[1]), ls._mul(-1.0, ls._mul(a[1], b[0]))),
    ]


def _rodrigues(axis, s, c):
    """Active rotation about a STATIC unit axis with lane-scalar sin/cos
    (spatial.transforms.rot_axis, unrolled)."""
    ax, ay, az = (float(a) for a in axis)
    one_c = ls._add(1.0, ls._mul(-1.0, c))
    R = [[0.0] * 3 for _ in range(3)]
    kk = [
        [ax * ax - 1.0, ax * ay, ax * az],
        [ax * ay, ay * ay - 1.0, ay * az],
        [ax * az, ay * az, az * az - 1.0],
    ]
    k = [[0.0, -az, ay], [az, 0.0, -ax], [-ay, ax, 0.0]]
    for i in range(3):
        for j in range(3):
            val = ls._mul(s, k[i][j]) if k[i][j] != 0.0 else 0.0
            val = ls._add(val, ls._mul(one_c, kk[i][j]))
            if i == j:
                val = ls._add(val, 1.0)
            R[i][j] = val
    return R


def ee_chain_lane(ms: ModelStatic, q_s, jid: int, fid, offset):
    """World EE position + per-chain (axis, origin) on lane scalars.

    q_s: list of n lane scalars.  Returns (p_ee 3-list, cols list of
    (vel_index, 3-list dp/dq)).  Floating rpy root: the 6 root columns come
    from the same geometric method — translation columns are the static
    world basis (through Ttree0's rotation), and the three Euler columns are
    chained-revolute axes a_y = ez, a_p = Rz ey, a_r = Rz Ry ex crossed with
    (p_ee - o_root) (exactly kinematics.fk._root_hom_derivs applied to the
    position rows)."""
    if ms.Ttree is None:
        raise ValueError("model host_data lacks Ttree; rebuild with "
                         "rbdtpu.model.make_model")
    # chain root -> jid
    chain = []
    k = jid
    while k != -1:
        chain.append(k)
        k = ms.parent[k]
    chain.reverse()

    R = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    p = [0.0, 0.0, 0.0]
    entries = []  # (vel_index, is_translation, a_world, o_world)
    for k in chain:
        if ms.fb and k == 0:
            Tt = ms.Ttree[0]
            Rt = _mat3_static([row[:3] for row in Tt])
            pt = [Tt[i][3] for i in range(3)]
            xyz = [q_s[0], q_s[1], q_s[2]]
            o_root = _v3add(_m3v(Rt, xyz), pt)
            p = o_root
            if ms.quat:
                # quaternion root: derivative columns live in the SOLVER
                # TANGENT chart (solver.integrate.config_retract — xi =
                # [body rotation vec (rows 0..2); body translation (3..5)]):
                # a_i = world images of the body axes (columns of Rt @ R(q)),
                # rotation col = a_i x (p_ee - o_root), translation col = a_i
                # (kinematics.fk.ee_position_jacobian_tangent, fused twin)
                Rq = ls.quat_R(q_s[3], q_s[4], q_s[5], q_s[6])
                R = _m3m(Rt, Rq)
                for i in range(3):
                    a_i = [R[r][i] for r in range(3)]
                    entries.append((i, False, a_i, o_root))
                    entries.append((3 + i, True, a_i, None))
                continue
            # rpy root: T0 = Ttree0 @ [[Rz(y)Ry(p)Rx(r), xyz], [0, 1]],
            # configuration-coordinate columns
            sr, cr = jnp.sin(q_s[3]), jnp.cos(q_s[3])
            sp_, cp_ = jnp.sin(q_s[4]), jnp.cos(q_s[4])
            sy, cy = jnp.sin(q_s[5]), jnp.cos(q_s[5])
            Rx = _rodrigues((1.0, 0.0, 0.0), sr, cr)
            Ry = _rodrigues((0.0, 1.0, 0.0), sp_, cp_)
            Rz = _rodrigues((0.0, 0.0, 1.0), sy, cy)
            RtRz = _m3m(Rt, Rz)
            RtRzRy = _m3m(RtRz, Ry)
            R = _m3m(RtRzRy, Rx)
            for t in range(3):
                entries.append((t, True, [Rt[i][t] for i in range(3)], None))
            entries.append((3, False, [RtRzRy[i][0] for i in range(3)],
                            o_root))
            entries.append((4, False, [RtRz[i][1] for i in range(3)],
                            o_root))
            entries.append((5, False, [Rt[i][2] for i in range(3)], o_root))
            continue
        Tt = ms.Ttree[k]
        Rt = [[Tt[i][j] for j in range(3)] for i in range(3)]
        pt = [Tt[i][3] for i in range(3)]
        p = _v3add(p, _m3v(R, pt))
        R1 = _m3m(R, Rt)
        qk = q_s[ms.qi(k)]
        a_world = _m3v(R1, [float(v) for v in ms.axis[k]])
        if ms.jtype[k] == PRISMATIC:
            p = _v3add(p, [ls._mul(qk, a) for a in a_world])
            R = R1
            entries.append((ms.vi(k), True, a_world, None))
        else:
            s, c = jnp.sin(qk), jnp.cos(qk)
            R = _m3m(R1, _rodrigues(ms.axis[k], s, c))
            entries.append((ms.vi(k), False, a_world, p))
    if fid is not None:
        Tf = ms.T_fixed[fid]
        Rf = [[Tf[i][j] for j in range(3)] for i in range(3)]
        pf = [Tf[i][3] for i in range(3)]
        p = _v3add(p, _m3v(R, pf))
        R = _m3m(R, Rf)
    off = [float(o) for o in offset[:3]]
    p_ee = _v3add(p, _m3v(R, off))
    cols = []
    for vi, is_trans, a_world, o_world in entries:
        if is_trans:
            col = list(a_world)
        else:
            col = _v3cross(a_world, _v3sub(p_ee, o_world))
        cols.append((vi, col))
    return p_ee, cols


def ee_gn_fused(model: RobotModel, q, target, *, ee_names=None,
                offset=(0.0, 0.0, 0.0), block_lanes: int = 512,
                gn: bool = True, interpret: bool | None = None):
    """Fused EE Gauss-Newton terms: q (B, n) ->
    (e (B, 3), g0 (B, n), H0 (B, n, n)) with e = p_ee(q) - target,
    g0 = J^T e, H0 = J^T J (position Jacobian).  Single end effector
    (ee_names None = the model's single leaf; multi-EE callers loop).
    All root types: q is (B, nq) configuration coordinates; g0/H0 are in
    the SOLVER chart — nq == nv columns for fixed-base/rpy models, 2*nv/2
    = nv TANGENT columns for the quaternion root (body-twist chart of
    solver.integrate.config_retract).

    ``gn=False``: position error only — returns (e, None, None) and skips
    the Jacobian/Hessian outputs entirely (the rollout cost-evaluation path,
    where writing (n, n) per state would octuple the HBM traffic)."""
    ms = get_static(model)
    n = ms.nv       # tangent/output dim
    n_in = ms.nq    # configuration input rows (nv + 1 for the quat root)
    C = _pad8(n)
    C_in = _pad8(n_in)
    dtype = q.dtype
    B = q.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    # EE selection mirrors kinematics.fk._resolve_ee for ONE effector
    if ee_names is None:
        leaves = [i for i in range(ms.nb)
                  if i not in set(ms.parent)]
        if len(leaves) != 1:
            raise ValueError("ee_names required for multi-leaf models")
        jid, fid = leaves[0], None
    else:
        (name,) = tuple(ee_names)
        if name in model.joint_names:
            jid, fid = model.joint_names.index(name), None
        else:
            fid = model.fixed_frame_names.index(name)
            jid = model.fixed_frame_parent[fid]
    tgt = [float(t) for t in target]

    L = min(block_lanes, 512)
    Bp = ((B + L - 1) // L) * L
    nblocks = Bp // L

    oh = _make_oh(C, dtype)

    def kernel(q_ref, *outs):
        if gn:
            e_ref, g_ref, h_ref = outs
        else:
            (e_ref,) = outs
        q_s = [q_ref[i : i + 1, :] for i in range(n_in)]
        p_ee, cols = ee_chain_lane(ms, q_s, jid, fid, offset)
        e = [ls._add(p_ee[r], -tgt[r]) for r in range(3)]
        full = lambda x: (
            jnp.full((C, L), x, dtype) if ls.is_static(x)
            else jnp.broadcast_to(x, (C, L)).astype(dtype)
        )
        fullrow = lambda x: (
            jnp.full((1, L), x, dtype) if ls.is_static(x)
            else jnp.broadcast_to(x, (1, L)).astype(dtype)
        )
        e_ref[:] = jnp.concatenate(
            [fullrow(e[r]) for r in range(3)]
            + [jnp.zeros((5, L), dtype)], axis=0
        )
        if not gn:
            return
        # Jacobian rows as colscalars: J[r] (C, L), sublane = column index
        J = [0.0, 0.0, 0.0]
        for ci, col in cols:
            m = oh(ci)
            for r in range(3):
                J[r] = ls._add(J[r], ls._mul(m, col[r]))
        g0 = 0.0
        for r in range(3):
            g0 = ls._add(g0, ls._mul(J[r], e[r]))
        g_ref[:] = full(g0)
        # H0 rows: H[i] = sum_r J[r][i] * J[r]  (colscalar per row)
        rows = []
        for i in range(n):
            acc = 0.0
            for r in range(3):
                Jr = J[r]
                Ji = Jr[i : i + 1, :] if not ls.is_static(Jr) else Jr
                acc = ls._add(acc, ls._mul(Ji, Jr))
            rows.append(full(acc))
        h_ref[:] = jnp.stack(rows)

    pack = lambda x, rows, Crows: jnp.pad(
        jnp.swapaxes(x, -1, -2), ((0, Crows - rows), (0, Bp - B))
    )
    spec2 = lambda rows: pl.BlockSpec((rows, L), lambda b: (0, b),
                                      memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((n, C, L), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
    out_specs = (spec2(8),) + ((spec2(C), spec3) if gn else ())
    out_shape = (jax.ShapeDtypeStruct((8, Bp), dtype),) + ((
        jax.ShapeDtypeStruct((C, Bp), dtype),
        jax.ShapeDtypeStruct((n, C, Bp), dtype),
    ) if gn else ())
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec2(C_in)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pack(q, n_in, C_in))
    e = jnp.swapaxes(outs[0], 0, 1)[:B, :3]
    if not gn:
        return e, None, None
    g0 = jnp.swapaxes(outs[1], 0, 1)[:B, :n]
    H0 = jnp.transpose(outs[2], (2, 0, 1))[:B, :, :n]
    return e, g0, H0


def ee_gn_fused_ok(model: RobotModel, flat_batch: int,
                   dtype=jnp.float32, ee_names=None) -> bool:
    """Static + compile-probe gate for ee_gn_fused (kernels.probe).

    ``ee_names`` must match the caller's (the probe compiles the exact
    chain — omitting it on a multi-leaf model makes the probe fail its
    leaf resolution and permanently disables the fused path)."""
    if not model.host_data:
        return False
    if dict(model.host_data).get("Ttree") is None:
        return False
    from .probe import probe_ok

    n = int(model.nq)
    sds = jax.ShapeDtypeStruct((flat_batch, n), jnp.dtype(dtype))
    fn = lambda q: ee_gn_fused(model, q, (0.1, 0.2, 0.3), ee_names=ee_names)
    key = (model.parent, model.joint_type, model.floating_base, flat_batch,
           None if ee_names is None else tuple(ee_names),
           jnp.dtype(dtype).name)
    return probe_ok("ee_gn", key, fn, (sds,), on_tpu=_on_tpu())
