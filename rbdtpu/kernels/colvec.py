"""Column-vectorized lane-scalar kernels: the fused DDP linearization.

The round-1 fused linearization unrolled every gradient COLUMN as a separate
lane-scalar (kernels.fused.rnea_grad_lane), giving O(nb * n) generated code —
tiny for a 7-DoF arm, but a ~20-minute Mosaic compile at quadruped size
(n = 18) and intractable for the humanoid (n = 36).

New layout: gradient/Minv columns live in the SUBLANE dimension.  A
"colscalar" is a (C, L) float32 tile where sublane index = derivative column
(C = nv rounded up to a multiple of 8) and lane index = batch element.  Base
(column-independent) quantities — joint transforms, velocities, accelerations,
forces — are (1, L) lane-scalars that broadcast against colscalars, so ALL of
``kernels.lanescalar``'s entry-wise algebra applies unchanged.  Column
injections (the reference's per-column ``mxS`` inserts, RBDReference.py:
1159,1172-1175,1231) become masked adds with a static (C, 1) one-hot.

Code size drops by ~n (one colscalar op covers all n columns), vector-op
count drops ~3x versus the unrolled kernel (one (C, L) op = ceil(C/8) vreg
ops instead of n separate (8, L) ops), and the same kernel covers fixed AND
floating base — the fb fused linearization the round-1 design had to disable.

Covers reference C4 + C5 + C9 as one device kernel: the gradient passes
``rnea_grad_fpass_dq/dqd`` + ``rnea_grad_bpass_dq/dqd``
(RBDReference.py:1127-1343), ``minv`` (:630-806) and ``forward_dynamics``
(:1371-1374), fused per DDP knot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.robot import RobotModel
from . import lanescalar as ls
from .fused import ModelStatic, get_static, _body_xc, \
    _rnea_sweeps_lane, aba_lane, _on_tpu


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _make_oh(C: int, dtype):
    """One-hot (C, 1) mask selecting derivative column i.  Built from a
    broadcasted iota (pallas kernels may not capture array constants);
    memoized so each column mask is materialized once per trace."""
    cache = {}

    def oh(i: int):
        if i not in cache:
            iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            cache[i] = (iota == i).astype(dtype)
        return cache[i]

    return oh


# ----------------------------------------------------------------------- #
# column-vectorized Minv (reference minv_bpass/minv_fpass, :630-783)      #
# ----------------------------------------------------------------------- #

def minv_colvec(ms: ModelStatic, X, oh):
    """Direct analytical M^-1 with columns in sublanes.

    X: per-body COMPACT (E, r) transform list (``_body_xc``) in base layout.  Returns the n ROWS of the
    upper-triangular-authoritative M^-1, each a colscalar; callers symmetrize
    outside (lower-triangle content is partial, like the reference's dense
    fill from the upper triangle, RBDReference.py:798-805).
    """
    nb, n = ms.nb, ms.nv
    Minv = [0.0] * n  # row i over all columns: colscalar
    F = [ls.vec6(0.0) for _ in range(nb)]  # F[i][r]: colscalar
    IA = [[row[:] for row in ms.I[i]] for i in range(nb)]  # base layout
    U, Dinv = [None] * nb, [None] * nb
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            # 6-wide root block via unrolled Cholesky (S = eye(6));
            # dense fill covers all nv columns (fixes reference fb bug,
            # SURVEY.md §2.1)
            L6 = ls.cholesky6(IA[0])
            eye_cols = [[1.0 if r == k else 0.0 for r in range(6)]
                        for k in range(6)]
            fbinv_cols = [ls.cholesky6_solve(L6, e) for e in eye_cols]
            fbinv = [[fbinv_cols[k][r] for k in range(6)] for r in range(6)]
            for r in range(6):
                acc = Minv[r]
                for k in range(6):
                    acc = ls._add(acc, ls._mul(oh(k), fbinv[r][k]))
                corr = ls.dot(fbinv[r], F[0])  # colscalar
                Minv[r] = ls._add(acc, ls._mul(-1.0, corr))
            continue
        S = ms.S[i]
        mi = ms.vi(i)
        Ui = ls.matvec(IA[i], S)
        Dinv_i = 1.0 / ls.dot(S, Ui)
        U[i], Dinv[i] = Ui, Dinv_i
        sF = ls.dot(S, F[i])  # colscalar
        Minv[mi] = ls._add(Minv[mi], ls._mul(-1.0, ls._mul(Dinv_i, sF)))
        Minv[mi] = ls._add(Minv[mi], ls._mul(oh(mi), Dinv_i))
        if p != -1:
            F[i] = [ls._add(F[i][r], ls._mul(Minv[mi], Ui[r]))
                    for r in range(6)]
            F[p] = ls.vadd(F[p], ls.xc_mtv(X[i], F[i]))
            Ia = ls.mat_combine_sym(IA[i], ls.outer_sym(Ui), -Dinv_i)
            IA[p] = ls.mat_add_sym(IA[p], ls.xc_xtax_sym(X[i], Ia))
    for i in range(nb):
        p = ms.parent[i]
        if p == -1:
            if ms.fb and i == 0:
                F[0] = [Minv[r] for r in range(6)]
            else:
                F[i] = [ls._mul(Minv[i], s) for s in ms.S[i]]
        else:
            mi = ms.vi(i)
            XF = ls.xc_mv(X[i], F[p])
            delta = ls._mul(-1.0, ls._mul(Dinv[i], ls.dot(U[i], XF)))
            Minv[mi] = ls._add(Minv[mi], delta)
            F[i] = [ls._add(ls._mul(Minv[mi], ms.S[i][r]), XF[r])
                    for r in range(6)]
    return Minv


# ----------------------------------------------------------------------- #
# column-vectorized RNEA gradient (reference rnea_grad_*pass_*, :1127-1343)#
# ----------------------------------------------------------------------- #

def grad_pass_colvec(ms: ModelStatic, X, q, qd, v, a, f, oh, wrt: str,
                     gravity: float):
    """One derivative sweep (wrt 'q' or 'qd') with columns in sublanes.

    Fuses the reference's fpass (RBDReference.py:1127/:1189) and bpass
    (:1257/:1299); returns the n rows of dc/d{q,qd}, each a colscalar.
    Floating base: the root-POSE dq columns are analytic — the root pose
    enters tau ONLY through the gravity seed a_0 = X0(q_root) a_grav (v_0 =
    qd[0:6] and the child transforms are pose-independent), so the position
    columns vanish (translation invariance) and the rotation columns seed
    da_0 = [0; (dR/dtheta_j)^T gl] with gl the linear part of
    Xtree_0 a_grav.  (The reference's own fb gradient path is broken,
    SURVEY.md §2.1 — this is validated against AD instead, tests/
    test_kernels.py.)  Root dqd is the identity block.
    """
    nb, n = ms.nb, ms.nv
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    dv, da, df = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        Xi = X[i]
        if ms.fb and i == 0:
            if wrt == "q":
                dv_i = ls.vec6(0.0)
                da_i = ls.vec6(0.0)
                if ms.quat:
                    # TANGENT columns (solver chart, [dtheta; dp]): the root
                    # pose enters tau only via the gravity seed
                    # a0_lin = exp(-dtheta^) E gl, so column j (= tangent
                    # rotation coord j, velocity index j) is w x e_j with
                    # w = E gl = lin(X0 a_grav); translation columns vanish
                    a0 = ls.xc_mv(Xi, a_grav)
                    w0, w1, w2 = a0[3], a0[4], a0[5]
                    neg = lambda t: ls._mul(-1.0, t)
                    cols = (
                        (0.0, w2, neg(w1)),       # w x e_0
                        (neg(w2), 0.0, w0),       # w x e_1
                        (w1, neg(w0), 0.0),       # w x e_2
                    )
                    for j in range(3):
                        for k in range(3):
                            da_i[3 + k] = ls._add(
                                da_i[3 + k], ls._mul(oh(j), cols[j][k])
                            )
                else:
                    # rpy coordinates: columns 3,4,5 seed
                    # da0 = [0; (dR/dtheta_j)^T gl]
                    # gl: linear part of Xtree_0 @ a_grav (static floats; the
                    # angular part of a spatial transform of [0; g] is 0)
                    g6 = ls.matvec(ls.mat_from_static(ms.Xtree[0]), a_grav)
                    gl = g6[3:6]
                    sr, cr = jnp.sin(q[3]), jnp.cos(q[3])
                    sp, cp = jnp.sin(q[4]), jnp.cos(q[4])
                    sy, cy = jnp.sin(q[5]), jnp.cos(q[5])
                    dRs = ls.rpy_dR(sr, cr, sp, cp, sy, cy)
                    for j, dR in enumerate(dRs):  # columns 3,4,5 (rpy)
                        # u = (dR/dtheta_j)^T gl  (E = R^T: dE gl = dR^T gl)
                        for k in range(3):
                            u_k = 0.0
                            for m in range(3):
                                u_k = ls._add(u_k, ls._mul(dR[m][k], gl[m]))
                            da_i[3 + k] = ls._add(
                                da_i[3 + k], ls._mul(oh(3 + j), u_k)
                            )
                df_i = ls.matvec(ms.I[i], da_i)  # dv = 0
            else:
                dv_i = [oh(r) for r in range(6)]  # eye block over columns
                da_i = ls.vec6(0.0)
                Iv = ls.matvec(ms.I[i], v[i])
                df_i = ls.vadd(
                    ls.cross_force(dv_i, Iv),
                    ls.cross_force(v[i], ls.matvec(ms.I[i], dv_i)),
                )
            dv[i], da[i], df[i] = dv_i, da_i, df_i
            continue
        S = ms.S[i]
        ci = ms.vi(i)
        qd_i = qd[ci]
        if p == -1:
            dv_i = ls.vec6(0.0)
            da_b = ls.vec6(0.0)
            Xa_ref = ls.xc_mv(Xi, a_grav)
        else:
            dv_i = ls.xc_mv(Xi, dv[p])
            da_b = ls.xc_mv(Xi, da[p])
            Xa_ref = ls.xc_mv(Xi, a[p])
        if wrt == "q":
            if p != -1:
                Xv = ls.xc_mv(Xi, v[p])
                inj = ls.cross_motion(Xv, S)
                dv_i = [ls._add(dv_i[r], ls._mul(oh(ci), inj[r]))
                        for r in range(6)]
        else:
            dv_i = [ls._add(dv_i[r], ls._mul(oh(ci), S[r]))
                    for r in range(6)]
        cm = ls.cross_motion(dv_i, S)
        da_i = [ls._add(da_b[r], ls._mul(qd_i, cm[r])) for r in range(6)]
        inj_a = ls.cross_motion(Xa_ref if wrt == "q" else v[i], S)
        da_i = [ls._add(da_i[r], ls._mul(oh(ci), inj_a[r]))
                for r in range(6)]
        Iv = ls.matvec(ms.I[i], v[i])
        df_i = ls.vadd(
            ls.vadd(ls.matvec(ms.I[i], da_i), ls.cross_force(dv_i, Iv)),
            ls.cross_force(v[i], ls.matvec(ms.I[i], dv_i)),
        )
        dv[i], da[i], df[i] = dv_i, da_i, df_i

    dc = [0.0] * n
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            for k in range(6):
                dc[k] = df[0][k]
            continue
        S = ms.S[i]
        ci = ms.vi(i)
        dc[ci] = ls.dot(S, df[i])
        if p != -1:
            df[p] = ls.vadd(df[p], ls.xc_mtv(X[i], df[i]))
            if wrt == "q":
                # crf(S) f (NOT -f x S: that identity is revolute-only —
                # see dynamics.rnea_grad.rnea_grad_bpass)
                delta = ls.xc_mtv(X[i], ls.cross_force(S, f[i]))
                df[p] = [ls._add(df[p][r], ls._mul(oh(ci), delta[r]))
                         for r in range(6)]
    return dc


# ----------------------------------------------------------------------- #
# the fused linearization kernel                                           #
# ----------------------------------------------------------------------- #

def _pick_lanes(Bp_hint: int, nb: int, n: int, C: int,
                budget: int = 10 << 20) -> int:
    """Largest lane-block keeping the estimated VMEM live set (df+dv
    colscalar peak + output blocks + slack) under budget."""
    est_cols = nb * 12 + 5 * n + 48
    per_lane = est_cols * C * 4
    for L in (512, 256, 128):
        if per_lane * L <= budget:
            return L
    return 128


def linearize_fused_ok(model: RobotModel, flat_batch: int,
                       dtype=jnp.float32) -> bool:
    """COMPILE PROBE for the fused linearization at this batch size (see
    kernels.probe): False means the solver should keep the jnp
    linearize_trajectory path instead of risking a Mosaic-side crash."""
    from .probe import probe_ok

    n, nq = model.nv, model.nq
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.dtype(dtype))
    fn = lambda q_, qd_, u_: linearize_parts_fused(model, q_, qd_, u_)
    args = (sds(flat_batch, nq), sds(flat_batch, n), sds(flat_batch, n))
    key = (model.parent, model.joint_type, model.floating_base,
           model.root_quat, flat_batch, jnp.dtype(dtype).name)
    return probe_ok("colvec_linearize", key, fn, args, on_tpu=_on_tpu())


def linearize_parts_fused(model: RobotModel, q, qd, u,
                          gravity: float = -9.81,
                          block_lanes: int | None = None,
                          interpret: bool | None = None):
    """Fused knot linearization pieces: q/qd/u (B, n) ->
    (Minv (B, n, n) symmetrized, dcq (B, n, n), dcd (B, n, n), qdd (B, n)).

    One pallas kernel per batch tile runs transform build -> ABA (qdd) ->
    RNEA kinematics/forces -> colvec Minv -> colvec gradient sweeps; HBM
    traffic is exactly inputs + outputs.
    """
    ms = get_static(model)
    n, nq, nb = ms.nv, ms.nq, ms.nb
    C = _pad8(n)
    Cq = _pad8(nq)
    dtype = q.dtype
    B = q.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    L = block_lanes or _pick_lanes(B, nb, n, C)
    Bp = ((B + L - 1) // L) * L
    nblocks = Bp // L

    def pack(x, rows, Crows):
        # (B, rows) -> (Crows, Bp): sublane = coordinate, lane = batch
        xt = jnp.swapaxes(x, -1, -2)
        xt = jnp.pad(xt, ((0, Crows - rows), (0, Bp - B)))
        return xt

    oh = _make_oh(C, dtype)

    def kernel(q_ref, qd_ref, u_ref, minv_ref, dcq_ref, dcd_ref, qdd_ref):
        q_s = [q_ref[i : i + 1, :] for i in range(nq)]
        qd_s = [qd_ref[i : i + 1, :] for i in range(n)]
        u_s = [u_ref[i : i + 1, :] for i in range(n)]
        X = [_body_xc(ms, i, q_s) for i in range(nb)]
        qdd = aba_lane(ms, q_s, qd_s, u_s, gravity, X=X)
        v, a, f, _ = _rnea_sweeps_lane(ms, X, qd_s, qdd, gravity)
        Minv = minv_colvec(ms, X, oh)
        dcq = grad_pass_colvec(ms, X, q_s, qd_s, v, a, f, oh, "q", gravity)
        dcd = grad_pass_colvec(ms, X, q_s, qd_s, v, a, f, oh, "qd", gravity)

        full = lambda x: (
            jnp.full((C, L), x, dtype) if ls.is_static(x)
            else jnp.broadcast_to(x, (C, L)).astype(dtype)
        )
        minv_ref[:] = jnp.stack([full(Minv[i]) for i in range(n)])
        dcq_ref[:] = jnp.stack([full(dcq[i]) for i in range(n)])
        dcd_ref[:] = jnp.stack([full(dcd[i]) for i in range(n)])
        zrow = jnp.zeros((1, L), dtype)
        qdd_ref[:] = jnp.concatenate(
            [jnp.broadcast_to(x, (1, L)) for x in qdd]
            + [zrow] * (C - n),
            axis=0,
        )

    spec2 = lambda rows: pl.BlockSpec((rows, L), lambda b: (0, b),
                                      memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((n, C, L), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
    Mi_pk, dcq_pk, dcd_pk, qdd_pk = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec2(Cq), spec2(C), spec2(C)],
        out_specs=(spec3, spec3, spec3, spec2(C)),
        out_shape=(
            jax.ShapeDtypeStruct((n, C, Bp), dtype),
            jax.ShapeDtypeStruct((n, C, Bp), dtype),
            jax.ShapeDtypeStruct((n, C, Bp), dtype),
            jax.ShapeDtypeStruct((C, Bp), dtype),
        ),
        interpret=interpret,
    )(pack(q, nq, Cq), pack(qd, n, C), pack(u, n, C))
    # (n, C, Bp) -> (B, n, n): [b, row, col]
    unpk = lambda t: jnp.transpose(t, (2, 0, 1))[:B, :, :n]
    Mi_up = unpk(Mi_pk)
    Mi = jnp.triu(Mi_up) + jnp.swapaxes(jnp.triu(Mi_up, 1), -1, -2)
    qdd_out = jnp.swapaxes(qdd_pk, 0, 1)[:B, :n]
    return Mi, unpk(dcq_pk), unpk(dcd_pk), qdd_out


def linearize_fused(model: RobotModel, q, qd, u, dt: float,
                    gravity: float = -9.81, block_lanes: int | None = None,
                    interpret: bool | None = None):
    """Fused DDP linearization: q/qd/u (B, n) -> A (B, 2n, 2n), B (B, 2n, n).

    The "fused batched Jacobian kernel feeding the DDP backward sweep"
    (SURVEY.md C4): the colvec pallas kernel produces Minv/dcq/dcd/qdd
    (analytic floating-base root-pose columns included), then
    gq = -Minv dcq etc. and the discrete-step assembly run as ordinary XLA
    (fusible elementwise + small batched matmuls).  Fixed AND floating base.
    """
    from ..spatial.batched import mm
    from ..solver.integrate import step_jacobians

    Mi, dcq, dcd, qdd = linearize_parts_fused(
        model, q, qd, u, gravity, block_lanes, interpret
    )
    gq = -mm(Mi, dcq)
    gd = -mm(Mi, dcd)
    qd_new = qd + dt * qdd if model.root_quat else None
    return step_jacobians(model, Mi, gq, gd, dt, qd_new=qd_new)
