"""Fused whole-algorithm Pallas kernels for the rollout hot path.

One kernel = one full dynamics step: every intermediate of the tree sweeps
lives in VMEM/vregs, nothing round-trips through HBM (the jnp path materializes
~100 small intermediates per step).  States are tiled (8, L) across
sublanes x lanes (see kernels.lanescalar); model constants are folded into the
traced kernel as python floats, producing model-specialized code — the
TPU-native analog of the robot-specific codegen the reference was built to
validate (README.md:5).

Fixed AND floating base, both root parameterizations (rpy: lane trig
transform; quaternion: polynomial lane quat_R + manifold lane integrator
``_integrate_q_lane``; the root solve is the unrolled 6x6 lane Cholesky
either way).  The fused DDP linearization lives in kernels.colvec
(columns-in-sublanes layout).  Fallback: off-TPU the same kernels run under
pallas interpret mode, bit-matching semantics for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.robot import RobotModel
from ..spatial.transforms import PRISMATIC
from . import lanescalar as ls


# ----------------------------------------------------------------------- #
# static model extraction (host-side, python floats)                      #
# ----------------------------------------------------------------------- #

class ModelStatic:
    """Host-side python-float model constants, built from RobotModel.host_data
    (STATIC metadata, so extraction works even when the model's numeric leaves
    are tracers — e.g. closed over inside a lax.scan body)."""

    def __init__(self, parent, jtype, host_data, floating_base=False,
                 root_quat=False):
        self.nb = len(parent)
        self.parent = parent
        self.jtype = jtype
        self.fb = bool(floating_base)
        self.quat = bool(root_quat)
        d = dict(host_data)
        self.axis = [list(a) for a in d["axis"]]
        self.Xtree = [[list(r) for r in X] for X in d["Xtree"]]
        self.I = [[list(r) for r in M] for M in d["I"]]
        self.S = [list(s) for s in d["S"]]
        # homogeneous tree data (absent on models built before it was added
        # to host_data; the FK kernels check for None)
        self.Ttree = (
            [[list(r) for r in T] for T in d["Ttree"]]
            if "Ttree" in d else None
        )
        self.T_fixed = (
            [[list(r) for r in T] for T in d["T_fixed"]]
            if "T_fixed" in d else None
        )
        self.nv = self.nb + 5 if self.fb else self.nb
        self.nq = self.nv + 1 if self.quat else self.nv

    def qi(self, i):
        """q-list index of 1-DoF joint i (root handled separately for fb)."""
        if self.quat:
            return i + 6
        return i + 5 if self.fb else i

    def vi(self, i):
        """velocity-list index of 1-DoF joint i."""
        return i + 5 if self.fb else i


@functools.lru_cache(maxsize=32)
def _static_cache(parent, jtype, host_data, fb, quat):
    return ModelStatic(parent, jtype, host_data, fb, quat)


def get_static(model: RobotModel) -> ModelStatic:
    if not model.host_data:
        raise ValueError(
            "model has no host_data; rebuild it with rbdtpu.model.make_model"
        )
    return _static_cache(model.parent, model.joint_type, model.host_data,
                         model.floating_base, model.root_quat)


# ----------------------------------------------------------------------- #
# lane-scalar sweeps (usable inside pallas kernels AND plain jit)         #
# ----------------------------------------------------------------------- #

def _joint_x(ms: ModelStatic, i: int, qi):
    if ms.jtype[i] == PRISMATIC:
        return ls.prismatic_x(ms.axis[i], ms.Xtree[i], qi)
    s, c = jnp.sin(qi), jnp.cos(qi)
    return ls.revolute_x(ms.axis[i], ms.Xtree[i], s, c)


# --- compact (E, r) transform builders (see lanescalar "compact Plücker") --

def _split_xtree(ms: ModelStatic):
    """(E_t, r_t) static split of every Xtree, cached on the ModelStatic."""
    if not hasattr(ms, "_xc_tree"):
        ms._xc_tree = [ls.plux_split_static(X) for X in ms.Xtree]
    return ms._xc_tree


def _joint_xc(ms: ModelStatic, i: int, qi):
    """Compact X = XJ(q) @ Xtree: plux(E1,r1)@plux(E2,r2) =
    plux(E1 E2, r2 + E2^T r1).  Revolute: r1 = 0 -> r STATIC = r_t.
    Prismatic: E1 = I -> E STATIC = E_t, r = r_t + E_t^T (axis q)."""
    Et, rt = _split_xtree(ms)[i]
    if ms.jtype[i] == PRISMATIC:
        d = [ls._mul(float(a), qi) for a in ms.axis[i]]
        return [row[:] for row in Et], ls.vadd(rt, ls.mtv3(Et, d))
    s, c = jnp.sin(qi), jnp.cos(qi)
    EJ = ls.rot3_coord(ms.axis[i], s, c)
    return ls.matmat(EJ, Et), list(rt)


def _body_xc(ms: ModelStatic, i: int, q):
    """Compact per-body transform from the full q scalar list (fb root:
    plux(R^T, p) @ Xtree -> E = R^T E_t, r = r_t + E_t^T p)."""
    if ms.fb and i == 0:
        Et, rt = _split_xtree(ms)[0]
        if ms.quat:
            R = ls.quat_R(q[3], q[4], q[5], q[6])
        else:
            sr, cr = jnp.sin(q[3]), jnp.cos(q[3])
            sp, cp = jnp.sin(q[4]), jnp.cos(q[4])
            sy, cy = jnp.sin(q[5]), jnp.cos(q[5])
            R = ls.rpy_R(sr, cr, sp, cp, sy, cy)
        Rt = [[R[j][i] for j in range(3)] for i in range(3)]  # R^T
        E = ls.matmat(Rt, Et)
        r = ls.vadd(rt, ls.mtv3(Et, [q[0], q[1], q[2]]))
        return E, r
    return _joint_xc(ms, i, q[ms.qi(i)])


def _body_x(ms: ModelStatic, i: int, q):
    """Transform of body i from the full q scalar list (fb root = 6-DoF
    rpy+xyz joint, matching spatial.transforms.floating_spatial_x; quat root
    = xyz + wxyz, matching floating_quat_spatial_x)."""
    if ms.fb and i == 0:
        if ms.quat:
            R = ls.quat_R(q[3], q[4], q[5], q[6])
        else:
            sr, cr = jnp.sin(q[3]), jnp.cos(q[3])
            sp, cp = jnp.sin(q[4]), jnp.cos(q[4])
            sy, cy = jnp.sin(q[5]), jnp.cos(q[5])
            R = ls.rpy_R(sr, cr, sp, cp, sy, cy)
        return ls.floating_x(ms.Xtree[0], q[0], q[1], q[2], R)
    return _joint_x(ms, i, q[ms.qi(i)])


def _vj(ms: ModelStatic, i: int, u):
    """Joint-space velocity/acceleration contribution from a full nv list."""
    if ms.fb and i == 0:
        return list(u[0:6])
    return ls.vscale(u[ms.vi(i)], ms.S[i])


def _xa_chain(ms: ModelStatic, X):
    """World->body compact transforms down the tree: Xa[i] = X[i] o Xa[p]
    (the corrected reference-C8 ancestor chain, in (E, r) compact form)."""
    Xa = [None] * ms.nb
    for i in range(ms.nb):
        p = ms.parent[i]
        Xa[i] = X[i] if p == -1 else ls.xc_compose(X[i], Xa[p])
    return Xa


def _apply_fext_lane(ms: ModelStatic, X, f_list, f_ext):
    """Subtract world-frame wrenches from per-body forces:
    f[i] -= Xa[i]^{-T} f_ext[i] — the lane twin of
    dynamics.rnea.apply_external_forces.  f_ext: list of nb 6-lists."""
    Xa = _xa_chain(ms, X)
    return [
        ls.vsub(f_list[i], ls.xc_fvT(Xa[i], f_ext[i]))
        for i in range(ms.nb)
    ]


def rnea_lane(ms: ModelStatic, q, qd, qdd=None, gravity: float = -9.81,
              f_ext=None):
    """Lane-scalar RNEA: q/qd/qdd are lists of n lane-scalars; f_ext an
    optional list of nb world-frame wrench 6-lists (exact
    dynamics.rnea(f_ext) semantics).  Returns tau (list of n lane-scalars).
    """
    nb = ms.nb
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    X, v, a, f = [None] * nb, [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        Xi = _body_xc(ms, i, q)
        vJ = _vj(ms, i, qd)
        if p == -1:
            vi = vJ
            ai = ls.xc_mv(Xi, a_grav)
        else:
            vi = ls.vadd(ls.xc_mv(Xi, v[p]), vJ)
            ai = ls.xc_mv(Xi, a[p])
        ai = ls.vadd(ai, ls.cross_motion(vi, vJ))
        if qdd is not None:
            ai = ls.vadd(ai, _vj(ms, i, qdd))
        Iv = ls.matvec(ms.I[i], vi)
        fi = ls.vadd(ls.matvec(ms.I[i], ai), ls.cross_force(vi, Iv))
        X[i], v[i], a[i], f[i] = Xi, vi, ai, fi

    if f_ext is not None:
        f = _apply_fext_lane(ms, X, f, f_ext)

    tau = [None] * (ms.nv)
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            for k in range(6):
                tau[k] = f[0][k]
        else:
            tau[ms.vi(i)] = ls.dot(ms.S[i], f[i])
        if p != -1:
            f[p] = ls.vadd(f[p], ls.xc_mtv(X[i], f[i]))
    return tau


def aba_lane(ms: ModelStatic, q, qd, tau, gravity: float = -9.81, X=None,
             f_ext=None):
    """Lane-scalar ABA: returns qdd (list of n lane-scalars).  Pass
    precomputed COMPACT (E, r) transforms via ``X`` (``_body_xc``) to share
    them with other sweeps.  f_ext: optional list of nb world-frame wrench
    6-lists subtracted from the bias forces (dynamics.aba(f_ext) semantics;
    reference hook RBDReference.py:877-878)."""
    nb = ms.nb
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    v, cb, pA = [None] * nb, [None] * nb, [None] * nb
    X = list(X) if X is not None else [None] * nb
    IA = [[row[:] for row in ms.I[i]] for i in range(nb)]
    for i in range(nb):
        p = ms.parent[i]
        Xi = X[i] if X[i] is not None else _body_xc(ms, i, q)
        vJ = _vj(ms, i, qd)
        if p == -1:
            vi = vJ
            ci = ls.vec6(0.0)
        else:
            vi = ls.vadd(ls.xc_mv(Xi, v[p]), vJ)
            ci = ls.cross_motion(vi, vJ)
        Iv = ls.matvec(ms.I[i], vi)
        X[i], v[i], cb[i] = Xi, vi, ci
        pA[i] = ls.cross_force(vi, Iv)

    if f_ext is not None:
        pA = _apply_fext_lane(ms, X, pA, f_ext)

    U, dinv, u_ = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            # 6-wide root block: handled in sweep 3 via cholesky6
            u_[i] = [tau[k] - pA[0][k] for k in range(6)]
            continue
        S = ms.S[i]
        Ui = ls.matvec(IA[i], S)
        di = ls.dot(S, Ui)
        dinv_i = 1.0 / di
        ui = tau[ms.vi(i)] - ls.dot(S, pA[i])
        U[i], dinv[i], u_[i] = Ui, dinv_i, ui
        if p != -1:
            Ia = ls.mat_combine_sym(
                IA[i], ls.outer_sym(Ui), -dinv_i
            )
            pa = ls.vadd(
                pA[i],
                ls.vadd(ls.matvec(Ia, cb[i]), ls.vscale(ui * dinv_i, Ui)),
            )
            IA[p] = ls.mat_add_sym(IA[p], ls.xc_xtax_sym(X[i], Ia))
            pA[p] = ls.vadd(pA[p], ls.xc_mtv(X[i], pa))

    qdd = [None] * (ms.nv)
    acc = [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        if p == -1:
            ai = ls.xc_mv(X[i], a_grav)
        else:
            ai = ls.xc_mv(X[i], acc[p])
        ai = ls.vadd(ai, cb[i])
        if ms.fb and i == 0:
            # qdd_root = IA0^{-1} (u - IA0 a) ... with U = D = IA0 (S = eye):
            # rhs = u - IA0 @ a, solve IA0 qdd = rhs
            rhs = ls.vsub(u_[0], ls.matvec(IA[0], ai))
            L6 = ls.cholesky6(IA[0])
            qdd_root = ls.cholesky6_solve(L6, rhs)
            for k in range(6):
                qdd[k] = qdd_root[k]
            acc[i] = ls.vadd(ai, qdd_root)
        else:
            qdd_i = (u_[i] - ls.dot(U[i], ai)) * dinv[i]
            acc[i] = ls.vadd(ai, ls.vscale(qdd_i, ms.S[i]))
            qdd[ms.vi(i)] = qdd_i
    return qdd


# ----------------------------------------------------------------------- #
# pallas wrappers                                                          #
# ----------------------------------------------------------------------- #

def _pad_batch(B: int) -> int:
    """Pad the state batch so lane tiles are multiples of 128 (the Mosaic
    block-shape requirement): B -> multiple of 8*128, unless B/8 already fits
    in one full-width block."""
    B8 = ((B + 7) // 8) * 8
    if B8 // 8 <= 512:
        return B8  # single full-array block of any width is allowed
    return ((B8 + 1023) // 1024) * 1024


def _pick_lanes(B_pad: int, cap: int = 512) -> int:
    """Largest lane-block (multiple of 128, or the full width) dividing
    B_pad//8 and <= cap."""
    rows = B_pad // 8
    if rows <= cap:
        return rows
    for L in (512, 384, 256, 128):
        if L <= cap and rows % L == 0:
            return L
    return rows  # fall back to one full-width block


def _on_tpu() -> bool:
    # device kind covers both the standard "tpu" backend and tunnel/plugin
    # platforms (e.g. "axon") that expose TPU devices under another name
    if jax.default_backend() == "tpu":
        return True
    try:
        return "TPU" in jax.devices()[0].device_kind
    except Exception:
        return False


def _pack(x, n):
    """(..., B, n) -> list of n (..., 8, B/8) lane-scalars (leading dims must
    be absent here: x is (B, n))."""
    B = x.shape[-2]
    xt = jnp.transpose(x, (1, 0)).reshape(n, 8, B // 8)
    return xt


def _unpack(xt, B):
    n = xt.shape[0]
    return jnp.transpose(xt.reshape(n, B), (1, 0))


def rnea_fused(model: RobotModel, q, qd, qdd=None, gravity: float = -9.81,
               block_lanes: int = 512, interpret: bool | None = None):
    """Fused-RNEA torque: q/qd/qdd (B, n) -> tau (B, n); B divisible by 8.

    On TPU this is ONE pallas kernel per block of 8*block_lanes states; off
    TPU it runs in interpret mode (tests) unless interpret=False.
    """
    ms = get_static(model)
    nq, nv = ms.nq, ms.nv
    B = q.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    Bp = _pad_batch(B)
    pad = lambda x: (
        x if Bp == B else jnp.concatenate(
            [x, jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)], axis=0)
    )
    q, qd = pad(q), pad(qd)
    if qdd is not None:
        qdd = pad(qdd)
    L = _pick_lanes(Bp, block_lanes)
    nblocks = (Bp // 8) // L

    has_qdd = qdd is not None

    def kernel(q_ref, qd_ref, *rest):
        if has_qdd:
            qdd_ref, tau_ref = rest
        else:
            (tau_ref,) = rest
        q_s = [q_ref[i] for i in range(nq)]
        qd_s = [qd_ref[i] for i in range(nv)]
        qdd_s = [rest[0][i] for i in range(nv)] if has_qdd else None
        tau = rnea_lane(ms, q_s, qd_s, qdd_s, gravity)
        for i in range(nv):
            tau_ref[i] = tau[i]

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
    ins = [_pack(q, nq), _pack(qd, nv)]
    in_specs = [mkspec(nq), mkspec(nv)]
    if has_qdd:
        ins.append(_pack(qdd, nv))
        in_specs.append(mkspec(nv))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=mkspec(nv),
        out_shape=jax.ShapeDtypeStruct((nv, 8, Bp // 8), q.dtype),
        interpret=interpret,
    )(*ins)
    return _unpack(out, Bp)[:B]


def _integrate_q_lane(ms: ModelStatic, q_s, qd_new, dt):
    """Lane twin of the semi-implicit position update: flat q + dt*qd' for
    1-DoF/rpy coordinates, manifold retraction for a quaternion root
    (p' = p + dt R(quat) v', quat' = quat (x) exp(dt w') — matching
    solver.integrate.config_retract).  Returns the nq-list q'."""
    if not (ms.fb and ms.quat):
        return [q_s[i] + dt * qd_new[i] for i in range(ms.nq)]
    R = ls.quat_R(q_s[3], q_s[4], q_s[5], q_s[6])
    w, v = qd_new[0:3], qd_new[3:6]
    p_new = [
        q_s[k] + dt * (R[k][0] * v[0] + R[k][1] * v[1] + R[k][2] * v[2])
        for k in range(3)
    ]
    quat_new = ls.quat_step(q_s[3], q_s[4], q_s[5], q_s[6],
                            w[0], w[1], w[2], dt)
    joints = [q_s[7 + j] + dt * qd_new[6 + j] for j in range(ms.nb - 1)]
    return p_new + list(quat_new) + joints


def _fext_lists(ms: ModelStatic, fe_ref):
    """Packed (nb*6) rows -> list of nb wrench 6-lists."""
    return [
        [fe_ref[i * 6 + k] for k in range(6)] for i in range(ms.nb)
    ]


def _pack_fext(ms: ModelStatic, f_ext, B, Bp, dtype):
    """(nb, 6) or (B, nb, 6) world wrenches -> packed (nb*6, 8, Bp//8)."""
    nbw = ms.nb * 6
    fe = jnp.asarray(f_ext, dtype)
    fe = jnp.broadcast_to(fe, (B, ms.nb, 6)).reshape(B, nbw)
    if Bp != B:
        fe = jnp.concatenate(
            [fe, jnp.zeros((Bp - B, nbw), fe.dtype)], axis=0)
    return _pack(fe, nbw)


def fd_step_fused(model: RobotModel, x, u, dt: float,
                  gravity: float = -9.81, block_lanes: int = 512,
                  interpret: bool | None = None, f_ext=None):
    """Fused ABA + semi-implicit Euler step: x (B, 2n), u (B, n) -> x' (B, 2n).

    The entire forward-dynamics step — transform build, 3 ABA sweeps,
    integration — is one pallas kernel; HBM traffic is exactly inputs+outputs.
    f_ext: optional (nb, 6) or (B, nb, 6) world-frame wrenches applied inside
    the kernel (exact dynamics.aba(f_ext) semantics; Xa chain in compact
    (E, r) form).
    """
    ms = get_static(model)
    nq, nv = ms.nq, ms.nv
    nx = nq + nv
    B = x.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    Bp = _pad_batch(B)
    fe_pk = (None if f_ext is None
             else _pack_fext(ms, f_ext, B, Bp, x.dtype))
    if Bp != B:
        padz = lambda t: jnp.concatenate(
            [t, jnp.zeros((Bp - B,) + t.shape[1:], t.dtype)], axis=0)
        x, u = padz(x), padz(u)
    L = _pick_lanes(Bp, block_lanes)
    nblocks = (Bp // 8) // L
    has_fe = fe_pk is not None

    def kernel(x_ref, u_ref, *rest):
        out_ref = rest[-1]
        q_s = [x_ref[i] for i in range(nq)]
        qd_s = [x_ref[nq + i] for i in range(nv)]
        tau_s = [u_ref[i] for i in range(nv)]
        fe = _fext_lists(ms, rest[0]) if has_fe else None
        q_new, qd_new = _step_lane(ms, q_s, qd_s, tau_s, dt, gravity,
                                   route="aba", f_ext=fe)
        for i in range(nv):
            out_ref[nq + i] = qd_new[i]
        for i in range(nq):
            out_ref[i] = q_new[i]

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
    spec_x = mkspec(nx)
    in_specs = [spec_x, mkspec(nv)]
    ins = [_pack(x, nx), _pack(u, nv)]
    if has_fe:
        in_specs.append(mkspec(ms.nb * 6))
        ins.append(fe_pk)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((nx, 8, Bp // 8), x.dtype),
        interpret=interpret,
    )(*ins)
    return _unpack(out, Bp)[:B]


def step_fused_ok(model: RobotModel, batch_total: int,
                  dtype=jnp.float32) -> bool:
    """COMPILE PROBE for fd_step_fused at this batch/dtype.  Exists mainly
    for NON-f32 dtypes (r5 bf16 MPPI sampling): the lane kernels were
    designed around f32 (8, 128) tiles, and Mosaic's bf16 tiling of the
    same 8-sublane blocks must be proven by compilation, not assumed."""
    if batch_total % 8 != 0:
        return False
    from .probe import probe_ok

    ms = get_static(model)
    nx = ms.nq + ms.nv
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.dtype(dtype))
    fn = lambda x, u: fd_step_fused(model, x, u, 0.01)
    args = (sds(batch_total, nx), sds(batch_total, ms.nv))
    key = (model.parent, model.joint_type, model.floating_base,
           model.root_quat, _pad_batch(batch_total), jnp.dtype(dtype).name)
    return probe_ok("fd_step", key, fn, args, on_tpu=_on_tpu())


def _feedback_rows_total(nx: int, nv: int, ndx: int) -> int:
    """Sublane rows live in VMEM per lane-column of the feedback kernel:
    inputs x, X_t (nx each), U_t, k_t (nv each), K_t (nv*ndx) + outputs
    x_new (nx), u (nv)."""
    return 3 * nx + 3 * nv + nv * ndx


def feedback_lane_budget(nx: int, nv: int, ndx: int,
                         extra_rows: int = 0) -> int:
    """Max lane-block width whose double-buffered footprint fits the ~16MB
    scoped-VMEM limit (6MB single-buffered budget — measured: the Mosaic
    stack allocates ~1.9x the block bytes).  The K gain block (nv*ndx rows)
    dominates: humanoid-size K fits only at narrow lane widths, i.e. small
    (alpha x batch) products.  extra_rows: additional streamed rows (the
    f_ext wrench block when present)."""
    per_lane = (_feedback_rows_total(nx, nv, ndx) + extra_rows) * 8 * 4
    return (6 * 1024 * 1024) // per_lane


def feedback_fused_ok(model: RobotModel, batch_total: int,
                      dtype=jnp.float32, with_fext: bool = False) -> bool:
    """True when feedback_rollout_fused can run batch_total trajectories
    (the solver's alpha-ladder x problem batch) without blowing scoped VMEM
    or degenerating to sub-128-lane blocks at large batch.

    Two gates: the static VMEM budget model, then (on TPU) a COMPILE PROBE of
    the exact kernel layout — the budget model approving a config is not
    proof Mosaic accepts it (kernels.probe), so the probe is authoritative:
    a config that fails to compile degrades to the jnp forward pass instead
    of crashing the solve."""
    if batch_total % 8 != 0:
        return False
    nv = int(model.nv)
    nx = int(model.nq) + nv
    BT = _pad_batch(batch_total) // 8
    if feedback_lane_budget(nx, nv, 2 * nv) < min(BT, 128):
        return False
    from .probe import probe_ok

    ndx = 2 * nv
    Bp = _pad_batch(batch_total)
    sds = lambda *s: jax.ShapeDtypeStruct(s, dtype)
    if with_fext:
        fn = lambda x0, Xn, Un, kf, Kf, F: feedback_rollout_fused(
            model, x0, Xn, Un, kf, Kf, 0.01, f_ext=F
        )
        args = (sds(batch_total, nx), sds(batch_total, 1, nx),
                sds(batch_total, 1, nv), sds(batch_total, 1, nv),
                sds(batch_total, 1, nv, ndx), sds(1, int(model.nb), 6))
    else:
        fn = lambda x0, Xn, Un, kf, Kf: feedback_rollout_fused(
            model, x0, Xn, Un, kf, Kf, 0.01
        )
        args = (sds(batch_total, nx), sds(batch_total, 1, nx),
                sds(batch_total, 1, nv), sds(batch_total, 1, nv),
                sds(batch_total, 1, nv, ndx))
    key = (model.parent, model.joint_type, model.floating_base,
           model.root_quat, Bp, jnp.dtype(dtype).name, with_fext)
    return probe_ok("feedback_rollout", key, fn, args, on_tpu=_on_tpu())


def _dx_rows(ms: ModelStatic, x, xn):
    """Tangent state diff dx (list of 2*nv lane scalars) between the current
    packed state x and the nominal xn (lists of nx rows) — the in-kernel twin
    of solver.integrate.state_diff (flat difference unless quaternion root,
    which takes the manifold diff [quat_log_rel, R0^T dp, flat rows])."""
    nx = ms.nq + ms.nv
    if not (ms.fb and ms.quat):
        return [x[i] - xn[i] for i in range(nx)]
    dth = ls.quat_log_rel(
        (xn[3], xn[4], xn[5], xn[6]), (x[3], x[4], x[5], x[6])
    )
    R0 = ls.quat_R(xn[3], xn[4], xn[5], xn[6])
    d = [x[i] - xn[i] for i in range(3)]
    dp = [
        R0[0][k] * d[0] + R0[1][k] * d[1] + R0[2][k] * d[2]
        for k in range(3)
    ]  # R0^T (p - p_nom): world delta in nominal body frame
    return list(dth) + dp + [x[i] - xn[i] for i in range(7, nx)]


def feedback_rollout_fused(model: RobotModel, x0, X_nom, U_nom, k_ff, K_fb,
                           dt: float, gravity: float = -9.81,
                           u_clip=None, interpret: bool | None = None,
                           f_ext=None):
    """Closed-loop line-search rollout with the FEEDBACK LAW fused into the
    dynamics kernel, scanning in packed lane layout.

    The DDP forward pass previously interleaved, per knot: a jnp feedback
    (u = U + a k + K dx), a (B, n)->(n, 8, L) pack, the fused dynamics
    kernel, and an unpack — two layout round-trips through HBM and several
    fusion boundaries per step, which dominated the MPC iteration (62% of
    iter time at the arm benchmark).  Here everything is packed ONCE up
    front (one transpose per input for the whole horizon), the lax.scan
    carries the packed state, and each step is ONE kernel: dx = x - X_t,
    u = U_t + k_t + K_t dx (the alpha ladder is pre-folded into k_ff),
    ABA, semi-implicit Euler — no per-step layout ops at all.

    x0 (B, nx); X_nom/U_nom/k_ff (B, H, nx/nv/nv); K_fb (B, H, nv, 2*nv).
    Returns (X_new (B, H, nx) — states 1..H, U_new (B, H, nv)).
    The state difference feeding the gains is the TANGENT diff
    (solver.integrate.state_diff): the flat x - X_t for fixed-base and rpy
    roots (nx == 2*nv), and for the quaternion root the in-kernel manifold
    diff [quat_log_rel, R0^T dp, flat joint/velocity rows] (2*nv != nx).

    u_clip: optional per-joint effort box — STATIC (the model's URDF
    limits); folded into the kernel as lane-constant clamps on the applied
    controls (Tassa-style clamped line search, matching forward_pass).
    """
    ms = get_static(model)
    nq, nv = ms.nq, ms.nv
    nx = nq + nv
    ndx = 2 * nv  # tangent dim (== nx unless quaternion root)
    B, H = U_nom.shape[-3], U_nom.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    Bp = _pad_batch(B)
    if Bp != B:
        x0 = jnp.concatenate(
            [x0, jnp.zeros((Bp - B, nx), x0.dtype)], axis=0)
        X_nom = jnp.concatenate(
            [X_nom, jnp.zeros((Bp - B, H, nx), X_nom.dtype)], axis=0)
        U_nom = jnp.concatenate(
            [U_nom, jnp.zeros((Bp - B, H, nv), U_nom.dtype)], axis=0)
        k_ff = jnp.concatenate(
            [k_ff, jnp.zeros((Bp - B, H, nv), k_ff.dtype)], axis=0)
        K_fb = jnp.concatenate(
            [K_fb, jnp.zeros((Bp - B, H, nv, ndx), K_fb.dtype)], axis=0)
    if ms.fb and ms.quat:
        # padded lanes run the kernel too: identity quats keep quat_log_rel
        # and the root solve finite on the padding
        x0 = x0.at[B:, 3].set(1.0) if Bp != B else x0
        X_nom = X_nom.at[B:, :, 3].set(1.0) if Bp != B else X_nom
    # static per-joint clamp constants, folded into the kernel at trace time
    lims = None if u_clip is None else [float(v) for v in np.asarray(u_clip)]
    BT = Bp // 8
    allowed = feedback_lane_budget(
        nx, nv, ndx, extra_rows=(ms.nb * 6 if f_ext is not None else 0))
    L = _pick_lanes(Bp, min(512, allowed))
    if L > allowed:  # _pick_lanes full-width fallback would blow VMEM
        cands = [d for d in range(1, min(allowed, BT) + 1) if BT % d == 0]
        if not cands:
            raise ValueError(
                f"feedback kernel K block (nv*ndx={nv * ndx}) exceeds VMEM "
                "even at 1 lane; use the jnp forward pass"
            )
        L = max(cands)
    nblocks = BT // L

    # pack the whole horizon once: (B, H, r) -> (H, r, 8, BT)
    packH = lambda a, r: jnp.transpose(a, (1, 2, 0)).reshape(H, r, 8, BT)
    Xn_p = packH(X_nom, nx)
    Un_p = packH(U_nom, nv)
    k_p = packH(k_ff, nv)
    K_p = packH(K_fb.reshape(Bp, H, nv * ndx), nv * ndx)
    x_p = _pack(x0, nx)
    has_fe = f_ext is not None
    nbw = ms.nb * 6
    if has_fe:
        # (H, nb, 6) shared across the packed batch -> lane-broadcast rows
        fe_p = jnp.broadcast_to(
            jnp.asarray(f_ext, x0.dtype).reshape(H, nbw, 1, 1),
            (H, nbw, 8, BT),
        )

    def _body(x, Xt, Ut, kt, Kt, fe):
        dx = _dx_rows(ms, x, Xt)
        u = []
        for i in range(nv):
            acc = Ut[i] + kt[i]
            for j in range(ndx):
                acc = acc + Kt[i * ndx + j] * dx[j]
            if lims is not None and np.isfinite(lims[i]):
                acc = jnp.clip(acc, -lims[i], lims[i])
            u.append(acc)
        q_s, qd_s = x[:nq], x[nq:]
        qdd = aba_lane(ms, q_s, qd_s, u, gravity, f_ext=fe)
        qd_new = [qd_s[i] + dt * qdd[i] for i in range(nv)]
        q_new = _integrate_q_lane(ms, q_s, qd_new, dt)
        return q_new, qd_new, u

    def kernel(x_ref, Xt_ref, Ut_ref, kt_ref, Kt_ref, *rest):
        from .ilpsched import ilp_call
        xo_ref, uo_ref = rest[-2], rest[-1]
        x = [x_ref[i] for i in range(nx)]
        fe = _fext_lists(ms, rest[0]) if has_fe else None
        q_new, qd_new, u = ilp_call(
            _body, x, [Xt_ref[i] for i in range(nx)],
            [Ut_ref[i] for i in range(nv)], [kt_ref[i] for i in range(nv)],
            [Kt_ref[i] for i in range(nv * ndx)], fe)
        for i in range(nq):
            xo_ref[i] = q_new[i]
        for i in range(nv):
            xo_ref[nq + i] = qd_new[i]
            uo_ref[i] = u[i]

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
    in_specs = [mkspec(nx), mkspec(nx), mkspec(nv), mkspec(nv),
                mkspec(nv * ndx)]
    if has_fe:
        in_specs.append(mkspec(nbw))
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=(mkspec(nx), mkspec(nv)),
        out_shape=(jax.ShapeDtypeStruct((nx, 8, BT), x0.dtype),
                   jax.ShapeDtypeStruct((nv, 8, BT), x0.dtype)),
        interpret=interpret,
    )

    def step(x_c, inp):
        Xt, Ut, kt, Kt = inp[:4]
        ops = (x_c, Xt, Ut, kt, Kt) + ((inp[4],) if has_fe else ())
        x_new, u = call(*ops)
        return x_new, (x_new, u)

    scan_in = (Xn_p, Un_p, k_p, K_p) + ((fe_p,) if has_fe else ())
    _, (X_st, U_st) = jax.lax.scan(step, x_p, scan_in)
    # (H, r, 8, BT) -> (B, H, r): one transpose for the whole trajectory
    unpackH = lambda a, r: jnp.transpose(
        a.reshape(H, r, Bp), (2, 0, 1)
    )[:B]
    return unpackH(X_st, nx), unpackH(U_st, nv)


def feedback_chunks(model: RobotModel, batch_total: int,
                    max_chunks: int = 8) -> int | None:
    """Smallest K-gain chunk count (1..max_chunks) whose per-call VMEM
    footprint allows >= 128-lane blocks at this batch (or covers the whole
    batch) — the enabling condition for feedback_rollout_fused_chunked when
    the unchunked kernel's K block (nv * 2nv rows) exceeds the budget at
    humanoid size.  None when even max_chunks doesn't fit."""
    if batch_total % 8 != 0:
        return None
    nv = int(model.nv)
    nx = int(model.nq) + nv
    ndx = 2 * nv
    BT = _pad_batch(batch_total) // 8
    for c in range(1, max_chunks + 1):
        cw = -(-ndx // c)
        # chunk kernel holds x, Xt (nx each), the K chunk, u partial (nv)
        rows = 2 * nx + nv * cw + nv
        lanes = (6 * 1024 * 1024) // (rows * 8 * 4)
        if lanes >= min(BT, 128):
            return c
    return None


def feedback_chunked_ok(model: RobotModel, batch_total: int,
                        dtype=jnp.float32,
                        with_fext: bool = False) -> int | None:
    """Chunk count for feedback_rollout_fused_chunked at this batch, or None
    when no chunking fits — the large-K fallback tier behind
    feedback_fused_ok (VERDICT r2 next #7: humanoid-size K blocks).  Same
    two-gate structure: the static budget picks a candidate, then a compile
    probe of the exact layout is authoritative (kernels.probe)."""
    c = feedback_chunks(model, batch_total)
    if c is None:
        return None
    from .probe import probe_ok

    nv = int(model.nv)
    nx = int(model.nq) + nv
    ndx = 2 * nv
    Bp = _pad_batch(batch_total)
    sds = lambda *s: jax.ShapeDtypeStruct(s, dtype)
    if with_fext:
        fn = lambda x0, Xn, Un, kf, Kf, F: feedback_rollout_fused_chunked(
            model, x0, Xn, Un, kf, Kf, 0.01, nchunks=c, f_ext=F
        )
        args = (sds(batch_total, nx), sds(batch_total, 1, nx),
                sds(batch_total, 1, nv), sds(batch_total, 1, nv),
                sds(batch_total, 1, nv, ndx), sds(1, int(model.nb), 6))
    else:
        fn = lambda x0, Xn, Un, kf, Kf: feedback_rollout_fused_chunked(
            model, x0, Xn, Un, kf, Kf, 0.01, nchunks=c
        )
        args = (sds(batch_total, nx), sds(batch_total, 1, nx),
                sds(batch_total, 1, nv), sds(batch_total, 1, nv),
                sds(batch_total, 1, nv, ndx))
    key = (model.parent, model.joint_type, model.floating_base,
           model.root_quat, Bp, c, jnp.dtype(dtype).name, with_fext)
    if probe_ok("feedback_chunked", key, fn, args, on_tpu=_on_tpu()):
        return c
    return None


def feedback_rollout_fused_chunked(
    model: RobotModel, x0, X_nom, U_nom, k_ff, K_fb, dt: float,
    gravity: float = -9.81, u_clip=None, nchunks: int = 2,
    interpret: bool | None = None, f_ext=None,
):
    """feedback_rollout_fused for K-gain blocks that exceed VMEM in one
    piece (large-batch humanoid line search — VERDICT r2 next #7).

    The per-step work splits into nchunks+1 Pallas calls, all in the packed
    lane layout with zero per-step layout ops:
      - chunk c computes the partial feedback u_c = K[:, c-th column slice]
        @ dx (each call holds only nv * ceil(ndx/nchunks) K rows in VMEM;
        the tangent diff dx is recomputed per chunk — trivial next to K),
      - the dynamics call applies u = clamp(U_t + k_t + sum_c u_c), runs
        ABA + semi-implicit Euler.
    K is packed COLUMN-major ((H, ndx*nv, 8, BT), row j*nv + i) so each
    chunk's rows are one contiguous block.  Exactly matches
    feedback_rollout_fused / the jnp forward pass (tests).
    """
    ms = get_static(model)
    nq, nv = ms.nq, ms.nv
    nx = nq + nv
    ndx = 2 * nv
    cw = -(-ndx // nchunks)
    nchunks = -(-ndx // cw)  # renormalize: every chunk nonempty
    ndx_p = cw * nchunks
    B, H = U_nom.shape[-3], U_nom.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    Bp = _pad_batch(B)
    if Bp != B:
        padz = lambda a: jnp.concatenate(
            [a, jnp.zeros((Bp - B,) + a.shape[1:], a.dtype)], axis=0)
        x0, X_nom, U_nom, k_ff, K_fb = map(
            padz, (x0, X_nom, U_nom, k_ff, K_fb))
        if ms.fb and ms.quat:
            x0 = x0.at[B:, 3].set(1.0)
            X_nom = X_nom.at[B:, :, 3].set(1.0)
    lims = None if u_clip is None else [float(v) for v in np.asarray(u_clip)]
    BT = Bp // 8
    rows_chunk = 2 * nx + nv * cw + nv
    lanes = (6 * 1024 * 1024) // (rows_chunk * 8 * 4)
    L = _pick_lanes(Bp, min(512, lanes))
    if L > lanes:
        cands = [d for d in range(1, min(lanes, BT) + 1) if BT % d == 0]
        if not cands:
            raise ValueError("chunked feedback kernel exceeds VMEM at 1 lane")
        L = max(cands)
    nblocks = BT // L

    packH = lambda a, r: jnp.transpose(a, (1, 2, 0)).reshape(H, r, 8, BT)
    Xn_p = packH(X_nom, nx)
    Un_p = packH(U_nom, nv)
    k_p = packH(k_ff, nv)
    # column-major K pack: (B, H, nv, ndx) -> (H, ndx_p * nv, 8, BT),
    # row index j * nv + i (chunk c owns rows [c*cw*nv, (c+1)*cw*nv))
    K_cm = jnp.swapaxes(K_fb, -1, -2)  # (Bp, H, ndx, nv)
    if ndx_p != ndx:
        K_cm = jnp.concatenate(
            [K_cm, jnp.zeros((Bp, H, ndx_p - ndx, nv), K_cm.dtype)], axis=-2
        )
    K_p = packH(K_cm.reshape(Bp, H, ndx_p * nv), ndx_p * nv)
    x_p = _pack(x0, nx)

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)

    def make_chunk_call(c):
        j0 = c * cw

        def kernel(x_ref, Xt_ref, Kc_ref, uo_ref):
            x = [x_ref[i] for i in range(nx)]
            dx = _dx_rows(ms, x, [Xt_ref[i] for i in range(nx)])
            for i in range(nv):
                acc = None
                for jj in range(cw):
                    j = j0 + jj
                    if j >= ndx:
                        break
                    t = Kc_ref[jj * nv + i] * dx[j]
                    acc = t if acc is None else acc + t
                uo_ref[i] = acc

        kspec = pl.BlockSpec((cw * nv, 8, L), lambda b, cc=c: (cc, 0, b),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[mkspec(nx), mkspec(nx), kspec],
            out_specs=mkspec(nv),
            out_shape=jax.ShapeDtypeStruct((nv, 8, BT), x0.dtype),
            interpret=interpret,
        )

    chunk_calls = [make_chunk_call(c) for c in range(nchunks)]
    has_fe = f_ext is not None
    nbw = ms.nb * 6
    if has_fe:
        fe_p = jnp.broadcast_to(
            jnp.asarray(f_ext, x0.dtype).reshape(H, nbw, 1, 1),
            (H, nbw, 8, BT),
        )

    def dyn_kernel(x_ref, u_ref, *rest):
        xo_ref, uo_ref = rest[-2], rest[-1]
        x = [x_ref[i] for i in range(nx)]
        u = []
        for i in range(nv):
            ui = u_ref[i]
            if lims is not None and np.isfinite(lims[i]):
                ui = jnp.clip(ui, -lims[i], lims[i])
            u.append(ui)
        q_s, qd_s = x[:nq], x[nq:]
        fe = _fext_lists(ms, rest[0]) if has_fe else None
        qdd = aba_lane(ms, q_s, qd_s, u, gravity, f_ext=fe)
        qd_new = [qd_s[i] + dt * qdd[i] for i in range(nv)]
        q_new = _integrate_q_lane(ms, q_s, qd_new, dt)
        for i in range(nq):
            xo_ref[i] = q_new[i]
        for i in range(nv):
            xo_ref[nq + i] = qd_new[i]
            uo_ref[i] = u[i]

    dyn_in_specs = [mkspec(nx), mkspec(nv)]
    if has_fe:
        dyn_in_specs.append(mkspec(nbw))
    dyn_call = pl.pallas_call(
        dyn_kernel,
        grid=(nblocks,),
        in_specs=dyn_in_specs,
        out_specs=(mkspec(nx), mkspec(nv)),
        out_shape=(jax.ShapeDtypeStruct((nx, 8, BT), x0.dtype),
                   jax.ShapeDtypeStruct((nv, 8, BT), x0.dtype)),
        interpret=interpret,
    )

    def step(x_c, inp):
        Xt, Ut, kt, Kt = inp[:4]
        u = Ut + kt
        for call in chunk_calls:
            u = u + call(x_c, Xt, Kt)
        ops = (x_c, u) + ((inp[4],) if has_fe else ())
        x_new, u_out = dyn_call(*ops)
        return x_new, (x_new, u_out)

    scan_in = (Xn_p, Un_p, k_p, K_p) + ((fe_p,) if has_fe else ())
    _, (X_st, U_st) = jax.lax.scan(step, x_p, scan_in)
    unpackH = lambda a, r: jnp.transpose(a.reshape(H, r, Bp), (2, 0, 1))[:B]
    return unpackH(X_st, nx), unpackH(U_st, nv)


def rollout_fused(model: RobotModel, x0, U, dt: float,
                  gravity: float = -9.81, interpret: bool | None = None):
    """Rollout driven by the fused step kernel: x0 (B, 2n), U (H, B, n)
    -> final state (B, 2n).  Scan-major U (time leading)."""
    def step(x, u):
        return fd_step_fused(model, x, u, dt, gravity,
                             interpret=interpret), None

    xf, _ = jax.lax.scan(step, x0, U)
    return xf


def _step_lane(ms: ModelStatic, q_s, qd_s, u_s, dt, gravity, route="aba",
               dense_minv=False, f_ext=None):
    """One forward-dynamics + semi-implicit-Euler step on lane scalars —
    shared by the per-step and whole-horizon kernels.  Returns
    (q_new, qd_new).  f_ext: optional list of nb wrench 6-lists (world
    frame), applied with exact dynamics.aba/forward_dynamics semantics."""
    n = ms.nv
    if route == "minv":
        X = [_body_xc(ms, i, q_s) for i in range(ms.nb)]
        _, _, _, c = _rnea_sweeps_lane(ms, X, qd_s, None, gravity,
                                       f_ext=f_ext)
        uc = [u_s[j] - c[j] for j in range(n)]
        if dense_minv:
            Minv = minv_lane(ms, X)
            qdd = [ls.dot(Minv[i], uc) for i in range(n)]
        else:
            qdd = aba_lane(ms, q_s, [0.0] * n, uc, gravity=0.0, X=X)
    else:
        qdd = aba_lane(ms, q_s, qd_s, u_s, gravity, f_ext=f_ext)
    qd_new = [qd_s[i] + dt * qdd[i] for i in range(n)]
    q_new = _integrate_q_lane(ms, q_s, qd_new, dt)
    return q_new, qd_new


def rollout_multi_ok(model: RobotModel, B: int, H: int, route: str,
                     dtype=jnp.float32, with_fext: bool = False) -> bool:
    """COMPILE PROBE for the whole-horizon rollout kernel at this (B, H)
    (kernels.probe): False -> callers fall back to the scan-of-step-kernels
    path instead of risking a Mosaic-side crash."""
    from .probe import probe_ok

    ms = get_static(model)
    nx = ms.nq + ms.nv
    sds = lambda *sh: jax.ShapeDtypeStruct(sh, jnp.dtype(dtype))
    if with_fext:
        fn = lambda x0_, U_, F_: rollout_fused_multi(
            model, x0_, U_, 0.01, route=route, probe=False, f_ext=F_)
        args = (sds(B, nx), sds(H, B, ms.nv), sds(H, ms.nb, 6))
    else:
        fn = lambda x0_, U_: rollout_fused_multi(model, x0_, U_, 0.01,
                                                 route=route, probe=False)
        args = (sds(B, nx), sds(H, B, ms.nv))
    key = (model.parent, model.joint_type, model.floating_base,
           model.root_quat, route, B, H, jnp.dtype(dtype).name, with_fext)
    return probe_ok("rollout_multi", key, fn, args, on_tpu=_on_tpu())


def rollout_fused_multi(model: RobotModel, x0, U, dt: float,
                        gravity: float = -9.81, route: str = "aba",
                        block_lanes: int = 512,
                        interpret: bool | None = None,
                        probe: bool = True, f_ext=None):
    """Whole-horizon fused rollout: ONE pallas kernel invocation per batch
    block executes EVERY time step, carrying the state in a VMEM scratch
    accumulator across the sequential time axis of the grid while U[t]
    blocks stream through the Pallas pipeline.

    Why: the scan-of-step-kernels rollout is LAUNCH-BOUND, not op-bound —
    measured ~27 us per fused-step launch at B=4096 on v5e (identical
    runtime for the 3.7k-op dense-Minv and the 2.3k-op factorized step,
    tools/audit_lane_ops.py), i.e. compute is ~5x cheaper than the per-step
    kernel entry/exit.  Folding the time loop into the grid amortizes the
    launch cost over H steps.

    x0 (B, nx), U (H, B, nv) scan-major -> final state (B, nx).
    route: "aba" (O(n) articulated) or "minv" (bias RNEA + factorized
    M^-1 apply — BASELINE configs[1] semantics, see fd_step_minv_fused).
    f_ext: optional (H, nb, 6) per-knot world wrenches (shared across the
    batch — solver.rollout.normalize_f_ext convention), streamed through
    the grid alongside U.
    """
    ms = get_static(model)
    nq, n = ms.nq, ms.nv
    nx = nq + n
    H, B = U.shape[0], x0.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    if probe and not interpret and not rollout_multi_ok(
            model, B, H, route, x0.dtype, with_fext=f_ext is not None):
        # graceful degradation (kernels.probe): per-step fused kernels
        step = fd_step_fused if route == "aba" else fd_step_minv_fused

        if f_ext is not None:
            def one_fe(x, inp):
                u, fe = inp
                return step(model, x, u, dt, gravity, f_ext=fe), None

            return jax.lax.scan(one_fe, x0, (U, f_ext))[0]

        def one(x, u):
            return step(model, x, u, dt, gravity), None

        return jax.lax.scan(one, x0, U)[0]
    Bp = _pad_batch(B)
    if Bp != B:
        x0 = jnp.concatenate(
            [x0, jnp.zeros((Bp - B, nx), x0.dtype)], axis=0)
        U = jnp.concatenate(
            [U, jnp.zeros((H, Bp - B, n), U.dtype)], axis=1)
    L = _pick_lanes(Bp, block_lanes)
    nblocks = (Bp // 8) // L
    has_fe = f_ext is not None
    nbw = ms.nb * 6

    U_pk = jnp.transpose(U, (0, 2, 1)).reshape(H, n, 8, Bp // 8)
    if has_fe:
        fe_pk = jnp.broadcast_to(
            jnp.asarray(f_ext, x0.dtype).reshape(H, nbw, 1, 1),
            (H, nbw, 8, Bp // 8),
        )

    def kernel(x0_ref, u_ref, *rest):
        out_ref, xs = rest[-2], rest[-1]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            xs[...] = x0_ref[...]

        q_s = [xs[i] for i in range(nq)]
        qd_s = [xs[nq + i] for i in range(n)]
        u_s = [u_ref[0, i] for i in range(n)]
        fe = (
            [[rest[0][0, i * 6 + k] for k in range(6)]
             for i in range(ms.nb)]
            if has_fe else None
        )
        from .ilpsched import ilp_call
        q_new, qd_new = ilp_call(
            lambda qs, qds, us, fe_: _step_lane(
                ms, qs, qds, us, dt, gravity, route, f_ext=fe_),
            q_s, qd_s, u_s, fe)
        for i in range(nq):
            xs[i] = q_new[i]
        for i in range(n):
            xs[nq + i] = qd_new[i]

        @pl.when(t == H - 1)
        def _fin():
            out_ref[...] = xs[...]

    spec_x = pl.BlockSpec((nx, 8, L), lambda b, t: (0, 0, b),
                          memory_space=pltpu.VMEM)
    spec_t = lambda rows: pl.BlockSpec(
        (1, rows, 8, L), lambda b, t: (t, 0, 0, b),
        memory_space=pltpu.VMEM)
    in_specs = [spec_x, spec_t(n)]
    ins = [_pack(x0, nx), U_pk]
    if has_fe:
        in_specs.append(spec_t(nbw))
        ins.append(fe_pk)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks, H),
        in_specs=in_specs,
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((nx, 8, Bp // 8), x0.dtype),
        scratch_shapes=[pltpu.VMEM((nx, 8, L), x0.dtype)],
        interpret=interpret,
    )(*ins)
    return _unpack(out, Bp)[:B]


# ----------------------------------------------------------------------- #
# lane-scalar direct M^-1 (per-column unrolled; used by the step kernel)  #
# ----------------------------------------------------------------------- #

def minv_lane(ms: ModelStatic, X):
    """Lane-scalar direct M^-1 (dense, symmetrized).  X: COMPACT (E, r)
    transform list from ``_body_xc``.  The subtree sparsity of the F matrices is
    enforced FOR FREE by static-zero folding in lanescalar (columns outside a
    subtree stay python 0.0 and generate no code).  Floating base: the root is
    one 6-wide block solved with the unrolled 6x6 lane Cholesky (the dense
    fill covers the full nv, fixing the reference's NB-only loop —
    SURVEY.md §2.1)."""
    nb = ms.nb
    n = ms.nv
    Minv = [[0.0] * n for _ in range(n)]
    F = [[ls.vec6(0.0) for _ in range(n)] for _ in range(nb)]
    IA = [[row[:] for row in ms.I[i]] for i in range(nb)]
    U = [None] * nb
    Dinv = [None] * nb
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            # root block: U = IA (S = eye), Dinv = IA^-1 via cholesky6
            L6 = ls.cholesky6(IA[0])
            eye_cols = [[1.0 if r == k else 0.0 for r in range(6)]
                        for k in range(6)]
            fbinv_cols = [ls.cholesky6_solve(L6, e) for e in eye_cols]
            # fbinv[r][k] = (IA^-1)[r][k]
            fbinv = [[fbinv_cols[k][r] for k in range(6)] for r in range(6)]
            for r in range(6):
                for k in range(6):
                    Minv[r][k] = ls._add(Minv[r][k], fbinv[r][k])
            # Minv[0:6, :] -= fbinv @ (S^T F[0]) with S^T F[0] = F[0]
            for c in range(n):
                col = [F[0][c][j] for j in range(6)]
                corr = [ls.dot(fbinv[r], col) for r in range(6)]
                for r in range(6):
                    Minv[r][c] = ls._add(
                        Minv[r][c], ls._mul(-1.0, corr[r])
                    )
            continue
        S = ms.S[i]
        mi = ms.vi(i)
        Ui = ls.matvec(IA[i], S)
        Dinv_i = 1.0 / ls.dot(S, Ui)
        U[i], Dinv[i] = Ui, Dinv_i
        for c in range(n):
            sF = ls.dot(S, F[i][c])
            if not (ls.is_static(sF) and sF == 0.0):
                Minv[mi][c] = ls._add(Minv[mi][c], ls._mul(-1.0, Dinv_i * sF))
        Minv[mi][mi] = ls._add(Minv[mi][mi], Dinv_i)
        if p != -1:
            for c in range(n):
                Fic = F[i][c]
                if not (ls.is_static(Minv[mi][c]) and Minv[mi][c] == 0.0):
                    Fic = ls.axpy(Minv[mi][c], Ui, Fic)
                F[i][c] = Fic
                F[p][c] = ls.vadd(F[p][c], ls.xc_mtv(X[i], Fic))
            Ia = ls.mat_combine_sym(IA[i], ls.outer_sym(Ui), -Dinv_i)
            IA[p] = ls.mat_add_sym(IA[p], ls.xc_xtax_sym(X[i], Ia))
    for i in range(nb):
        p = ms.parent[i]
        if p == -1:
            if ms.fb and i == 0:
                # S = eye(6): F[0][c] = Minv rows 0:6 at column c
                for c in range(n):
                    F[0][c] = [Minv[r][c] for r in range(6)]
            else:
                for c in range(n):
                    F[i][c] = ls.vscale(Minv[i][c], ms.S[i])
        else:
            mi = ms.vi(i)
            for c in range(n):
                XF = ls.xc_mv(X[i], F[p][c])
                delta = ls._mul(-1.0, ls._mul(Dinv[i], ls.dot(U[i], XF)))
                Minv[mi][c] = ls._add(Minv[mi][c], delta)
                F[i][c] = ls.axpy(Minv[mi][c], ms.S[i], XF)
    # dense symmetrization (upper triangle is authoritative)
    return [
        [Minv[i][j] if j >= i else Minv[j][i] for j in range(n)]
        for i in range(n)
    ]


def _rnea_sweeps_lane(ms: ModelStatic, X, qd, qdd, gravity, f_ext=None):
    """Forward+backward RNEA given precomputed transforms.  Returns
    (v, a, f_acc, tau): per-body vec6 lists (f accumulated leaf->root),
    tau a length-nv list.  Floating-base aware.  f_ext: optional list of nb
    world-frame wrench 6-lists (subtracted before the backward sweep)."""
    nb = ms.nb
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    v, a, f = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        vJ = _vj(ms, i, qd)
        if p == -1:
            vi = vJ
            ai = ls.xc_mv(X[i], a_grav)
        else:
            vi = ls.vadd(ls.xc_mv(X[i], v[p]), vJ)
            ai = ls.xc_mv(X[i], a[p])
        ai = ls.vadd(ai, ls.cross_motion(vi, vJ))
        if qdd is not None:
            ai = ls.vadd(ai, _vj(ms, i, qdd))
        Iv = ls.matvec(ms.I[i], vi)
        fi = ls.vadd(ls.matvec(ms.I[i], ai), ls.cross_force(vi, Iv))
        v[i], a[i], f[i] = vi, ai, fi
    if f_ext is not None:
        f = _apply_fext_lane(ms, X, f, f_ext)
    tau = [None] * ms.nv
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        if ms.fb and i == 0:
            for k in range(6):
                tau[k] = f[0][k]
        else:
            tau[ms.vi(i)] = ls.dot(ms.S[i], f[i])
        if p != -1:
            f[p] = ls.vadd(f[p], ls.xc_mtv(X[i], f[i]))
    return v, a, f, tau


def fd_step_minv_fused(model: RobotModel, x, u, dt: float,
                       gravity: float = -9.81, block_lanes: int = 512,
                       interpret: bool | None = None,
                       dense_minv: bool = False, f_ext=None):
    """Fused forward-dynamics step on the Minv + RNEA route (BASELINE.json
    configs[1]): bias RNEA -> qdd = M^-1 (u - c) -> semi-implicit Euler, all
    in ONE pallas kernel.  x (B, 2n), u (B, n) -> (B, 2n).

    The M^-1 application uses the articulated-inertia FACTORIZATION applied
    to the single rhs vector — ``aba_lane`` with statically-zero velocity
    and zero gravity, whose first sweep constant-folds away, leaving exactly
    the Carpentier M^-1 operator's backward factorization + forward solve
    (the same operator ``minv_lane`` materializes densely; identical result
    up to f32 rounding, O(n) instead of O(n^2) lane ops — the dense inverse
    is only worth building when the full matrix is consumed, e.g. the
    linearization kernels).  ``dense_minv=True`` keeps the explicit dense
    route (used by the equivalence tests to pin both paths)."""
    ms = get_static(model)
    nq, n = ms.nq, ms.nv
    nx = nq + n
    B = x.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    Bp = _pad_batch(B)
    fe_pk = (None if f_ext is None
             else _pack_fext(ms, f_ext, B, Bp, x.dtype))
    if Bp != B:
        padz = lambda t: jnp.concatenate(
            [t, jnp.zeros((Bp - B,) + t.shape[1:], t.dtype)], axis=0)
        x, u = padz(x), padz(u)
    L = _pick_lanes(Bp, block_lanes)
    nblocks = (Bp // 8) // L
    has_fe = fe_pk is not None

    def kernel(x_ref, u_ref, *rest):
        out_ref = rest[-1]
        q_s = [x_ref[i] for i in range(nq)]
        qd_s = [x_ref[nq + i] for i in range(n)]
        u_s = [u_ref[i] for i in range(n)]
        fe = _fext_lists(ms, rest[0]) if has_fe else None
        q_new, qd_new = _step_lane(ms, q_s, qd_s, u_s, dt, gravity,
                                   route="minv", dense_minv=dense_minv,
                                   f_ext=fe)
        for i in range(n):
            out_ref[nq + i] = qd_new[i]
        for i in range(nq):
            out_ref[i] = q_new[i]

    mkspec = lambda rows: pl.BlockSpec((rows, 8, L), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
    spec_x = mkspec(nx)
    in_specs = [spec_x, mkspec(n)]
    ins = [_pack(x, nx), _pack(u, n)]
    if has_fe:
        in_specs.append(mkspec(ms.nb * 6))
        ins.append(fe_pk)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((nx, 8, Bp // 8), x.dtype),
        interpret=interpret,
    )(*ins)
    return _unpack(out, Bp)[:B]
