"""Fused whole-algorithm Pallas kernels for the rollout hot path.

One kernel = one full dynamics step: every intermediate of the tree sweeps
lives in VMEM/vregs, nothing round-trips through HBM (the jnp path materializes
~100 small intermediates per step).  States are tiled (8, L) across
sublanes x lanes (see kernels.lanescalar); model constants are folded into the
traced kernel as python floats, producing model-specialized code — the
TPU-native analog of the robot-specific codegen the reference was built to
validate (README.md:5).

Fixed-base models only (the floating-base root needs a 6x6 lane-scalar
inverse; fb callers use the jnp path).  Fallback: off-TPU the same kernels run
under pallas interpret mode, bit-matching semantics for tests.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.robot import RobotModel
from ..spatial.transforms import REVOLUTE, PRISMATIC
from . import lanescalar as ls


# ----------------------------------------------------------------------- #
# static model extraction (host-side, python floats)                      #
# ----------------------------------------------------------------------- #

class ModelStatic:
    """Host-side python-float model constants, built from RobotModel.host_data
    (STATIC metadata, so extraction works even when the model's numeric leaves
    are tracers — e.g. closed over inside a lax.scan body)."""

    def __init__(self, parent, jtype, host_data):
        self.nb = len(parent)
        self.parent = parent
        self.jtype = jtype
        d = dict(host_data)
        self.axis = [list(a) for a in d["axis"]]
        self.Xtree = [[list(r) for r in X] for X in d["Xtree"]]
        self.I = [[list(r) for r in M] for M in d["I"]]
        self.S = [list(s) for s in d["S"]]


@functools.lru_cache(maxsize=32)
def _static_cache(parent, jtype, host_data):
    return ModelStatic(parent, jtype, host_data)


def get_static(model: RobotModel) -> ModelStatic:
    if model.floating_base:
        raise ValueError("fused kernels support fixed-base models only")
    if not model.host_data:
        raise ValueError(
            "model has no host_data; rebuild it with rbdtpu.model.make_model"
        )
    return _static_cache(model.parent, model.joint_type, model.host_data)


# ----------------------------------------------------------------------- #
# lane-scalar sweeps (usable inside pallas kernels AND plain jit)         #
# ----------------------------------------------------------------------- #

def _joint_x(ms: ModelStatic, i: int, qi):
    if ms.jtype[i] == PRISMATIC:
        return ls.prismatic_x(ms.axis[i], ms.Xtree[i], qi)
    s, c = jnp.sin(qi), jnp.cos(qi)
    return ls.revolute_x(ms.axis[i], ms.Xtree[i], s, c)


def rnea_lane(ms: ModelStatic, q, qd, qdd=None, gravity: float = -9.81):
    """Lane-scalar RNEA: q/qd/qdd are lists of n lane-scalars.
    Returns tau (list of n lane-scalars)."""
    nb = ms.nb
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    X, v, a, f = [None] * nb, [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        Xi = _joint_x(ms, i, q[i])
        vJ = ls.vscale(qd[i], ms.S[i])
        if p == -1:
            vi = vJ
            ai = ls.matvec(Xi, a_grav)
        else:
            vi = ls.vadd(ls.matvec(Xi, v[p]), vJ)
            ai = ls.matvec(Xi, a[p])
        ai = ls.vadd(ai, ls.cross_motion(vi, vJ))
        if qdd is not None:
            ai = ls.vadd(ai, ls.vscale(qdd[i], ms.S[i]))
        Iv = ls.matvec(ms.I[i], vi)
        fi = ls.vadd(ls.matvec(ms.I[i], ai), ls.cross_force(vi, Iv))
        X[i], v[i], a[i], f[i] = Xi, vi, ai, fi

    tau = [None] * nb
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        tau[i] = ls.dot(ms.S[i], f[i])
        if p != -1:
            f[p] = ls.vadd(f[p], ls.matvec_T(X[i], f[i]))
    return tau


def aba_lane(ms: ModelStatic, q, qd, tau, gravity: float = -9.81):
    """Lane-scalar ABA: returns qdd (list of n lane-scalars)."""
    nb = ms.nb
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, -gravity]
    X, v, cb, pA = [None] * nb, [None] * nb, [None] * nb, [None] * nb
    IA = [[row[:] for row in ms.I[i]] for i in range(nb)]
    for i in range(nb):
        p = ms.parent[i]
        Xi = _joint_x(ms, i, q[i])
        vJ = ls.vscale(qd[i], ms.S[i])
        if p == -1:
            vi = vJ
            ci = ls.vec6(0.0)
        else:
            vi = ls.vadd(ls.matvec(Xi, v[p]), vJ)
            ci = ls.cross_motion(vi, vJ)
        Iv = ls.matvec(ms.I[i], vi)
        X[i], v[i], cb[i] = Xi, vi, ci
        pA[i] = ls.cross_force(vi, Iv)

    U, dinv, u_ = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb - 1, -1, -1):
        p = ms.parent[i]
        S = ms.S[i]
        Ui = ls.matvec(IA[i], S)
        di = ls.dot(S, Ui)
        dinv_i = 1.0 / di
        ui = tau[i] - ls.dot(S, pA[i])
        U[i], dinv[i], u_[i] = Ui, dinv_i, ui
        if p != -1:
            Ia = ls.mat_sub(
                IA[i], ls.mat_scale(dinv_i, ls.outer_vv(Ui, Ui))
            )
            pa = ls.vadd(
                pA[i],
                ls.vadd(ls.matvec(Ia, cb[i]), ls.vscale(ui * dinv_i, Ui)),
            )
            IA[p] = ls.mat_add(IA[p], ls.xtax(X[i], Ia))
            pA[p] = ls.vadd(pA[p], ls.matvec_T(X[i], pa))

    qdd = [None] * nb
    acc = [None] * nb
    for i in range(nb):
        p = ms.parent[i]
        if p == -1:
            ai = ls.matvec(X[i], a_grav)
        else:
            ai = ls.matvec(X[i], acc[p])
        ai = ls.vadd(ai, cb[i])
        qdd_i = (u_[i] - ls.dot(U[i], ai)) * dinv[i]
        acc[i] = ls.vadd(ai, ls.vscale(qdd_i, ms.S[i]))
        qdd[i] = qdd_i
    return qdd


# ----------------------------------------------------------------------- #
# pallas wrappers                                                          #
# ----------------------------------------------------------------------- #

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
    n = ms.nb
    B = q.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    L = min(block_lanes, B // 8)
    nblocks = (B // 8 + L - 1) // L

    has_qdd = qdd is not None

    def kernel(q_ref, qd_ref, *rest):
        if has_qdd:
            qdd_ref, tau_ref = rest
        else:
            (tau_ref,) = rest
        q_s = [q_ref[i] for i in range(n)]
        qd_s = [qd_ref[i] for i in range(n)]
        qdd_s = [rest[0][i] for i in range(n)] if has_qdd else None
        tau = rnea_lane(ms, q_s, qd_s, qdd_s, gravity)
        for i in range(n):
            tau_ref[i] = tau[i]

    spec = pl.BlockSpec((n, 8, L), lambda b: (0, 0, b),
                        memory_space=pltpu.VMEM)
    ins = [_pack(q, n), _pack(qd, n)]
    in_specs = [spec, spec]
    if has_qdd:
        ins.append(_pack(qdd, n))
        in_specs.append(spec)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, B // 8), q.dtype),
        interpret=interpret,
    )(*ins)
    return _unpack(out, B)


def fd_step_fused(model: RobotModel, x, u, dt: float,
                  gravity: float = -9.81, block_lanes: int = 512,
                  interpret: bool | None = None):
    """Fused ABA + semi-implicit Euler step: x (B, 2n), u (B, n) -> x' (B, 2n).

    The entire forward-dynamics step — transform build, 3 ABA sweeps,
    integration — is one pallas kernel; HBM traffic is exactly inputs+outputs.
    """
    ms = get_static(model)
    n = ms.nb
    B = x.shape[-2]
    if interpret is None:
        interpret = not _on_tpu()
    L = min(block_lanes, B // 8)
    nblocks = (B // 8 + L - 1) // L

    def kernel(x_ref, u_ref, out_ref):
        q_s = [x_ref[i] for i in range(n)]
        qd_s = [x_ref[n + i] for i in range(n)]
        tau_s = [u_ref[i] for i in range(n)]
        qdd = aba_lane(ms, q_s, qd_s, tau_s, gravity)
        for i in range(n):
            qd_new = qd_s[i] + dt * qdd[i]
            out_ref[n + i] = qd_new
            out_ref[i] = q_s[i] + dt * qd_new

    spec_x = pl.BlockSpec((2 * n, 8, L), lambda b: (0, 0, b),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((n, 8, L), lambda b: (0, 0, b),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec_x, spec_u],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((2 * n, 8, B // 8), x.dtype),
        interpret=interpret,
    )(_pack(x, 2 * n), _pack(u, n))
    return _unpack(out, B)


def rollout_fused(model: RobotModel, x0, U, dt: float,
                  gravity: float = -9.81, interpret: bool | None = None):
    """Rollout driven by the fused step kernel: x0 (B, 2n), U (H, B, n)
    -> final state (B, 2n).  Scan-major U (time leading)."""
    def step(x, u):
        return fd_step_fused(model, x, u, dt, gravity,
                             interpret=interpret), None

    xf, _ = jax.lax.scan(step, x0, U)
    return xf
