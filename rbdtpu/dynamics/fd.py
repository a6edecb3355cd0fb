"""Forward dynamics (Minv route) and its analytical gradient.

Reimplements reference C9 (``forward_dynamics`` RBDReference.py:1371-1374,
``forward_dynamics_grad`` :1376-1384) with the redundancy removed: the reference
recomputes minv() inside both the dynamics and the gradient (SURVEY.md §3.4);
here ``forward_dynamics_full`` computes M^-1, qdd and the linearization in one
pass sharing the joint transforms — the rollout + linearization core of the MPC
engine.
"""
from __future__ import annotations

from ..model.robot import RobotModel
from ..spatial.batched import mm, mv
from .minv import minv
from .rnea import rnea
from .rnea_grad import rnea_grad


def forward_dynamics(model: RobotModel, q, qd, u, gravity: float = -9.81,
                     f_ext=None):
    """qdd = M^-1 (u - C(q, qd)): (..., nq), (..., nv), (..., nv) -> (..., nv)."""
    c, _, _, _ = rnea(model, q, qd, None, gravity, f_ext)
    Mi = minv(model, q)
    return mv(Mi, u - c)


def forward_dynamics_grad(model: RobotModel, q, qd, u, gravity: float = -9.81):
    """(d qdd/dq, d qdd/dqd) = (-M^-1 dc/dq, -M^-1 dc/dqd) at qdd = FD(q,qd,u)
    (reference :1376-1384)."""
    _, _, dqdd_dq, dqdd_dqd = forward_dynamics_full(model, q, qd, u, gravity)
    return dqdd_dq, dqdd_dqd


def forward_dynamics_full(model: RobotModel, q, qd, u, gravity: float = -9.81):
    """One-pass qdd + linearization: returns (qdd, Mi, dqdd_dq, dqdd_dqd).

    Shares M^-1 between the dynamics and the gradient (the reference's
    ``forward_dynamics_grad`` recomputes it; SURVEY.md §3.4 note).
    """
    c, _, _, _ = rnea(model, q, qd, None, gravity)
    Mi = minv(model, q)
    qdd = mv(Mi, u - c)
    dc_dq, dc_dqd = rnea_grad(model, q, qd, qdd, gravity, split=True)
    dqdd_dq = -mm(Mi, dc_dq)
    dqdd_dqd = -mm(Mi, dc_dqd)
    return qdd, Mi, dqdd_dq, dqdd_dqd
