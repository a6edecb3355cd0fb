"""Drop-in reference-compatible API.

``RBDReferenceTPU`` mirrors the reference class surface exactly — method
names, keyword names (GRAVITY, USE_VELOCITY_DAMPING, output_dense, f_ext),
defaults and return shapes/orientations of ``RBDReference``
(/root/reference/RBDReference.py: rnea :623, rnea_fpass :559, rnea_bpass :600,
minv :785, crba :1029, aba :817, rnea_grad :1345, forward_dynamics :1371,
forward_dynamics_grad :1376, second_order_idsva_parallel :1387, fdsva_so
:1606, end_effector_pose :220, end_effector_pose_gradient :286,
end_effector_pose_hessian :392, apply_external_forces :529) — so an existing
consumer of the reference can switch by replacing the constructor, keeping the
per-body arrays in the reference's (6, NB) orientation.

Inputs may be numpy or jax arrays (1-D, single state — the reference is
serial); outputs are numpy float64 like the reference.  For the batched,
jit-native API use rbdtpu.dynamics directly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .model.robot import RobotModel
from . import dynamics as dyn
from .kinematics import fk


class RBDReferenceTPU:
    def __init__(self, robot):
        """robot: a RobotModel, or any object with a ``.model`` RobotModel
        attribute (e.g. the OracleRobotAdapter)."""
        self.robot = robot
        self.model: RobotModel = (
            robot if isinstance(robot, RobotModel) else robot.model
        )

    # --- helpers -------------------------------------------------------- #
    def _q(self, q):
        return jnp.asarray(np.asarray(q, dtype=np.float64).ravel())

    @staticmethod
    def _np(x):
        return np.asarray(x, dtype=np.float64)

    # --- inverse dynamics ----------------------------------------------- #
    def rnea(self, q, qd, qdd=None, GRAVITY=-9.81, f_ext=None):
        """Returns (c, v, a, f) with v/a/f in the reference's (6, NB) layout.
        NOTE: unlike the reference (which ignores f_ext, SURVEY.md §2.1),
        f_ext IS applied."""
        fe = None if f_ext is None else jnp.asarray(
            np.asarray(f_ext, dtype=np.float64).reshape(self.model.nb, 6)
        )
        c, v, a, f = dyn.rnea(
            self.model, self._q(q), self._q(qd),
            None if qdd is None else self._q(qdd), GRAVITY, fe,
        )
        return (self._np(c), self._np(v).T, self._np(a).T, self._np(f).T)

    def rnea_fpass(self, q, qd, qdd=None, GRAVITY=-9.81):
        from .dynamics.xforms import joint_transforms_list

        Xs = joint_transforms_list(self.model, self._q(q))
        v, a, f = dyn.rnea_fpass(
            self.model, Xs, self._q(q), self._q(qd),
            None if qdd is None else self._q(qdd), GRAVITY,
        )
        stack = lambda l: self._np(jnp.stack(l, axis=-2)).T
        return stack(v), stack(a), stack(f)

    def rnea_bpass(self, q, f):
        from .dynamics.xforms import joint_transforms_list

        f_in = jnp.asarray(np.asarray(f, dtype=np.float64).T)
        Xs = joint_transforms_list(self.model, self._q(q))
        c, f_l = dyn.rnea_bpass(
            self.model, Xs, [f_in[i] for i in range(self.model.nb)]
        )
        return self._np(c), self._np(jnp.stack(f_l, axis=-2)).T

    def apply_external_forces(self, q, f_in, f_ext):
        from .dynamics.xforms import joint_transforms_list

        Xs = joint_transforms_list(self.model, self._q(q))
        f_l = jnp.asarray(np.asarray(f_in, dtype=np.float64).T)
        fe = jnp.asarray(np.asarray(f_ext, dtype=np.float64).T)
        out = dyn.apply_external_forces(
            self.model, Xs, [f_l[i] for i in range(self.model.nb)], fe
        )
        return self._np(jnp.stack(out, axis=-2)).T

    # --- mass matrix ----------------------------------------------------- #
    def minv(self, q, output_dense=True):
        return self._np(dyn.minv(self.model, self._q(q), output_dense))

    def crba(self, q):
        return self._np(dyn.crba(self.model, self._q(q)))

    # --- forward dynamics ------------------------------------------------ #
    def aba(self, q, qd, tau, f_ext=None, GRAVITY=-9.81):
        fe = None if f_ext is None else jnp.asarray(
            np.asarray(f_ext, dtype=np.float64).reshape(self.model.nb, 6)
        )
        return self._np(
            dyn.aba(self.model, self._q(q), self._q(qd), self._q(tau), fe,
                    GRAVITY)
        )

    def forward_dynamics(self, q, qd, u, GRAVITY=-9.81):
        return self._np(
            dyn.forward_dynamics(self.model, self._q(q), self._q(qd),
                                 self._q(u), GRAVITY)
        )

    def forward_dynamics_grad(self, q, qd, u, GRAVITY=-9.81):
        dq, dqd = dyn.forward_dynamics_grad(
            self.model, self._q(q), self._q(qd), self._q(u), GRAVITY
        )
        return self._np(dq), self._np(dqd)

    # --- first/second-order derivatives ---------------------------------- #
    def rnea_grad(self, q, qd, qdd=None, GRAVITY=-9.81,
                  USE_VELOCITY_DAMPING=False):
        return self._np(
            dyn.rnea_grad(self.model, self._q(q), self._q(qd),
                          None if qdd is None else self._q(qdd), GRAVITY,
                          USE_VELOCITY_DAMPING)
        )

    def second_order_idsva_parallel(self, q, qd, qdd, GRAVITY=-9.81):
        outs = dyn.idsva_so(self.model, self._q(q), self._q(qd),
                            self._q(qdd), GRAVITY)
        return tuple(self._np(o) for o in outs)

    def fdsva_so(self, q, qd, u, GRAVITY=-9.81):
        outs = dyn.fdsva_so(self.model, self._q(q), self._q(qd), self._q(u),
                            GRAVITY)
        return tuple(self._np(o) for o in outs)

    # --- end-effector kinematics ----------------------------------------- #
    def end_effector_pose(self, q, ee_joint_names=None, ee_offsets=None):
        offset = None if ee_offsets is None else jnp.asarray(
            np.asarray(ee_offsets, dtype=np.float64).ravel()
        )
        out = fk.ee_pose(self.model, self._q(q), ee_names=ee_joint_names,
                         offset=offset)
        return self._np(out)

    def end_effector_pose_gradient(self, q, ee_joint_names=None,
                                   ee_offsets=None):
        offset = None if ee_offsets is None else jnp.asarray(
            np.asarray(ee_offsets, dtype=np.float64).ravel()
        )
        out = fk.ee_pose_gradient(self.model, self._q(q),
                                  ee_names=ee_joint_names, offset=offset)
        return self._np(out)

    def end_effector_pose_hessian(self, q, ee_joint_names=None,
                                  ee_offsets=None):
        offset = None if ee_offsets is None else jnp.asarray(
            np.asarray(ee_offsets, dtype=np.float64).ravel()
        )
        out = fk.ee_pose_hessian(self.model, self._q(q),
                                 ee_names=ee_joint_names, offset=offset)
        return self._np(out)
