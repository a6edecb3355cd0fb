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

    # --- granular Minv passes (reference :630, :737) ---------------------- #
    def minv_bpass(self, q):
        """Backward Minv sweep; returns (Minv, F, U, Dinv) in the reference's
        layouts (RBDReference.py:630-735): Minv (n, n) upper rows, F
        (n, 6, n), U (n, 6), Dinv (n,).  NOTE the reference's ``Dinv`` array
        stores D = S^T IA S (its ``minv_fpass`` divides by it); matched here.
        Floating base: the root block's U rows hold the articulated root
        inertia columns (S = eye(6)) and Dinv[0:6] its diagonal."""
        from .dynamics.xforms import joint_transforms_list

        m = self.model
        Xs = joint_transforms_list(m, self._q(q))
        Minv, F, U_l, Dinv_l, fb_Dinv = dyn.minv_bpass(m, Xs)
        n = m.nv
        Fr = np.zeros((n, 6, n))
        Ur = np.zeros((n, 6))
        Dr = np.zeros(n)
        for i in range(m.nb):
            if m.floating_base and i == 0:
                D_root = np.linalg.inv(self._np(fb_Dinv))  # = articulated IA
                Ur[0:6, :] = D_root  # U = IA @ eye(6)
                Dr[0:6] = np.diag(D_root)
                Fr[0:6, :, :] = self._np(F[0])[None]
            else:
                mi = m.v_index(i)
                Fr[mi] = self._np(F[i])
                Ur[mi] = self._np(U_l[i])
                Dr[mi] = 1.0 / float(self._np(Dinv_l[i]))
        return self._np(Minv), Fr, Ur, Dr

    def minv_fpass(self, q, Minv, F, U, Dinv):
        """Forward Minv sweep completing the upper-triangular M^-1
        (reference :737-783); accepts the ``minv_bpass`` reference-layout
        intermediates and returns Minv (n, n)."""
        from .dynamics.xforms import joint_transforms_list

        m = self.model
        Xs = joint_transforms_list(m, self._q(q))
        F_l = [jnp.asarray(np.asarray(F[m.v_index(i) if not
                                        (m.floating_base and i == 0) else 0],
                                      dtype=np.float64))
               for i in range(m.nb)]
        U_l, Dinv_l = [None] * m.nb, [None] * m.nb
        for i in range(m.nb):
            if m.floating_base and i == 0:
                continue
            mi = m.v_index(i)
            U_l[i] = jnp.asarray(np.asarray(U[mi], dtype=np.float64))
            Dinv_l[i] = jnp.asarray(1.0 / np.float64(Dinv[mi]))
        out = dyn.minv_fpass(
            m, Xs, jnp.asarray(np.asarray(Minv, dtype=np.float64)),
            F_l, U_l, Dinv_l,
        )
        return self._np(out)

    # --- granular RNEA-gradient passes (reference :1127-:1343) ------------ #
    def _grad_fpass_full(self, q, qd, v, a, GRAVITY=-9.81):
        """v, a: reference (6, NB) layout (from ``rnea``, qdd included)."""
        from .dynamics.xforms import joint_transforms_list

        m = self.model
        Xs = joint_transforms_list(m, self._q(q))
        vs = jnp.asarray(np.asarray(v, dtype=np.float64).T)
        as_ = jnp.asarray(np.asarray(a, dtype=np.float64).T)
        return dyn.rnea_grad_fpass(m, Xs, self._q(qd), vs, as_, GRAVITY,
                                   full=True)

    def _ref3(self, lst):
        # per-body list of (6, n) -> reference (6, n, NB)
        return np.stack([self._np(x) for x in lst], axis=-1)

    def rnea_grad_fpass_dq(self, q, qd, v, a, GRAVITY=-9.81):
        """dq forward derivative sweep (reference :1127-1187).  Returns
        (dv_dq, da_dq, df_dq), each (6, n, NB).  ``v``/``a``: (6, NB)
        kinematics from ``rnea``."""
        dv_q, da_q, df_q, _, _, _ = self._grad_fpass_full(q, qd, v, a,
                                                          GRAVITY)
        return self._ref3(dv_q), self._ref3(da_q), self._ref3(df_q)

    def rnea_grad_fpass_dqd(self, q, qd, v):
        """dqd forward derivative sweep (reference :1189-1255).  Returns
        (dv_dqd, da_dqd, df_dqd), each (6, n, NB).  ``v``: (6, NB)."""
        a0 = np.zeros_like(np.asarray(v, dtype=np.float64))  # a unused (dqd)
        _, _, _, dv_d, da_d, df_d = self._grad_fpass_full(q, qd, v, a0)
        return self._ref3(dv_d), self._ref3(da_d), self._ref3(df_d)

    def rnea_grad_bpass_dq(self, q, f, df_dq):
        """dq backward sweep -> dc_dq (n, n) (reference :1257-1297).
        ``f``: (6, NB) accumulated forces; ``df_dq``: (6, n, NB)."""
        from .dynamics.xforms import joint_transforms_list

        m = self.model
        Xs = joint_transforms_list(m, self._q(q))
        fj = jnp.asarray(np.asarray(f, dtype=np.float64).T)
        dfq = np.asarray(df_dq, dtype=np.float64)
        df_q = [jnp.asarray(dfq[..., i]) for i in range(m.nb)]
        zeros = [jnp.zeros_like(d) for d in df_q]
        dc_dq, _ = dyn.rnea_grad_bpass(m, Xs, fj, df_q, zeros)
        return self._np(dc_dq)

    def rnea_grad_bpass_dqd(self, q, df_dqd, USE_VELOCITY_DAMPING=False):
        """dqd backward sweep -> dc_dqd (n, n) (reference :1299-1343)."""
        from .dynamics.xforms import joint_transforms_list

        m = self.model
        Xs = joint_transforms_list(m, self._q(q))
        dfd = np.asarray(df_dqd, dtype=np.float64)
        df_d = [jnp.asarray(dfd[..., i]) for i in range(m.nb)]
        zeros = [jnp.zeros_like(d) for d in df_d]
        fj = jnp.zeros((m.nb, 6), dtype=Xs[0].dtype)
        _, dc_dqd = dyn.rnea_grad_bpass(m, Xs, fj, zeros, df_d,
                                        USE_VELOCITY_DAMPING)
        return self._np(dc_dqd)

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
