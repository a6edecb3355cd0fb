"""Second-order inverse/forward dynamics derivatives (IDSVA-SO / FDSVA-SO).

Reimplements reference C10 (``second_order_idsva_parallel``
RBDReference.py:1387-1604, ``fdsva_so`` :1606-1631) the JAX-native way: instead
of hand-assembling the IC/BC/T1-T4/D1-D4 world-frame tensor machinery (which in
the reference is fixed-base only and carries a chain-only accumulation bug at
:1448, SURVEY.md §2.1), the second-order tensors are obtained by one
forward-mode differentiation of the *analytical* first-order kernel
(``rnea_grad``) — machine-precision exact, jit/vmap-closed, and correct for
branched trees and floating bases where the reference is not.

Cost: n tangent evaluations of the analytical O(NB·n) first-order sweep, i.e.
O(NB·n²) — the same asymptotic cost as the reference's direct assembly
(:1499-1603), with XLA batching the tangents onto the MXU.

Tensor layout (matches the reference's return convention):
  d2tau_dq[i, j, k]   = ∂²tau_i / ∂q_j ∂q_k       (symmetric in j,k)
  d2tau_dqd[i, j, k]  = ∂²tau_i / ∂qd_j ∂qd_k     (symmetric in j,k)
  d2tau_dvdq[i, j, k] = ∂²tau_i / ∂qd_j ∂q_k
  dM_dq[i, j, k]      = ∂M_ij / ∂q_k              (symmetric in i,j)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from .crba import crba
from .fd import forward_dynamics_full
from .rnea_grad import rnea_grad


def idsva_so(model: RobotModel, q, qd, qdd, gravity: float = -9.81):
    """Second-order inverse-dynamics derivatives.

    (..., nq), (..., nv), (..., nv) -> 4 tensors (..., n, n, n) as documented in
    the module header (reference ``second_order_idsva_parallel``
    RBDReference.py:1387-1604).
    """
    def first_order(q_, qd_, qdd_):
        return jnp.stack(
            rnea_grad(model, q_, qd_, qdd_, gravity, split=True)
        )

    def single(q_, qd_, qdd_):
        # jacfwd w.r.t. q of (dc_dq, dc_dqd): gives (2,n,n,n) with last axis = k
        d_dq = jax.jacfwd(first_order, argnums=0)(q_, qd_, qdd_)
        d2tau_dq = d_dq[0]          # ∂(∂tau_i/∂q_j)/∂q_k
        d2tau_dvdq = d_dq[1]        # ∂(∂tau_i/∂qd_j)/∂q_k
        d2tau_dqd = jax.jacfwd(
            lambda qdqd: first_order(q_, qdqd, qdd_)[1], argnums=0
        )(qd_)
        dM = jax.jacfwd(lambda qq: crba(model, qq))(q_)
        return d2tau_dq, d2tau_dqd, d2tau_dvdq, dM

    if q.ndim == 1:
        return single(q, qd, qdd)
    batch = q.shape[:-1]
    flat = lambda x: x.reshape((-1, x.shape[-1]))
    outs = jax.vmap(single)(flat(q), flat(qd), flat(qdd))
    return tuple(o.reshape(batch + o.shape[1:]) for o in outs)


def fdsva_so(model: RobotModel, q, qd, u, gravity: float = -9.81):
    """Second-order forward-dynamics derivatives (reference ``fdsva_so``
    RBDReference.py:1606-1631).

    Returns (daba_dqdq, daba_dvdq, daba_dvdv, daba_dtdq), each (..., n, n, n):
      daba_dqdq[i,j,k] = ∂²qdd_i/∂q_j∂q_k,  daba_dvdv = ∂²qdd/∂qd²,
      daba_dvdq = ∂²qdd/∂qd∂q,  daba_dtdq[i,j,k] = ∂(∂qdd_i/∂tau_j)/∂q_k.
    """
    qdd, Minv, fd_dq, fd_dqd = forward_dynamics_full(model, q, qd, u, gravity)
    d2_dq, d2_dqd, d2_dvdq, dM_dq = idsva_so(model, q, qd, qdd, gravity)

    mm = lambda A, B: jnp.einsum("...il,...ljk->...ijk", A, B)
    # chain rule: tau(q, qd, qdd(q, qd, u)) is identically u, so the total
    # second derivative of qdd folds dM_dq against the first-order FD grads
    # (same contractions as the reference's einsums at :1622-1629)
    t_q = jnp.einsum("...ilk,...lj->...ijk", dM_dq, fd_dq)
    t_qT = jnp.swapaxes(t_q, -1, -2)
    daba_dqdq = -mm(Minv, d2_dq + t_q + t_qT)
    t_v = jnp.einsum("...ilk,...lj->...ijk", dM_dq, fd_dqd)
    daba_dvdq = -mm(Minv, d2_dvdq + t_v)
    daba_dvdv = -mm(Minv, d2_dqd)
    daba_dtdq = -mm(Minv, jnp.einsum("...ilk,...lj->...ijk", dM_dq, Minv))
    return daba_dqdq, daba_dvdq, daba_dvdv, daba_dtdq
