"""Second-order inverse/forward dynamics derivatives (IDSVA-SO / FDSVA-SO).

Reimplements reference C10 (``second_order_idsva_parallel``
RBDReference.py:1387-1604, ``fdsva_so`` :1606-1631) two ways:

``idsva_so_native`` — the direct world-frame IC/BC tensor assembly, TPU-first:
one unrolled forward pass builds per-body world-frame kinematic vectors
(S, Sd, psid, psidd) and composite inertia factors (IC, BC, f; accumulated
with the dense ``subtree_mask`` instead of the reference's chain-only
``f[pi] += f[pi+1]`` at :1448 — a known reference bug, SURVEY.md §2.1), then
ALL (i, j, k) tensor entries are produced at once as masked dense einsum
bilinear forms  x^T D_i y  over the per-body 6x6 factors D1-D4/T1-T4
(:1450-1491).  The reference's triple ancestor loop (:1499-1603) becomes a
fixed set of (n, n, n) einsum contractions gated by ``ancestor_mask`` —
branch-correct by construction, batched, jit-closed, MXU-friendly.
Fixed-base models (the reference's own scope).

``idsva_so_ad`` — one forward-mode differentiation of the *analytical*
first-order kernel (``rnea_grad``).  Machine-precision exact, and correct for
floating bases (where the Euler-angle root makes the world-frame S-variation
identities inapplicable, same as the first-order root-pose columns —
``rnea_grad`` docstring).  Serves as the fb path and the ground truth the
native sweep is tested against (tests/test_idsva.py).

``idsva_so`` dispatches: native for fixed base, AD for floating base.

Tensor layout (matches the reference's return convention):
  d2tau_dq[i, j, k]   = ∂²tau_i / ∂q_j ∂q_k       (symmetric in j,k)
  d2tau_dqd[i, j, k]  = ∂²tau_i / ∂qd_j ∂qd_k     (symmetric in j,k)
  d2tau_dvdq[i, j, k] = ∂²tau_i / ∂qd_j ∂q_k
  dM_dq[i, j, k]      = ∂M_ij / ∂q_k              (symmetric in i,j)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.robot import RobotModel
from ..spatial.ops import (
    crm, crf, icrf, cross_motion, cross_force, factor_inertia, dot_inertia,
)
from ..spatial.batched import mm, mtm, mv
from .crba import crba
from .fd import forward_dynamics_full
from .rnea_grad import rnea_grad
from .xforms import joint_transforms_list


def _x_inv(X):
    """Inverse of a spatial motion transform [[E, 0], [B, E]] without a
    general 6x6 solve: [[E^T, 0], [-E^T B E^T, E^T]]."""
    E = X[..., :3, :3]
    B = X[..., 3:, :3]
    Et = jnp.swapaxes(E, -1, -2)
    Bi = -Et @ B @ Et
    top = jnp.concatenate([Et, jnp.zeros_like(Et)], axis=-1)
    bot = jnp.concatenate([Bi, Et], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _world_pass(model: RobotModel, q, qd, qdd, gravity: float):
    """World-frame forward pass (reference :1410-1448, with the composite
    f/IC/BC accumulation done as dense subtree-mask sums).

    Returns stacked (..., n, 6[,6]) arrays: S, Sd, psid, psidd and the
    COMPOSITE IC, BC, f.
    """
    nb = model.nb
    Xs = joint_transforms_list(model, q)
    dtype = Xs[0].dtype
    g = jnp.zeros(q.shape[:-1] + (6,), dtype).at[..., 5].set(-gravity)

    Xup, S0, v, a, psid, psidd, Sd, IC, BC, f = ([None] * nb for _ in range(10))
    for i in range(nb):
        p = model.parent[i]
        Xup[i] = Xs[i] if p == -1 else mm(Xs[i], Xup[p])
        S0[i] = mv(_x_inv(Xup[i]), jnp.broadcast_to(model.S[i], g.shape))
        vp = jnp.zeros_like(g) if p == -1 else v[p]
        ap = g if p == -1 else a[p]
        qd_i = qd[..., model.v_index(i), None]
        vJ = S0[i] * qd_i
        psid[i] = cross_motion(vp, S0[i])
        psidd[i] = cross_motion(ap, S0[i]) + cross_motion(vp, psid[i])
        v[i] = vp + vJ
        a[i] = ap + cross_motion(vp, vJ) + S0[i] * qdd[..., model.v_index(i), None]
        Sd[i] = cross_motion(v[i], S0[i])
        IC[i] = mtm(Xup[i], mm(jnp.broadcast_to(model.I[i], Xup[i].shape), Xup[i]))
        ICv = mv(IC[i], v[i])
        # BC = crf(v) I + icrf(Iv) - I crm(v) = 2 * factor_inertia(I, v)
        # (reference factor_functions number=3, RBDReference.py:45-54)
        BC[i] = 2.0 * factor_inertia(IC[i], v[i])
        f[i] = mv(IC[i], a[i]) + cross_force(v[i], ICv)

    stack = lambda xs: jnp.stack(xs, axis=-2)
    stackm = lambda xs: jnp.stack(xs, axis=-3)
    S0, Sd, psid, psidd = map(stack, (S0, Sd, psid, psidd))
    IC, BC = map(stackm, (IC, BC))
    f = stack(f)
    # composite (subtree) sums — dense mask contraction, branch-correct
    st = jnp.asarray(model.subtree_mask(), dtype)
    ICc = jnp.einsum("ij,...jab->...iab", st, IC)
    BCc = jnp.einsum("ij,...jab->...iab", st, BC)
    fc = jnp.einsum("ij,...ja->...ia", st, f)
    return S0, Sd, psid, psidd, ICc, BCc, fc


def idsva_so_native(model: RobotModel, q, qd, qdd, gravity: float = -9.81):
    """Direct second-order sweep (fixed base; reference :1387-1604).

    (..., n) inputs -> 4 tensors (..., n, n, n); arbitrary leading batch."""
    if model.floating_base:
        raise ValueError(
            "idsva_so_native covers fixed-base models (the reference's own "
            "scope); use idsva_so (dispatches to the AD path for fb)"
        )
    n = model.nv
    S, Sd, psid, psidd, IC, BC, f = _world_pass(model, q, qd, qdd, gravity)
    dtype = S.dtype

    # per-body 6x6 factors (reference T1-T4 / D1-D4, :1476-1491)
    T1 = jnp.einsum("...iab,...ib->...ia", IC, S)
    T2 = -jnp.einsum("...iba,...ib->...ia", BC, S)  # -BC^T S
    T3 = (
        jnp.einsum("...iab,...ib->...ia", BC, psid)
        + jnp.einsum("...iab,...ib->...ia", IC, psidd)
        + jnp.einsum("...iab,...ib->...ia", icrf(f), S)
    )
    T4 = jnp.einsum("...iab,...ib->...ia", BC, S) + jnp.einsum(
        "...iab,...ib->...ia", IC, psid + Sd
    )
    # Bfac = 2 * factor_inertia (reference factor_functions, :45-54); dotf =
    # dot_inertia (reference dot_matrix, :27-31).  Both operate per body on
    # the stacked (..., n, 6, 6) / (..., n, 6) layout via batched broadcasting
    Bfac = lambda M, x: 2.0 * factor_inertia(M, x)
    dotf = dot_inertia
    D1 = dotf(IC, S)
    D2 = Bfac(IC, psid) + dotf(BC, S)
    D3 = Bfac(IC, S)
    D4 = icrf(jnp.einsum("...iba,...ib->...ia", IC, S))  # icrf(IC^T S)

    # static precedence masks: Anc[x, y] == 1 iff y == x or y is an ancestor
    # of x; Astr strict.  (model.ancestor_mask — SURVEY.md §7 P4.)
    Astr = jnp.asarray(np.asarray(model.ancestor_mask(), np.float64), dtype)
    Anc = Astr + jnp.eye(n, dtype=dtype)
    eye = jnp.eye(n, dtype=dtype)

    # bilinear helper: bil(D, x, y)[..., r, a, b] = x_a^T D_r y_b
    bil = lambda D, x, y: jnp.einsum("...red,...ae,...bd->...rab", D, x, y)
    # pairwise motion cross table: _cm(X, Y)[..., a, b, :] = X_a x Y_b
    _cm = lambda X, Y: cross_motion(X[..., :, None, :], Y[..., None, :, :])
    swap_ab = lambda t: jnp.swapaxes(t, -1, -2)
    # 3-D masks (r, a, b) from 2-D precedence; label convention: "xy" reads
    # mask[x, y] of the 2-D matrix
    m3 = lambda spec, M1, M2: jnp.einsum(spec + "->rab", M1, M2)

    cmSS = _cm(S, S)                 # [a, b] = S_a x S_b

    # ---- d2tau_dq (reference :1533, :1544, :1554, :1580, :1583, :1592) ----
    # V1[r,a,b] = -psid_a^T D3_r psid_b - T2_r.(psid_b x S_a)
    #             + T1_r.(psidd_b x S_a)        [rows in subtree: r >= a >= b]
    V1 = (
        -bil(D3, psid, psid)
        - jnp.einsum("...re,...bae->...rab", T2, _cm(psid, S))
        + jnp.einsum("...re,...bae->...rab", T1, _cm(psidd, S))
    )
    # V2[r,a,b] = S_r^T D2_a psid_b + S_r^T D1_a psidd_b - T3_a.(S_b x S_r)
    #             [row a strict ancestor: a >= b > r]
    V2 = (
        jnp.einsum("...aed,...re,...bd->...rab", D2, S, psid)
        + jnp.einsum("...aed,...re,...bd->...rab", D1, S, psidd)
        - jnp.einsum("...ae,...bre->...rab", T3, cmSS)
    )
    # V3[r,a,b] = S_r^T D2_b psid_a + S_r^T D1_b psidd_a   [a <= r < b]
    V3 = jnp.einsum("...bed,...re,...ad->...rab", D2, S, psid) + jnp.einsum(
        "...bed,...re,...ad->...rab", D1, S, psidd
    )
    d2q = (
        m3("ra,ab", Anc, Anc) * V1            # r >= a >= b
        + m3("rb,ba", Anc, Astr) * swap_ab(V1)  # r >= b > a
        + m3("ab,br", Anc, Astr) * V2           # a >= b > r
        + m3("ar,ba", Astr, Astr) * swap_ab(V2)  # b > a > r
        + m3("ra,br", Anc, Astr) * V3           # a <= r < b
        + m3("rb,ar", Anc, Astr) * swap_ab(V3)  # b <= r < a
    )

    # ---- d2tau_dqd (reference :1547, :1562, :1572, :1586, :1602) ----------
    W1 = -bil(D3, S, S)   # -S_a^T D3_r S_b   [r >= a > b]
    W2 = jnp.einsum("...aed,...re,...bd->...rab", D3, S, S)  # S_r^T D3_a S_b
    d2qd = (
        m3("ra,ab", Anc, Astr) * W1
        + m3("rb,ba", Anc, Astr) * swap_ab(W1)
        + m3("ab,br", Astr, Astr) * W2           # a > b > r
        + m3("ba,ar", Astr, Astr) * swap_ab(W2)  # b > a > r
        + m3("ra,br", Anc, Astr) * swap_ab(W2)   # a <= r < b
        + m3("rb,ar", Anc, Astr) * W2            # b <= r < a
    )
    # diagonal (a == b): r >= a: -S_a^T D1_r S_a;
    # r < a: T1_a.(S_r x S_a) + S_r.(S_a x* T1_a)
    diag_desc = -jnp.einsum("...red,...ae,...ad->...ra", D1, S, S)
    diag_anc = jnp.einsum("...ae,...rae->...ra", T1, cmSS) + jnp.einsum(
        "...re,...ae->...ra", S, cross_force(S, T1)
    )
    d2qd = d2qd + (Anc * diag_desc + jnp.swapaxes(Astr, -1, -2) * diag_anc)[
        ..., :, :, None
    ] * eye

    # ---- d2tau_dvdq (reference :1534, :1551, :1556, :1576, :1590, :1595) --
    # layout [i, j, k] = d2tau_i / dqd_j dq_k
    H1 = -bil(D3, S, psid)  # -S_a^T D3_r psid_b      [r >= a >= b]
    # H2[r,a,b] = -S_a^T D3_r psid_b - T2_r.(S_a x S_b)
    #             + T1_r.((Sd_a+psid_a) x S_b - 2 psid_b x S_a)  [r >= b > a]
    H2 = (
        H1
        - jnp.einsum("...re,...abe->...rab", T2, cmSS)
        + jnp.einsum("...re,...abe->...rab", T1, _cm(Sd + psid, S))
        - 2.0 * jnp.einsum("...re,...bae->...rab", T1, _cm(psid, S))
    )
    # H3[r,a,b] = S_r^T D3_a psid_b - T4_a.(S_b x S_r)   [a >= b > r]
    H3 = jnp.einsum("...aed,...re,...bd->...rab", D3, S, psid) - jnp.einsum(
        "...ae,...bre->...rab", T4, cmSS
    )
    # H46[r,a,b] = S_r^T D2_b S_a + S_r^T D1_b (Sd_a + psid_a)  [a,r < b]
    H46 = jnp.einsum("...bed,...re,...ad->...rab", D2, S, S) + jnp.einsum(
        "...bed,...re,...ad->...rab", D1, S, Sd + psid
    )
    H5 = jnp.einsum("...aed,...re,...bd->...rab", D3, S, psid)  # [b <= r < a]
    dvdq = (
        m3("ra,ab", Anc, Anc) * H1
        + m3("rb,ba", Anc, Astr) * H2
        + m3("ab,br", Anc, Astr) * H3
        + m3("ba,br", Astr, Astr) * H46   # a < b, r < b (both ancestors of b)
        + m3("ar,rb", Astr, Anc) * H5
    )

    # ---- dM_dq (reference :1564, :1598) -----------------------------------
    K1 = jnp.einsum("...aed,...re,...bd->...rab", D4, S, S)   # S_r^T D4_a S_b
    K1b = jnp.einsum("...red,...ae,...bd->...rab", D4, S, S)  # S_a^T D4_r S_b
    K2 = jnp.einsum("...bed,...re,...ad->...rab", D1, S, S)   # S_r^T D1_b S_a
    K2b = jnp.einsum("...bed,...ae,...rd->...rab", D1, S, S)  # S_a^T D1_b S_r
    dM = (
        m3("br,ab", Astr, Anc) * K1    # r < b <= a
        + m3("ba,rb", Astr, Anc) * K1b  # a < b <= r
        + m3("ar,ba", Anc, Astr) * K2   # r <= a < b
        + m3("ra,br", Astr, Astr) * K2b  # a < r < b
    )

    return d2q, d2qd, dvdq, dM


def idsva_so_ad(model: RobotModel, q, qd, qdd, gravity: float = -9.81):
    """Second-order tensors by forward-mode AD over the analytical first-order
    kernel (``rnea_grad``) — exact for branched trees AND floating bases
    (n tangent evaluations of the O(NB*n) sweep; XLA batches the tangents)."""

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


def idsva_so(model: RobotModel, q, qd, qdd, gravity: float = -9.81):
    """Second-order inverse-dynamics derivatives.

    (..., nq), (..., nv), (..., nv) -> 4 tensors (..., n, n, n) as documented
    in the module header (reference ``second_order_idsva_parallel``
    RBDReference.py:1387-1604).  Dispatch: direct native sweep for fixed-base
    models, AD-over-analytic-gradient for floating base.
    """
    if model.floating_base:
        return idsva_so_ad(model, q, qd, qdd, gravity)
    return idsva_so_native(model, q, qd, qdd, gravity)


def fdsva_so(model: RobotModel, q, qd, u, gravity: float = -9.81):
    """Second-order forward-dynamics derivatives (reference ``fdsva_so``
    RBDReference.py:1606-1631).

    Returns (daba_dqdq, daba_dvdq, daba_dvdv, daba_dtdq), each (..., n, n, n):
      daba_dqdq[i,j,k] = ∂²qdd_i/∂q_j∂q_k,  daba_dvdv = ∂²qdd/∂qd²,
      daba_dvdq = ∂²qdd/∂qd∂q,  daba_dtdq[i,j,k] = ∂(∂qdd_i/∂tau_j)/∂q_k.
    """
    qdd, Minv, fd_dq, fd_dqd = forward_dynamics_full(model, q, qd, u, gravity)
    d2_dq, d2_dqd, d2_dvdq, dM_dq = idsva_so(model, q, qd, qdd, gravity)

    mmt3 = lambda A, B: jnp.einsum("...il,...ljk->...ijk", A, B)
    # chain rule: tau(q, qd, qdd(q, qd, u)) is identically u, so the total
    # second derivative of qdd folds dM_dq against the first-order FD grads
    # (same contractions as the reference's einsums at :1622-1629)
    t_q = jnp.einsum("...ilk,...lj->...ijk", dM_dq, fd_dq)
    t_qT = jnp.swapaxes(t_q, -1, -2)
    daba_dqdq = -mmt3(Minv, d2_dq + t_q + t_qT)
    t_v = jnp.einsum("...ilk,...lj->...ijk", dM_dq, fd_dqd)
    daba_dvdq = -mmt3(Minv, d2_dvdq + t_v)
    daba_dvdv = -mmt3(Minv, d2_dqd)
    daba_dtdq = -mmt3(Minv, jnp.einsum("...ilk,...lj->...ijk", dM_dq, Minv))
    return daba_dqdq, daba_dvdq, daba_dvdv, daba_dtdq
