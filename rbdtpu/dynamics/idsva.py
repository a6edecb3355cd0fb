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
    """Direct second-order sweep (reference :1387-1604, fixed-base there;
    this implementation also covers the FLOATING BASE natively — see
    ``_idsva_so_native_fb``).

    (..., n) inputs -> 4 tensors (..., n, n, n); arbitrary leading batch.

    Size crossover (measured, v5e r4 driver capture): at arm scale (n=7)
    the native sweep is a near-wash with plain forward-over-reverse AD
    (615k native vs 540k AD eval/s — +14%); its value is the large-n /
    floating-base regime, where the AD fallback needs O(n^2) tangent RNEA
    evaluations per sample (humanoid-30 QUAT root: 28.8k native vs 153.7
    retraction-AD eval/s — 187x).  Callers that only ever evaluate
    fixed-base arm-class models can use ``idsva_so_ad`` interchangeably;
    the solver's exact-Hessian path uses this native sweep everywhere
    because its advantage grows superlinearly with n."""
    if model.floating_base:
        return _idsva_so_native_fb(model, q, qd, qdd, gravity)
    n = model.nv
    S, Sd, psid, psidd, IC, BC, f = _world_pass(model, q, qd, qdd, gravity)
    dtype = S.dtype
    Astr = jnp.asarray(np.asarray(model.ancestor_mask(), np.float64), dtype)
    Anc = Astr + jnp.eye(n, dtype=dtype)
    return _so_assemble(S, Sd, psid, psidd, IC, BC, f, Anc, Astr)


def _so_assemble(S, Sd, psid, psidd, IC, BC, f, Anc, Astr):
    """Masked-dense einsum assembly of the four second-order tensors from
    per-COORDINATE world-frame quantities (reference :1450-1603).

    S/Sd/psid/psidd (..., n, 6); IC/BC (..., n, 6, 6) composite (per
    coordinate's body); f (..., n, 6); Anc/Astr (n, n) COORDINATE-level
    precedence (Anc[x, y]: y's body is x's body or an ancestor of it;
    Astr strict).  Works for 1-DoF-per-body trees (fixed base, where
    coordinate == body) and for coordinate-expanded floating-base trees
    (where the 6 root coordinates share body 0) — the d2qd same-body pairs
    are handled by the clean 3-term form below, exact for multi-DoF roots.
    """
    # per-coordinate 6x6 factors (reference T1-T4 / D1-D4, :1476-1491)
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

    # ---- d2tau_dqd --------------------------------------------------------
    # Clean 3-term masked form, derived directly from the velocity-quadratic
    # structure of the bias force (equivalent to the reference's 6-case split
    # :1547-1602 for 1-DoF trees, and exact for multi-DoF roots / same-body
    # coordinate pairs, which the case split cannot express):
    #   d2tau_r/dqd_a dqd_b =
    #     [b strict-anc a] S_r^T IC_max(r,a) (S_b x S_a)      (+ a<->b swap)
    #   + [pairwise comparable] S_r^T (crf(S_a) IC_deep S_b
    #                                  + crf(S_b) IC_deep S_a)
    # with IC_deep the composite inertia of the deepest of {r, a, b} and
    # x^T crf(y) z = -(y x x).z folding the crf contractions onto cmSS.
    ICS = jnp.einsum("...xde,...ye->...xyd", IC, S)  # ICS[x, y] = IC_x S_y
    # term1 (+ its a<->b swap): [b strict-anc a] S_r^T IC_max(r,a) (S_b x S_a)
    t1_r = m3("ra,ab", Anc, Astr) * jnp.einsum(
        "...re,...bae->...rab", T1, cmSS
    )
    t1_a = m3("ar,ab", Astr, Astr) * jnp.einsum(
        "...rd,...ade,...bae->...rab", S, IC, cmSS
    )
    term1 = t1_r + t1_a
    # term3: deepest-of-{r,a,b} composite inertia, partitioned exclusively
    M_r = m3("ra,rb", Anc, Anc)   # r at least as deep as both
    M_a = m3("ar,ab", Astr, Anc)  # a strictly deeper than r, >= b
    M_b = m3("br,ba", Astr, Astr)  # b strictly deeper than both
    t3_r = -(
        jnp.einsum("...are,...rbe->...rab", cmSS, ICS)
        + jnp.einsum("...bre,...rae->...rab", cmSS, ICS)
    )
    t3_a = -(
        jnp.einsum("...are,...abe->...rab", cmSS, ICS)
        + jnp.einsum("...bre,...ae->...rab", cmSS, T1)
    )
    t3_b = -(
        jnp.einsum("...are,...be->...rab", cmSS, T1)
        + jnp.einsum("...bre,...bae->...rab", cmSS, ICS)
    )
    d2qd = (
        term1 + swap_ab(term1)
        + M_r * t3_r + M_a * t3_a + M_b * t3_b
    )

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


def _idsva_so_native_fb(model: RobotModel, q, qd, qdd, gravity: float):
    """Native second-order sweep for the FLOATING BASE — rpy AND quaternion
    roots, beyond the reference's fixed-base-only scope (RBDReference.py:1415).

    Structure (the TPU-first decomposition):

    1. The whole sweep runs in the ROOT frame, where the root's motion
       subspace is the identity and — crucially — the root POSE enters tau
       ONLY through the gravity seed u6 = X0(q_root) a_grav = [0; R^T gl]
       (the same fact the first-order fused linearization exploits,
       kernels/colvec.py).  tau is AFFINE in that seed, so every
       root-pose derivative reduces to gravity-loading contractions.
    2. VELOCITY coordinates (root twist + joint rates) and JOINT-q
       derivatives come from the coordinate-expanded root-frame world pass:
       the root contributes 6 coordinates sharing body 0 with S = e_c,
       psid = 0, psidd = u6 x e_c, Sd = v0 x e_c, and the masked-einsum
       assembly (``_so_assemble``) runs on body-level precedence expanded
       to coordinates.  The d2qd 3-term form is exact for the same-body
       root pairs.
    3. Root-POSE q columns: translation columns vanish (gravity is
       translation-invariant); rotation columns are
         d2tau/dth_a dth_b = T1_r . d2u6/dth^2        (T1_r = IC_r S_r)
         d2tau/dq_j dth_m = -[j anc-or-self r] T1_r . (S_j x du_m)
                            + [j in strict subtree r] S_r^T D1_j du_m
       (the dS_r and dIC_r terms of the first case cancel via
       x^T crf(y) z = -(y x x).z).  d2tau/dqd dth = 0 and dM/dth = 0
       (the mass matrix in body-twist coordinates is pose-independent).

    QUATERNION root (model.root_quat): identical structure — the ONLY
    chart-dependent quantities are du6/dxi and d2u6/dxi2, evaluated through
    the solver's right retraction quat*exp(xi_th)
    (solver.integrate.config_retract) at xi = 0 instead of the flat rpy
    coordinates; the retraction curvature of the chart is therefore captured
    exactly, because tau depends on the root-orientation tangent ONLY
    through u6.  The tangent ordering follows the root twist: rotation
    columns 0:3, translation 3:6 (rpy: translation 0:3, rotation 3:6).
    Cross-checked against retraction-AD at 1e-8 (tests/test_idsva.py).
    """
    nb, nv = model.nb, model.nv
    Xs = joint_transforms_list(model, q)
    dtype = Xs[0].dtype
    a_grav = jnp.zeros(q.shape[:-1] + (6,), dtype).at[..., 5].set(-gravity)
    u6 = mv(Xs[0], a_grav)  # gravity seed in the root frame

    # ---- body-level root-frame pass (Xup[0] = identity) ----
    Xup, S0, v, a, psid, psidd, Sd, IC, BC, f = (
        [None] * nb for _ in range(10)
    )
    v[0] = qd[..., 0:6]
    a[0] = u6 + qdd[..., 0:6]
    IC[0] = jnp.broadcast_to(model.I[0], u6.shape[:-1] + (6, 6))
    BC[0] = 2.0 * factor_inertia(IC[0], v[0])
    f[0] = mv(IC[0], a[0]) + cross_force(v[0], mv(IC[0], v[0]))
    for i in range(1, nb):
        p = model.parent[i]
        Xup[i] = Xs[i] if p == 0 else mm(Xs[i], Xup[p])
        S0[i] = mv(_x_inv(Xup[i]), jnp.broadcast_to(model.S[i], u6.shape))
        vp, ap = v[p], a[p]
        qd_i = qd[..., model.v_index(i), None]
        vJ = S0[i] * qd_i
        psid[i] = cross_motion(vp, S0[i])
        psidd[i] = cross_motion(ap, S0[i]) + cross_motion(vp, psid[i])
        v[i] = vp + vJ
        a[i] = (
            ap + cross_motion(vp, vJ)
            + S0[i] * qdd[..., model.v_index(i), None]
        )
        Sd[i] = cross_motion(v[i], S0[i])
        IC[i] = mtm(Xup[i], mm(jnp.broadcast_to(model.I[i], Xup[i].shape),
                               Xup[i]))
        BC[i] = 2.0 * factor_inertia(IC[i], v[i])
        f[i] = mv(IC[i], a[i]) + cross_force(v[i], mv(IC[i], v[i]))

    stack = lambda xs: jnp.stack(xs, axis=-2)
    stackm = lambda xs: jnp.stack(xs, axis=-3)
    st = jnp.asarray(model.subtree_mask(), dtype)
    ICb = jnp.einsum("ij,...jab->...iab", st, stackm(IC))
    BCb = jnp.einsum("ij,...jab->...iab", st, stackm(BC))
    fb_ = jnp.einsum("ij,...ja->...ia", st, stack(f))

    # ---- coordinate expansion: 6 root coords (body 0) + joints ----
    bmap = np.array([0] * 6 + list(range(1, nb)))
    batch = u6.shape[:-1]
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    zero6 = jnp.zeros(batch + (6, 6), dtype)
    Sc = jnp.concatenate([eye6, stack(S0[1:])], axis=-2)
    psid_c = jnp.concatenate([zero6, stack(psid[1:])], axis=-2)
    # root: parent is the inertial frame with the gravity-trick acceleration
    psidd_root = cross_motion(u6[..., None, :], eye6)
    psidd_c = jnp.concatenate([psidd_root, stack(psidd[1:])], axis=-2)
    Sd_root = cross_motion(v[0][..., None, :], eye6)
    Sd_c = jnp.concatenate([Sd_root, stack(Sd[1:])], axis=-2)
    ICc = jnp.take(ICb, jnp.asarray(bmap), axis=-3)
    BCc = jnp.take(BCb, jnp.asarray(bmap), axis=-3)
    fc = jnp.take(fb_, jnp.asarray(bmap), axis=-2)

    Ab = np.asarray(model.ancestor_mask(), np.float64)  # strict, body level
    Astr_c = jnp.asarray(Ab[np.ix_(bmap, bmap)], dtype)
    Anc_c = Astr_c + jnp.asarray(
        (bmap[:, None] == bmap[None, :]).astype(np.float64), dtype
    )

    d2q, d2qd, dvdq, dM = _so_assemble(
        Sc, Sd_c, psid_c, psidd_c, ICc, BCc, fc, Anc_c, Astr_c
    )

    # ---- root-pose q columns (gravity blocks) ----
    Xtree0 = jnp.asarray(model.Xtree[0], dtype)
    agv = jnp.zeros((6,), dtype).at[5].set(-gravity)

    if model.root_quat:
        # tangent chart = the solver's right retraction quat*exp(xi_th)
        # (solver.integrate.config_retract); derivatives of the gravity seed
        # AT xi = 0 capture the chart's curvature exactly
        from ..spatial.transforms import floating_quat_spatial_x
        from ..spatial.quat import quat_exp, quat_mul

        def u_fn_q(dth, quat):
            q7 = jnp.concatenate(
                [jnp.zeros((3,), dtype), quat_mul(quat, quat_exp(dth))]
            )
            return floating_quat_spatial_x(Xtree0, q7) @ agv

        def derivs(quat):
            z = jnp.zeros((3,), dtype)
            return (
                jax.jacfwd(u_fn_q)(z, quat),
                jax.jacfwd(jax.jacfwd(u_fn_q))(z, quat),
            )

        root_rot = q[..., 3:7]
    else:
        from ..spatial.transforms import floating_spatial_x

        def u_fn(th):
            q6 = jnp.concatenate([jnp.zeros((3,), dtype), th])
            return floating_spatial_x(Xtree0, q6) @ agv

        def derivs(th):
            return jax.jacfwd(u_fn)(th), jax.jacfwd(jax.jacfwd(u_fn))(th)

        root_rot = q[..., 3:6]

    if root_rot.ndim == 1:
        du, d2u = derivs(root_rot)  # (6, 3), (6, 3, 3)
    else:
        flat = root_rot.reshape((-1, root_rot.shape[-1]))
        du, d2u = jax.vmap(derivs)(flat)
        du = du.reshape(batch + (6, 3))
        d2u = d2u.reshape(batch + (6, 3, 3))

    T1c = jnp.einsum("...iab,...ib->...ia", ICc, Sc)
    D1c = dot_inertia(ICc, Sc)
    # zero out the garbage the sweep produced in root q columns
    colmask = jnp.concatenate(
        [jnp.zeros((6,), dtype), jnp.ones((nv - 6,), dtype)]
    )
    d2q = d2q * colmask[:, None] * colmask[None, :]
    dvdq = dvdq * colmask
    dM = dM * colmask
    # rotation-tangent slots in the root's 6 coordinates: rpy q-layout is
    # [xyz, rpy] -> 3:6; the quat tangent follows the twist ordering
    # [omega, v] (solver.integrate.config_retract) -> 0:3
    rot = slice(0, 3) if model.root_quat else slice(3, 6)
    # theta-theta block
    gg = jnp.einsum("...re,...emn->...rmn", T1c, d2u)
    d2q = d2q.at[..., rot, rot].set(gg)
    # joint-theta cross block
    duT = jnp.swapaxes(du, -1, -2)  # (..., 3, 6)
    cmSdu = cross_motion(Sc[..., :, None, :], duT[..., None, :, :])
    cross = (
        -Anc_c[..., :, :, None]
        * jnp.einsum("...re,...jme->...rjm", T1c, cmSdu)
        + jnp.swapaxes(Astr_c, -1, -2)[..., :, :, None]
        * jnp.einsum("...jde,...rd,...me->...rjm", D1c, Sc, duT)
    )
    d2q = d2q.at[..., 6:, rot].set(cross[..., 6:, :])
    d2q = d2q.at[..., rot, 6:].set(
        jnp.swapaxes(cross[..., 6:, :], -1, -2)
    )
    return d2q, d2qd, dvdq, dM


def idsva_so_ad(model: RobotModel, q, qd, qdd, gravity: float = -9.81):
    """Second-order tensors by forward-mode AD over the analytical first-order
    kernel (``rnea_grad``) — exact for branched trees AND floating bases
    (n tangent evaluations of the O(NB*n) sweep; XLA batches the tangents).

    QUATERNION root: all q-derivatives are TANGENT-chart derivatives — every
    differentiation goes through the solver's retraction
    (solver.integrate.config_retract) at xi = 0, i.e.
    d2tau_dq[i, j, k] = d^2 tau_i(q (+) xi) / dxi_j dxi_k |_{xi=0}.
    This is the unambiguous exact Hessian in the chart centered at q (NO
    chart recentering — differentiating rnea_grad's recentered tangent
    columns would drop the retraction-curvature terms)."""
    if model.floating_base and model.root_quat:
        return _idsva_so_ad_quat(model, q, qd, qdd, gravity)

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


def _idsva_so_ad_quat(model: RobotModel, q, qd, qdd, gravity: float):
    """Quaternion-root tangent-chart ground truth: double-jacfwd through the
    retraction (see idsva_so_ad docstring).  O(n^2) tangent evaluations of
    the full RNEA — the verification/fallback path; ``idsva_so_native`` is
    the fast one."""
    from ..solver.integrate import config_retract
    from .rnea import rnea

    n = model.nv

    def single(q_, qd_, qdd_):
        z = jnp.zeros((n,), q_.dtype)

        def tau_xi(xi, qd__, qdd__):
            return rnea(model, config_retract(model, q_, xi), qd__, qdd__,
                        gravity)[0]

        d2tau_dq = jax.jacfwd(jax.jacfwd(tau_xi, argnums=0), argnums=0)(
            z, qd_, qdd_
        )
        d2tau_dqd = jax.jacfwd(jax.jacfwd(tau_xi, argnums=1), argnums=1)(
            z, qd_, qdd_
        )
        # [i, j, k] = d(dtau_i/dqd_j)/dxi_k
        d2tau_dvdq = jax.jacfwd(jax.jacfwd(tau_xi, argnums=1), argnums=0)(
            z, qd_, qdd_
        )
        dM = jax.jacfwd(
            lambda xi: crba(model, config_retract(model, q_, xi))
        )(z)
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
    RBDReference.py:1387-1604).  The direct native sweep covers ALL root
    types: fixed base, rpy root, and the quaternion root's tangent chart
    (the retraction curvature enters only through the gravity-seed
    derivatives — see ``_idsva_so_native_fb``); ``idsva_so_ad`` remains as
    the AD cross-check/fallback.
    """
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
