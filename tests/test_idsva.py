"""IDSVA-SO / FDSVA-SO parity and exactness tests (reference C10).

Layout verified empirically: all four second-order tensors match the reference
at the identity permutation to ~1e-14 on the serial arm7 chain (the reference's
accumulation at RBDReference.py:1448 is only correct for serial chains —
SURVEY.md §2.1 — which arm7 is).

The NATIVE direct sweep (idsva_so_native: world-frame IC/BC factors + masked
dense einsum assembly, the TPU re-architecture of the reference's triple
ancestor loop :1499-1603) is tested against double-forward-mode AD of plain
RNEA — an implementation-independent ground truth — on a serial chain, a
branched tree, and a mixed revolute/prismatic chain.  The prismatic case also
locks in the rnea_grad bpass fix: the reference's -f x S force correction
(:1278 via fxS :166-168) equals crf(S) f only for angular-only S, so its
rnea_grad (and originally ours) disagreed with finite differences of its own
rnea on prismatic models.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.dynamics import (
    crba, fdsva_so, idsva_so, idsva_so_ad, idsva_so_native, rnea, rnea_grad,
)
from rbdtpu.model import parse_urdf

from conftest import random_state


def _tree_model(jtypes, parents):
    """Small test tree with dense inertias and tilted joint frames."""
    links = "".join(
        f'<link name="l{i}"><inertial><origin xyz="0.05 0.02 0.1"/>'
        f'<mass value="{1.0 + 0.2 * i}"/><inertia ixx="0.02" iyy="0.03" '
        f'izz="0.015" ixy="0.002" ixz="0.001" iyz="0.003"/></inertial></link>'
        for i in range(len(jtypes) + 1)
    )
    axes = ["0 1 0", "1 0 0", "0 0 1", "1 0 0", "0 1 0"]
    joints = "".join(
        f'<joint name="j{i}" type="{jtypes[i]}">'
        f'<origin xyz="0.1 0.05 0.2" rpy="0.1 {0.1 * i} 0"/>'
        f'<parent link="l{parents[i]}"/><child link="l{i + 1}"/>'
        f'<axis xyz="{axes[i % len(axes)]}"/></joint>'
        for i in range(len(jtypes))
    )
    return parse_urdf(
        f'<robot name="t">{links}{joints}</robot>', dtype=np.float64
    )


@pytest.mark.parametrize(
    "jtypes,parents",
    [
        (["revolute"] * 4, [0, 1, 2, 3]),            # serial chain
        (["revolute"] * 5, [0, 1, 1, 2, 1]),         # branched tree
        (["revolute", "prismatic", "revolute", "prismatic"], [0, 1, 2, 3]),
    ],
    ids=["chain", "branched", "prismatic"],
)
def test_idsva_native_matches_double_ad(jtypes, parents, rng):
    """Native sweep == jacfwd(jacfwd(rnea)) — independent ground truth."""
    m = _tree_model(jtypes, parents)
    q = jnp.array(rng.uniform(-1, 1, m.nq))
    qd = jnp.array(rng.uniform(-1, 1, m.nv))
    qdd = jnp.array(rng.uniform(-1, 1, m.nv))
    d2q, d2qd, dvdq, dM = idsva_so_native(m, q, qd, qdd)
    tau_q = lambda q_: rnea(m, q_, qd, qdd)[0]
    np.testing.assert_allclose(
        np.asarray(d2q), np.asarray(jax.jacfwd(jax.jacfwd(tau_q))(q)),
        atol=1e-11,
    )
    tau_qd = lambda qd_: rnea(m, q, qd_, qdd)[0]
    np.testing.assert_allclose(
        np.asarray(d2qd), np.asarray(jax.jacfwd(jax.jacfwd(tau_qd))(qd)),
        atol=1e-11,
    )
    # dvdq[i, j, k] = d(dtau_i/dqd_j)/dq_k
    np.testing.assert_allclose(
        np.asarray(dvdq),
        np.asarray(jax.jacfwd(
            lambda q_: jax.jacfwd(lambda qd_: rnea(m, q_, qd_, qdd)[0])(qd)
        )(q)),
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(dM), np.asarray(jax.jacfwd(lambda q_: crba(m, q_))(q)),
        atol=1e-11,
    )


def test_idsva_native_matches_ad_path(arm7, rng):
    """Native sweep == AD-over-analytic-gradient path (the fb fallback)."""
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    args = (jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for o_n, o_a in zip(idsva_so_native(arm7, *args), idsva_so_ad(arm7, *args)):
        np.testing.assert_allclose(np.asarray(o_n), np.asarray(o_a), atol=1e-10)


def test_rnea_grad_prismatic_matches_ad(rng):
    """The first-order dq gradient is exact on prismatic joints (the
    reference's own rnea_grad is NOT: its fxS force correction is
    revolute-only — found by the native second-order sweep)."""
    m = _tree_model(
        ["revolute", "prismatic", "revolute", "prismatic"], [0, 1, 2, 3]
    )
    q = jnp.array(rng.uniform(-1, 1, m.nq))
    qd = jnp.array(rng.uniform(-1, 1, m.nv))
    qdd = jnp.array(rng.uniform(-1, 1, m.nv))
    dcq, dcd = rnea_grad(m, q, qd, qdd, split=True)
    J = jax.jacfwd(lambda q_: rnea(m, q_, qd, qdd)[0])(q)
    np.testing.assert_allclose(np.asarray(dcq), np.asarray(J), atol=1e-11)
    Jd = jax.jacfwd(lambda qd_: rnea(m, q, qd_, qdd)[0])(qd)
    np.testing.assert_allclose(np.asarray(dcd), np.asarray(Jd), atol=1e-11)


def test_idsva_so_parity(arm7, oracle, rng):
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    ref = oracle.second_order_idsva_parallel(q.copy(), qd.copy(), qdd.copy())
    ours = idsva_so(arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    names = ["d2tau_dq", "d2tau_dqd", "d2tau_dvdq", "dM_dq"]
    for name, r, o in zip(names, ref, ours):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=1e-8, err_msg=name
        )


def test_fdsva_so_parity(arm7, oracle, rng):
    q, qd, tau = random_state(rng, arm7)
    ref = oracle.fdsva_so(q.copy(), qd.copy(), tau.copy())
    ours = fdsva_so(arm7, jnp.array(q), jnp.array(qd), jnp.array(tau))
    names = ["daba_dqdq", "daba_dvdq", "daba_dvdv", "daba_dtdq"]
    for name, r, o in zip(names, ref, ours):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=1e-6, err_msg=name
        )


def test_idsva_so_matches_ad_of_rnea_grad(arm7, rng):
    """Second derivatives equal jacfwd of the analytical first-order kernel."""
    q, qd, _ = random_state(rng, arm7)
    qdd = rng.uniform(-1, 1, arm7.nv)
    d2q, d2qd, d2vq, dM = idsva_so(
        arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd)
    )
    dM_ad = jax.jacfwd(lambda qq: crba(arm7, qq))(jnp.array(q))
    np.testing.assert_allclose(np.asarray(dM), np.asarray(dM_ad), atol=1e-10)
    # symmetry properties
    np.testing.assert_allclose(
        np.asarray(d2q), np.swapaxes(np.asarray(d2q), -1, -2), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(d2qd), np.swapaxes(np.asarray(d2qd), -1, -2), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(dM), np.swapaxes(np.asarray(dM), 0, 1), atol=1e-10
    )


def test_idsva_so_batched(arm7, rng):
    q, qd, _ = random_state(rng, arm7, batch=(2,))
    qdd = rng.uniform(-1, 1, (2, arm7.nv))
    outs = idsva_so(arm7, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    singles = idsva_so(arm7, jnp.array(q[1]), jnp.array(qd[1]), jnp.array(qdd[1]))
    for o, s in zip(outs, singles):
        assert o.shape == (2,) + s.shape
        np.testing.assert_allclose(np.asarray(o[1]), np.asarray(s), atol=1e-10)


def test_idsva_native_floating_base_matches_ad(quadruped12fb, rng):
    """The native fb sweep (root-frame coordinate expansion + gravity-seed
    decomposition for the rpy-chart pose columns) equals AD of the exact
    rnea_grad at machine precision — beyond the reference's fixed-base-only
    scope (RBDReference.py:1415)."""
    from rbdtpu.dynamics.idsva import idsva_so_native, idsva_so_ad

    m = quadruped12fb
    q, qd, _ = random_state(rng, m)
    qdd = rng.uniform(-1, 1, m.nv)
    A = idsva_so_native(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    B = idsva_so_ad(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for name, x, y in zip(("d2q", "d2qd", "dvdq", "dM"), A, B):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-10, err_msg=name
        )
    # nonstandard gravity exercises the gravity-loading blocks
    A0 = idsva_so_native(m, jnp.array(q), jnp.array(qd), jnp.array(qdd),
                         gravity=3.71)
    B0 = idsva_so_ad(m, jnp.array(q), jnp.array(qd), jnp.array(qdd),
                     gravity=3.71)
    for x, y in zip(A0, B0):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-10)


def test_idsva_native_floating_base_branched_batched(rng):
    """Branched fb tree (humanoid), batched inputs: native == AD."""
    from rbdtpu.model import load_asset
    from rbdtpu.dynamics.idsva import idsva_so_native, idsva_so_ad

    m = load_asset("humanoid30", dtype=np.float64, floating_base=True)
    q, qd, _ = random_state(rng, m, batch=(2,))
    qdd = rng.uniform(-1, 1, (2, m.nv))
    A = idsva_so_native(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    B = idsva_so_ad(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for x, y in zip(A, B):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-9)


def test_exact_hessian_ddp_floating_base(quadruped12fb, rng):
    """Exact-Hessian (full DDP) solve on the floating-base quadruped runs
    through the native fb IDSVA sweep and still converges (VERDICT r2 next
    #6: lift the fixed-base restriction)."""
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost

    m = quadruped12fb
    H, dt = 8, 0.02
    x_goal = jnp.zeros(m.nq + m.nv).at[2].set(0.35)
    x0 = jnp.array(x_goal).at[2].add(0.05).at[6].add(0.2)
    cost = quadratic_tracking_cost(m, x_goal, w_q=5.0, w_qd=0.1, w_u=1e-4)
    U0 = jnp.zeros((H, m.nv))
    st, Jh = ddp_solve(
        m, cost, x0, U0, DDPConfig(iters=6, dt=dt, exact_hessians=True)
    )
    J = np.asarray(Jh)
    assert np.isfinite(J).all() and J[-1] < J[0]


def test_idsva_native_quat_root_matches_retraction_ad(quadruped12quat, rng):
    """QUATERNION root (VERDICT r3 item 4): the native sweep's tangent-chart
    second-order tensors equal double-jacfwd of RNEA through the solver's
    retraction (idsva_so_ad's quat branch) at machine precision.  The chart
    curvature enters only through the gravity-seed derivatives — see
    dynamics.idsva._idsva_so_native_fb."""
    from rbdtpu.dynamics.idsva import idsva_so_native, idsva_so_ad, idsva_so

    m = quadruped12quat
    q, qd, _ = random_state(rng, m)
    qdd = rng.uniform(-1, 1, m.nv)
    A = idsva_so_native(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    B = idsva_so_ad(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for name, x, y in zip(("d2q", "d2qd", "dvdq", "dM"), A, B):
        assert x.shape == (m.nv, m.nv, m.nv), name
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-10, err_msg=name
        )
    # dispatcher routes the quat root to the native sweep now
    C = idsva_so(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for x, y in zip(A, C):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_idsva_native_quat_humanoid_batched(rng):
    """Branched quat-root tree (humanoid), batched: native == retraction-AD."""
    from rbdtpu.model import load_asset
    from rbdtpu.dynamics.idsva import idsva_so_native, idsva_so_ad

    m = load_asset("humanoid30", dtype=np.float64, floating_base=True,
                   root_quat=True)
    q, qd, _ = random_state(rng, m, batch=(2,))
    qdd = rng.uniform(-1, 1, (2, m.nv))
    A = idsva_so_native(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    B = idsva_so_ad(m, jnp.array(q), jnp.array(qd), jnp.array(qdd))
    for x, y in zip(A, B):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-9)


def test_exact_hessian_ddp_quat_root(quadruped12quat, rng):
    """Exact-Hessian DDP on the QUATERNION root no longer raises
    (VERDICT r3 item 4: solver/ddp.py:476-482) and descends: the fdsva_so
    tensors are tangent-chart exact; the step retraction's second-order
    transport is the only omitted term (documented in ddp.py)."""
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost
    from rbdtpu.solver.integrate import config_retract

    m = quadruped12quat
    H, dt = 8, 0.02
    q_goal = jnp.zeros(m.nq).at[2].set(0.35).at[3].set(1.0)
    x_goal = jnp.concatenate([q_goal, jnp.zeros(m.nv)])
    q0 = config_retract(
        m, q_goal, jnp.zeros(m.nv).at[5].set(0.05).at[0].add(0.2)
    )
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    cost = quadratic_tracking_cost(m, x_goal, w_q=5.0, w_qd=0.1, w_u=1e-4)
    U0 = jnp.zeros((H, m.nv))
    st, Jh = ddp_solve(
        m, cost, x0, U0, DDPConfig(iters=6, dt=dt, exact_hessians=True)
    )
    J = np.asarray(Jh)
    assert np.isfinite(J).all() and J[-1] < J[0]
