"""Control-sequence parity: the full TPU-stack DDP vs a serial numpy DDP
driven by the REFERENCE dynamics (BASELINE.json north star: "matching the
numpy reference controls to 1e-6").

Same cost, integrator, Riccati recursion and line-search rule on both sides;
the only difference is the dynamics engine (our batched JAX kernels vs
RBDReference serial numpy).  f64 end to end.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.oracle.ddp_numpy import NumpyDDP, QuadTrackingCostNp
from rbdtpu.solver import (
    DDPConfig, ddp_solve, pack_state, quadratic_tracking_cost,
)

H = 40
ITERS = 8
DT = 0.02


@pytest.mark.slow
def test_ddp_control_parity(arm7, oracle, rng):
    q_goal = rng.uniform(-0.4, 0.4, arm7.nq)
    x_goal = np.concatenate([q_goal, np.zeros(arm7.nv)])
    x0 = np.concatenate([np.zeros(arm7.nq), np.zeros(arm7.nv)])
    U0 = np.zeros((H, arm7.nv))

    # --- ours (JAX, f64 on CPU) ---
    cfg = DDPConfig(iters=ITERS, dt=DT, n_alphas=8)
    cost = quadratic_tracking_cost(arm7, jnp.array(x_goal))
    state, _ = ddp_solve(
        arm7, cost, jnp.array(x0), jnp.array(U0), cfg
    )
    U_ours = np.asarray(state.U)

    # --- reference-driven numpy mirror ---
    np_cost = QuadTrackingCostNp(arm7.nq, arm7.nv, x_goal)
    np_ddp = NumpyDDP(oracle, arm7.nq, arm7.nv, dt=DT, iters=ITERS)
    _, U_ref, J_ref = np_ddp.solve(np_cost, x0, U0)

    err = np.abs(U_ours - U_ref).max()
    assert err < 1e-6, f"max |u - u_ref| = {err:.3e}"
    assert abs(float(state.J) - J_ref) / max(1.0, abs(J_ref)) < 1e-9
