"""End-to-end example: batched DDP MPC reaching with the 7-DoF arm.

Run (CPU):   JAX_PLATFORMS=cpu python examples/mpc_reaching.py
Run (TPU):   python examples/mpc_reaching.py          (one process at a time)

Shows the full stack: URDF model -> batched dynamics -> analytic-gradient DDP
with gravity-compensation warm start -> closed-loop receding-horizon MPC.
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rbdtpu.model import load_asset
from rbdtpu.dynamics import rnea
from rbdtpu.kinematics.fk import ee_pose
from rbdtpu.solver import (
    DDPConfig, ddp_solve, ee_reaching_cost, mpc_run, pack_state,
)


def main():
    model = load_asset("arm7", dtype=np.float32)
    target = jnp.array([0.3, 0.2, 0.8], jnp.float32)
    cost = ee_reaching_cost(
        model, target, w_ee=10.0, w_ee_f=2000.0, w_u=1e-6,
        w_qd=1e-3, w_qd_f=0.1,
    )

    # ---- one batch of open-loop solves (64 start states) ----------------- #
    B, H = 64, 100
    key = jax.random.PRNGKey(0)
    q0 = 0.3 * jax.random.normal(key, (B, model.nq), jnp.float32)
    zero = jnp.zeros((B, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], axis=-1)
    u_hold = rnea(model, q0, zero, zero)[0]  # gravity compensation
    U0 = jnp.broadcast_to(u_hold[:, None, :], (B, H, model.nv))

    cfg = DDPConfig(iters=10, dt=0.01, n_alphas=8)
    states, hist = jax.jit(
        lambda x, U: ddp_solve(model, cost, x, U, cfg)
    )(x0, U0)
    qf = states.X[:, -1, : model.nq]
    ee = ee_pose(model, qf)[:, 0, :3]
    dist = jnp.linalg.norm(ee - target, axis=-1)
    print(f"batched solve: mean final cost {float(states.J.mean()):.3f}, "
          f"mean EE error {float(dist.mean())*100:.1f} cm")

    # ---- closed-loop receding-horizon MPC from one state ----------------- #
    steps = 50
    carry, (U_applied, J_hist) = mpc_run(
        model, cost, x0[0], U0[0], steps, DDPConfig(iters=3, dt=0.01,
                                                    n_alphas=4)
    )
    q_end = carry.x[: model.nq]
    ee_end = ee_pose(model, q_end)[0, :3]
    print(f"closed-loop MPC after {steps} steps: EE at "
          f"{np.asarray(ee_end).round(3)}, target {np.asarray(target)}")


if __name__ == "__main__":
    main()
