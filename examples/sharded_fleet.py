"""Fleet-scale scenario MPC on a device mesh: the multi-chip deployment
shape of this framework (BASELINE.json north star), runnable on a laptop.

Run (virtual 8-device mesh, CPU):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_fleet.py

On a real TPU slice the SAME code runs unchanged — `make_mesh()` builds the
mesh from `jax.devices()`, the per-device program is the natively-batched
DDP solve (which is what lets the fused Pallas kernels engage per chip),
and the only cross-device traffic is the scalar telemetry psum riding ICI.
Problems are independent, so scaling is embarrassingly parallel by design:
this is the "1024 scenarios on a pod slice" serving shape (SURVEY.md §5,
distrib/sharded.py).

What it shows:
  1) a scenario fan: one nominal state perturbed into B disturbance
     hypotheses (initial-state uncertainty),
  2) `sharded_ddp_solve` sharding the fan over every device in the mesh,
  3) the sharded result matching a single-device solve bit-for-bit per
     problem (SPMD determinism — same program, same data, same answer),
  4) consensus extraction: the lowest-cost plan pulled from the sharded
     batch with one argmin.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rbdtpu.model import load_asset
from rbdtpu.distrib import make_mesh, sharded_ddp_solve
from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost


def main():
    model = load_asset("arm7", dtype=np.float32)
    nx, nv = model.nq + model.nv, model.nv
    H = 40
    n_dev = len(jax.devices())
    B = 16 * n_dev  # scenarios, divisible by the mesh size

    mesh = make_mesh()
    print(f"mesh: {mesh.shape} over {n_dev} {jax.devices()[0].platform} "
          "device(s)")

    # scenario fan: nominal reach start + per-scenario initial-state noise
    rng = np.random.default_rng(7)
    x_nom = np.zeros(nx, np.float32)
    x_nom[:model.nq] = 0.3
    x0 = jnp.asarray(
        x_nom + 0.05 * rng.standard_normal((B, nx)), jnp.float32)
    U0 = jnp.zeros((B, H, nv), jnp.float32)

    x_goal = jnp.zeros(nx, jnp.float32)
    cost = quadratic_tracking_cost(model, x_goal, w_q=1.0, w_qd=0.01,
                                   w_u=1e-4)
    cfg = DDPConfig(iters=6, dt=0.01)

    t0 = time.perf_counter()
    J, U, meanJ = sharded_ddp_solve(mesh, model, cost, x0, U0, cfg)
    J.block_until_ready()
    t1 = time.perf_counter()
    print(f"sharded solve: {B} scenarios x H={H} on {n_dev} devices "
          f"in {t1 - t0:.1f}s (incl. compile); mean J = {float(meanJ):.3f}")

    # SPMD determinism: the sharded program must equal the local one
    states, _ = ddp_solve(model, cost, x0, U0, cfg)
    dJ = float(jnp.max(jnp.abs(states.J - J)))
    print(f"sharded vs single-device |dJ|_max = {dJ:.2e}")

    best = int(jnp.argmin(J))
    print(f"consensus plan: scenario {best}, J = {float(J[best]):.3f} "
          f"(worst {float(jnp.max(J)):.3f})")
    assert dJ < 1e-5
    print("OK")


if __name__ == "__main__":
    main()
