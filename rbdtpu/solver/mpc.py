"""Receding-horizon MPC driver + solver-state checkpointing.

Aux subsystems per SURVEY.md §5: the solver state (nominal trajectory, controls,
regularization) is a pytree -> trivially serializable; checkpoint/resume uses
msgpack-free numpy .npz (no extra deps) with an orbax hook when available.
Failure handling: DDP's internal regularization backoff + line-search rejection
(solver-level guards) mean a step can never make the nominal worse.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.robot import RobotModel
from .costs import Cost
from .ddp import DDPConfig, DDPState, ddp_solve
from .integrate import euler_semi_implicit, split_state
from ..dynamics.aba import aba


class MPCCarry(NamedTuple):
    x: jax.Array      # current state (nx,)
    U: jax.Array      # warm-start control sequence (H, nv)


def mpc_step(model: RobotModel, cost: Cost, carry: MPCCarry,
             config: DDPConfig = DDPConfig()):
    """One receding-horizon step: solve from the current state (warm-started),
    apply the first control, advance the plant one dt, shift the plan.

    jit/vmap-closed; returns (new_carry, (u_applied, J))."""
    state, _ = ddp_solve(model, cost, carry.x, carry.U, config)
    u0 = state.U[0]
    q, qd = split_state(model, carry.x)
    qdd = aba(model, q, qd, u0, gravity=config.gravity)
    x_next = euler_semi_implicit(model, carry.x, qdd, config.dt)
    U_warm = jnp.concatenate([state.U[1:], state.U[-1:]], axis=0)
    return MPCCarry(x_next, U_warm), (u0, state.J)


def mpc_run(model: RobotModel, cost: Cost, x0, U0, n_steps: int,
            config: DDPConfig = DDPConfig()):
    """Closed-loop MPC rollout for n_steps plant steps via lax.scan.

    Returns (final_carry, (U_applied (n_steps, nv), J_hist (n_steps,)))."""
    def step(carry, _):
        return mpc_step(model, cost, carry, config)

    return jax.lax.scan(step, MPCCarry(x0, U0), None, length=n_steps)


# --------------------------------------------------------------------------- #
# Checkpoint / resume (SURVEY.md §5)                                          #
# --------------------------------------------------------------------------- #

def save_solver_state(path: str, state: DDPState) -> None:
    """Serialize a DDPState (or any flat pytree of arrays) to .npz."""
    flat, _ = jax.tree.flatten(state)
    np.savez(path, **{f"leaf{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_solver_state(path: str, like: DDPState) -> DDPState:
    """Restore a DDPState saved by save_solver_state (treedef from `like`)."""
    data = np.load(path)
    _, treedef = jax.tree.flatten(like)
    leaves = [jnp.asarray(data[f"leaf{i}"]) for i in range(len(data.files))]
    return jax.tree.unflatten(treedef, leaves)
