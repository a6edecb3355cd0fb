"""MPPI — sampling-based MPC (the "sampling+DDP hybrid" of BASELINE.json
configs[4]).  Pure batched rollouts: thousands of perturbed control sequences
evaluated per step via vmap (P1), softmin-weighted update.  No reference
counterpart (SURVEY.md §2: parallelism components are new design).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..model.robot import RobotModel
from .costs import Cost, trajectory_cost
from .rollout import rollout


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    n_samples: int = 256
    sigma: float = 0.5
    # softmin temperature RELATIVE to the sample-cost spread: the effective
    # lambda is temperature * (max J - min J), which keeps the weighting
    # meaningful across cost scales
    temperature: float = 0.05
    dt: float = 0.01
    gravity: float = -9.81
    fused: bool = False  # fused Pallas step kernel for the sample rollouts
    # clip sampled AND updated controls to the model's URDF effort box
    # (model.u_limit_vector; VERDICT r1 item 9)
    u_limits: bool = False


def mppi_step(
    model: RobotModel,
    cost: Cost,
    x0,
    U,
    key,
    config: MPPIConfig = MPPIConfig(),
):
    """One MPPI update: sample perturbations, roll out in parallel, reweight.

    x0 (nx,), U (H, nv) -> (U_new, mean_cost).  jit/vmap-closed.
    """
    H, nu = U.shape
    eps = config.sigma * jax.random.normal(
        key, (config.n_samples, H, nu), U.dtype
    )
    # include the unperturbed nominal as a candidate: the update can never
    # move weight off a strictly better current plan
    eps = eps.at[0].set(0.0)
    U_samp = U[None] + eps
    if config.u_limits:
        lim = model.u_limit_vector().astype(U.dtype)
        U_samp = jnp.clip(U_samp, -lim, lim)
        eps = U_samp - U[None]  # weighted update stays inside the box

    X_samp = rollout(model, jnp.broadcast_to(x0, (config.n_samples,) + x0.shape),
                     U_samp, config.dt, config.gravity, fused=config.fused)
    Js = jax.vmap(lambda X, Uc: trajectory_cost(cost, X, Uc))(X_samp, U_samp)
    Js = jnp.where(jnp.isfinite(Js), Js, jnp.inf)
    beta = jnp.min(Js)
    # lambda scaled by the mean excursion above the best sample (robust to
    # outlier rollouts, unlike max-min)
    finite = jnp.where(jnp.isfinite(Js), Js, beta)
    lam = config.temperature * (jnp.mean(finite) - beta) + 1e-10
    w = jax.nn.softmax(-(Js - beta) / lam)
    U_new = U + jnp.einsum("s,shu->hu", w, eps)
    # acceptance guard: keep the better of {weighted update, best sample}
    # and never regress below the unperturbed nominal (Js[0]) — the sampling
    # analog of DDP's line-search rejection (solver-level failure guard,
    # SURVEY.md §5)
    X_new = rollout(model, x0[None], U_new[None], config.dt, config.gravity,
                    fused=config.fused)[0]
    J_new = trajectory_cost(cost, X_new, U_new)
    cand_J = jnp.stack([J_new, beta, Js[0]])
    pick = jnp.argmin(cand_J)
    U_out = jax.lax.switch(
        pick, [lambda: U_new, lambda: U_samp[jnp.argmin(Js)], lambda: U]
    )
    return U_out, cand_J[pick]


def mppi_solve(model, cost, x0, U0, key, iters: int = 16,
               config: MPPIConfig = MPPIConfig()):
    """Iterated MPPI refinement; returns (U, cost_history)."""
    def step(carry, key_t):
        U, _ = carry
        U_new, J = mppi_step(model, cost, x0, U, key_t, config)
        return (U_new, J), J

    keys = jax.random.split(key, iters)
    (U, J), hist = jax.lax.scan(step, (U0, jnp.inf), keys)
    return U, hist
