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
    # reduced-precision SAMPLE rollouts (r5, VERDICT r4 #9): the sampling
    # stage only needs RANKING fidelity, not 1e-6 parity — the softmin
    # weights and the argmin-best sample are rank statistics.  "bfloat16"
    # runs the S perturbed rollouts + their cost eval in bf16 (2x VPU
    # throughput / half the HBM traffic); the weighted-update rollout, its
    # acceptance cost, and the accepted plan stay in the solve dtype, so
    # the guarded never-regress property is evaluated at full precision.
    # None = solve dtype everywhere.
    sampling_dtype: str | None = None


def mppi_step(
    model: RobotModel,
    cost: Cost,
    x0,
    U,
    key,
    config: MPPIConfig = MPPIConfig(),
    f_ext=None,
):
    """One MPPI update: sample perturbations, roll out in parallel, reweight.

    NATIVELY BATCHED over leading problem dims: x0 (..., nx), U (..., H, nv)
    with ONE key — perturbations for every problem and sample are drawn in a
    single call, and problems x samples flatten into ONE rollout batch.
    That flattening (rather than vmap-of-problems) is what lets the fused
    Pallas step kernel engage at its efficient lane widths for multi-
    scenario humanoid-class solves.  Single-problem calls (batch = ()) draw
    identical noise to the historical per-problem API.  Returns
    (U_new (..., H, nv), accepted cost (...,)).
    """
    batch = U.shape[:-2]
    H, nu = U.shape[-2:]
    nx = x0.shape[-1]
    S = config.n_samples
    eps = config.sigma * jax.random.normal(key, batch + (S, H, nu), U.dtype)
    # include the unperturbed nominal as a candidate: the update can never
    # move weight off a strictly better current plan
    eps = eps.at[..., 0, :, :].set(0.0)
    U_samp = U[..., None, :, :] + eps
    if config.u_limits:
        lim = model.u_limit_vector().astype(U.dtype)
        U_samp = jnp.clip(U_samp, -lim, lim)
        # weighted update stays inside the box
        eps = U_samp - U[..., None, :, :]

    x0_b = jnp.broadcast_to(x0[..., None, :], batch + (S, nx))
    if config.sampling_dtype is not None:
        sdt = jnp.dtype(config.sampling_dtype)
        fused_s = config.fused
        if fused_s:
            from ..kernels.fused import step_fused_ok

            # non-f32 lane tiling must be proven by a compile probe
            flat_b = 1
            for b in batch:
                flat_b *= b
            fused_s = step_fused_ok(model, flat_b * S, sdt)
        X_samp = rollout(
            model, x0_b.reshape((-1, nx)).astype(sdt),
            U_samp.reshape((-1, H, nu)).astype(sdt),
            config.dt, config.gravity, fused=fused_s,
            f_ext=None if f_ext is None else jnp.asarray(f_ext, sdt),
        ).reshape(batch + (S, H + 1, nx))
        # rank statistics only: cost eval back in the solve dtype
        Js = trajectory_cost(cost, X_samp.astype(U.dtype), U_samp)
    else:
        X_samp = rollout(
            model, x0_b.reshape((-1, nx)), U_samp.reshape((-1, H, nu)),
            config.dt, config.gravity, fused=config.fused, f_ext=f_ext,
        ).reshape(batch + (S, H + 1, nx))
        Js = trajectory_cost(cost, X_samp, U_samp)
    Js = jnp.where(jnp.isfinite(Js), Js, jnp.inf)
    beta = jnp.min(Js, axis=-1)
    # lambda scaled by the mean excursion above the best sample (robust to
    # outlier rollouts, unlike max-min)
    finite = jnp.where(jnp.isfinite(Js), Js, beta[..., None])
    lam = (
        config.temperature * (jnp.mean(finite, axis=-1) - beta) + 1e-10
    )
    w = jax.nn.softmax(-(Js - beta[..., None]) / lam[..., None], axis=-1)
    U_new = U + jnp.einsum("...s,...shu->...hu", w, eps)
    # acceptance guard: keep the better of {weighted update, best sample}
    # and never regress below the unperturbed nominal (Js[..., 0]) — the
    # sampling analog of DDP's line-search rejection (solver-level failure
    # guard, SURVEY.md §5)
    X_new = rollout(
        model, x0.reshape((-1, nx)), U_new.reshape((-1, H, nu)),
        config.dt, config.gravity, fused=config.fused, f_ext=f_ext,
    ).reshape(batch + (H + 1, nx))
    J_new = trajectory_cost(cost, X_new, U_new)
    U_best = jnp.take_along_axis(
        U_samp, jnp.argmin(Js, axis=-1)[..., None, None, None], axis=-3
    )[..., 0, :, :]
    if config.sampling_dtype is not None:
        # the bf16 sample costs are RANKING estimates; the acceptance guard
        # must compare true costs or accepted J can regress across
        # iterations — re-score the best sample and the nominal with two
        # full-precision B-sized rollouts (~2% of the S-sample work)
        J_best = trajectory_cost(cost, rollout(
            model, x0.reshape((-1, nx)), U_best.reshape((-1, H, nu)),
            config.dt, config.gravity, fused=config.fused, f_ext=f_ext,
        ).reshape(batch + (H + 1, nx)), U_best)
        J_nom = trajectory_cost(cost, rollout(
            model, x0.reshape((-1, nx)), U.reshape((-1, H, nu)),
            config.dt, config.gravity, fused=config.fused, f_ext=f_ext,
        ).reshape(batch + (H + 1, nx)), U)
        cand_J = jnp.stack([J_new, J_best, J_nom], axis=-1)
    else:
        cand_J = jnp.stack([J_new, beta, Js[..., 0]], axis=-1)
    pick = jnp.argmin(cand_J, axis=-1)
    pick_e = pick[..., None, None]
    U_out = jnp.where(
        pick_e == 0, U_new, jnp.where(pick_e == 1, U_best, U)
    )
    J_out = jnp.take_along_axis(cand_J, pick[..., None], axis=-1)[..., 0]
    return U_out, J_out


def mppi_solve(model, cost, x0, U0, key, iters: int = 16,
               config: MPPIConfig = MPPIConfig(), f_ext=None):
    """Iterated MPPI refinement (batched like ``mppi_step``); returns
    (U, cost_history (iters, ...))."""
    def step(carry, key_t):
        U, _ = carry
        U_new, J = mppi_step(model, cost, x0, U, key_t, config, f_ext=f_ext)
        return (U_new, J), J

    keys = jax.random.split(key, iters)
    J0 = jnp.full(U0.shape[:-2], jnp.inf, U0.dtype)
    (U, J), hist = jax.lax.scan(step, (U0, J0), keys)
    return U, hist
