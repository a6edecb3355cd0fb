"""Sharded batched solves: shard_map wrappers around the solver layer.

Each device runs the SAME program on its shard of the problem batch (SPMD);
cross-device reductions (mean/best cost, MPPI weight normalization) are XLA
collectives riding ICI within a host and DCN across hosts (SURVEY.md §5
"distributed communication backend").

Every wrapper takes ``axis`` as a mesh-axis name OR a tuple of names: with a
2-D ("host", "batch") mesh (tools/launch_multihost.py), pass
``axis=("host", "batch")`` and the problem batch shards over the flattened
host x device grid while the telemetry reductions psum over both axes —
the same program runs single-process on a virtual mesh and multi-process
under jax.distributed (tests/test_multihost.py runs it across 2 OS
processes x 4 virtual devices each).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..model.robot import RobotModel
from ..solver.costs import Cost
from ..solver.ddp import DDPConfig, ddp_solve
from ..solver.mppi import MPPIConfig
from ..solver.rollout import rollout
from ..solver.costs import trajectory_cost


def _axes(axis):
    """Normalize an axis name or tuple of names to a tuple."""
    return axis if isinstance(axis, tuple) else (axis,)


def sharded_rollouts(mesh: Mesh, model: RobotModel, x0, U, dt, gravity=-9.81,
                     axis="batch"):
    """Batch of rollouts sharded over the mesh: x0 (B, nx), U (B, H, nv) with B
    divisible by the axis size -> X (B, H+1, nx) sharded the same way."""
    ax = _axes(axis)
    fn = shard_map(
        lambda x0_s, U_s: rollout(model, x0_s, U_s, dt, gravity),
        mesh=mesh,
        in_specs=(P(ax), P(ax)),
        out_specs=P(ax),
        check_vma=False,
    )
    return fn(x0, U)


def sharded_ddp_solve(mesh: Mesh, model: RobotModel, cost: Cost, x0_batch,
                      U0_batch, config: DDPConfig = DDPConfig(),
                      axis="batch"):
    """Sharded batch of independent DDP solves (BASELINE.json north star:
    solves/s across a pod slice).  Returns (J (B,), U (B, H, nv), mean_J).

    The per-shard program runs the natively-batched solve on its local
    problems; the final mean cost is a psum over the mesh axes (the
    cross-host QP/Riccati-style reduction exercised here is the scalar
    telemetry reduction — per-problem Riccati stays chip-local by design:
    problems are independent).
    """
    ax = _axes(axis)

    def local(x0_s, U0_s):
        # natively-batched solve over the local shard (NOT vmap-of-problems:
        # the native batch is what lets the fused Pallas kernels engage
        # per device — CLAUDE.md performance rules)
        states, _ = ddp_solve(model, cost, x0_s, U0_s, config)
        local_sum = jnp.sum(states.J)
        total = jax.lax.psum(local_sum, ax)
        n = jax.lax.psum(jnp.asarray(states.J.shape[0], x0_s.dtype), ax)
        return states.J, states.U, total / n

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(ax), P(ax)),
        out_specs=(P(ax), P(ax), P()),
        check_vma=False,
    )
    return fn(x0_batch, U0_batch)


def sharded_mppi_step(mesh: Mesh, model: RobotModel, cost: Cost, x0, U, key,
                      config: MPPIConfig = MPPIConfig(), axis="batch"):
    """ONE MPPI update whose SAMPLE population is sharded across the mesh —
    the multi-host sampling MPC of BASELINE.json configs[4].

    Every device draws its own slice of the perturbation population, rolls it
    out locally, then the softmax normalizer and the weighted update are global
    psum reductions (the cross-host reduction path).
    x0 (nx,), U (H, nv) replicated -> U_new replicated.
    """
    ax = _axes(axis)
    n_dev = 1
    for a in ax:
        n_dev *= mesh.shape[a]
    local_n = config.n_samples // n_dev

    def local(x0_r, U_r, key_r):
        idx = jax.lax.axis_index(ax)  # linearized over all sharded axes
        k_local = jax.random.fold_in(key_r, idx)
        eps = config.sigma * jax.random.normal(
            k_local, (local_n,) + U_r.shape, U_r.dtype
        )
        U_samp = U_r[None] + eps
        X = rollout(
            model, jnp.broadcast_to(x0_r, (local_n,) + x0_r.shape),
            U_samp, config.dt, config.gravity,
        )
        Js = jax.vmap(lambda Xs, Us: trajectory_cost(cost, Xs, Us))(X, U_samp)
        Js = jnp.where(jnp.isfinite(Js), Js, jnp.inf)
        beta = jax.lax.pmin(jnp.min(Js), ax)
        # same robust mean-based lambda as solver.mppi, reduced globally
        finite = jnp.where(jnp.isfinite(Js), Js, beta)
        mean = jax.lax.psum(jnp.sum(finite), ax) / config.n_samples
        lam = config.temperature * (mean - beta) + 1e-10
        w_un = jnp.exp(-(Js - beta) / lam)
        Z = jax.lax.psum(jnp.sum(w_un), ax)
        w = w_un / Z
        dU = jax.lax.psum(jnp.einsum("s,shu->hu", w, eps), ax)
        J_mean = jax.lax.psum(jnp.sum(w * Js), ax)
        return U_r + dU, J_mean

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(x0, U, key)
