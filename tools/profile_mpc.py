"""Phase-level DDP/MPC profiler: amortized per-phase latency on the current
backend (designed for the TPU tunnel: many repetitions inside ONE jit call,
min over calls — single-call timings through the tunnel are noise, see
CLAUDE.md).

Phases timed independently on realistic data (a rolled-out nominal
trajectory of the requested config):
  linearize   solver.rollout.linearize_trajectory (fused colvec when fused)
  quadratize  solver.costs.quadratize_trajectory
  backward    solver.ddp.backward_pass (jnp scan)
  backward_f  kernels.riccati.backward_pass_fused (when it applies)
  forward     solver.ddp.forward_pass (jnp scan)
  forward_f   solver.ddp.forward_pass_fused (when it applies)
  full_iter   one whole ddp iteration via ddp_solve(iters=1)

Usage:  python tools/profile_mpc.py [arm7|quadruped12|humanoid30] [B] [H] [ee]
(trailing "ee": use the EE-reaching cost — exercises the fused FK/GN cost
kernel, incl. the rpy floating root — instead of quadratic tracking)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

sys.path.insert(0, ".")

from rbdtpu.model import load_asset  # noqa: E402
from rbdtpu.dynamics import rnea  # noqa: E402
from rbdtpu.solver import (  # noqa: E402
    DDPConfig, ddp_solve, ee_reaching_cost, quadratic_tracking_cost,
)
from rbdtpu.solver.ddp import (  # noqa: E402
    backward_pass, forward_pass, forward_pass_fused, _make_step,
    _make_linearize,
)
from rbdtpu.solver.costs import quadratize_trajectory  # noqa: E402
from rbdtpu.solver.rollout import rollout  # noqa: E402


def timed(name, fn, *args, reps=20, calls=4):
    """Amortize `reps` executions inside one jit; min over `calls` calls.

    ``args`` are jit PARAMETERS (device inputs), not closure captures —
    captured concrete arrays embed in the HLO as constants and at benchmark
    sizes blow the remote-compile request limit (HTTP 413 on the tunnel)."""

    def perturb(x, eps):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
            return x + eps.astype(x.dtype)
        return x

    def prog(eps_seq, *a):
        # eps_seq is a RUNTIME (reps,) zeros array: adding eps_t to every
        # float input makes each iteration's operands distinct to XLA, so
        # the loop body cannot be hoisted out of the scan as loop-invariant
        # (observed: an invariant body collapses the measurement to
        # cost/reps — e.g. a 0.005 ms "linearize" at quadruped size)
        def body(_, eps):
            out = fn(*jax.tree.map(lambda x: perturb(x, eps), a))
            # reduce every output with a FULL sum: slicing out one element
            # here lets XLA dead-code-eliminate all but one knot/batch of a
            # per-knot-independent jnp phase (observed: humanoid jnp
            # linearize "0.005 ms"; Pallas phases are opaque so fused
            # numbers were unaffected — jnp phases could read falsely fast)
            return _, jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), out
            )

        return jax.lax.scan(body, 0, eps_seq)[1]

    def fetch(out):
        # HOST-FETCH sync: block_until_ready can return before the work is
        # done through the axon tunnel (r4 finding — identical-args repeat
        # calls read ~0.06 ms); reading leaves to host is the reliable sync
        return jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.ravel(x)[0]), out, 0.0
        )

    f = jax.jit(prog)
    t0 = time.perf_counter()
    fetch(f(jnp.zeros((reps,), jnp.float32), *args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for c in range(calls):
        eps = jnp.full((reps,), (c + 1) * 1e-9, jnp.float32)
        t0 = time.perf_counter()
        fetch(f(eps, *args))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"{name:12s} {per * 1e3:8.3f} ms/exec   (compile {compile_s:.1f}s)")
    return per


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "arm7"
    fb = name != "arm7"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (128 if name == "arm7"
                                                    else 1024)
    H = int(sys.argv[3]) if len(sys.argv) > 3 else (100 if name == "arm7"
                                                    else 50)
    use_quat = "quat" in sys.argv[4:]
    kw = dict(root_quat=True) if (fb and use_quat) else {}
    model = load_asset(name, dtype=np.float32, floating_base=fb, **kw)
    print(f"model={name}{' quat' if use_quat else ''} "
          f"nx={model.nq + model.nv} nv={model.nv} B={B} H={H} "
          f"devices={jax.devices()}")
    use_ee = name == "arm7" or "ee" in sys.argv[4:]
    cost_f = None
    if use_ee:
        ee_kw = dict(w_ee=10.0, w_ee_f=2000.0, w_u=1e-6, w_qd=1e-3,
                     w_qd_f=0.1)
        tgt = jnp.array([0.3, 0.2, 0.8], jnp.float32)
        ee = (None if name == "arm7"
              else [model.joint_names[model.leaves()[0]]])
        cost = ee_reaching_cost(model, tgt, ee_names=ee, fused=False, **ee_kw)
        cost_f = ee_reaching_cost(model, tgt, ee_names=ee, fused=True,
                                  **ee_kw)
    else:
        goal = jnp.zeros(model.nq + model.nv, jnp.float32)
        if fb and use_quat:
            goal = goal.at[3].set(1.0)  # identity root quaternion
        cost = quadratic_tracking_cost(model, goal, w_q=2.0, w_qd=0.05,
                                       w_u=1e-5)
    cfg = DDPConfig(iters=1, dt=0.01, n_alphas=8, fused=True)
    key = jax.random.PRNGKey(0)
    q0 = 0.2 * jax.random.normal(key, (B, model.nq), jnp.float32)
    if fb:
        q0 = q0.at[:, 2].add(0.35)
    if fb and use_quat:
        quat = q0[:, 3:7].at[:, 0].add(2.0)  # near-identity, unit-normalized
        q0 = q0.at[:, 3:7].set(
            quat / jnp.linalg.norm(quat, axis=-1, keepdims=True))
    x0 = jnp.concatenate([q0, jnp.zeros((B, model.nv), jnp.float32)], -1)
    zero = jnp.zeros((B, model.nv), jnp.float32)
    u_hold = rnea(model, q0, zero, zero)[0]
    U = jnp.broadcast_to(u_hold[:, None, :], (B, H, model.nv))

    X = jax.jit(
        lambda x, u: rollout(model, x, u, cfg.dt, fused=True)
    )(x0, U)
    jax.block_until_ready(X)

    lin = jax.jit(_make_linearize(model, cfg))  # fused colvec when fused
    A, Bm = lin(X, U)
    jax.block_until_ready((A, Bm))
    quads = quadratize_trajectory(cost, X, U)
    lx, lu, lxx, luu, lux, lfx, lfxx = quads
    reg = jnp.full((B,), 1e-6, jnp.float32)
    k, K, dV1, ok = backward_pass(A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx,
                                  reg)
    jax.block_until_ready((k, K))
    alphas = 2.0 ** -jnp.arange(cfg.n_alphas, dtype=jnp.float32)
    step_fn = _make_step(model, cfg)

    timed("linearize", lin, X, U)
    timed("quadratize",
          lambda X_, U_: quadratize_trajectory(cost, X_, U_), X, U)
    if cost_f is not None:
        timed("quadratize_f",
              lambda X_, U_: quadratize_trajectory(cost_f, X_, U_), X, U)
    timed("backward", backward_pass,
          A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
    try:
        from rbdtpu.kernels.riccati import (
            backward_pass_fused, riccati_fused_ok,
        )

        if riccati_fused_ok(model.nq + model.nv, model.nv, B):
            timed("backward_f", backward_pass_fused,
                  A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
        else:
            print("backward_f   (not applicable at this config)")
    except Exception as e:  # surface compile failures, keep profiling
        print(f"backward_f   FAILED: {type(e).__name__}: {e}")
    try:
        from rbdtpu.kernels.riccati_chunk import (
            backward_pass_chunked, riccati_chunk_ok,
        )

        if riccati_chunk_ok(model.nq + model.nv, model.nv, B):
            timed("backward_c", backward_pass_chunked,
                  A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)
        else:
            print("backward_c   (not applicable at this config)")
    except Exception as e:
        print(f"backward_c   FAILED: {type(e).__name__}: {e}")
    timed("forward",
          lambda X_, U_, k_, K_: forward_pass(
              model, cost, X_, U_, k_, K_, alphas, cfg.dt, cfg.gravity,
              step_fn), X, U, k, K)
    from rbdtpu.kernels.fused import feedback_fused_ok

    if feedback_fused_ok(model, B * cfg.n_alphas):
        timed("forward_f",
              lambda X_, U_, k_, K_: forward_pass_fused(
                  model, cost, X_, U_, k_, K_, alphas, cfg.dt, cfg.gravity),
              X, U, k, K)
        if cost_f is not None:
            timed("forward_fc",
                  lambda X_, U_, k_, K_: forward_pass_fused(
                      model, cost_f, X_, U_, k_, K_, alphas, cfg.dt,
                      cfg.gravity), X, U, k, K)
    else:
        print("forward_f    (not applicable at this config)")
    timed("full_iter",
          lambda x_, U_: ddp_solve(model, cost, x_, U_, cfg)[0].J,
          x0, U, reps=5)
    if cost_f is not None:
        timed("full_iter_fc",
              lambda x_, U_: ddp_solve(model, cost_f, x_, U_, cfg)[0].J,
              x0, U, reps=5)
        timed("full_iter_fc_rb",
              lambda x_, U_: ddp_solve(
                  model, cost_f, x_, U_,
                  DDPConfig(iters=1, dt=0.01, n_alphas=8, fused=True,
                            fused_riccati=True))[0].J,
              x0, U, reps=5)
        # fused_riccati=False arm: the A/B against the r5 AUTO policy
        # (chunked VMEM-resident sweep at nx>=24 on TPU)
        timed("full_iter_fc_norb",
              lambda x_, U_: ddp_solve(
                  model, cost_f, x_, U_,
                  DDPConfig(iters=1, dt=0.01, n_alphas=8, fused=True,
                            fused_riccati=False))[0].J,
              x0, U, reps=5)
    if cost_f is None:
        # tracking-cost configs need the fused_riccati=False arm too (the
        # r5 auto-policy A/B; EE configs get it as full_iter_fc_norb)
        timed("full_iter_norb",
              lambda x_, U_: ddp_solve(
                  model, cost, x_, U_,
                  DDPConfig(iters=1, dt=0.01, n_alphas=8, fused=True,
                            fused_riccati=False))[0].J,
              x0, U, reps=5)
    # variant: fused dynamics kernels but jnp forward pass (decides the
    # feedback_fused_ok auto-on at this scale)
    timed("full_iter_nofb",
          lambda x_, U_: ddp_solve(
              model, cost if cost_f is None else cost_f, x_, U_,
              DDPConfig(iters=1, dt=0.01, n_alphas=8, fused=True,
                        fused_feedback=False))[0].J,
          x0, U, reps=5)


if __name__ == "__main__":
    main()
