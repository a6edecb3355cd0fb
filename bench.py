"""Benchmark harness (BASELINE.md).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.json configs[1]): batched forward-dynamics rollouts,
4096 trajectories x H=50 on the 7-DoF arm, Minv + RNEA path, one chip.
vs_baseline = speedup over the serial numpy reference oracle executing the same
forward-dynamics step on this host's CPU (the reference publishes no numbers of
its own — SURVEY.md §6).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the unrolled sweeps are expensive to (re)compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B = 4096
H = 50
DT = 0.01


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu_rollout(model):
    from rbdtpu.dynamics import forward_dynamics
    from rbdtpu.solver import euler_semi_implicit, pack_state, split_state

    def step(x, u):
        q, qd = split_state(model, x)
        qdd = forward_dynamics(model, q, qd, u)
        x2 = euler_semi_implicit(model, x, qdd, DT)
        return x2, None

    @jax.jit
    def roll(x0, U):
        # U is scan-major (H, B, nv): a (B, H, nv) layout would cost a
        # lane-padded transpose (~20 ms at this size) inside the loop body
        xf, _ = jax.lax.scan(step, x0, U)
        return xf

    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)
    U = 0.5 * jax.random.normal(key, (H, B, model.nv), jnp.float32)

    t0 = time.perf_counter()
    roll(x0, U).block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # min over several timed batches: robust to host/tunnel noise
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(3):
            out = roll(x0, U)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 3)
    steps_per_s = B * H / best
    log(f"tpu rollout: {best*1e3:.2f} ms for {B}x{H} steps -> {steps_per_s:,.0f} steps/s")
    return steps_per_s


def bench_numpy_baseline(model):
    """Serial numpy reference: one forward_dynamics (rnea + minv) + integrate
    per step, timed on this host."""
    from rbdtpu.oracle import OracleRobotAdapter, load_reference_class

    cls = load_reference_class()
    if cls is None:
        log("reference not available; vs_baseline=nan")
        return float("nan")
    ref = cls(OracleRobotAdapter(model))
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, model.nq)
    qd = rng.uniform(-1, 1, model.nv)
    u = rng.uniform(-1, 1, model.nv)
    # warmup + time
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        qdd = np.asarray(ref.forward_dynamics(q, qd, u)).ravel()
        qd = qd + DT * qdd
        q = q + DT * qd
    per_step = (time.perf_counter() - t0) / n
    log(f"numpy reference: {per_step*1e3:.3f} ms/step -> {1/per_step:,.0f} steps/s")
    return 1.0 / per_step


def main():
    from rbdtpu.model import load_asset

    model = load_asset("arm7", dtype=np.float32)
    log(f"devices: {jax.devices()}")
    steps_per_s = bench_tpu_rollout(model)
    base = bench_numpy_baseline(load_asset("arm7", dtype=np.float64))
    vs = steps_per_s / base if np.isfinite(base) else None
    print(json.dumps({
        "metric": "fd_rollout_steps_per_s_4096x50_arm7",
        "value": round(steps_per_s),
        "unit": "steps/s",
        "vs_baseline": round(vs, 1) if vs else None,
    }), flush=True)


if __name__ == "__main__":
    main()
