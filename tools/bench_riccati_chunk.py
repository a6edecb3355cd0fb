"""A/B the Riccati backward sweep: jnp scan vs the chunked-batch Pallas
kernel (kernels.riccati_chunk), isolated from the rest of the solver.

The r4 profiler + XLA memory analysis pinned the jnp sweep as the #1 solver
phase at quadruped/humanoid scale and MEMORY-bound (2.10 GB HBM temps per
quadruped sweep) — VERDICT r4 item #1.  This tool measures the sweep alone
at solver-realistic shapes under the r4 timing protocol: R reps amortized
inside one jit with per-rep input perturbation, every timed call ended in a
host fetch, two amortization levels for a latency-excluded slope rate.

Usage: python tools/bench_riccati_chunk.py [jnp|chunk|both] [config ...]
  configs: arm (B=128 nx=14), quadruped (B=1024 nx=36), humanoid (B=16
  nx=72); default = quadruped.  Which-arm selector so a killed A/B resumes
  without repeating the measured arm (CLAUDE.md budget discipline).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

CONFIGS = {
    "arm": dict(B=128, nx=14, nv=7, H=100),
    "quadruped": dict(B=1024, nx=36, nv=18, H=50),
    "humanoid": dict(B=16, nx=72, nv=36, H=32),
}


def make_args(B, nx, nv, H, timed_lxx=True, seed=0):
    rng = np.random.default_rng(seed)
    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))
    rnd = lambda *s: jnp.array(rng.standard_normal(s), jnp.float32)
    A = 0.05 * rnd(B, H, nx, nx) + jnp.eye(nx, dtype=jnp.float32)
    Bm = 0.05 * rnd(B, H, nx, nv)
    lx = rnd(B, H, nx)
    lu = rnd(B, H, nv)
    lfx = rnd(B, nx)
    lfxx = jnp.array(
        sym(np.eye(nx) + 0.05 * rng.standard_normal((B, nx, nx))),
        jnp.float32)
    lfxx = lfxx @ jnp.swapaxes(lfxx, -1, -2)
    reg = jnp.full((B,), 1e-6, jnp.float32)
    if timed_lxx:  # EE-cost regime: per-knot state blocks, const luu/lux
        lxx = jnp.array(
            sym(0.02 * rng.standard_normal((B, H, nx, nx))), jnp.float32
        ) + 2.0 * jnp.eye(nx, dtype=jnp.float32)
    else:
        lxx = 2.0 * jnp.eye(nx, dtype=jnp.float32)
    luu = 2.0 * jnp.eye(nv, dtype=jnp.float32)
    lux = jnp.zeros((nv, nx), jnp.float32)
    return (A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)


def timed_sweep(sweep, args, B, H, reps, label, calls=3):
    A = args[0]

    @jax.jit
    def many(args, eps):
        def one(acc, i):
            a = (args[0] + (eps * i) * 1e-8,) + args[1:]
            k, K, dV1, ok = sweep(*a)
            return acc + jnp.sum(dV1) + jnp.sum(k[..., 0, :]), None
        acc, _ = jax.lax.scan(
            one, jnp.asarray(0.0, jnp.float32),
            1.0 + jnp.arange(reps, dtype=jnp.float32))
        return acc

    t0 = time.perf_counter()
    v = float(many(args, jnp.asarray(0.0, jnp.float32)))
    print(f"{label} R={reps}: compile+1 {time.perf_counter()-t0:.1f}s "
          f"(val {v:.4g})", flush=True)
    best = float("inf")
    for i in range(calls):
        t0 = time.perf_counter()
        float(many(args, jnp.asarray(float(i + 1), jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = best / reps * 1e3
    print(f"{label} R={reps}: {best*1e3:.1f} ms total -> {ms:.3f} ms/sweep "
          f"({B}x{H} knots)", flush=True)
    return best


def main():
    argv = sys.argv[1:]
    arms = [a for a in argv if a in ("jnp", "chunk", "both")] or ["both"]
    cfgs = [a for a in argv if a in CONFIGS] or ["quadruped"]
    arm = arms[0]
    print(f"devices: {jax.devices()}", flush=True)
    for cname in cfgs:
        c = CONFIGS[cname]
        print(f"== {cname}: {c}", flush=True)
        args = make_args(**c)
        results = {}
        for which in (["jnp", "chunk"] if arm == "both" else [arm]):
            if which == "jnp":
                from rbdtpu.solver.ddp import backward_pass as sweep
            else:
                from rbdtpu.kernels.riccati_chunk import (
                    backward_pass_chunked as sweep)
            try:
                R1, R2 = 4, 16
                t1 = timed_sweep(sweep, args, c["B"], c["H"], R1,
                                 f"{cname}/{which}")
                t2 = timed_sweep(sweep, args, c["B"], c["H"], R2,
                                 f"{cname}/{which}")
                slope = (t2 - t1) / (R2 - R1) * 1e3
                print(f"{cname}/{which}: SLOPE {slope:.3f} ms/sweep "
                      f"(dispatch-excluded)", flush=True)
                results[which] = slope
            except Exception as e:
                print(f"{cname}/{which} FAILED: "
                      f"{str(e).splitlines()[0][:300]}", flush=True)
        if len(results) == 2:
            print(f"{cname}: jnp {results['jnp']:.3f} vs chunk "
                  f"{results['chunk']:.3f} ms/sweep -> "
                  f"{results['jnp']/results['chunk']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
