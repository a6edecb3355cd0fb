"""Synthetic VPU retire-rate ceiling (r5, VERDICT r4 #5).

The rollout kernel executes 2,288 lane ops/step and reaches 38.8% of the
"4 ALUs x 1.67 GHz" issue-slot bound (slope).  The r5 critical-path audit
(tools/audit_lane_ops.py) shows the step DAG carries ILP ~12.5 — NOT
chain-bound — so the residual must be the practical per-op cost of
register/VMEM-resident (8, 128)-tile code under Mosaic's scheduler, not the
algorithm.  This tool measures that machine practicum directly: M
independent mul-then-add chains (the kernel's dominant op mix, census
mul:add ~ 1.8:1) of depth D over (8, L) tiles, zero memory traffic beyond
first/last touch, compiled exactly like the lane kernels.

ops/cycle retired on this synthetic — with ILP far above 4 and no
algorithmic structure at all — is the honest ceiling for the fused step
kernels; the rollout kernel's % of THAT is the closed roofline account.

Usage: python tools/bench_vpu_ceiling.py [M] [D] [L]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
sys.path.insert(0, ".")


def make_bench(M, D, L, reps, r_in=256, mem=False):
    NBUF = 64

    def kernel(x_ref, o_ref):
        # r_in repeats inside the kernel amortize the ~27 us launch floor;
        # the round constant depends on the loop carry so nothing folds
        def body(_, rows):
            out = list(rows)
            for d in range(D):
                c = 1.0 + 1e-6 * d
                if mem:
                    # every FMA reads a distinct VMEM operand (static
                    # index) — models the real kernels' value traffic
                    out = [
                        out[i] * x_ref[(d * M + i) % NBUF] + c
                        for i in range(M)
                    ]
                else:
                    out = [r * c + 0.5 for r in out]
            return tuple(out)

        rows = tuple(x_ref[i] for i in range(M))
        rows = jax.lax.fori_loop(0, r_in, body, rows)
        for i in range(M):
            o_ref[i] = rows[i]

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((max(NBUF, M) if mem else M, 8, L),
                               lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, 8, L), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 8, L), jnp.float32),
    )

    @jax.jit
    def many(x, eps):
        def one(c, i):
            return c + call(x + i * eps)[0, 0, 0], None
        acc, _ = jax.lax.scan(
            one, jnp.float32(0.0),
            1.0 + jnp.arange(reps, dtype=jnp.float32))
        return acc

    return many


def main():
    args = [a for a in sys.argv[1:] if a != "mem"]
    mem = "mem" in sys.argv[1:]
    M = int(args[0]) if len(args) > 0 else 16
    D = int(args[1]) if len(args) > 1 else 64
    L = int(args[2]) if len(args) > 2 else 128
    r_in = 4096
    print(f"devices={jax.devices()} M={M} D={D} L={L} r_in={r_in} mem={mem}")
    for m in (1, 2, 4, 8, M):
        x = jnp.ones((max(64, m), 8, L), jnp.float32)
        times = {}
        for reps in (8, 32):
            many = make_bench(m, D, L, reps, r_in, mem)
            t0 = time.perf_counter()
            float(many(x, jnp.float32(0.0)))
            cs = time.perf_counter() - t0
            best = float("inf")
            for i in range(4):
                t0 = time.perf_counter()
                float(many(x, jnp.float32(i + 1)))
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        # slope excludes the ~26 ms dispatch floor (r4 protocol);
        # 2 ops per round (mul + add) per chain, per (8,128)-tile
        dt = times[32] - times[8]
        ops = 2 * D * m * (32 - 8) * r_in * (L / 128.0)
        cycles = dt * 1.67e9
        print(f"M={m}: {times[8]*1e3:.1f}/{times[32]*1e3:.1f} ms "
              f"-> {ops/cycles:.2f} ops/cycle "
              f"({ops/cycles/4:.0%} of the 4-ALU bound)", flush=True)


if __name__ == "__main__":
    main()
