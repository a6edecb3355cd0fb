"""A/B the emission-order ILP scheduler (kernels/ilpsched.py) on the
whole-horizon fused rollout kernel — the headline BASELINE configs[1] arm.

One scheduling distance per process (probe caches and compiled artifacts
must not cross arms; same pattern as tools/bench_chunked.py):

    python tools/bench_ilp.py 0          # baseline emission order
    python tools/bench_ilp.py 4          # defer consumers < 4 slots
    python tools/bench_ilp.py 8 aba      # optional route selector

Protocol = bench.bench_tpu_rollout (r4): two amortization levels R1 < R2,
every timed call ends in a host fetch, headline = R2 end-to-end rate plus
the latency-excluded slope rate.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = int(sys.argv[1]) if len(sys.argv) > 1 else 0
ROUTE = sys.argv[2] if len(sys.argv) > 2 else "minv"
os.environ["RBDTPU_ILP_SCHED"] = str(D)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from rbdtpu.model import load_asset
from rbdtpu.kernels.fused import rollout_fused_multi

B, H, DT = 4096, 50, 0.01


def main():
    model = load_asset("arm7", dtype=np.float32)
    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)

    def timed_at(R):
        U_big = 0.2 * jax.random.normal(
            key, (R, H, B, model.nv), jnp.float32)

        @jax.jit
        def roll_many(x0, U_big, eps):
            def one(acc, U_r):
                xf = rollout_fused_multi(model, x0 + eps, U_r, DT,
                                         route=ROUTE)
                return acc + 1e-12 * jnp.sum(xf), None
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), U_big)
            return acc

        t0 = time.perf_counter()
        float(roll_many(x0, U_big, jnp.float32(0.0)))
        print(f"[D={D} {ROUTE}] R={R} compile+first: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            float(roll_many(x0, U_big, jnp.float32((i + 1) * 1e-9)))
            best = min(best, time.perf_counter() - t0)
        return best

    R1, R2 = 160, 640
    t1, t2 = timed_at(R1), timed_at(R2)
    e2e = B * H * R2 / t2
    slope = B * H * (R2 - R1) / max(t2 - t1, 1e-9)
    print(f"[D={D} {ROUTE}] t1={t1*1e3:.2f} ms t2={t2*1e3:.2f} ms -> "
          f"{e2e/1e6:,.0f}M steps/s e2e; {slope/1e6:,.0f}M slope", flush=True)


if __name__ == "__main__":
    main()
