"""A/B the spatial.batched MXU-vs-VPU dispatch (_MXU_MIN) on the Riccati
backward sweep at arm/quadruped/humanoid problem sizes (r4: the broadcast
form materializes (..., i, j, k) intermediates — fine at 6x6, catastrophic
at nx = 36-72).

Usage: python tools/bench_mxu_dispatch.py
One TPU process at a time; r4 host-fetch-sync timing protocol.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
sys.path.insert(0, ".")

from rbdtpu.spatial import batched  # noqa: E402
from rbdtpu.solver.ddp import backward_pass  # noqa: E402


def bench(B, nx, nu, H, reps=8):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    A = (jnp.broadcast_to(jnp.eye(nx), (B, H, nx, nx))
         + 0.01 * jax.random.normal(ks[0], (B, H, nx, nx), jnp.float32))
    Bm = 0.01 * jax.random.normal(ks[1], (B, H, nx, nu), jnp.float32)
    lx = jax.random.normal(ks[2], (B, H, nx), jnp.float32)
    lu = jax.random.normal(ks[3], (B, H, nu), jnp.float32)
    lxx = jnp.eye(nx, dtype=jnp.float32)
    luu = 0.1 * jnp.eye(nu, dtype=jnp.float32)
    lux = jnp.zeros((nu, nx), jnp.float32)
    lfx = jax.random.normal(ks[4], (B, nx), jnp.float32)
    lfxx = jnp.broadcast_to(10.0 * jnp.eye(nx, dtype=jnp.float32),
                            (B, nx, nx))
    reg = jnp.full((B,), 1e-6, jnp.float32)

    @jax.jit
    def many(A, Bm, lx, lu, lfx, eps):
        def one(acc, k):
            kk = backward_pass(A, Bm, lx, lu + (eps * k) * 1e-9, lxx, luu,
                               lux, lfx, lfxx, reg)[0]
            return acc + 1e-9 * kk.sum(), None
        kvals = 1.0 + jnp.arange(reps, dtype=jnp.float32)
        return jax.lax.scan(one, jnp.float32(0.0), kvals)[0]

    t0 = time.perf_counter()
    float(many(A, Bm, lx, lu, lfx, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        float(many(A, Bm, lx, lu, lfx, jnp.float32(i + 1.0)))
        best = min(best, time.perf_counter() - t0)
    return best / reps, compile_s


def main():
    configs = [("arm7", 128, 14, 7, 100), ("quadruped", 1024, 36, 18, 50),
               ("humanoid", 256, 72, 36, 32),
               # VERDICT r4 #2: the nx=72 decision at the SOLVER's humanoid
               # batch (B=16) — the B=256 compile blew the r4 TPU budget
               ("humanoid16", 16, 72, 36, 32)]
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    if sel:
        configs = [c for c in configs if c[0] in sel]
    saved = batched._MXU_MIN
    try:
        for label, B, nx, nu, H in configs:
            for mode, thresh in (("mxu", 13), ("vpu-broadcast", 10**9)):
                batched._MXU_MIN = thresh
                t, cs = bench(B, nx, nu, H)
                print(f"{label} B={B} nx={nx} H={H} [{mode}]: "
                      f"{t*1e3:.2f} ms/sweep (compile {cs:.1f}s)", flush=True)
    finally:
        batched._MXU_MIN = saved  # the shipped default (broadcast wins)


if __name__ == "__main__":
    main()
