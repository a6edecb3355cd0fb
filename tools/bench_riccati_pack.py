"""Measure the host-side layout cost of the chunked Riccati sweep: the
(B, H, n, m) -> (H, n, m, B) packing transposes on the way in and the
k/K unpacking on the way out — the candidate next lever (emitting packed
layouts straight from the colvec linearizer and consuming packed gains in
the fused feedback pass would delete both).

Times (r4 protocol, slope over two rep levels):
  full   — backward_pass_chunked end-to-end
  pack   — ONLY the pack + unpack transposes (same shapes, dummy compute)

Usage: python tools/bench_riccati_pack.py  (quadruped shape)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from rbdtpu.kernels.riccati_chunk import backward_pass_chunked  # noqa: E402


def main():
    B, nx, nv, H = 1024, 36, 18, 50
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.array(rng.standard_normal(s), jnp.float32)
    A = 0.05 * rnd(B, H, nx, nx) + jnp.eye(nx, dtype=jnp.float32)
    Bm = 0.05 * rnd(B, H, nx, nv)
    lx = rnd(B, H, nx)
    lu = rnd(B, H, nv)
    lxx = jnp.array(
        0.02 * rng.standard_normal((B, H, nx, nx)), jnp.float32)
    lxx = 0.5 * (lxx + jnp.swapaxes(lxx, -1, -2)) + 2.0 * jnp.eye(
        nx, dtype=jnp.float32)
    luu = 2.0 * jnp.eye(nv, dtype=jnp.float32)
    lux = jnp.zeros((nv, nx), jnp.float32)
    lfx = rnd(B, nx)
    lfxx = jnp.broadcast_to(10.0 * jnp.eye(nx, dtype=jnp.float32),
                            (B, nx, nx))
    reg = jnp.full((B,), 1e-6, jnp.float32)
    args = (A, Bm, lx, lu, lxx, luu, lux, lfx, lfxx, reg)

    def full(args, eps):
        A_, rest = args[0], args[1:]
        k, K, dV, ok = backward_pass_chunked(A_ + eps, *rest)
        return jnp.sum(dV) + jnp.sum(k[..., 0, :])

    def pack_only(args, eps):
        # the same transposes the sweep performs, with a trivial reduce in
        # between so XLA cannot fuse pack into unpack
        A_, Bm_, lx_, lu_, lxx_ = args[0] + eps, args[1], args[2], args[3], \
            args[4]
        pk = lambda a: jnp.transpose(
            a.reshape(B, H, a.shape[-2], a.shape[-1]), (1, 2, 3, 0))
        packs = [pk(A_), pk(Bm_), pk(lx_[..., None]), pk(lu_[..., None]),
                 pk(lxx_)]
        k_o = packs[3] * 2.0                       # (H, nv, 1, B)
        K_o = packs[1][:, :nv, :, :] * 2.0         # (H, nv, nx?, B)-ish
        k = jnp.transpose(k_o[:, :, 0, :], (2, 0, 1))
        K = jnp.transpose(K_o, (3, 0, 1, 2))
        return (jnp.sum(packs[0][0, 0, 0]) + jnp.sum(k[..., 0])
                + jnp.sum(K[:, 0, 0, 0]))

    for name, fn in (("full", full), ("pack", pack_only)):
        times = {}
        for reps in (4, 16):
            @jax.jit
            def many(args, e0):
                def one(acc, i):
                    return acc + fn(args, e0 * i * 1e-8), None
                acc, _ = jax.lax.scan(
                    one, jnp.float32(0.0),
                    1.0 + jnp.arange(reps, dtype=jnp.float32))
                return acc

            t0 = time.perf_counter()
            float(many(args, jnp.float32(0.0)))
            print(f"{name} R={reps}: compile "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                float(many(args, jnp.float32(i + 1)))
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        slope = (times[16] - times[4]) / 12 * 1e3
        print(f"{name}: SLOPE {slope:.3f} ms/sweep", flush=True)


if __name__ == "__main__":
    main()
