"""Exact-Hessian DDP vs iLQR on the FLOATING-BASE quadruped (VERDICT r2
next #6 "Done" criterion): now that the native IDSVA-SO sweep covers the
rpy root, measure whether full DDP (fxx folded into the backward sweep)
pays at fb scale — iterations-to-converge AND wall-clock.

The reference's second-order sweep is fixed-base only
(RBDReference.py:1415); this config is beyond its scope by construction.

Usage: python tools/bench_fbddp.py [Bm] [H] [iters]  (defaults 64 32 10)
One TPU process at a time (CLAUDE.md); min-over-batches inside one jit.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

sys.path.insert(0, ".")

from rbdtpu.model import load_asset
from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost
from rbdtpu.dynamics import rnea


def main():
    Bm = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    model = load_asset("quadruped12", dtype=np.float32, floating_base=True)
    key = jax.random.PRNGKey(1)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32).at[:, 2].set(0.35)
    q0 = q0 + 0.05 * jax.random.normal(key, q0.shape, jnp.float32)
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    x_goal = jnp.zeros(model.nq + model.nv, jnp.float32).at[2].set(0.4)
    cost = quadratic_tracking_cost(model, x_goal, w_q=2.0, w_qd=0.05,
                                   w_u=1e-5)
    U0 = jnp.broadcast_to(
        rnea(model, q0, zero, zero)[0][:, None, :], (Bm, H, model.nv)
    )

    results = {}
    for name, exact in (("ilqr", False), ("exact-hessian ddp", True)):
        cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=6, fused=True,
                        exact_hessians=exact)
        f = jax.jit(
            lambda x, U, c=cfg: ddp_solve(model, cost, x, U, c)[1]
        )  # J_hist (iters, B)
        t0 = time.perf_counter()
        Jh = f(x0, U0)
        _ = float(Jh[0, 0])  # host-fetch sync (r4: block_until_ready can
        # return early through the tunnel)
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            Jh = f(x0 + (i + 1) * 1e-6, U0)
            _ = float(Jh[0, 0])
            best = min(best, time.perf_counter() - t0)
        Jh = np.asarray(f(x0, U0))  # (iters, B)
        Jm = Jh.mean(axis=-1)
        results[name] = (best, Jm)
        print(f"{name}: {best*1e3:.1f} ms / {Bm} solves x {iters} iters "
              f"({best*1e3/iters:.2f} ms/iter) -> {Bm/best:,.1f} solves/s",
              flush=True)
        print(f"{name}: mean J per iter: "
              + " ".join(f"{v:.4f}" for v in Jm), flush=True)

    # iterations-to-converge: first iter within 0.1% of each run's own floor
    for name, (best, Jm) in results.items():
        floor = Jm[-1]
        k = int(np.argmax(Jm <= floor * 1.001)) + 1
        print(f"{name}: reaches 0.1%-of-floor (J={floor:.4f}) at iter {k}, "
              f"wall to there ~{best/len(Jm)*k*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
