"""A/B the chunked-K fused feedback rollout vs the jnp forward pass at a
LARGE-BATCH humanoid DDP config — the regime feedback_fused_ok rejects
(unchunked K needs 2916 VMEM rows -> 67-lane budget < the 128-lane floor at
batch_total >= 1024) and feedback_rollout_fused_chunked exists for
(VERDICT r2 next #7).

Usage: python tools/bench_chunked.py [Bm] [H] [iters] [which]
(defaults 256 32 4 both; which in {jnp, fused, both} reruns one arm alone
— humanoid compiles through the tunnel run ~30 min each)
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
    Bm = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    model = load_asset("humanoid30", dtype=np.float32, floating_base=True)
    key = jax.random.PRNGKey(2)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32).at[:, 2].set(0.9)
    q0 = q0 + 0.02 * jax.random.normal(key, (Bm, model.nv), jnp.float32)
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    x_goal = jnp.zeros(model.nq + model.nv, jnp.float32).at[2].set(0.95)
    cost = quadratic_tracking_cost(model, x_goal, w_q=2.0, w_qd=0.05,
                                   w_u=1e-5)
    U0 = jnp.broadcast_to(
        rnea(model, q0, zero, zero)[0][:, None, :], (Bm, H, model.nv)
    )

    from rbdtpu.kernels.fused import feedback_chunked_ok, feedback_fused_ok

    bt = Bm * 4
    print(f"batch_total={bt}: unchunked_ok="
          f"{feedback_fused_ok(model, bt)} "
          f"chunked={feedback_chunked_ok(model, bt)}", flush=True)

    which = sys.argv[4] if len(sys.argv) > 4 else "both"
    # NOTE r4: auto mode (fused_feedback=None) STOPS at the unchunked
    # kernel since the r3b demotion — the chunked tier only engages with
    # fused_feedback=True, so that is what the fused arm must pass (the
    # pre-demotion tool passed None, which NOW measures the jnp pass twice)
    arms = {"jnp": [("jnp", False)], "fused": [("chunked", True)],
            "both": [("jnp", False), ("chunked", True)]}[which]
    for name, fb in arms:
        cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=4, fused=True,
                        fused_feedback=fb)
        f = jax.jit(lambda x, U, c=cfg: ddp_solve(model, cost, x, U, c)[0].J)
        t0 = time.perf_counter()
        J = f(x0, U0)
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s "
              f"finite={float(jnp.mean(jnp.isfinite(J))):.3f}", flush=True)
        # reps-amortized + HOST-SYNCED timing (block_until_ready returns
        # early through the tunnel; one solve/call carries the ~26 ms
        # dispatch floor — r4 protocol, see bench.timed_solve_rate)
        reps = 4

        @jax.jit
        def many(x, U, eps):
            def one(acc, k):
                Jk = ddp_solve(model, cost, x + (eps * k) * 1e-6, U, cfg)[0].J
                return acc + jnp.mean(Jk), None
            ks = 1.0 + jnp.arange(reps, dtype=x.dtype)
            return jax.lax.scan(one, jnp.float32(0.0), ks)[0]

        float(many(x0, U0, jnp.float32(0.0)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(x0, U0, jnp.float32(i + 1.0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms for {reps}x{Bm} solves -> "
              f"{Bm*reps/best:,.1f} solves/s  (H={H}, iters={iters})",
              flush=True)


if __name__ == "__main__":
    main()
