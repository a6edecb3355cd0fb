"""Benchmark harness (BASELINE.md).  Timeout-proof output (VERDICT r3 #1):

- Prints ONE JSON LINE PER METRIC on stdout the moment it is measured,
  ordered cheapest-headline-first (rollout -> arm MPC -> quadruped ->
  quadruped_ee -> humanoid rpy -> quat -> quat_ee -> idsva), so a driver
  timeout forfeits only the arms that never ran.
- A final summary JSON line aggregates everything that completed (same key
  schema as earlier rounds: metric=fd_rollout_..., vs_baseline, per-solver
  keys).  The summary is ALSO printed from a SIGTERM/SIGINT handler, so
  `timeout` (rc=124) still yields the aggregate.
- `RBDTPU_BENCH_BUDGET_S=<seconds>` skips arms not yet started once the
  budget is spent (the running arm finishes; the summary reports skips).
- Each arm runs under try/except: one failing arm cannot zero the rest.

Headline config (BASELINE.json configs[1]): batched forward-dynamics rollouts,
4096 trajectories x H=50 on the 7-DoF arm, Minv + RNEA path, one chip.
vs_baseline = speedup over the serial numpy reference oracle executing the same
forward-dynamics step on this host's CPU (the reference publishes no numbers of
its own — SURVEY.md §6).

Extra diagnostics go to stderr; stdout carries only JSON lines.
"""
import json
import os
import signal
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

T0 = time.perf_counter()
SUMMARY = {"metric": "fd_rollout_steps_per_s_4096x50_arm7", "value": None,
           "unit": "steps/s", "vs_baseline": None}
_SUMMARY_PRINTED = False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, **extra):
    """One JSON line per metric, the moment it is measured (VERDICT r3 #1)."""
    rec = {"metric": metric, "value": value, "unit": unit}
    rec.update(extra)
    rec["t_s"] = round(time.perf_counter() - T0, 1)
    print(json.dumps(rec), flush=True)
    return rec


def print_summary():
    global _SUMMARY_PRINTED
    if _SUMMARY_PRINTED:
        return
    _SUMMARY_PRINTED = True
    SUMMARY["elapsed_s"] = round(time.perf_counter() - T0, 1)
    print(json.dumps(SUMMARY), flush=True)


def _on_term(signum, frame):
    # driver `timeout` sends SIGTERM before SIGKILL: flush the aggregate of
    # whatever completed so rc=124 still certifies the measured arms
    SUMMARY["partial"] = f"signal {signum}"
    print_summary()
    sys.stdout.flush()
    os._exit(124)


def budget_left():
    b = os.environ.get("RBDTPU_BENCH_BUDGET_S")
    if not b:
        return float("inf")
    return float(b) - (time.perf_counter() - T0)


def bench_tpu_rollout(model):
    """Minv + RNEA forward-dynamics rollouts (BASELINE.json configs[1]),
    through the fused Pallas step kernel (same algorithm as the jnp path —
    equivalence is asserted in tests/test_kernels.py and below)."""
    from rbdtpu.dynamics import forward_dynamics
    from rbdtpu.kernels import fd_step_minv_fused
    from rbdtpu.solver import euler_semi_implicit, split_state

    def step(x, u):
        return fd_step_minv_fused(model, x, u, DT), None

    def step_jnp(x, u):
        q, qd = split_state(model, x)
        qdd = forward_dynamics(model, q, qd, u)
        return euler_semi_implicit(model, x, qdd, DT), None

    R = 20  # rollouts per device call: amortizes the per-call dispatch floor
            # (8-26 ms through the tunnel), which otherwise dominates

    @jax.jit
    def roll(x0, U):
        # U is scan-major (H, B, nv): a (B, H, nv) layout would cost a
        # lane-padded transpose (~20 ms at this size) inside the loop body
        xf, _ = jax.lax.scan(step, x0, U)
        return xf

    @jax.jit
    def roll_many(x0, U_big):
        def one(acc, U_r):
            xf, _ = jax.lax.scan(step, x0, U_r)
            return acc + 1e-12 * jnp.sum(xf), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0), U_big)
        return acc

    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)
    U = 0.5 * jax.random.normal(key, (H, B, model.nv), jnp.float32)
    U_big = 0.5 * jax.random.normal(
        key, (R, H, B, model.nv), jnp.float32
    )

    t0 = time.perf_counter()
    roll(x0, U).block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # honesty check: fused kernel path == jnp path over a short horizon
    @jax.jit
    def roll_jnp10(x0, U):
        xf, _ = jax.lax.scan(step_jnp, x0, U[:10])
        return xf

    @jax.jit
    def roll_fused10(x0, U):
        xf, _ = jax.lax.scan(step, x0, U[:10])
        return xf

    err = float(jnp.abs(roll_fused10(x0, U) - roll_jnp10(x0, U)).max())
    log(f"fused-vs-jnp 10-step rollout max err: {err:.2e}")
    assert err < 1e-3, "fused Minv+RNEA step diverges from the jnp path"

    # min over several timed batches: robust to host/tunnel noise
    roll_many(x0, U_big).block_until_ready()
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        out = roll_many(x0, U_big)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    steps_per_s = B * H * R / best
    log(f"tpu rollout: {best*1e3:.2f} ms for {R}x({B}x{H}) steps -> "
        f"{steps_per_s:,.0f} steps/s")

    # FLOP accounting (VERDICT r1 item 10): XLA's own cost model for the
    # whole timed program -> flops/step and achieved fraction of chip peak.
    # (The fused-kernel flops are Pallas-internal and invisible to XLA's
    # analysis, so count the EQUIVALENT jnp step program — same algorithm.)
    flops_per_step = pct_peak = None
    roofline = {}
    try:
        # one UNSCANNED step at full batch: XLA's cost model counts a scan
        # body once regardless of trip count, so analyze the body directly
        one_step = jax.jit(lambda x, u: step_jnp(x, u)[0])
        an = one_step.lower(x0, U[0]).compile().cost_analysis()
        an = an[0] if isinstance(an, (list, tuple)) else an
        total = float(an.get("flops", float("nan")))
        flops_per_step = total / B
        peak = _chip_peak_flops()
        if peak:
            pct_peak = 100.0 * flops_per_step * steps_per_s / peak
        log(f"flops/step (XLA cost model): {flops_per_step:,.0f}; achieved "
            f"{flops_per_step * steps_per_s / 1e12:.2f} TFLOP/s"
            + (f" = {pct_peak:.2f}% of MXU f32 peak" if pct_peak else ""))
        # ROOFLINE for the lane-scalar workload (VERDICT r2 weak #5): this
        # is a tiny-operand VPU program — the MXU peak is the wrong
        # denominator.  Attainable bound = min(HBM-bandwidth bound on the
        # fused kernel's true IO, VPU issue bound on the cost-model flops):
        #   bytes/step: kernel IO is exactly inputs+outputs (everything else
        #   lives in VMEM/vregs): x(nx) + u(nv) in, x(nx) out, f32;
        #   VPU-issue bound: (8,128) lanes x 4 ALUs x ~1.67 GHz (v5e)
        #   ~= 6.8e12 op/s, x2 when every op dual-issues as FMA (the XLA
        #   cost model counts an FMA as 2 flops, so 1.37e13 is the
        #   consistent ceiling).
        nx_b, nv_b = model.nq + model.nv, model.nv
        bytes_per_step = 4 * (2 * nx_b + nv_b)
        hbm = _chip_hbm_bw()
        vpu = _chip_vpu_flops()
        if hbm and vpu and np.isfinite(flops_per_step):
            t_hbm = bytes_per_step / hbm
            t_vpu = flops_per_step / vpu
            attainable = 1.0 / max(t_hbm, t_vpu)
            roofline = {
                "bytes_per_step": bytes_per_step,
                "achieved_gb_s": round(bytes_per_step * steps_per_s / 1e9, 1),
                "hbm_bound_steps_per_s": round(1.0 / t_hbm),
                "vpu_bound_steps_per_s": round(1.0 / t_vpu),
                "pct_attainable": round(100.0 * steps_per_s / attainable, 1),
                "bound": "vpu" if t_vpu > t_hbm else "hbm",
            }
            log(
                f"roofline: {bytes_per_step} B/step -> "
                f"{roofline['achieved_gb_s']} GB/s of {hbm/1e9:.0f} GB/s; "
                f"VPU bound {roofline['vpu_bound_steps_per_s']:,} steps/s "
                f"(FMA-ideal) -> achieved "
                f"{roofline['pct_attainable']}% of the "
                f"{roofline['bound']}-limited attainable rate"
            )
    except Exception as e:  # cost analysis is backend-dependent
        log(f"flop accounting unavailable: {e}")
    return steps_per_s, flops_per_step, pct_peak, roofline


def _chip_peak_flops():
    """Dense peak FLOP/s of the attached chip (None when unknown).  v5e MXU
    peak is 197 TFLOP/s bf16 / ~98 f32; our rollout math is f32, so quote
    against the f32 figure."""
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 98e12
    if "v4" in kind:
        return 137.5e12
    return None


def _chip_hbm_bw():
    """HBM bandwidth (B/s) of the attached chip (None when unknown)."""
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819e9
    if "v4" in kind:
        return 1228e9
    return None


def _chip_vpu_flops():
    """VPU issue ceiling (FLOP/s, FMA counted as 2 — matching XLA's cost
    model): (8, 128) lanes x 4 ALUs x clock x 2."""
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 8 * 128 * 4 * 1.67e9 * 2
    if "v4" in kind:
        return 8 * 128 * 4 * 1.05e9 * 2 * 2  # 2 cores
    return None


def bench_fused_rollout(model):
    """Fused Pallas ABA+Euler rollout (kernels.rollout_fused): slope-based
    per-step cost between two horizons, rejecting the fixed per-call floor."""
    from rbdtpu.kernels import rollout_fused

    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)
    R, H_f = 40, 50

    @jax.jit
    def roll_many(x0, U_big):
        def one(acc, U_r):
            xf = rollout_fused(model, x0, U_r, DT)
            return acc + 1e-12 * jnp.sum(xf), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0), U_big)
        return acc

    U_big = 0.2 * jax.random.normal(key, (R, H_f, B, model.nv), jnp.float32)
    roll_many(x0, U_big).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = roll_many(x0, U_big)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    steps_per_s = B * H_f * R / best
    log(f"fused rollout: {best*1e3:.2f} ms for {R}x({B}x{H_f}) -> "
        f"{steps_per_s/1e6:,.0f}M state-steps/s")
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
    q0 = rng.uniform(-1, 1, model.nq)
    qd0 = 0.1 * rng.uniform(-1, 1, model.nv)
    u = rng.uniform(-1, 1, model.nv)
    # min over batches of steps: robust to host noise.  The state RESETS each
    # timed block (VERDICT r3 weak #4: open-loop random-torque integration
    # diverges to overflow within ~100 steps, spamming the driver tail with
    # RuntimeWarnings and timing denormal/NaN paths instead of real arithmetic)
    best = float("inf")
    with np.errstate(all="ignore"):
        for _ in range(5):
            q, qd = q0.copy(), qd0.copy()
            t0 = time.perf_counter()
            for _ in range(20):
                qdd = np.asarray(ref.forward_dynamics(q, qd, u)).ravel()
                qd = qd + DT * qdd
                q = q + DT * qd
            best = min(best, (time.perf_counter() - t0) / 20)
            assert np.all(np.isfinite(q)), "numpy baseline diverged in-block"
    log(f"numpy reference: {best*1e3:.3f} ms/step -> {1/best:,.0f} steps/s")
    return 1.0 / best


def bench_mpc_solves(model):
    """DDP MPC solves/s (BASELINE.json configs[2]: iiwa reaching, H=100,
    rnea_grad linearization)."""
    from rbdtpu.solver import DDPConfig, ddp_solve, ee_reaching_cost

    H, iters, Bm = 100, 10, 128
    cost = ee_reaching_cost(
        model, jnp.array([0.3, 0.2, 0.8], jnp.float32),
        w_ee=10.0, w_ee_f=2000.0, w_u=1e-6, w_qd=1e-3, w_qd_f=0.1,
    )
    from rbdtpu.dynamics import rnea

    cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=8, fused=True)
    key = jax.random.PRNGKey(0)
    # random start CONFIGURATIONS at rest + gravity-compensation warm start:
    # the hold-torque nominal is then a stable equilibrium (a zero-torque or
    # moving nominal physically diverges over the 1 s horizon)
    q0 = 0.3 * jax.random.normal(key, (Bm, model.nq), jnp.float32)
    x0 = jnp.concatenate(
        [q0, jnp.zeros((Bm, model.nv), jnp.float32)], axis=-1
    )
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    u_hold = rnea(model, q0, zero, zero)[0]
    U0 = jnp.broadcast_to(u_hold[:, None, :], (Bm, H, model.nv))
    f = jax.jit(lambda x, U: ddp_solve(model, cost, x, U, cfg)[0].J)
    t0 = time.perf_counter()
    J = f(x0, U0)
    J.block_until_ready()
    log(f"mpc compile+1: {time.perf_counter()-t0:.1f}s")
    assert bool(jnp.all(jnp.isfinite(J))), "MPC solves produced non-finite J"
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        f(x0, U0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"mpc: {best*1e3:.1f} ms for {Bm} solves -> {Bm/best:,.0f} solves/s "
        f"(H={H}, iters={iters}, meanJ={float(J.mean()):.3f})")
    return Bm / best


def bench_quadruped_mpc():
    """BASELINE.json configs[3]: quadruped (12-DoF + floating base)
    multi-scenario MPC, 1024 scenarios batched on one chip."""
    from rbdtpu.model import load_asset
    from rbdtpu.solver import DDPConfig, ddp_solve, quadratic_tracking_cost
    from rbdtpu.dynamics import rnea

    model = load_asset("quadruped12", dtype=np.float32, floating_base=True)
    Bm, H, iters = 1024, 50, 5
    key = jax.random.PRNGKey(1)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32)
    q0 = q0.at[:, 2].set(0.35)  # stand height
    q0 = q0 + 0.05 * jax.random.normal(key, q0.shape, jnp.float32)
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    x_goal = jnp.zeros(model.nq + model.nv, jnp.float32).at[2].set(0.4)
    cost = quadratic_tracking_cost(model, x_goal, w_q=2.0, w_qd=0.05,
                                   w_u=1e-5)
    u_hold = rnea(model, q0, zero, zero)[0]
    U0 = jnp.broadcast_to(u_hold[:, None, :], (Bm, H, model.nv))
    cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=6, fused=True)
    f = jax.jit(lambda x, U: ddp_solve(model, cost, x, U, cfg)[0].J)
    t0 = time.perf_counter()
    J = f(x0, U0)
    J.block_until_ready()
    log(f"quadruped compile+1: {time.perf_counter()-t0:.1f}s "
        f"finite_frac={float(jnp.mean(jnp.isfinite(J).astype(jnp.float32))):.3f}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x0, U0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"quadruped: {best*1e3:.1f} ms for {Bm} scenarios -> "
        f"{Bm/best:,.0f} solves/s (H={H}, iters={iters})")
    return Bm / best


def bench_quadruped_ee_mpc():
    """Floating-base quadruped EE (foot) reaching, 1024 scenarios: exercises
    the fb fused EE cost quadratization (kernels.fk_lane geometric root
    columns — BASELINE.md measured it 6.3x over the jnp quadratize and -27%
    on the full iteration at this config)."""
    from rbdtpu.model import load_asset
    from rbdtpu.solver import DDPConfig, ddp_solve, ee_reaching_cost
    from rbdtpu.dynamics import rnea

    model = load_asset("quadruped12", dtype=np.float32, floating_base=True)
    Bm, H, iters = 1024, 50, 5
    key = jax.random.PRNGKey(4)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32).at[:, 2].set(0.35)
    q0 = q0 + 0.05 * jax.random.normal(key, q0.shape, jnp.float32)
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    ee = [model.joint_names[model.leaves()[0]]]
    cost = ee_reaching_cost(
        model, jnp.array([0.3, 0.1, 0.1], jnp.float32), ee_names=ee,
        w_ee=10.0, w_ee_f=500.0, w_qd=1e-2, w_u=1e-5,
    )
    u_hold = rnea(model, q0, zero, zero)[0]
    U0 = jnp.broadcast_to(u_hold[:, None, :], (Bm, H, model.nv))
    cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=6, fused=True)
    f = jax.jit(lambda x, U: ddp_solve(model, cost, x, U, cfg)[0].J)
    t0 = time.perf_counter()
    J = f(x0, U0)
    J.block_until_ready()
    log(f"quadruped_ee compile+1: {time.perf_counter()-t0:.1f}s "
        f"finite_frac={float(jnp.mean(jnp.isfinite(J).astype(jnp.float32))):.3f}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x0, U0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"quadruped_ee: {best*1e3:.1f} ms for {Bm} scenarios -> "
        f"{Bm/best:,.0f} solves/s (H={H}, iters={iters}, fused EE cost)")
    return Bm / best


def bench_humanoid_hybrid(root_quat: bool = False):
    """BASELINE.json configs[4]: humanoid (~30 DoF + fb) sampling+DDP hybrid.

    root_quat=True runs the same task on the singularity-free quaternion
    root (nq != nv, tangent-space DDP — VERDICT r1 item 5); the rpy variant
    stays for baseline continuity."""
    from rbdtpu.model import load_asset
    from rbdtpu.solver import (
        DDPConfig, MPPIConfig, hybrid_solve, quadratic_tracking_cost,
    )
    from rbdtpu.dynamics import rnea

    model = load_asset("humanoid30", dtype=np.float32, floating_base=True,
                       root_quat=root_quat)
    Bm, H = 16, 32
    key = jax.random.PRNGKey(2)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32).at[:, 2].set(0.9)
    noise = 0.02 * jax.random.normal(key, (Bm, model.nv), jnp.float32)
    if root_quat:
        from rbdtpu.solver.integrate import config_retract

        q0 = q0.at[:, 3].set(1.0)  # identity quat
        q0 = config_retract(model, q0, noise)
    else:
        q0 = q0 + noise
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    x_goal = jnp.zeros(model.nq + model.nv, jnp.float32).at[2].set(0.95)
    if root_quat:
        x_goal = x_goal.at[3].set(1.0)
    cost = quadratic_tracking_cost(model, x_goal, w_q=2.0, w_qd=0.05,
                                   w_u=1e-5)
    u_hold = rnea(model, q0, zero, zero)[0]
    U0 = jnp.broadcast_to(u_hold[:, None, :], (Bm, H, model.nv))
    mcfg = MPPIConfig(n_samples=128, sigma=0.3, dt=0.01, fused=True)
    dcfg = DDPConfig(iters=4, dt=0.01, n_alphas=4, fused=True)
    # natively batched hybrid (problems x samples flatten into ONE fused
    # rollout lane batch; vmap-of-problems would block the packed kernels)
    key = jax.random.PRNGKey(3)
    f = jax.jit(
        lambda x, U, k: hybrid_solve(model, cost, x, U, k, mcfg, dcfg,
                                     mppi_iters=4)[0].J
    )
    t0 = time.perf_counter()
    J = f(x0, U0, key)
    J.block_until_ready()
    log(f"humanoid compile+1: {time.perf_counter()-t0:.1f}s "
        f"finite_frac={float(jnp.mean(jnp.isfinite(J).astype(jnp.float32))):.3f}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x0, U0, key).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"humanoid hybrid: {best*1e3:.1f} ms for {Bm} solves -> "
        f"{Bm/best:,.1f} solves/s (H={H}, MPPI 4x128 + DDP 4)")
    return Bm / best


def bench_humanoid_quat_ee():
    """Humanoid (30-DoF + QUATERNION root) hand-reaching DDP (VERDICT r3 #7):
    extends the quat-root EE-reaching evidence from quadruped/rpy scale to the
    flagship humanoid through the fused quat tangent-column GN quadratization
    (kernels/fk_lane.py analytic tangent-space EE Jacobian, a4b43f0)."""
    from rbdtpu.model import load_asset
    from rbdtpu.solver import DDPConfig, ddp_solve, ee_reaching_cost
    from rbdtpu.solver.integrate import config_retract
    from rbdtpu.dynamics import rnea

    model = load_asset("humanoid30", dtype=np.float32, floating_base=True,
                       root_quat=True)
    Bm, H, iters = 16, 32, 5
    key = jax.random.PRNGKey(5)
    q0 = jnp.zeros((Bm, model.nq), jnp.float32).at[:, 2].set(0.9)
    q0 = q0.at[:, 3].set(1.0)  # identity quat
    noise = 0.02 * jax.random.normal(key, (Bm, model.nv), jnp.float32)
    q0 = config_retract(model, q0, noise)
    zero = jnp.zeros((Bm, model.nv), jnp.float32)
    x0 = jnp.concatenate([q0, zero], -1)
    cost = ee_reaching_cost(
        model, jnp.array([0.35, 0.25, 1.1], jnp.float32),
        ee_names=["left_arm_wrist_roll"],
        w_ee=10.0, w_ee_f=500.0, w_qd=1e-2, w_u=1e-5,
    )
    u_hold = rnea(model, q0, zero, zero)[0]
    U0 = jnp.broadcast_to(u_hold[:, None, :], (Bm, H, model.nv))
    cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=4, fused=True)
    f = jax.jit(lambda x, U: ddp_solve(model, cost, x, U, cfg)[0].J)
    t0 = time.perf_counter()
    J = f(x0, U0)
    J.block_until_ready()
    log(f"humanoid_quat_ee compile+1: {time.perf_counter()-t0:.1f}s "
        f"finite_frac={float(jnp.mean(jnp.isfinite(J).astype(jnp.float32))):.3f}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x0, U0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"humanoid_quat_ee: {best*1e3:.1f} ms for {Bm} solves -> "
        f"{Bm/best:,.1f} solves/s (H={H}, iters={iters}, quat root, fused EE)")
    return Bm / best


def bench_second_order(model):
    """Native IDSVA-SO sweep throughput (VERDICT r1 item 4): batched
    second-order tensor evaluations/s, native sweep vs AD-over-gradient."""
    from rbdtpu.dynamics import idsva_so_native, idsva_so_ad

    Bs = 2048
    key = jax.random.PRNGKey(0)
    q = 0.5 * jax.random.normal(key, (Bs, model.nq), jnp.float32)
    qd = 0.5 * jax.random.normal(key, (Bs, model.nv), jnp.float32)
    qdd = 0.5 * jax.random.normal(key, (Bs, model.nv), jnp.float32)
    R = 8

    def timed(fn, label):
        @jax.jit
        def many(q, qd, qdd):
            def one(acc, _):
                outs = fn(model, q, qd, qdd)
                return acc + 1e-12 * outs[0].sum(), None
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=R)
            return acc

        many(q, qd, qdd).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            many(q, qd, qdd).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        rate = Bs * R / best
        log(f"idsva_so {label}: {rate:,.0f} eval/s")
        return rate

    native = timed(idsva_so_native, "native")
    ad = timed(idsva_so_ad, "ad")
    return native, ad


def bench_riccati():
    """Sequential vs parallel (associative-scan) Riccati backward sweep
    latency at H in {100, 500, 1000}, small batch — the parallel sweep's
    intended regime (VERDICT r1 item 7).  Prints ONE JSON line with the
    measured latencies and the crossover, which justifies the
    DDPConfig.parallel_riccati default (off: single-chip throughput work is
    batch-dominated; on: long-horizon latency-critical solves).
    """
    from rbdtpu.solver.ddp import backward_pass
    from rbdtpu.solver.parallel_riccati import backward_pass_parallel

    nx, nu = 14, 7  # arm7-sized problem
    key = jax.random.PRNGKey(0)
    out = {"metric": "riccati_backward_latency", "unit": "ms",
           "nx": nx, "nu": nu}
    results = {}
    for H in (100, 500, 1000):
        ks = jax.random.split(key, 6)
        # stable-ish random linearization + SPD costs
        A = (jnp.broadcast_to(jnp.eye(nx), (H, nx, nx))
             + 0.01 * jax.random.normal(ks[0], (H, nx, nx), jnp.float32))
        B = 0.01 * jax.random.normal(ks[1], (H, nx, nu), jnp.float32)
        lx = jax.random.normal(ks[2], (H, nx), jnp.float32)
        lu = jax.random.normal(ks[3], (H, nu), jnp.float32)
        lxx = jnp.eye(nx, dtype=jnp.float32)
        luu = 0.1 * jnp.eye(nu, dtype=jnp.float32)
        lux = jnp.zeros((nu, nx), jnp.float32)
        lfx = jax.random.normal(ks[4], (nx,), jnp.float32)
        lfxx = 10.0 * jnp.eye(nx, dtype=jnp.float32)
        reg = jnp.float32(1e-6)

        def time_fn(fn):
            R = 20  # amortize dispatch: R sweeps per timed call, serialized
                    # via a data-dependent scan (ONE copy of the program —
                    # an unrolled sum of 20 sweeps OOMs the compiler)

            @jax.jit
            def g():
                def body(c, _):
                    k = fn(A, B, lx, lu + 1e-9 * c, lxx, luu, lux, lfx,
                           lfxx, reg)[0]
                    return c + 1e-20 * k.sum(), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
                return c

            g().block_until_ready()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                g().block_until_ready()
                best = min(best, (time.perf_counter() - t0) / R)
            return best * 1e3

        t_seq = time_fn(backward_pass)
        t_par = time_fn(backward_pass_parallel)
        results[H] = (t_seq, t_par)
        log(f"riccati H={H}: sequential {t_seq:.3f} ms, parallel "
            f"{t_par:.3f} ms ({t_seq / t_par:.2f}x)")
        out[f"sequential_ms_H{H}"] = round(t_seq, 3)
        out[f"parallel_ms_H{H}"] = round(t_par, 3)
    out["value"] = out["parallel_ms_H1000"]
    crossover = [H for H, (ts, tp) in results.items() if tp < ts]
    out["parallel_wins_at_H"] = crossover
    print(json.dumps(out), flush=True)


def bench_sharded():
    """Multi-chip scaling harness (VERDICT r1 item 6): data-parallel DDP
    solves over a jax.sharding.Mesh, measuring per-device throughput and
    scaling efficiency vs the 1-device mesh.

    Runs on whatever devices exist: real chips when available, or the
    8-virtual-device CPU mesh (JAX_PLATFORMS=cpu
    XLA_FLAGS=--xla_force_host_platform_device_count=8) — same program either
    way; on hardware the collectives ride ICI.  Prints ONE JSON line.
    """
    from rbdtpu.model import load_asset
    from rbdtpu.distrib import make_mesh, sharded_ddp_solve
    from rbdtpu.solver import DDPConfig, ee_reaching_cost
    from rbdtpu.dynamics import rnea

    model = load_asset("arm7", dtype=np.float32)
    n_dev = len(jax.devices())
    per_dev_B, H, iters = 16, 32, 5
    cost = ee_reaching_cost(
        model, jnp.array([0.3, 0.2, 0.8], jnp.float32),
        w_ee=10.0, w_ee_f=2000.0, w_u=1e-6, w_qd=1e-3, w_qd_f=0.1,
    )
    # fused kernels engage per shard on hardware (native-batch shards);
    # the CPU virtual mesh keeps the jnp path — interpret-mode Pallas under
    # an 8-way shard_map is validation-speed only
    cfg = DDPConfig(iters=iters, dt=0.01, n_alphas=4,
                    fused=jax.devices()[0].platform != "cpu")

    def solves_per_s(n):
        mesh = make_mesh(n)
        B = per_dev_B * n
        key = jax.random.PRNGKey(0)
        q0 = 0.3 * jax.random.normal(key, (B, model.nq), jnp.float32)
        x0 = jnp.concatenate(
            [q0, jnp.zeros((B, model.nv), jnp.float32)], -1
        )
        zero = jnp.zeros((B, model.nv), jnp.float32)
        u_hold = rnea(model, q0, zero, zero)[0]
        U0 = jnp.broadcast_to(u_hold[:, None, :], (B, H, model.nv))
        f = jax.jit(
            lambda x, U: sharded_ddp_solve(mesh, model, cost, x, U, cfg)[0]
        )
        J = f(x0, U0)
        J.block_until_ready()
        assert bool(jnp.all(jnp.isfinite(J)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            f(x0, U0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return B / best

    tput1 = solves_per_s(1)
    tputN = solves_per_s(n_dev) if n_dev > 1 else tput1
    eff = tputN / (n_dev * tput1)
    log(f"sharded: 1-dev {tput1:,.0f} solves/s, {n_dev}-dev {tputN:,.0f} "
        f"solves/s, efficiency {eff:.3f}")
    print(json.dumps({
        "metric": "sharded_ddp_scaling",
        "value": round(tputN),
        "unit": "solves/s",
        "n_devices": n_dev,
        "per_device_1dev_solves_per_s": round(tput1),
        "scaling_efficiency": round(eff, 3),
        "platform": jax.devices()[0].platform,
    }), flush=True)


def arm_rollout():
    from rbdtpu.model import load_asset

    model = load_asset("arm7", dtype=np.float32)
    steps_per_s, flops_per_step, pct_peak, roofline = bench_tpu_rollout(model)
    base = bench_numpy_baseline(load_asset("arm7", dtype=np.float64))
    vs = round(steps_per_s / base, 1) if np.isfinite(base) else None
    extra = {"vs_baseline": vs}
    if flops_per_step is not None and np.isfinite(flops_per_step):
        extra["flops_per_step"] = round(flops_per_step)
        if pct_peak is not None:
            extra["pct_peak"] = round(pct_peak, 3)
        if roofline:
            extra["roofline"] = roofline
    emit("fd_rollout_steps_per_s_4096x50_arm7", round(steps_per_s),
         "steps/s", **extra)
    SUMMARY["value"] = round(steps_per_s)
    SUMMARY["vs_baseline"] = vs
    for k in ("flops_per_step", "pct_peak", "roofline"):
        if k in extra:
            SUMMARY[k] = extra[k]
    fused = round(bench_fused_rollout(model))
    emit("fused_aba_rollout_steps_per_s", fused, "steps/s")
    SUMMARY["fused_aba_rollout_steps_per_s"] = fused


def arm_mpc():
    from rbdtpu.model import load_asset

    v = round(bench_mpc_solves(load_asset("arm7", dtype=np.float32)))
    emit("mpc_solves_per_s_H100", v, "solves/s")
    SUMMARY["mpc_solves_per_s_H100"] = v


def arm_quadruped():
    v = round(bench_quadruped_mpc())
    emit("quadruped_1024scen_solves_per_s", v, "solves/s")
    SUMMARY["quadruped_1024scen_solves_per_s"] = v


def arm_quadruped_ee():
    v = round(bench_quadruped_ee_mpc())
    emit("quadruped_ee_1024scen_solves_per_s", v, "solves/s")
    SUMMARY["quadruped_ee_1024scen_solves_per_s"] = v


def arm_humanoid():
    v = round(bench_humanoid_hybrid(), 1)
    emit("humanoid_hybrid_solves_per_s", v, "solves/s")
    SUMMARY["humanoid_hybrid_solves_per_s"] = v


def arm_humanoid_quat():
    v = round(bench_humanoid_hybrid(root_quat=True), 1)
    emit("humanoid_hybrid_quat_solves_per_s", v, "solves/s")
    SUMMARY["humanoid_hybrid_quat_solves_per_s"] = v


def arm_humanoid_quat_ee():
    v = round(bench_humanoid_quat_ee(), 1)
    emit("humanoid_quat_ee_solves_per_s", v, "solves/s")
    SUMMARY["humanoid_quat_ee_solves_per_s"] = v


def arm_idsva():
    from rbdtpu.model import load_asset

    so_native, so_ad = bench_second_order(
        load_asset("arm7", dtype=np.float32)
    )
    emit("idsva_so_native_eval_per_s", round(so_native), "eval/s",
         ad_eval_per_s=round(so_ad))
    SUMMARY["idsva_so_native_eval_per_s"] = round(so_native)
    SUMMARY["idsva_so_ad_eval_per_s"] = round(so_ad)


# (env flag to disable, arm fn) — cheapest-headline-first (VERDICT r3 #1);
# every solver headline lands before the slow humanoid compiles can eat a
# driver timeout.  Set RBDTPU_BENCH_<X>=0 to skip one when iterating locally.
ARMS = [
    ("RBDTPU_BENCH_ROLLOUT", arm_rollout),
    ("RBDTPU_BENCH_MPC", arm_mpc),
    ("RBDTPU_BENCH_QUADRUPED", arm_quadruped),
    ("RBDTPU_BENCH_QUADRUPED_EE", arm_quadruped_ee),
    ("RBDTPU_BENCH_HUMANOID", arm_humanoid),
    ("RBDTPU_BENCH_HUMANOID_QUAT", arm_humanoid_quat),
    ("RBDTPU_BENCH_HUMANOID_QUAT_EE", arm_humanoid_quat_ee),
    ("RBDTPU_BENCH_SO", arm_idsva),
]


def main():
    if "--sharded" in sys.argv:
        bench_sharded()
        return
    if "--riccati" in sys.argv:
        bench_riccati()
        return

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    log(f"devices: {jax.devices()}")
    skipped, failed = [], []
    for env_key, fn in ARMS:
        name = fn.__name__
        if os.environ.get(env_key) == "0":
            skipped.append(f"{name} (env)")
            continue
        if budget_left() <= 0:
            skipped.append(f"{name} (budget)")
            log(f"budget exhausted; skipping {name}")
            continue
        try:
            t0 = time.perf_counter()
            fn()
            log(f"{name}: done in {time.perf_counter() - t0:.1f}s")
        except Exception as e:  # one failing arm must not zero the rest
            failed.append(f"{name}: {type(e).__name__}: {e}")
            log(f"{name} FAILED: {type(e).__name__}: {e}")
    if skipped:
        SUMMARY["skipped"] = skipped
    if failed:
        SUMMARY["failed"] = failed
    print_summary()


if __name__ == "__main__":
    main()
