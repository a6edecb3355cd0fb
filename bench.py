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


def timed_solve_rate(solve_J, x0, U0, batch, reps, calls=4, label=""):
    """Amortized solver throughput: `reps` full solves inside ONE jitted
    program (each on an eps-perturbed x0 so no stage can be deduplicated /
    hoisted), min wall time over `calls` HOST-SYNCED calls (the timed value
    is fetched to host — block_until_ready alone can return early through
    the tunnel, r4 finding), minus nothing: the residual single dispatch
    (~26 ms floor measured this round) is amortized by reps, not
    subtracted.  Returns (solves_per_s, mean_J_of_first_solve).

    r1-r3 solver rates timed ONE solve per call and therefore carried the
    full dispatch floor in every sample — the r4 jumps on the small/fast
    configs are measurement-protocol corrections, not only kernel wins
    (BASELINE.md provenance notes)."""
    @jax.jit
    def many(x, U, eps):
        def one(acc, k):
            J = solve_J(x + (eps * k) * 1e-6, U)
            return acc + jnp.mean(J), None
        ks = 1.0 + jnp.arange(reps, dtype=x.dtype)
        acc, _ = jax.lax.scan(one, jnp.asarray(0.0, x.dtype), ks)
        return acc / reps

    t0 = time.perf_counter()
    J1 = solve_J(x0, U0)
    finite = jnp.isfinite(J1)
    frac = float(jnp.mean(finite.astype(jnp.float32)))
    jm = float(jnp.where(finite, J1, 0.0).sum()
               / jnp.maximum(finite.sum(), 1))
    log(f"{label} compile+1: {time.perf_counter() - t0:.1f}s "
        f"finite_frac={frac:.3f} meanJ_finite={jm:.3f}")
    # a few diverged scenarios must not zero the metric (they never did in
    # the pre-r4 arms, which only logged finite_frac); all-NaN = broken arm
    assert frac > 0.0, f"{label}: every solve non-finite"
    float(many(x0, U0, jnp.asarray(0.0, x0.dtype)))  # compile + sync
    best = float("inf")
    for i in range(calls):
        t0 = time.perf_counter()
        float(many(x0, U0, jnp.asarray(float(i + 1), x0.dtype)))
        best = min(best, time.perf_counter() - t0)
    rate = batch * reps / best
    log(f"{label}: {best*1e3:.1f} ms for {reps}x{batch} solves -> "
        f"{rate:,.1f} solves/s")
    return rate, jm


def bench_tpu_rollout(model):
    """Minv + RNEA forward-dynamics rollouts (BASELINE.json configs[1]),
    through the WHOLE-HORIZON fused Pallas kernel (kernels.rollout_fused_multi
    route="minv": bias RNEA + factorized M^-1 apply per step, time loop
    inside the kernel grid; same algorithm as the jnp path — equivalence is
    asserted in tests/test_kernels.py and below).

    Timing protocol (r4): the tunnel's per-call dispatch floor was measured
    at ~27 ms this round — min-over-calls at small amortization measures
    LATENCY, not throughput (the r1-r3 133-155M rows were latency-bound;
    work x4 moved runtime only ~10%).  So: (a) every timed call ends in a
    HOST FETCH of the scalar result (block_until_ready alone returns early
    through the tunnel), (b) two amortization levels R1 < R2 are timed and
    the headline is the R2 end-to-end rate (conservative, still includes
    one dispatch), with the slope rate (R2-R1)H·B/(t2-t1) reported as the
    latency-excluded device rate and the implied per-call floor logged."""
    from rbdtpu.dynamics import forward_dynamics
    from rbdtpu.kernels import fd_step_minv_fused
    from rbdtpu.kernels.fused import rollout_fused_multi
    from rbdtpu.solver import euler_semi_implicit, split_state

    def step_jnp(x, u):
        q, qd = split_state(model, x)
        qdd = forward_dynamics(model, q, qd, u)
        return euler_semi_implicit(model, x, qdd, DT), None

    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)
    U = 0.5 * jax.random.normal(key, (H, B, model.nv), jnp.float32)

    # honesty check: fused whole-horizon kernel == jnp path over 10 steps
    @jax.jit
    def roll_jnp10(x0, U):
        xf, _ = jax.lax.scan(step_jnp, x0, U[:10])
        return xf

    @jax.jit
    def roll_fused10(x0, U):
        return rollout_fused_multi(model, x0, U[:10], DT, route="minv")

    err = float(jnp.abs(roll_fused10(x0, U) - roll_jnp10(x0, U)).max())
    log(f"fused-vs-jnp 10-step rollout max err: {err:.2e}")
    assert err < 1e-3, "fused Minv+RNEA rollout diverges from the jnp path"

    def timed_at(R):
        U_big = 0.2 * jax.random.normal(
            key, (R, H, B, model.nv), jnp.float32
        )

        @jax.jit
        def roll_many(x0, U_big, eps):
            def one(acc, U_r):
                xf = rollout_fused_multi(model, x0 + eps, U_r, DT,
                                         route="minv")
                return acc + 1e-12 * jnp.sum(xf), None
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), U_big)
            return acc

        t0 = time.perf_counter()
        float(roll_many(x0, U_big, jnp.float32(0.0)))  # compile + sync
        log(f"rollout R={R} compile+first: {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for i in range(4):
            # per-call eps defeats any upstream memoization of identical
            # dispatches; float() forces a real device sync
            t0 = time.perf_counter()
            float(roll_many(x0, U_big, jnp.float32((i + 1) * 1e-9)))
            best = min(best, time.perf_counter() - t0)
        return best

    R1, R2 = 160, 640
    t1, t2 = timed_at(R1), timed_at(R2)
    steps_per_s = B * H * R2 / t2
    slope = B * H * (R2 - R1) / max(t2 - t1, 1e-9)
    floor_ms = max(t2 - R2 * (t2 - t1) / (R2 - R1), 0.0) * 1e3
    log(f"tpu rollout: {t2*1e3:.2f} ms for {R2}x({B}x{H}) steps -> "
        f"{steps_per_s:,.0f} steps/s end-to-end; slope (latency-excluded) "
        f"{slope/1e6:,.0f}M steps/s; implied dispatch floor {floor_ms:.1f} ms")

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
                "slope_steps_per_s": round(slope),
                "dispatch_floor_ms": round(floor_ms, 1),
                # NOTE: pct_attainable > 100 is expected now — the "vpu
                # bound" normalizes by the JNP program's cost-model flops
                # (21.7k/step), while the lane kernel's static folding
                # executes ~2.3k real ops/step (tools/audit_lane_ops.py);
                # the honest ceiling is the issue-slot bound below
            }
            # OP-LEVEL account (VERDICT r3 item 3): the cost-model flop bound
            # above charges the jnp program's flops, but the lane kernel's
            # static folding executes far fewer real ops — census the traced
            # kernel body (the exact jaxpr Mosaic lowers) and report the
            # issue-slot bound it implies, so both the flop-normalized and
            # the instruction-level roofline are in the captured artifact.
            try:
                ops = _lane_op_census(model)
                kind = getattr(jax.devices()[0], "device_kind", "").lower()
                clock = 1.67e9 if ("v5" in kind) else None
                if clock:
                    tile_rate = 4 * clock  # 4 ALUs, one (8,128) tile/op
                    bound = tile_rate / max(ops, 1) * 1024
                    roofline["lane_ops_per_step"] = ops
                    roofline["issue_bound_steps_per_s"] = round(bound)
                    roofline["pct_issue_bound"] = round(
                        100.0 * steps_per_s / bound, 1
                    )
                    roofline["pct_issue_bound_slope"] = round(
                        100.0 * slope / bound, 1
                    )
            except Exception as e:
                log(f"lane-op census unavailable: {e}")
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


def _lane_op_census(model):
    """Primitive-op count of the fused minv-route step kernel body (one
    (8, 128) lane tile; every op = one full-width VPU op).  Mirrors
    tools/audit_lane_ops.py — see it for the per-phase breakdown."""
    from rbdtpu.kernels import fused as kf

    ms = kf.get_static(model)
    nq, nv = ms.nq, ms.nv
    sc = lambda: jnp.zeros((8, 128), jnp.float32)
    args = [sc() for _ in range(nq + 2 * nv)]

    def body(*a):
        q = list(a[:nq])
        qd = list(a[nq:nq + nv])
        u = list(a[nq + nv:])
        q_new, qd_new = kf._step_lane(ms, q, qd, u, 0.01, -9.81,
                                      route="minv")
        return q_new + qd_new

    # same issue-slot weights as tools/audit_lane_ops.py (divides, sqrt and
    # transcendentals occupy multiple VPU passes; container eqns with
    # sub-jaxprs are walked, not counted) so the captured roofline and the
    # audit tool agree on one bound
    weights = {"div": 8, "sqrt": 8, "rsqrt": 8, "sin": 12, "cos": 12,
               "integer_pow": 2}
    jaxpr = jax.make_jaxpr(body)(*args)
    n = 0

    def walk(jx):
        nonlocal n
        for eqn in jx.eqns:
            has_sub = False
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                    has_sub = True
            if not has_sub:
                n += weights.get(eqn.primitive.name, 1)

    walk(jaxpr.jaxpr)
    return n


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
    """Fused whole-horizon ABA-route rollout (kernels.rollout_fused_multi
    route="aba") — same sync-forced two-level amortization protocol as
    bench_tpu_rollout."""
    from rbdtpu.kernels.fused import rollout_fused_multi

    key = jax.random.PRNGKey(0)
    x0 = 0.1 * jax.random.normal(key, (B, model.nq + model.nv), jnp.float32)
    H_f = 50

    def timed_at(R):
        U_big = 0.2 * jax.random.normal(
            key, (R, H_f, B, model.nv), jnp.float32
        )

        @jax.jit
        def roll_many(x0, U_big, eps):
            def one(acc, U_r):
                xf = rollout_fused_multi(model, x0 + eps, U_r, DT,
                                         route="aba")
                return acc + 1e-12 * jnp.sum(xf), None
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), U_big)
            return acc

        float(roll_many(x0, U_big, jnp.float32(0.0)))
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            float(roll_many(x0, U_big, jnp.float32((i + 1) * 1e-9)))
            best = min(best, time.perf_counter() - t0)
        return best

    R1, R2 = 160, 640
    t1, t2 = timed_at(R1), timed_at(R2)
    steps_per_s = B * H_f * R2 / t2
    slope = B * H_f * (R2 - R1) / max(t2 - t1, 1e-9)
    log(f"fused aba rollout: {t2*1e3:.2f} ms for {R2}x({B}x{H_f}) -> "
        f"{steps_per_s/1e6:,.0f}M end-to-end / {slope/1e6:,.0f}M slope "
        "state-steps/s")
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
    rate, jm = timed_solve_rate(f, x0, U0, Bm, reps=8, label="mpc")
    log(f"mpc meanJ={jm:.3f} (H={H}, iters={iters})")
    return rate


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
    rate, _ = timed_solve_rate(f, x0, U0, Bm, reps=4, calls=3,
                               label="quadruped")
    return rate


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
    rate, _ = timed_solve_rate(f, x0, U0, Bm, reps=4, calls=3,
                               label="quadruped_ee")
    return rate


def bench_humanoid_hybrid(root_quat: bool = False, sampling_dtype=None):
    """BASELINE.json configs[4]: humanoid (~30 DoF + fb) sampling+DDP hybrid.

    root_quat=True runs the same task on the singularity-free quaternion
    root (nq != nv, tangent-space DDP — VERDICT r1 item 5); the rpy variant
    stays for baseline continuity.  sampling_dtype="bfloat16" runs the
    MPPI sample rollouts in bf16 (r5, VERDICT r4 #9) — callers compare the
    returned mean accepted cost against the f32 run for the drift check."""
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
    mcfg = MPPIConfig(n_samples=128, sigma=0.3, dt=0.01, fused=True,
                      sampling_dtype=sampling_dtype)
    dcfg = DDPConfig(iters=4, dt=0.01, n_alphas=4, fused=True)
    # natively batched hybrid (problems x samples flatten into ONE fused
    # rollout lane batch; vmap-of-problems would block the packed kernels)
    key = jax.random.PRNGKey(3)
    f = jax.jit(
        lambda x, U, k: hybrid_solve(model, cost, x, U, k, mcfg, dcfg,
                                     mppi_iters=4)[0].J
    )
    tag = "" if sampling_dtype is None else f" {sampling_dtype}"
    rate, jm = timed_solve_rate(
        lambda x, U: f(x, U, key), x0, U0, Bm, reps=6, calls=3,
        label=f"humanoid hybrid{' quat' if root_quat else ''}{tag}",
    )
    return rate, jm


def bench_idsva_humanoid_quat():
    """Native quaternion-root IDSVA-SO at humanoid size vs the
    retraction-AD fallback (VERDICT r3 item 4 'bench native vs AD at
    humanoid size').  The AD path is O(n^2) tangent RNEA evaluations per
    sample, so it runs at a tiny batch — rates are per-eval either way."""
    from rbdtpu.model import load_asset
    from rbdtpu.dynamics import idsva_so_native, idsva_so_ad

    model = load_asset("humanoid30", dtype=np.float32, floating_base=True,
                       root_quat=True)
    key = jax.random.PRNGKey(0)

    def timed(fn, Bs, R, label):
        ks = jax.random.split(key, 3)
        q = jnp.zeros((Bs, model.nq), jnp.float32).at[:, 3].set(1.0)
        from rbdtpu.solver.integrate import config_retract

        q = config_retract(
            model, q, 0.3 * jax.random.normal(ks[0], (Bs, model.nv),
                                              jnp.float32)
        )
        qd = 0.5 * jax.random.normal(ks[1], (Bs, model.nv), jnp.float32)
        qdd = 0.5 * jax.random.normal(ks[2], (Bs, model.nv), jnp.float32)

        @jax.jit
        def many(q, qd, qdd):
            def one(acc, _):
                outs = fn(model, q, qd, qdd)
                return acc + 1e-12 * outs[0].sum(), None
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=R)
            return acc

        many(q, qd, qdd).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            many(q, qd, qdd).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        rate = Bs * R / best
        log(f"idsva_so humanoid-quat {label}: {rate:,.1f} eval/s")
        return rate

    native = timed(idsva_so_native, 256, 4, "native")
    ad = timed(idsva_so_ad, 4, 1, "retraction-AD")
    return native, ad


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
    rate, _ = timed_solve_rate(f, x0, U0, Bm, reps=6, calls=3,
                               label="humanoid_quat_ee")
    return rate


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

            # r5: HOST-FETCH sync (float(...)) — block_until_ready can
            # return early through the tunnel (r4 finding); this row was
            # the last pre-r4-protocol number in the tables (VERDICT r4
            # weak #2 / next #6)
            float(g())
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(g())
                best = min(best, (time.perf_counter() - t0) / R)
            return best * 1e3

        t_seq = time_fn(backward_pass)
        t_par = time_fn(backward_pass_parallel)
        results[H] = (t_seq, t_par)
        log(f"riccati H={H}: sequential {t_seq:.3f} ms, parallel "
            f"{t_par:.3f} ms ({t_seq / t_par:.2f}x)")
        out[f"sequential_ms_H{H}"] = round(t_seq, 3)
        out[f"parallel_ms_H{H}"] = round(t_par, 3)
        try:  # r5 third arm: the VMEM-resident chunked kernel at B=1
            from rbdtpu.kernels.riccati_chunk import backward_pass_chunked

            def chunk1(A_, B_, lx_, lu_, lxx_, luu_, lux_, lfx_, lfxx_, r_):
                return backward_pass_chunked(
                    A_[None], B_[None], lx_[None], lu_[None], lxx_, luu_,
                    lux_, lfx_[None], lfxx_[None], r_[None],
                )

            t_chk = time_fn(chunk1)
            log(f"riccati H={H}: chunked-kernel {t_chk:.3f} ms")
            out[f"chunked_ms_H{H}"] = round(t_chk, 3)
        except Exception as e:
            log(f"riccati H={H}: chunked arm failed: "
                f"{str(e).splitlines()[0][:200]}")
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
    v, jm = bench_humanoid_hybrid()
    v = round(v, 1)
    emit("humanoid_hybrid_solves_per_s", v, "solves/s")
    SUMMARY["humanoid_hybrid_solves_per_s"] = v
    SUMMARY["humanoid_hybrid_meanJ_f32"] = jm


def arm_humanoid_quat():
    v, _ = bench_humanoid_hybrid(root_quat=True)
    v = round(v, 1)
    emit("humanoid_hybrid_quat_solves_per_s", v, "solves/s")
    SUMMARY["humanoid_hybrid_quat_solves_per_s"] = v


def arm_humanoid_bf16():
    """r5 (VERDICT r4 #9): bf16 MPPI sampling stage on the humanoid hybrid.
    The accuracy check rides along: mean accepted cost drift vs the f32
    arm (the sampling stage only needs ranking fidelity; the acceptance
    guard re-scores in f32, so drift measures ranking loss, not guard
    error)."""
    v, jm = bench_humanoid_hybrid(sampling_dtype="bfloat16")
    v = round(v, 1)
    jf = SUMMARY.get("humanoid_hybrid_meanJ_f32")
    drift = None if not jf else abs(jm - jf) / max(abs(jf), 1e-9)
    emit("humanoid_hybrid_bf16_solves_per_s", v, "solves/s",
         meanJ_drift_vs_f32=None if drift is None else round(drift, 4))
    SUMMARY["humanoid_hybrid_bf16_solves_per_s"] = v
    if drift is not None:
        SUMMARY["humanoid_hybrid_bf16_meanJ_drift"] = round(drift, 4)


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


def arm_idsva_humanoid_quat():
    hq_native, hq_ad = bench_idsva_humanoid_quat()
    emit("idsva_so_humanoid_quat_native_eval_per_s", round(hq_native),
         "eval/s", ad_eval_per_s=round(hq_ad, 1))
    SUMMARY["idsva_so_humanoid_quat_native_eval_per_s"] = round(hq_native)
    SUMMARY["idsva_so_humanoid_quat_ad_eval_per_s"] = round(hq_ad, 1)


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
    ("RBDTPU_BENCH_SO_HUMANOID_QUAT", arm_idsva_humanoid_quat),
    # r5 additions LAST (VERDICT r4 #10: headline metrics always land
    # before new arms can eat the driver budget)
    ("RBDTPU_BENCH_HUMANOID_BF16", arm_humanoid_bf16),
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
