"""Instruction-level audit of the fused step kernels (VERDICT r3 item 3).

Counts the primitive ops in the TRACED lane-scalar kernel body (the same
jaxpr Mosaic lowers), weighted per lane element, and compares against the
XLA cost-model flop count bench.py quotes.  The gap between the two is the
first-principles explanation of the roofline fraction: the VPU-issue bound
uses cost-model flops (FMA = 2), while the machine retires one op per
ALU-slot per cycle — separate mul/add pairs, selects, transcendental
polynomial steps and divides all widen the op/flop ratio.

Usage: python tools/audit_lane_ops.py [arm7|quadruped12|humanoid30]
"""
import sys
from collections import Counter

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rbdtpu.model import load_asset  # noqa: E402
from rbdtpu.kernels import fused as kf  # noqa: E402
from rbdtpu.kernels import lanescalar as ls  # noqa: E402


# per-lane-element issue-slot weights (v5e VPU): 1 slot per ALU op; divide /
# sqrt / transcendentals go through multi-pass sequences — weights are the
# op's own jaxpr footprint (their expansions are already visible in the
# jaxpr for sin/cos only at Mosaic level, so we charge documented costs)
WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "neg": 1, "max": 1, "min": 1,
    "select_n": 1, "lt": 1, "gt": 1, "le": 1, "ge": 1, "and": 1, "or": 1,
    "div": 8, "sqrt": 8, "rsqrt": 8,
    "sin": 12, "cos": 12,  # VPU polynomial + range reduction
    "integer_pow": 2,
}


def census(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim in ("scan", "while", "cond", "pjit", "custom_jvp_call",
                        "custom_vjp_call", "remat", "checkpoint"):
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr)
                    elif isinstance(sub, (list, tuple)):
                        for s in sub:
                            if hasattr(s, "jaxpr"):
                                walk(s.jaxpr)
                continue
            counts[prim] += 1

    walk(jaxpr.jaxpr)
    return counts


def critical_path(fn, *args):
    """Weighted depth of the longest dependent op chain in the traced body
    (r5, VERDICT r4 #5): every eqn's outputs sit at
    max(depth of inputs) + weight(op).  The VPU can only overlap
    INDEPENDENT ops across its 4 ALUs, so the retire-rate ceiling is
    total_slots / max(4, total_slots / critical_path) — when the available
    ILP (total/critical) is under 4, the kernel is CHAIN-bound and no
    scheduler can reach the 4-ALU issue bound."""
    jaxpr = jax.make_jaxpr(fn)(*args)

    depth = {}

    def dof(v):
        return depth.get(id(v), 0) if not hasattr(v, "val") else 0

    def walk(jx):
        for eqn in jx.eqns:
            w = WEIGHTS.get(eqn.primitive.name, 1)
            d = max((dof(v) for v in eqn.invars), default=0) + w
            for o in eqn.outvars:
                depth[id(o)] = d

    walk(jaxpr.jaxpr)
    return max(depth.values(), default=0)


def report(label, counts, per_what="state-step"):
    total = sum(counts.values())
    slots = sum(WEIGHTS.get(k, 1) * v for k, v in counts.items())
    arith = sum(v for k, v in counts.items() if k in ("add", "sub", "mul"))
    top = ", ".join(f"{k}:{v}" for k, v in counts.most_common(8))
    print(f"{label}: {total} lane ops/{per_what} "
          f"({arith} add/sub/mul; weighted issue-slots {slots}) | {top}")
    return total, slots


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "arm7"
    fb = name != "arm7"
    model = load_asset(name, dtype=np.float32, floating_base=fb)
    ms = kf.get_static(model)
    nq, nv = ms.nq, ms.nv
    L = 128
    sc = lambda: jnp.zeros((8, L), jnp.float32)
    q = [sc() for _ in range(nq)]
    qd = [sc() for _ in range(nv)]
    u = [sc() for _ in range(nv)]

    print(f"model={name} nb={ms.nb} nq={nq} nv={nv} (one (8,{L}) lane tile; "
          "every op below = one full-width VPU op over the tile)")

    def xbuild(q):
        return [kf._body_xc(ms, i, q) for i in range(ms.nb)]

    def flatten_x(X):
        out = []
        for E, r in X:
            for row in E:
                out += [e for e in row if not ls.is_static(e)]
            out += [e for e in r if not ls.is_static(e)]
        return out

    cx = census(lambda *q: flatten_x(xbuild(list(q))), *q)
    report("X build (all joints)", cx)

    def rnea_bias(args):
        q, qd = args[:nq], args[nq:]
        X = xbuild(q)
        _, _, _, c = kf._rnea_sweeps_lane(ms, X, qd, None, -9.81)
        return c

    c_all = census(rnea_bias, list(q) + list(qd))
    report("X build + RNEA bias", c_all)

    def minv_only(args):
        q = args[:nq]
        X = xbuild(q)
        Minv = kf.minv_lane(ms, X)
        return [e for row in Minv for e in row if not ls.is_static(e)]

    report("X build + minv_lane", census(minv_only, list(q)))

    def full_step_dense(*args):
        q, qd, uu = list(args[:nq]), list(args[nq:nq + nv]), list(args[nq + nv:])
        X = xbuild(q)
        _, _, _, c = kf._rnea_sweeps_lane(ms, X, qd, None, -9.81)
        Minv = kf.minv_lane(ms, X)
        uc = [uu[j] - c[j] for j in range(nv)]
        qdd = [ls.dot(Minv[i], uc) for i in range(nv)]
        qd_new = [qd[i] + 0.01 * qdd[i] for i in range(nv)]
        q_new = kf._integrate_q_lane(ms, q, qd_new, 0.01)
        return q_new + qd_new

    report("fd_step_minv_fused (dense_minv=True) body",
           census(full_step_dense, *(q + qd + u)))

    def full_step(*args):
        q, qd, uu = list(args[:nq]), list(args[nq:nq + nv]), list(args[nq + nv:])
        X = xbuild(q)
        _, _, _, c = kf._rnea_sweeps_lane(ms, X, qd, None, -9.81)
        uc = [uu[j] - c[j] for j in range(nv)]
        qdd = kf.aba_lane(ms, q, [0.0] * nv, uc, gravity=0.0, X=X)
        qd_new = [qd[i] + 0.01 * qdd[i] for i in range(nv)]
        q_new = kf._integrate_q_lane(ms, q, qd_new, 0.01)
        return q_new + qd_new

    tot_minv, slots_minv = report(
        "FULL fd_step_minv_fused body (factorized M^-1 apply)",
        census(full_step, *(q + qd + u))
    )

    def aba_step(*args):
        q, qd, uu = list(args[:nq]), list(args[nq:nq + nv]), list(args[nq + nv:])
        qdd = kf.aba_lane(ms, q, qd, uu, -9.81)
        qd_new = [qd[i] + 0.01 * qdd[i] for i in range(nv)]
        q_new = kf._integrate_q_lane(ms, q, qd_new, 0.01)
        return q_new + qd_new

    tot_aba, slots_aba = report(
        "FULL fd_step_fused (ABA) body", census(aba_step, *(q + qd + u))
    )

    # issue-slot roofline: v5e VPU retires 8x128x4 lanes/cycle @ ~1.67 GHz
    vpu_slots_per_s = 4 * 1.67e9  # full-width (8,128) ops per second
    print("\nissue-slot bound (one (8,128) tile per op, 4 ALUs x 1.67 GHz):")
    for lbl, slots in (("minv-route step", slots_minv),
                       ("aba-route step", slots_aba)):
        bound = vpu_slots_per_s / slots * (8 * 128)
        print(f"  {lbl}: {slots} slots -> {bound/1e6:,.0f}M state-steps/s "
              "attainable (0 overhead)")

    # dependency-chain account (r5, VERDICT r4 #5): weighted critical path
    # vs total slots gives the ILP actually available to fill 4 ALUs
    print("\ndependency-chain account (weighted critical path):")
    for lbl, fn, slots in (("minv-route step", full_step, slots_minv),
                           ("aba-route step", aba_step, slots_aba)):
        cp = critical_path(fn, *(q + qd + u))
        ilp = slots / cp
        eff_alus = min(4.0, ilp)
        chain_bound = vpu_slots_per_s / 4 * eff_alus / slots * (8 * 128)
        print(f"  {lbl}: critical path {cp} slots, ILP {ilp:.2f} "
              f"(4 ALUs need 4.0) -> chain-adjusted ceiling "
              f"{chain_bound/1e6:,.0f}M steps/s "
              f"({eff_alus/4:.0%} of the issue bound)")


if __name__ == "__main__":
    main()
