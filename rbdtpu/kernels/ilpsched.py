"""Emission-order ILP scheduling for straight-line lane-scalar kernel bodies.

Why this exists (BASELINE.md "Rollout-kernel issue-slot account", r5): the
whole-horizon rollout kernel executes its ~2.3k-op lane-scalar step body at
~1.55 ops/cycle — just BELOW the measured single-dependent-chain rate at
L=512 (1.89, tools/bench_vpu_ceiling.py) and far below the ~3.5 ops/cycle
the VPU sustains once ILP >= 4 is exposed in ISSUE ORDER.  The step DAG has
ILP 12.5-13.5 (critical path 184-194 of 2,484 weighted slots,
tools/audit_lane_ops.py), but Mosaic schedules the body essentially in
program order, so consecutive *emitted* ops on the same dependence chain
stall ~3 cycles each.

This module closes that gap at TRACE TIME: the pure tile-to-tile step
function is traced to a jaxpr, its equations are re-topologically-sorted so
no op is emitted within ``min_dist`` slots of its most recent producer
(where the DAG allows), and the reordered jaxpr is replayed into the
enclosing Pallas trace with ``jax.core.eval_jaxpr``.  The scheduler is
MINIMAL-PERTURBATION: it keeps the original order except where an op sits
too close to a producer, deferring it while some other ready op (typically
from an adjacent independent subtree/body chain) fills the slot.  This
bounds the register-pressure increase — a full breadth-first order would
blow the live set and cause VMEM spills (the step kernels are
register-pressure sensitive, kernels/lanescalar.py "compact Plücker" note).

The reference computes each joint's kernels one after another in serial
numpy (RBDReference.py:205-260); the TPU analog is one wide VPU program
whose instruction stream must interleave independent chains to cover the
~3-cycle op latency — exactly what this pass does.

Enabled via ``RBDTPU_ILP_SCHED=<D>`` (emission distance, 0 = off) or the
explicit ``min_dist`` argument.  Pure reordering: results are bitwise
identical (same primitives, same operands, only issue order changes).
"""
from __future__ import annotations

import os
from heapq import heappush, heappop

import jax
from jax import core as jcore
try:  # jax >= 0.5 public export of Var; jax.core.Var was removed
    from jax.extend.core import Var as _Var
except ImportError:  # pragma: no cover
    from jax._src.core import Var as _Var
from jax.tree_util import tree_flatten, tree_unflatten


def env_min_dist(default: int = 0) -> int:
    """Scheduling distance from RBDTPU_ILP_SCHED (0 = disabled)."""
    try:
        return int(os.environ.get("RBDTPU_ILP_SCHED", str(default)))
    except ValueError:
        return 0


def reorder_eqns(jaxpr, min_dist: int = 4):
    """Return jaxpr equations in a new valid topological order in which an
    equation is emitted at least ``min_dist`` slots after its latest
    producer whenever some other ready equation can fill the gap."""
    eqns = jaxpr.eqns
    n = len(eqns)
    producer = {}  # Var -> producing eqn index
    for i, e in enumerate(eqns):
        for v in e.outvars:
            producer[v] = i
    deps = [[] for _ in range(n)]
    children = [[] for _ in range(n)]
    indeg = [0] * n
    for i, e in enumerate(eqns):
        seen = set()
        for v in e.invars:
            if not isinstance(v, _Var):
                continue
            j = producer.get(v)
            if j is not None and j not in seen:
                seen.add(j)
                deps[i].append(j)
                children[j].append(i)
        indeg[i] = len(deps[i])

    emitted_slot = [0] * n  # slot at which eqn i was emitted
    ready = []  # heap of original indices
    for i in range(n):
        if indeg[i] == 0:
            heappush(ready, i)

    order = []
    slot = 0
    while ready:
        # Earliest-original-index ready eqn whose producers are all at
        # least min_dist slots back; else the one with the oldest newest
        # producer (to guarantee progress with minimal stall).
        popped = []
        chosen = None
        while ready:
            i = heappop(ready)
            last = max((emitted_slot[d] for d in deps[i]), default=-min_dist)
            if last <= slot - min_dist:
                chosen = i
                break
            popped.append((last, i))
        if chosen is None:
            popped.sort()
            _, chosen = popped.pop(0)
            popped = [p for p in popped]
        for _, i in popped:
            heappush(ready, i)
        order.append(chosen)
        emitted_slot[chosen] = slot
        slot += 1
        for c in children[chosen]:
            indeg[c] -= 1
            if indeg[c] == 0:
                heappush(ready, c)
    assert len(order) == n, "cycle in jaxpr dependence graph?"
    return [eqns[i] for i in order]


def ilp_call(fn, *args, min_dist: int | None = None):
    """Call ``fn(*args)`` with its equations re-emitted in an ILP-exposing
    order.  ``fn`` must be PURE and straight-line (no refs / effects) from
    arrays to arrays; args/outputs may be arbitrary pytrees (None leaves
    fine).  With min_dist <= 0 this is a plain call."""
    if min_dist is None:
        min_dist = env_min_dist()
    if min_dist <= 0:
        return fn(*args)
    flat, in_tree = tree_flatten(args)
    out_store = []

    def ffn(*fl):
        out = fn(*tree_unflatten(in_tree, fl))
        fo, ot = tree_flatten(out)
        out_store.append(ot)
        return fo

    closed = jax.make_jaxpr(ffn)(*flat)
    new_eqns = reorder_eqns(closed.jaxpr, min_dist)
    new_jaxpr = closed.jaxpr.replace(eqns=new_eqns)
    outs = jcore.eval_jaxpr(new_jaxpr, closed.consts, *flat)
    return tree_unflatten(out_store[0], outs)
