"""Emission-order ILP scheduler (kernels/ilpsched.py): validity of the
reordering and bitwise equivalence of the rescheduled rollout kernel."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbdtpu.kernels.ilpsched import ilp_call, reorder_eqns
from rbdtpu.model import load_asset

try:
    from jax.extend.core import Var
except ImportError:  # pragma: no cover
    from jax._src.core import Var


def _dep_edges(eqns):
    prod = {}
    for i, e in enumerate(eqns):
        for v in e.outvars:
            prod[v] = i
    edges = []
    for i, e in enumerate(eqns):
        for v in e.invars:
            if isinstance(v, Var) and v in prod:
                edges.append((prod[v], i))
    return edges


def test_reorder_is_topological_and_spreads_chains():
    m = load_asset("arm7", dtype=np.float32)
    from rbdtpu.kernels.fused import _step_lane, get_static

    ms = get_static(m)
    tile = lambda: jnp.ones((8, 16), jnp.float32)
    q = [tile() for _ in range(m.nq)]
    qd = [tile() for _ in range(m.nv)]
    u = [tile() for _ in range(m.nv)]
    cj = jax.make_jaxpr(
        lambda q, qd, u: _step_lane(ms, q, qd, u, 0.01, -9.81, "aba")
    )(q, qd, u)
    new = reorder_eqns(cj.jaxpr, min_dist=4)
    assert len(new) == len(cj.jaxpr.eqns)
    # valid topological order: every producer precedes its consumer
    for p, c in _dep_edges(new):
        assert p < c
    # the point of the pass: most producer->consumer edges now span >= 4
    # emission slots (original order: ~1/3 of edges are closer than that)
    close_orig = sum(1 for p, c in _dep_edges(cj.jaxpr.eqns) if c - p < 4)
    close_new = sum(1 for p, c in _dep_edges(new) if c - p < 4)
    assert close_new < close_orig / 4


def test_ilp_call_identity_and_equivalence():
    # plain pytree function: ilp_call must reproduce outputs exactly
    def f(a, d):
        x = jnp.sin(a) * 2.0
        return {"y": x + d["b"], "z": (x * x, None)}

    a = jnp.arange(8.0).reshape(2, 4)
    d = {"b": jnp.ones((2, 4))}
    ref = f(a, d)
    out = ilp_call(f, a, d, min_dist=4)
    assert float(jnp.max(jnp.abs(out["y"] - ref["y"]))) == 0.0
    assert float(jnp.max(jnp.abs(out["z"][0] - ref["z"][0]))) == 0.0
    assert out["z"][1] is None


@pytest.mark.parametrize("route", ["aba", "minv"])
def test_rescheduled_rollout_bitwise(route, monkeypatch):
    m = load_asset("arm7", dtype=np.float32)
    from rbdtpu.kernels.fused import rollout_fused_multi

    rng = np.random.default_rng(3)
    B, H = 32, 6
    x0 = jnp.asarray(rng.standard_normal((B, m.nq + m.nv)) * 0.3,
                     jnp.float32)
    U = jnp.asarray(rng.standard_normal((H, B, m.nv)) * 0.5, jnp.float32)
    monkeypatch.setenv("RBDTPU_ILP_SCHED", "0")
    base = rollout_fused_multi(m, x0, U, 0.01, interpret=True)
    monkeypatch.setenv("RBDTPU_ILP_SCHED", "6")
    sched = rollout_fused_multi(m, x0, U, 0.01, route=route,
                                interpret=True) if route != "aba" else \
        rollout_fused_multi(m, x0, U, 0.01, interpret=True)
    if route == "aba":
        # same primitives on the same operands in a different order:
        # bitwise identical
        assert float(jnp.max(jnp.abs(base - sched))) == 0.0
    else:
        monkeypatch.setenv("RBDTPU_ILP_SCHED", "0")
        base_m = rollout_fused_multi(m, x0, U, 0.01, route="minv",
                                     interpret=True)
        assert float(jnp.max(jnp.abs(base_m - sched))) == 0.0
