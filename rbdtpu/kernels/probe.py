"""Compile probes: never let a Mosaic-side failure crash a solve at runtime.

The fused kernels pick lane-block widths from a static VMEM budget model
(kernels.fused.feedback_lane_budget and friends).  A budget model can be
wrong — the only full-size TPU run of the round-2 feedback kernel crashed on
a scoped-VMEM overflow the budget had approved (VERDICT r2 weak #2) — and
interpret-mode tests cannot catch Mosaic VMEM/compile failures.  So every
auto-enabled fused path is gated by a PROBE: an ahead-of-time
``jit(fn).lower(abstract_args).compile()`` of the exact kernel layout the
solver would run.  Mosaic raises scoped-VMEM overflows and other lowering
failures at compile time, so a failed probe means "this configuration would
have crashed"; the caller logs it and falls back to the jnp path instead.

Probes run only where they can fail (a real TPU backend); off-TPU the fused
kernels run in interpret mode, which never OOMs.  Results are memoized per
(kernel, model, layout), and the persistent compile cache makes a successful
probe's compile work reusable.  ``RBDTPU_PROBE_FAIL`` (comma-separated name
substrings) forces matching probes to fail — the CPU-test hook for asserting
graceful degradation end-to-end.
"""
from __future__ import annotations

import os
import sys

import jax

_cache: dict = {}


def _forced_fail(name: str) -> bool:
    pats = os.environ.get("RBDTPU_PROBE_FAIL", "")
    return any(p and p in name for p in pats.split(","))


def clear():
    """Drop memoized probe results (tests)."""
    _cache.clear()


def probe_ok(name: str, key: tuple, fn, abstract_args, *,
             on_tpu: bool) -> bool:
    """True iff ``jit(fn)`` compiles for ``abstract_args`` on this backend.

    ``key`` memoizes the result (include every layout-determining datum).
    ``on_tpu=False`` short-circuits to True (interpret mode cannot OOM)
    unless the test hook forces a failure.  ``RBDTPU_PROBE_COMPILE`` makes
    off-TPU probes actually compile (interpret-mode kernels) — the CPU-test
    hook for trace-time probe bugs (e.g. a probe fn that mis-resolves the
    model's EE chain would otherwise silently disable the fused path on
    TPU only).
    """
    full_key = (name,) + key
    if os.environ.get("RBDTPU_PROBE_COMPILE"):
        on_tpu = True
    if _forced_fail(name):
        if full_key not in _cache:
            print(
                f"rbdtpu: probe '{name}' FORCED to fail (RBDTPU_PROBE_FAIL); "
                "falling back to the jnp path",
                file=sys.stderr,
            )
            _cache[full_key] = False
        return False
    if not on_tpu:
        return True
    if full_key in _cache:
        return _cache[full_key]
    try:
        jax.jit(fn).lower(*abstract_args).compile()
        ok = True
    except Exception as e:  # Mosaic VMEM overflow / lowering blow-up / OOM
        msg = str(e).splitlines()[0][:300]
        print(
            f"rbdtpu: fused kernel '{name}' failed to compile at this size; "
            f"falling back to the jnp path ({msg})",
            file=sys.stderr,
        )
        ok = False
    _cache[full_key] = ok
    return ok
