"""Sharding-invariant debug mode — the race-detection analogue.

Role parity: the reference has no sanitizers; its safety model is
whole-file task isolation (SURVEY.md §5 race detection row).  In the
rebuild, device data races are structurally absent (functional JAX), but
SHARDING bugs — wrong partition specs, stale jit caches keyed on the
wrong mesh, reductions that stop being order-free — show up as
cross-shard disagreement.  This mode makes that class of bug loud:

- every mesh-sharded op (pileup, association, pair-HMM scoring,
  window-sharded votes) re-executes its single-device reference and
  asserts EXACT equality for integer ops / tight-tolerance equality for
  the float HMM forward;
- global input arrays are checked against the partition spec they were
  built with before dispatch.

Enable with FALCON_UNZIP_TPU_DEBUG_SHARDING=1 (or by calling
``enable(True)``); zero overhead when off.  Tested in
tests/test_debug_sharding.py, including that a seeded inconsistency is
actually caught.
"""
from __future__ import annotations

import os

import numpy as np

_FORCED: bool | None = None


def enable(on: bool | None = True) -> None:
    """True/False force the mode; None restores the env-var default."""
    global _FORCED
    _FORCED = on


def enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    return os.environ.get("FALCON_UNZIP_TPU_DEBUG_SHARDING", "") not in (
        "", "0", "false")


class ShardingInvariantError(AssertionError):
    """A mesh-sharded op disagreed with its single-device reference."""


def check_equal(name: str, sharded, reference, atol: float = 0.0) -> None:
    """Assert sharded == reference (exact for integers, atol for floats)."""
    s = np.asarray(sharded)
    r = np.asarray(reference)
    if s.shape != r.shape:
        raise ShardingInvariantError(
            f"[{name}] shape drift: sharded {s.shape} vs reference "
            f"{r.shape}")
    if atol == 0.0:
        bad = s != r
    else:
        bad = ~np.isclose(s, r, atol=atol, rtol=1e-6)
    if bad.any():
        idx = tuple(int(i[0]) for i in np.nonzero(bad))
        raise ShardingInvariantError(
            f"[{name}] {int(bad.sum())}/{bad.size} elements disagree with "
            f"the single-device reference (first at {idx}: "
            f"sharded={s[idx]!r} ref={r[idx]!r}) — sharding invariant "
            f"violated (wrong spec / non-order-free reduction / stale "
            f"jit cache)")


def check_spec(name: str, arr, expected_spec) -> None:
    """Assert a global jax.Array carries the partition spec it was built
    with (catches accidental resharding / committed-device drift)."""
    spec = getattr(getattr(arr, "sharding", None), "spec", None)
    if spec is None:
        return
    if tuple(spec) != tuple(expected_spec):
        raise ShardingInvariantError(
            f"[{name}] input sharding drifted: {spec} != {expected_spec}")
