"""NaN/blow-up watchdog — the idiomatic TPU equivalent of the reference's
runtime stability guards (SURVEY.md section 5.3).

The reference's only failure handling is algebraic guards inside UpdateMacro
and the cavity's tau auto-resize. Here a watchdog checks the state for
non-finite values on a cadence and either raises (fail-fast) or rolls back
to the last good checkpoint, making long unattended runs recoverable.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class BlowupError(RuntimeError):
    def __init__(self, step: int, what: str):
        super().__init__(f"non-finite {what} detected at step {step}")
        self.step = step


def finite_reduction(state):
    """Jittable whole-state isfinite reduction (every floating leaf, incl.
    bfloat16 storage). The single definition of "finite" shared by the
    watchdog, bench.py, and the scaling harness."""
    leaves = [jnp.isfinite(x).all() for x in jax.tree.leaves(state)
              if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)]
    return jnp.stack(leaves).all()


def state_is_finite(state) -> bool:
    """One device-side reduction over every array in the state pytree."""
    return bool(jax.device_get(finite_reduction(state)))


class Watchdog:
    """Check every `every` steps; keep a rolling good snapshot for rollback.

    >>> wd = Watchdog(every=50, keep_snapshot=True)
    >>> for t in range(nsteps):
    ...     state = step(state)
    ...     state = wd.check(t, state)   # may raise or roll back
    """

    def __init__(self, every: int = 100, keep_snapshot: bool = False,
                 on_blowup: str = "raise"):
        assert on_blowup in ("raise", "rollback")
        self.every = max(every, 1)
        self.keep_snapshot = keep_snapshot
        self.on_blowup = on_blowup
        self._good = None
        self._good_step: Optional[int] = None

    def check(self, t: int, state):
        if (t + 1) % self.every:
            return state
        if state_is_finite(state):
            if self.keep_snapshot:
                # Must be a materialized device copy, not an alias: callers
                # jit the step with donate_argnums=(0,), which invalidates
                # the live state's buffers on the next step() call — an
                # aliased snapshot would be deleted exactly when rollback
                # needs it.
                self._good = jax.tree.map(jnp.array, state)
                self._good_step = t
            return state
        if self.on_blowup == "rollback" and self._good is not None:
            # Hand out a copy: the caller's donating step would otherwise
            # consume the snapshot itself, breaking any second rollback.
            return jax.tree.map(jnp.array, self._good)
        raise BlowupError(t, "simulation state")
