"""Numerical-safety utilities (SURVEY §5 'race detection / sanitizers':
the reference has none; JAX purity removes data races, and these guards
cover the numerical failure modes).

* ``enable_nan_debugging()`` — jax debug_nans/debug_infs toggles.
* ``assert_all_finite(tree)`` — jit-compatible finite check via
  checkify-style error value: returns a boolean and the first offending
  path for host-side reporting.
* ``finite_or_skip(updates, flag)`` — zero the whole update when any
  entry is non-finite (skip-bad-step protection for production runs;
  off by default to preserve reference semantics).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def enable_nan_debugging(nans: bool = True, infs: bool = False) -> None:
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def tree_all_finite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf entry is finite. jit-safe."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    flags = [
        jnp.all(jnp.isfinite(l.astype(jnp.float32)))
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    out = flags[0]
    for f in flags[1:]:
        out = jnp.logical_and(out, f)
    return out


def nonfinite_paths(tree: Any) -> list:
    """Host-side: paths of leaves containing non-finite values."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        import numpy as np

        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append("/".join(str(getattr(p, "key", p)) for p in path))
    return bad


def skip_nonfinite_updates(updates: Any) -> Tuple[Any, jax.Array]:
    """(gated updates, was_finite): zeroes every update when any entry is
    non-finite — a bad batch skips the step instead of poisoning params."""
    ok = tree_all_finite(updates)
    gated = jax.tree.map(
        lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
    )
    return gated, ok
