"""Numeric sanitizers (SURVEY.md §5 "Race detection / sanitizers").

JAX's functional purity removes data races; the numeric hazards that remain
are NaN/Inf propagation.  Helpers:

* :func:`enable_nan_checks` — flips ``jax_debug_nans`` (every jitted function
  re-runs eagerly on NaN and raises at the producing op).
* :func:`assert_all_finite` — jittable check on a pytree; raises via
  ``checkify``-free debug callback in the train loop when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def tree_all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = [
        jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.bool_(True)
    return jnp.all(jnp.stack(leaves))


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side assertion (fetches one scalar; use at log boundaries)."""
    if not bool(tree_all_finite(tree)):
        bad = [
            path for path, x in jax.tree_util.tree_flatten_with_path(tree)[0]
            if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)
            and not bool(jnp.all(jnp.isfinite(x)))
        ]
        raise FloatingPointError(f"non-finite values in {name}: {bad[:8]}")
