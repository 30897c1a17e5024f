"""Matmul-precision helpers.

On TPU the default matmul precision is bfloat16, which is far too coarse for
DQMC stabilization (the whole point of the UdV machinery is taming
condition-number growth; see SURVEY.md §9 "Wrapping & stabilization").
Every core contraction in this package goes through these helpers so the
MXU runs full-fp32 (three-pass) precision regardless of global config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix multiply at highest available precision for the input dtype."""
    return jnp.matmul(a, b, precision=HIGHEST)


def mm3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """a @ b @ c at highest precision (left to right)."""
    return mm(mm(a, b), c)


def scale_cols(a: jax.Array, d: jax.Array) -> jax.Array:
    """a @ diag(d) without forming the diagonal matrix."""
    return a * d[..., None, :]


def scale_rows(d: jax.Array, a: jax.Array) -> jax.Array:
    """diag(d) @ a without forming the diagonal matrix."""
    return d[..., :, None] * a
