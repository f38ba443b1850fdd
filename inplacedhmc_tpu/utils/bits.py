"""Bit-twiddling helpers for the iterative NUTS tree.

The reference keeps per-transition direction bits in a single ``UInt32``
(``/root/reference/src/tree.jl:140-155``) and manages tree storage with 32-bit
occupancy masks (``tree.jl:52-64``).  On TPU we keep the direction-economizing
trick (one 32-bit draw per transition supplies every doubling direction) and use
bit arithmetic to drive the checkpoint-stack indexing of the *iterative* tree
build, which replaces the reference's recursion (``tree.jl:321-366``).

Checkpoint-slot scheme (standard iterative-NUTS formulation):

* leaf ``n`` of a subtree is the **right edge** of the ``2^k``-leaf node
  ``[n - 2^k + 1, n]`` for every ``k in 1..trailing_ones(n)``;
* every such node's **left edge** ``l`` is even, and the slot
  ``popcount(l >> 1)`` is free exactly when the left-edge data must be stored;
* at leaf ``n`` the nodes to U-turn-check live in slots
  ``popcount(n >> 1) - trailing_ones(n) + 1 .. popcount(n >> 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def popcount(x):
    """Number of set bits (works on traced int32 scalars/arrays)."""
    return lax.population_count(jnp.asarray(x, jnp.int32))


def trailing_ones(x):
    """Number of contiguous low-order one bits of ``x``.

    ``trailing_ones(n) == trailing_zeros(n + 1)``; computed branch-free as the
    popcount of the mask of bits that flip when incrementing.
    """
    x = jnp.asarray(x, jnp.int32)
    return lax.population_count(jnp.bitwise_and(jnp.bitwise_not(x), x + 1) - 1)


def checkpoint_slot(n):
    """Stack slot used when (even) leaf ``n`` is stored as a left edge."""
    n = jnp.asarray(n, jnp.int32)
    return lax.population_count(n >> 1)


def direction_bit(flags, d):
    """Doubling direction for depth ``d`` from a uint32 of direction flags.

    Mirrors ``next_direction`` (``/root/reference/src/tree.jl:152-155``): bit 0
    drives the first doubling, bit 1 the second, etc.  ``True`` means forward.
    """
    return jnp.bitwise_and(jnp.right_shift(flags, jnp.asarray(d, flags.dtype)), 1) == 1
