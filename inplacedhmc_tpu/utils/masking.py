"""Per-chain mask helpers.

All NUTS state is batched over a leading chains axis and advanced in lockstep
inside ``lax.while_loop``; chains that terminated their trajectory keep
computing but have every state update masked out.  This module centralizes the
``where``-with-broadcast logic so the tree code stays readable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bcast_where(mask, new, old):
    """``jnp.where`` with ``mask`` of shape ``[C]`` against ``[C, ...]`` operands."""
    extra = new.ndim - mask.ndim
    m = mask.reshape(mask.shape + (1,) * extra)
    return jnp.where(m, new, old)


def tree_where(mask, new, old):
    """Apply :func:`bcast_where` across matching pytrees."""
    return jax.tree_util.tree_map(lambda n, o: bcast_where(mask, n, o), new, old)
