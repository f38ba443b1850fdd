"""Shared padding/tiling helpers for the Pallas kernels.

One definition of the chain-padding arithmetic: three kernels (fused
leapfrog, fused logistic potential, whole-tree transition) pad a chain batch
to a whole number of VMEM tiles, and hand-synced copies of the rounding dance
had already drifted into near-variants.
"""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def chain_tiles(c: int, block_c: int):
    """``(cpad, bc)`` for a batch of ``c`` chains tiled into blocks of at most
    ``block_c`` rows: ``bc`` divides ``cpad`` exactly, both are multiples of
    the f32 sublane tile (8).  Small batches shrink the tile to the batch
    instead of launching a zero-size grid."""
    if block_c % 8 != 0:
        raise ValueError(f"block_c must be a multiple of 8, got {block_c}")
    cpad = round_up(max(c, 8), min(block_c, round_up(c, 8)))
    bc = min(block_c, cpad)
    cpad = round_up(cpad, bc)
    return cpad, bc
