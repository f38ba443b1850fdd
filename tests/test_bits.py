"""Unit tests for the tree bit arithmetic (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu.utils.bits import (checkpoint_slot, direction_bit, popcount,
                                        trailing_ones)


def py_trailing_ones(n):
    t = 0
    while n & 1:
        t += 1
        n >>= 1
    return t


def test_popcount_and_trailing_ones():
    ns = np.arange(0, 4096, dtype=np.int32)
    got_tz = np.asarray(trailing_ones(jnp.asarray(ns)))
    want_tz = np.array([py_trailing_ones(int(n)) for n in ns])
    np.testing.assert_array_equal(got_tz, want_tz)
    got_pc = np.asarray(popcount(jnp.asarray(ns)))
    want_pc = np.array([bin(int(n)).count("1") for n in ns])
    np.testing.assert_array_equal(got_pc, want_pc)


def test_checkpoint_slots_are_consistent():
    """At leaf n, the node [l, n] of size 2^k must find its left-edge data at
    slot popcount(n>>1) - k + 1, which must equal the slot where (even) leaf l
    stored it: popcount(l>>1).  Also verify no live slot is overwritten."""
    for max_depth in (1, 3, 6, 10):
        size = 1 << max_depth
        for n in range(size):
            t = py_trailing_ones(n)
            for k in range(1, t + 1):
                l = n - (1 << k) + 1
                assert l % 2 == 0
                slot_expected = bin(n >> 1).count("1") - (k - 1)
                slot_stored = bin(l >> 1).count("1")
                assert slot_expected == slot_stored
        # liveness: storing at slot(l) must not clobber a slot still needed
        live = {}
        for n in range(size):
            if n % 2 == 0:
                live[bin(n >> 1).count("1")] = n
            t = py_trailing_ones(n)
            for k in range(1, t + 1):
                l = n - (1 << k) + 1
                assert live[bin(l >> 1).count("1")] == l


def test_direction_bits():
    flags = jnp.asarray([0b1011, 0b0000, 0xFFFFFFFF], dtype=jnp.uint32)
    for d, want in [(0, [True, False, True]), (1, [True, False, True]),
                    (2, [False, False, True]), (3, [True, False, True])]:
        got = np.asarray(direction_bit(flags, jnp.asarray(d, jnp.int32)))
        np.testing.assert_array_equal(got, want)
