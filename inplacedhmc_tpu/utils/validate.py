"""Invariant checks — the functional-world analog of the reference's memory
sanitizers (SURVEY.md §5 "race detection / sanitizers").

The reference guards its slab allocator with double-free and out-of-slots
assertions and null-pointer canaries (``tree.jl:80,92,103,115``,
``NUTS.jl:100-111``).  XLA's functional model removes those failure classes;
what remains worth asserting are the *algorithmic* invariants of the sampler
output.  ``validate_result`` checks them post-hoc (host-side, cheap); use in
tests, debugging sessions, and long-run monitoring.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..core.state import Termination, TreeStats


class InvariantViolation(AssertionError):
    pass


def validate_tree_stats(stats: TreeStats, max_depth: int = 10) -> List[str]:
    """Return a list of violated invariants (empty = clean)."""
    problems = []
    term = np.asarray(stats.termination)
    tl = np.asarray(stats.term_left)
    tr = np.asarray(stats.term_right)
    depth = np.asarray(stats.depth)
    steps = np.asarray(stats.steps)
    acc = np.asarray(stats.acceptance_rate)
    energy = np.asarray(stats.energy)

    if not np.all(np.isin(term, [Termination.MAX_DEPTH, Termination.DIVERGENCE,
                                 Termination.TURNING])):
        problems.append("unknown termination code")
    if not np.all((acc >= 0) & (acc <= 1)):
        problems.append("acceptance rate outside [0, 1]")
    if not np.all((depth >= 0) & (depth <= max_depth)):
        problems.append(f"depth outside [0, {max_depth}]")
    # a depth-d tree visited at least 2^d - 1 leaves
    if not np.all(steps >= (1 << np.minimum(depth, 30)) - 1):
        problems.append("steps < 2^depth - 1 (impossible tree)")
    if not np.all(steps <= (1 << max_depth) - 1):
        problems.append("steps exceed the max-depth budget")
    # InvalidTree encoding (tree.jl:269-300): divergence left==right;
    # max-depth sentinel (1, 0); turning left < right
    div = term == Termination.DIVERGENCE
    if not np.all(tl[div] == tr[div]):
        problems.append("divergence record with left != right")
    md = term == Termination.MAX_DEPTH
    if not (np.all(tl[md] == 1) and np.all(tr[md] == 0)):
        problems.append("max-depth record != (1, 0) sentinel")
    turn = term == Termination.TURNING
    if not np.all(tl[turn] < tr[turn]):
        problems.append("turning record without left < right")
    if np.any(np.isnan(energy)):
        problems.append("NaN in recorded energies")
    return problems


def validate_result(result, max_depth: int = 10, strict: bool = True):
    """Validate an :class:`MCMCResult`: finite draws + tree-stat invariants.

    With ``strict`` raises :class:`InvariantViolation`; otherwise returns the
    problem list.
    """
    problems = validate_tree_stats(result.stats, max_depth)
    draws = np.asarray(result.draws)
    if not np.all(np.isfinite(draws)):
        problems.append("non-finite values in chain draws")
    if strict and problems:
        raise InvariantViolation("; ".join(problems))
    return problems
