"""Phase-space and sampler-state pytrees.

TPU-native re-design of the reference's phase-space data model
(``/root/reference/src/hamiltonian.jl:237-276``): instead of raw-pointer
``PtrVector`` views into a per-thread arena, every object is an immutable
pytree of ``[chains, ...]``-batched arrays; XLA buffer donation plays the role
of the in-place updates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class EvalPoint(NamedTuple):
    """A position with its cached log density and gradient.

    Mirrors ``EvaluatedLogDensity`` (``hamiltonian.jl:237-248``): the gradient
    is cached so each position is evaluated exactly once per leapfrog step.

    Shapes: ``q``/``grad`` are ``[C, D]``, ``logp`` is ``[C]``.
    """

    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


class PhasePoint(NamedTuple):
    """Position + momentum, the reference's ``PhasePoint`` (``hamiltonian.jl:265-276``)."""

    Q: EvalPoint
    p: jnp.ndarray


class Termination:
    """Reason a NUTS trajectory stopped.  Integer codes used in ``TreeStats``.

    Encodes the reference's ``InvalidTree`` taxonomy (``tree.jl:269-300``):
    ``MAX_DEPTH`` is the ``REACHED_MAX_DEPTH`` sentinel ``(left,right)=(1,0)``;
    divergence has ``left == right`` (position of the divergent leaf); turning
    has ``left < right`` (the turning subtree's extreme positions).
    """

    MAX_DEPTH = 0
    DIVERGENCE = 1
    TURNING = 2


class TreeStats(NamedTuple):
    """Per-transition diagnostics, struct-of-arrays over chains.

    The vectorized equivalent of ``TreeStatisticsNUTS``
    (``/root/reference/src/NUTS.jl:229-242``); every field is ``[C]``.
    """

    energy: jnp.ndarray          # log density (negative energy) at the proposal
    acceptance_rate: jnp.ndarray
    termination: jnp.ndarray     # Termination.* codes, int32
    term_left: jnp.ndarray       # InvalidTree.left analog, int32
    term_right: jnp.ndarray      # InvalidTree.right analog, int32
    depth: jnp.ndarray           # successful doublings, int32
    steps: jnp.ndarray           # leapfrog steps taken, int32


class WarmupState(NamedTuple):
    """Adaptation state between warmup stages (``warmup.jl:47-51``).

    ``log_eps`` is ``None`` before the initial step-size search; ``metric`` is
    a ``DiagMetric`` or ``DenseMetric`` (see ``core/metric.py``).  This tuple is
    a complete resume point: serializing ``(rng_key, WarmupState, stage index)``
    between stages gives checkpoint/restart for free.
    """

    z: EvalPoint
    metric: NamedTuple
    log_eps: Optional[jnp.ndarray]  # [C] (per-chain) or scalar (pooled)
