"""Typed option structs — the framework's config surface.

Frozen dataclasses mirroring the reference's keyword-argument option structs
(SURVEY.md §5 "config/flag system"): ``NUTS`` (``NUTS.jl:204-220``),
``DualAveraging`` (``stepsize.jl:173-193``), ``InitialStepsizeSearch``
(``stepsize.jl:16-38``), ``TuningNUTS`` (``warmup.jl:217-234``),
``FindLocalOptimum`` (``warmup.jl:137-150``).  Every reference field is
API surface here; TPU-specific knobs (dtype, pooled adaptation) are additive.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class NUTS:
    """NUTS algorithm configuration (``NUTS.jl:204-220``).

    ``max_depth`` ≤ 30 mirrors the reference's 32-bit direction/occupancy
    budget (``tree.jl:10-13, 132``); ``min_delta`` is the divergence threshold.
    """

    max_depth: int = 10
    min_delta: float = -1000.0

    def __post_init__(self):
        assert 0 < self.max_depth <= 30, "max_depth must be in (0, 30]"
        assert self.min_delta < 0


@dataclasses.dataclass(frozen=True)
class DualAveraging:
    """Hoffman–Gelman (2014) Algorithm 6 parameters (``stepsize.jl:173-193``)."""

    delta: float = 0.8   # target acceptance rate
    gamma: float = 0.05  # regularization scale
    kappa: float = 0.75  # relaxation exponent
    t0: int = 10         # offset

    def __post_init__(self):
        assert 0 < self.delta < 1
        assert self.gamma > 0
        assert 0.5 < self.kappa <= 1
        assert self.t0 >= 0


@dataclasses.dataclass(frozen=True)
class FixedStepsize:
    """No-op step-size adaptation (``stepsize.jl:251-259``)."""


@dataclasses.dataclass(frozen=True)
class InitialStepsizeSearch:
    """Bracket-then-bisect initial step-size finder (``stepsize.jl:16-38``).

    Finds eps with local acceptance ratio in ``[a_min, a_max]`` — stricter than
    Hoffman–Gelman's threshold-crossing, per the reference's note about
    high-curvature posteriors.
    """

    a_min: float = 0.25
    a_max: float = 0.75
    eps0: float = 1.0
    c: float = 2.0
    maxiter_crossing: int = 400
    maxiter_bisect: int = 400

    def __post_init__(self):
        assert 0 < self.a_min < self.a_max < 1
        assert self.eps0 > 0 and self.c > 1


@dataclasses.dataclass(frozen=True)
class FindLocalOptimum:
    """Penalized quasi-Newton warmup initializer (``warmup.jl:137-150``).

    Optimizes ``logp(q) - 0.5 * magnitude_penalty * ||q||^2`` for at most
    ``iterations`` L-BFGS steps; failing chains are restarted from fresh
    random positions with a doubled penalty, up to ``max_retries`` times
    (``warmup.jl:162-171``).
    """

    magnitude_penalty: float = 1e-4
    iterations: int = 50
    max_retries: int = 10


@dataclasses.dataclass(frozen=True)
class TuningNUTS:
    """A stepsize(+metric) tuning window (``warmup.jl:217-234``).

    ``metric`` selects the end-of-window re-estimate: ``"diag"``
    (``Diagonal``), ``"dense"`` (``Symmetric``) or ``None`` (unchanged).
    ``lam`` is the shrinkage regularizer, defaulting to ``5/N``
    (``warmup.jl:229``).
    """

    n: int
    stepsize_adaptation: Union[DualAveraging, FixedStepsize] = DualAveraging()
    metric: Optional[str] = "diag"
    lam: Optional[float] = None
    #: rank of the low-rank+diag metric (``metric="low_rank"`` only)
    rank: int = 16
    #: estimate the metric from streamed O(D)/O(D^2) moments instead of the
    #: stored [N, C, D] window draws — required at 10k-chain x 1k-dim scale
    #: where the window would not fit in HBM
    stream: bool = False

    def __post_init__(self):
        assert self.metric in (None, "diag", "dense", "low_rank")
        assert self.n > 0

    @property
    def lam_value(self) -> float:
        return 5.0 / self.n if self.lam is None else self.lam


WarmupStage = Union[FindLocalOptimum, InitialStepsizeSearch, TuningNUTS, None]


class StepsizeCollapseError(RuntimeError):
    """Adaptation drove the step size out of sane bounds.

    The reference aborts a tuning window when the dual-averaged eps collapses
    (``/root/reference/src/warmup.jl:289-296``: ``ϵ < 1e-10`` throws with the
    offending state).  Here the guard runs in the driver at every window /
    chunk boundary (one scalar fetch) and carries the window's acceptance
    statistics so a 10k-chain run poisoned by one bad window fails loudly
    with a diagnosis instead of sampling at eps ~ 0 for hours.
    """


def default_warmup_stages(
    local_optimization: Optional[FindLocalOptimum] = FindLocalOptimum(),
    stepsize_search: Optional[InitialStepsizeSearch] = InitialStepsizeSearch(),
    metric: str = "diag",
    stepsize_adaptation: DualAveraging = DualAveraging(),
    init_steps: int = 75,
    middle_steps: int = 25,
    doubling_stages: int = 5,
    terminating_steps: int = 50,
    rank: int = 16,
    stream: bool = False,
) -> Tuple[WarmupStage, ...]:
    """The reference's default windowed schedule (``warmup.jl:361-372``):
    optimum → stepsize search → 75 → (25, 50, 100, 200, 400 with metric
    re-estimates) → 50, i.e. 900 warmup transitions by default.
    ``rank`` applies when ``metric="low_rank"``; ``stream=True`` estimates
    metrics from streamed moments instead of stored window draws (the
    memory-bounded mode for huge chain-count × dimension products)."""
    middle = tuple(
        TuningNUTS(n=middle_steps << i, stepsize_adaptation=stepsize_adaptation,
                   metric=metric, rank=rank, stream=stream)
        for i in range(doubling_stages)
    )
    return tuple(
        s for s in (
            local_optimization,
            stepsize_search,
            TuningNUTS(n=init_steps, stepsize_adaptation=stepsize_adaptation, metric=None),
            *middle,
            TuningNUTS(n=terminating_steps, stepsize_adaptation=stepsize_adaptation,
                       metric=None),
        ) if s is not None
    )


def fixed_stepsize_warmup_stages(
    local_optimization: Optional[FindLocalOptimum] = FindLocalOptimum(),
    metric: str = "diag",
    middle_steps: int = 25,
    doubling_stages: int = 5,
) -> Tuple[WarmupStage, ...]:
    """Fixed-ϵ schedule (``warmup.jl:383-389``); requires an initial eps."""
    middle = tuple(
        TuningNUTS(n=middle_steps << i, stepsize_adaptation=FixedStepsize(),
                   metric=metric)
        for i in range(doubling_stages)
    )
    return tuple(s for s in (local_optimization, *middle) if s is not None)
