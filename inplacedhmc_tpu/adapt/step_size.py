"""Step-size adaptation: dual averaging + vectorized initial-eps search.

TPU rebuild of ``/root/reference/src/stepsize.jl``.  Dual averaging is the
identical scalar recurrence, shape-polymorphic: per-chain ``[C]`` states, or
a pooled scalar state when the CALLER pre-reduces the acceptance to a
cross-chain (and, under ``shard_map``/GSPMD, cross-device) mean — see
``adapt/warmup.py`` (pooled mode), the collective capability named by the
north star (SURVEY.md §2).

The initial step-size search is the reference's bracket-then-bisect
(``stepsize.jl:51-126``) re-expressed as a lockstep ``lax.while_loop`` whose
every iteration evaluates the local acceptance ratio for *all* chains with one
batched leapfrog step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DualAveraging, InitialStepsizeSearch
from ..core.hamiltonian import joint_logdensity
from ..core.metric import Metric
from ..core.state import PhasePoint
from ..ops.integrator import leapfrog


class DualAveragingState(NamedTuple):
    """Per-chain (or pooled scalar) dual-averaging state (``stepsize.jl:196-202``)."""

    mu: jnp.ndarray
    m: jnp.ndarray        # iteration counter (shared scalar int32)
    h_bar: jnp.ndarray
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray


def da_init(params: DualAveraging, eps: jnp.ndarray) -> DualAveragingState:
    """``mu = log(10) + log(eps0)`` etc. (``stepsize.jl:208-212``)."""
    log_eps = jnp.log(eps)
    z = jnp.zeros_like(log_eps)
    return DualAveragingState(mu=jnp.log(10.0) + log_eps,
                              m=jnp.asarray(0, jnp.int32),
                              h_bar=z, log_eps=log_eps, log_eps_bar=z)


def da_update(params: DualAveraging, s: DualAveragingState,
              accept: jnp.ndarray) -> DualAveragingState:
    """One dual-averaging step (``stepsize.jl:220-229``)."""
    m = s.m + 1
    mf = m.astype(s.h_bar.dtype)
    h_bar = s.h_bar + (params.delta - accept - s.h_bar) / (mf + params.t0)
    log_eps = s.mu - jnp.sqrt(mf) / params.gamma * h_bar
    log_eps_bar = s.log_eps_bar + mf ** (-params.kappa) * (log_eps - s.log_eps_bar)
    return DualAveragingState(mu=s.mu, m=m, h_bar=h_bar,
                              log_eps=log_eps, log_eps_bar=log_eps_bar)


def da_current_eps(s: DualAveragingState) -> jnp.ndarray:
    """Step size while tuning (``stepsize.jl:235``)."""
    return jnp.exp(s.log_eps)


def da_final_eps(s: DualAveragingState) -> jnp.ndarray:
    """Smoothed final step size after the window (``stepsize.jl:241``)."""
    return jnp.exp(s.log_eps_bar)


# ---------------------------------------------------------------------------
# initial step-size search
# ---------------------------------------------------------------------------

class _SearchCarry(NamedTuple):
    phase: jnp.ndarray   # [C] int32: 0 = bracketing, 1 = bisecting, 2 = done
    eps: jnp.ndarray     # [C] current candidate
    eps_lo: jnp.ndarray  # [C] bisection bracket: A(eps_lo) > a_max
    eps_hi: jnp.ndarray  # [C] A(eps_hi) < a_min
    grow: jnp.ndarray    # [C] bool: bracketing upward (A > a_max -> grow eps)
    it: jnp.ndarray      # scalar int32


def local_acceptance_ratio(potential: Callable, metric: Metric,
                           z: PhasePoint) -> Callable:
    """``A(eps) = exp(logdensity(H, leapfrog(z, eps)) - logdensity(H, z))``
    (``stepsize.jl:150-160``), batched; non-finite ratios become 0."""
    target = joint_logdensity(metric, z.Q.logp, z.p)

    def a_of(eps):
        z1 = leapfrog(potential, metric, z, eps)
        val = joint_logdensity(metric, z1.Q.logp, z1.p) - target
        val = jnp.where(jnp.isnan(val), -jnp.inf, val)
        return jnp.exp(jnp.minimum(val, 50.0))  # cap to avoid inf ratios

    return a_of


def find_initial_stepsize(params: InitialStepsizeSearch, potential: Callable,
                          metric: Metric, z: PhasePoint) -> jnp.ndarray:
    """Vectorized bracket+bisect (``stepsize.jl:111-126``): per-chain eps with
    ``A(eps) in [a_min, a_max]``, all chains searched in lockstep."""
    dtype = z.Q.q.dtype
    c = z.Q.q.shape[0]
    a_of = local_acceptance_ratio(potential, metric, z)

    eps0 = jnp.full((c,), params.eps0, dtype)
    a0 = a_of(eps0)
    in_band = jnp.logical_and(a0 >= params.a_min, a0 <= params.a_max)
    grow = a0 > params.a_max

    carry = _SearchCarry(
        phase=jnp.where(in_band, 2, 0).astype(jnp.int32),
        eps=eps0,
        eps_lo=eps0, eps_hi=eps0, grow=grow,
        it=jnp.asarray(0, jnp.int32),
    )
    max_it = params.maxiter_crossing + params.maxiter_bisect

    def cond(s: _SearchCarry):
        return jnp.logical_and(jnp.any(s.phase < 2), s.it < max_it)

    def body(s: _SearchCarry) -> _SearchCarry:
        bracketing = s.phase == 0
        bisecting = s.phase == 1
        factor = jnp.where(s.grow, params.c, 1.0 / params.c).astype(dtype)
        cand = jnp.where(bracketing, s.eps * factor,
                         jnp.where(bisecting, 0.5 * (s.eps_lo + s.eps_hi), s.eps))
        a = a_of(cand)  # phase-2 lanes compute but never consume this

        in_band = jnp.logical_and(a >= params.a_min, a <= params.a_max)

        # bracketing: crossed when the acceptance passed the target threshold
        # (stepsize.jl:51-72: s*(A - a) <= 0 with a = a_max when growing down
        # in A, a_min when shrinking up)
        thresh = jnp.where(s.grow, params.a_max, params.a_min).astype(dtype)
        sign = jnp.where(s.grow, 1.0, -1.0).astype(dtype)
        crossed = sign * (a - thresh) <= 0

        # new bisection bracket on crossing: the side with A > a_max is lo.
        # When growing (A was > a_max): prev eps has A > a_max -> lo = prev, hi = cand.
        # When shrinking (A was < a_min): prev eps has A < a_min -> hi = prev, lo = cand.
        lo_cross = jnp.where(s.grow, s.eps, cand)
        hi_cross = jnp.where(s.grow, cand, s.eps)

        br = bracketing
        done_now = jnp.logical_and(br, jnp.logical_and(crossed, in_band))
        to_bisect = jnp.logical_and(br, jnp.logical_and(crossed, jnp.logical_not(in_band)))
        keep_bracketing = jnp.logical_and(br, jnp.logical_not(crossed))
        # enforce the per-phase budget the config names: chains still
        # bracketing after maxiter_crossing iterations switch to bisection
        # over the last (eps, cand) interval instead of silently spending
        # the bisect budget on more bracketing
        force_bisect = jnp.logical_and(
            keep_bracketing, s.it + 1 >= params.maxiter_crossing)
        keep_bracketing = jnp.logical_and(keep_bracketing,
                                          jnp.logical_not(force_bisect))

        # bisection update (stepsize.jl:83-102)
        bi = bisecting
        bi_done = jnp.logical_and(bi, in_band)
        hi_new = jnp.where(jnp.logical_and(bi, a < params.a_min), cand, s.eps_hi)
        lo_new = jnp.where(jnp.logical_and(bi, a > params.a_max), cand, s.eps_lo)

        phase = s.phase
        phase = jnp.where(done_now | bi_done, 2, phase)
        phase = jnp.where(to_bisect | force_bisect, 1, phase)

        eps = jnp.where(done_now | bi_done, cand,
                        jnp.where(keep_bracketing, cand, s.eps))
        eps_lo = jnp.where(to_bisect, lo_cross,
                           jnp.where(force_bisect, jnp.minimum(s.eps, cand),
                                     lo_new))
        eps_hi = jnp.where(to_bisect, hi_cross,
                           jnp.where(force_bisect, jnp.maximum(s.eps, cand),
                                     hi_new))

        return _SearchCarry(phase=phase, eps=eps,
                            eps_lo=eps_lo, eps_hi=eps_hi, grow=s.grow,
                            it=s.it + 1)

    out = lax.while_loop(cond, body, carry)
    # chains that never converged (pathological target): fall back to the
    # bisection midpoint — the reference errors here (stepsize.jl:70-71);
    # we prefer a usable eps and let dual averaging correct it.
    eps = jnp.where(out.phase == 2, out.eps, 0.5 * (out.eps_lo + out.eps_hi))
    return eps
