"""Velocity-Verlet leapfrog integrator (jnp reference implementation).

Math identical to the reference's fused kernels
(``/root/reference/src/kinetic_energy.jl:126-195``)::

    p_mid = p + eps/2 * grad(q)
    q'    = q + eps * M^-1 * p_mid
    p'    = p_mid + eps/2 * grad(q')

batched over chains with a (possibly per-chain, signed) step size.  XLA fuses
the elementwise arithmetic into the gradient evaluation; a hand-fused Pallas
variant for structured models lives in ``ops/leapfrog_pallas.py`` behind an
A/B-testable flag.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..core.metric import Metric, psharp
from ..core.state import EvalPoint, PhasePoint


def leapfrog(potential: Callable, metric: Metric, z: PhasePoint,
             eps: jnp.ndarray) -> PhasePoint:
    """One leapfrog step.  ``eps`` is scalar or ``[C]`` and may be negative.

    Uses the cached gradient in ``z.Q`` so each position is evaluated exactly
    once (the ``EvaluatedLogDensity`` trick, ``hamiltonian.jl:237-248``).
    """
    q, grad, p = z.Q.q, z.Q.grad, z.p
    eps = jnp.asarray(eps, q.dtype)
    eps_b = eps[..., None] if eps.ndim else eps
    half = 0.5 * eps_b
    p_mid = p + half * grad
    q_new = q + eps_b * psharp(metric, p_mid)
    logp_new, grad_new = potential(q_new)
    p_new = p_mid + half * grad_new
    return PhasePoint(Q=EvalPoint(q=q_new, logp=logp_new, grad=grad_new), p=p_new)
