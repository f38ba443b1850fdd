"""Hamiltonian assembly: batched log-density evaluation and joint density.

TPU equivalent of ``evaluate_ℓ!`` / ``logdensity(H, z)``
(``/root/reference/src/kinetic_energy.jl:72-112``): the model is a pure
``logp(q) -> scalar`` function; ``jax.vmap(jax.value_and_grad(...))`` replaces
the in-place ``logdensity_and_gradient!`` interface, and non-finite values are
mapped to ``-inf`` so they surface as divergences instead of crashing.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .metric import Metric, kinetic_energy
from .state import EvalPoint


def batched_logdensity_and_grad(logp: Callable) -> Callable:
    """Turn a scalar ``logp([D])`` into a guarded batched ``[C, D] -> ([C], [C, D])``.

    Non-finite log densities become ``-inf`` and their gradients are zeroed —
    the divergence-safe sentinel semantics of ``evaluate_ℓ!``
    (``kinetic_energy.jl:80-84``; the reference stores ``q`` as a placeholder
    gradient, we store zeros so masked lockstep chains stay NaN-free).
    """
    vg = jax.vmap(jax.value_and_grad(logp))

    def evaluate(q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        val, grad = vg(q)
        # a non-finite GRADIENT with a finite value (autodiff where/overflow
        # traps) must also map to the -inf sentinel: zeroing just the bad
        # components would let the tree integrate corrupted dynamics with no
        # divergence flag (the Pallas kernel flags the same case, and the
        # two engines must agree)
        ok = jnp.logical_and(jnp.isfinite(val),
                             jnp.all(jnp.isfinite(grad), axis=-1))
        val = jnp.where(ok, val, -jnp.inf)
        grad = jnp.where(ok[..., None], grad, jnp.zeros_like(grad))
        # pin to the STATE dtype: under x64 mode a model with f64 constants
        # silently promotes logp/grad to f64, which then breaks the f32
        # while_loop carries in the tree (dtype of the sampler is q's, not
        # the model data's)
        return val.astype(q.dtype), grad.astype(q.dtype)

    return evaluate


def evaluate(potential: Callable, q: jnp.ndarray) -> EvalPoint:
    """Build an :class:`EvalPoint` at ``q`` (``kinetic_energy.jl:72-85``)."""
    logp, grad = potential(q)
    return EvalPoint(q=q, logp=logp, grad=grad)


def joint_logdensity(metric: Metric, logp_q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``logdensity(H, z) = ℓ(q) - K(p)`` with ``-inf`` guards.

    Mirrors ``kinetic_energy.jl:107-112``: a non-finite ``ℓ(q)`` or a
    non-finite kinetic energy (NaN/Inf leaked into the position during
    leapfrog) both yield ``-inf``, making the point divergent.
    """
    k = kinetic_energy(metric, p)
    val = logp_q - jnp.where(jnp.isfinite(k), k, jnp.inf)
    return jnp.where(jnp.isfinite(val), val, -jnp.inf)
