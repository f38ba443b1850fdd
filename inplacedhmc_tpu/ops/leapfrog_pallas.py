"""Fused Pallas leapfrog kernel for diagonal-Gaussian-gradient models.

The flagship bandwidth kernel (BASELINE.json north star; SURVEY.md C7): for
models whose gradient is ``-Lambda * q`` (standard/diagonal normal targets),
one whole velocity-Verlet step

    p_mid = p - (eps/2) * Lambda * q
    q'    = q + eps * Minv * p_mid
    p'    = p_mid - (eps/2) * Lambda * q'
    logp' = -0.5 * sum(Lambda * q'^2)
    kin'  = 0.5 * sum(Minv * p'^2)

fuses into a single VMEM pass: two [C, D] reads (q, p), three [C, D]-ish
writes (q', p', grad') plus two [C, 1] reductions.  The jnp reference path
costs ~2x the HBM traffic across multiple XLA kernels; the reference's
equivalent was the hand-written ``@avx`` loop at ``kinetic_energy.jl:126-163``.

The gradient output is ``-Lambda q'`` (recomputed, not stored between steps),
and delta/energy reductions come out fused so the NUTS tree needs no extra
pass over [C, D] for the divergence check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, p_ref, eps_ref, lam_ref, minv_ref,
            qo_ref, po_ref, go_ref, ps_ref, logp_ref, kin_ref):
    q = q_ref[:]                 # [BC, D]
    p = p_ref[:]
    eps = eps_ref[:]             # [BC, 1] signed per-chain step
    lam = lam_ref[0:1, :]        # [1, D]
    minv = minv_ref[0:1, :]      # [1, D]
    half = 0.5 * eps

    p_mid = p - half * (lam * q)
    q_new = q + eps * (minv * p_mid)
    grad_new = -(lam * q_new)
    p_new = p_mid + half * grad_new

    psharp_new = minv * p_new

    qo_ref[:] = q_new
    po_ref[:] = p_new
    go_ref[:] = grad_new
    ps_ref[:] = psharp_new
    logp_ref[:] = -0.5 * jnp.sum(lam * q_new * q_new, axis=1, keepdims=True)
    kin_ref[:] = 0.5 * jnp.sum(p_new * psharp_new, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_c", "interpret"))
def _fused_leapfrog_padded(q, p, eps, lam, minv, block_c: int,
                           interpret: bool = False):
    cpad, dpad = q.shape
    grid = (cpad // block_c,)
    vec_spec = pl.BlockSpec((block_c, dpad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_c, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, dpad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, col_spec, row_spec, row_spec],
        out_specs=[vec_spec, vec_spec, vec_spec, vec_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
            jax.ShapeDtypeStruct((cpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((cpad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * cpad * dpad,
            bytes_accessed=4 * cpad * dpad * 6,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, p, eps, lam, minv)


def make_fused_gaussian_leapfrog(precision, metric_inv, block_c: int = 512,
                                 interpret: bool = False):
    """Build a fused leapfrog for ``grad = -precision * q`` targets.

    Returns ``step(q, p, eps_signed) -> (q', p', grad', logp', kin', psharp')``
    with
    ``q/p``: [C, D], ``eps_signed``: [C].  ``metric_inv`` is the diagonal
    ``M^-1`` ([D]); rebuild the closure when the metric adapts.
    """
    precision = jnp.asarray(precision, jnp.float32)
    d = precision.shape[0]
    dpad = _round_up(d, 128)
    lam = jnp.zeros((1, dpad), jnp.float32).at[0, :d].set(precision)
    minv = jnp.zeros((1, dpad), jnp.float32).at[0, :d].set(
        jnp.asarray(metric_inv, jnp.float32))

    def step(q, p, eps_signed):
        c = q.shape[0]
        cpad = _round_up(max(c, 8), min(block_c, _round_up(c, 8)))
        bc = min(block_c, cpad)
        cpad = _round_up(cpad, bc)
        qp = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(q)
        pp = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(p)
        ep = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(eps_signed)
        qn, pn, gn, ps, lp, kin = _fused_leapfrog_padded(qp, pp, ep, lam, minv,
                                                         bc, interpret)
        return (qn[:c, :d], pn[:c, :d], gn[:c, :d], lp[:c, 0], kin[:c, 0],
                ps[:c, :d])

    return step
