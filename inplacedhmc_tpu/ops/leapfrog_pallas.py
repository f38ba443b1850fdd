"""Fused Pallas leapfrog kernel for diagonal-Gaussian-gradient models.

The flagship bandwidth kernel (BASELINE.json north star; SURVEY.md C7): for
models whose gradient is ``-Lambda * q`` (standard/diagonal normal targets),
one whole velocity-Verlet step

    p_mid = p - (eps/2) * Lambda * q
    q'    = q + eps * Minv * p_mid
    p'    = p_mid - (eps/2) * Lambda * q'
    logp' = -0.5 * sum(Lambda * q'^2)
    kin'  = 0.5 * sum(Minv * p'^2)

fuses into a single VMEM pass: two [C, D] reads (q, p) and four [C, D]
writes (q', p', grad', p♯') plus two [C, 1] reductions — 6 [C, D] arrays of
HBM traffic per step, the figure the roofline harness
(benchmarks/roofline.py) and the kernel's own cost_estimate use.  The jnp
reference path costs ~2x that across multiple XLA kernels; the reference's
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

from .common import chain_tiles
from .common import round_up as _round_up


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


def _multi_step_kernel(k_steps: int):
    """k dependent velocity-Verlet steps per launch, state held in VMEM.

    The single-step kernel pays 6 [C, D] HBM transfers per step; here the
    trajectory stays resident, so HBM traffic is 4 [C, D] arrays per *launch*
    (q/p in, q/p out) amortized over ``k_steps`` — the standalone-harness
    analog of how the whole-tree kernel already runs its inner steps
    launch-free.  This is the kernel that makes the standalone roofline
    number representative (round-1 verdict #2); the reference's fused loop
    is ``kinetic_energy.jl:126-163``.
    """

    def kernel(q_ref, p_ref, eps_ref, lam_ref, minv_ref, qo_ref, po_ref):
        lam = lam_ref[0:1, :]
        minv = minv_ref[0:1, :]
        eps = eps_ref[:]
        half = 0.5 * eps
        qo_ref[:] = q_ref[:]
        po_ref[:] = p_ref[:]

        def body(i, carry):
            q = qo_ref[:]
            p = po_ref[:]
            p_mid = p - half * (lam * q)
            q_new = q + eps * (minv * p_mid)
            p_new = p_mid - half * (lam * q_new)
            qo_ref[:] = q_new
            po_ref[:] = p_new
            return 0

        jax.lax.fori_loop(0, k_steps, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("k_steps", "block_c", "interpret"))
def multi_step_leapfrog(q, p, eps, lam, minv, k_steps: int,
                        block_c: int = 1024, interpret: bool = False):
    """Run ``k_steps`` dependent leapfrog steps in one kernel launch.
    ``q``/``p``: [C, D] (lane-padded), ``eps``: [C, 1] signed, ``lam``/
    ``minv``: [1, D].  Returns ``(q', p')``.  The chain count must tile
    evenly into ``block_c`` blocks — a truncating grid would silently skip
    the remainder rows and return garbage for those chains."""
    cpad, dpad = q.shape
    bc = min(block_c, cpad)
    if cpad % bc:
        raise ValueError(
            f"chain count {cpad} does not tile into blocks of {bc}; pad the "
            f"batch (see ops.common.chain_tiles) or pass a dividing block_c")
    grid = (cpad // bc,)
    vec = pl.BlockSpec((bc, dpad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, dpad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _multi_step_kernel(k_steps),
        grid=grid,
        in_specs=[vec, vec, col, row, row],
        out_specs=[vec, vec],
        out_shape=[jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
                   jax.ShapeDtypeStruct((cpad, dpad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * cpad * dpad * k_steps,
            bytes_accessed=4 * cpad * dpad * 4,
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

    Note: each call pads inputs and slices outputs (the XLA tree carries
    unpadded arrays), which adds real copies around the fused pass — the
    whole-tree kernel (ops/tree_pallas.py) pads once per transition and is
    the launch-free formulation; this step kernel is the fallback for the
    XLA tree path.
    """
    precision = jnp.asarray(precision, jnp.float32)
    d = precision.shape[0]
    dpad = _round_up(d, 128)
    lam = jnp.zeros((1, dpad), jnp.float32).at[0, :d].set(precision)
    minv = jnp.zeros((1, dpad), jnp.float32).at[0, :d].set(
        jnp.asarray(metric_inv, jnp.float32))

    def step(q, p, eps_signed):
        c = q.shape[0]
        cpad, bc = chain_tiles(c, block_c)
        qp = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(q)
        pp = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(p)
        ep = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(eps_signed)
        qn, pn, gn, ps, lp, kin = _fused_leapfrog_padded(qp, pp, ep, lam, minv,
                                                         bc, interpret)
        return (qn[:c, :d], pn[:c, :d], gn[:c, :d], lp[:c, 0], kin[:c, 0],
                ps[:c, :d])

    return step
