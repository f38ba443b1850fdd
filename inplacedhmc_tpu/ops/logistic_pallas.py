"""Fused Pallas value+gradient kernel for Bayesian logistic regression.

The flagship MXU kernel (SURVEY.md §7 step 6): for the logistic model the
log-density and its gradient are

    eta  = q @ X^T                      [C, N]   (MXU)
    logp = sum_i w_i (y_i eta_i - log(1+e^eta_i)) - 0.5 s2 ||q||^2
    grad = (w*(y - sigmoid(eta))) @ X - s2 q     (MXU)

Under plain autodiff XLA materializes ``eta`` (and the sigmoid residual) in
HBM between the forward and backward matmuls — two+ round trips of a [C, N]
array.  This kernel streams X/y tiles through VMEM once per chain-tile and
accumulates ``logp`` and ``grad`` on-chip, flash-attention style: the [C, N]
intermediate never exists.

Grid: ``(C/BC, N/BN)``; the output blocks depend only on the chain tile, so
Pallas keeps them resident in VMEM while the N axis streams (revisiting
pattern).  Observation rows are masked with a 0/1 weight vector so padding to
tile multiples contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import chain_tiles
from .common import round_up as _round_up


#: MXU pass counts per precision: "default" = one bf16 pass, "high" = three
#: bf16 passes via an explicit hi/lo bf16 split (Mosaic rejects
#: lax.Precision.HIGH, so the classic split-float trick is hand-rolled:
#: a = a_hi + a_lo with both bf16 leaves eta error ~2^-17 relative once the
#: lo*lo term is dropped — f32-grade), "highest" = six passes (exact f32).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dnums):
    """f32-grade [a contract b] in three 1-pass bf16 MXU products.

    precision is pinned to DEFAULT explicitly: the package flips the global
    matmul default to f32 (``__init__.py``), and bf16 inputs with an implied
    HIGHEST request is exactly the combination these single-pass products
    must not inherit."""
    prec = jax.lax.Precision.DEFAULT
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    acc = jax.lax.dot_general(a_hi, b_hi, dnums, precision=prec,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(a_lo, b_hi, dnums, precision=prec,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(a_hi, b_lo, dnums, precision=prec,
                               preferred_element_type=jnp.float32)
    return acc


def _make_fused_kernel(grad_bf16: bool, ablate_trans: bool = False,
                       fwd_precision: str = "high",
                       bwd_precision: str = "default"):
    """``ablate_trans``: INTERNAL measurement hook
    (benchmarks/logistic_mxu_sweep.py) replacing the exp/log1p block with
    linear stand-ins of the same shape — the resulting kernel computes the
    WRONG density; it exists only to attribute kernel time between the two
    MXU contractions and the [BC, BN] VPU transcendental block.

    ``fwd_precision``/``bwd_precision``: MXU precision of the eta and grad
    contractions.  This is load-bearing for CORRECTNESS, not just speed:
    jax's DEFAULT on TPU is a single bf16 pass, which puts O(1e-2) relative
    error in every eta element, and summing ~1e4 such log-likelihood terms
    leaves O(1) ABSOLUTE error in logp — a deterministic perturbation of the
    target density itself (measured: benchmarks/logistic_precision_ab.json).
    The forward therefore defaults to HIGH (3-pass bf16, f32-grade eta).
    The backward stays DEFAULT: a perturbed-but-deterministic gradient field
    only shifts acceptance, never the stationary distribution (leapfrog stays
    reversible/volume-preserving and energies are f32) — same argument as
    ``grad_bf16``."""
    fprec = None if fwd_precision == "high" else _PRECISIONS[fwd_precision]
    bprec = None if bwd_precision == "high" else _PRECISIONS[bwd_precision]

    def _kernel(q_ref, x_ref, yw_ref, s2_ref, logp_ref, grad_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            logp_ref[:] = jnp.zeros_like(logp_ref)
            grad_ref[:] = jnp.zeros_like(grad_ref)

        q = q_ref[:]                     # [BC, D]
        x = x_ref[:]                     # [BN, D]
        y = yw_ref[0, :]                 # [BN]
        w = yw_ref[1, :]                 # [BN]

        fwd_dnums = (((1,), (1,)), ((), ()))
        if fprec is None:
            eta = _dot3(q, x, fwd_dnums)                           # [BC, BN]
        else:
            eta = jax.lax.dot_general(q, x, fwd_dnums,
                                      preferred_element_type=jnp.float32,
                                      precision=fprec)             # [BC, BN]
        # one transcendental pair serves both the value and the gradient:
        # t = e^{-|eta|} gives log(1+e^eta) = max(eta,0) + log1p(t) (stable)
        # and sigmoid(eta) = 1/(1+t) for eta>=0, t/(1+t) otherwise — saves a
        # second exp per element on the VPU (the [BC, BN] elementwise block is
        # a material fraction of kernel time next to the two MXU matmuls)
        if ablate_trans:
            t = 0.5 * eta                      # linear stand-in, same shape
            ll = y[None, :] * eta - (jnp.maximum(eta, 0.0) + t)
        else:
            t = jnp.exp(-jnp.abs(eta))
            ll = y[None, :] * eta - (jnp.maximum(eta, 0.0) + jnp.log1p(t))
        logp_ref[:] += jnp.sum(ll * w[None, :], axis=1, keepdims=True)

        inv1pt = 1.0 / (1.0 + t)
        sig = jnp.where(eta >= 0.0, inv1pt, t * inv1pt)
        resid = (y[None, :] - sig) * w[None, :]                     # [BC, BN]
        if grad_bf16:
            # bf16 inputs for the backward contraction, f32 accumulate: a
            # single native MXU pass instead of the multi-pass f32 product.
            # EXACTNESS-PRESERVING: leapfrog is reversible and
            # volume-preserving for any deterministic gradient field, and
            # energies/multinomial weights stay f32, so the sampler still
            # targets the exact posterior — a slightly perturbed gradient
            # only (marginally) lowers acceptance. logp is NOT touched.
            resid = resid.astype(jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
        bwd_dnums = (((1,), (0,)), ((), ()))
        if bprec is None:
            grad_ref[:] += _dot3(resid, x, bwd_dnums)
        else:
            grad_ref[:] += jax.lax.dot_general(
                resid, x, bwd_dnums, preferred_element_type=jnp.float32,
                precision=bprec)

        @pl.when(j == nj - 1)
        def _prior():
            s2 = s2_ref[0, 0]
            logp_ref[:] += -0.5 * s2 * jnp.sum(q * q, axis=1, keepdims=True)
            grad_ref[:] += -s2 * q

    return _kernel


_kernel = _make_fused_kernel(False)  # default f32 kernel (back-compat name)


def _make_packed_kernel(ablate_trans: bool = False):
    """Packed split-bf16 forward (``fwd_precision="packed"``, D <= 64 only).

    The contraction depth D pads to 128 MXU lanes whatever we do, so for
    D <= 64 the dead lanes can carry the split-float correction for free:

      qp = [q_hi | q_lo]   (bf16, lanes 0..D-1 and 64..64+D-1)
      xp = [x_hi | x_hi]   (bf16, same lane groups)
      xl = [x_lo | 0   ]   (bf16)

      eta = qp·xp + qp·xl = (q_hi·x_hi + q_lo·x_hi) + q_hi·x_lo

    — the same three split products as ``_dot3`` but in TWO 1-pass bf16
    matmuls of the shape the padded single-pass kernel already paid for,
    with the first two terms summed inside the MXU's f32 accumulator.
    The backward streams plain f32 x alongside the packed copies so it
    matches the 3-pass kernel's backward exactly.  Status: NOT the default.
    Static accuracy matches the 3-pass split and the kernel is ~4% faster
    per eval (benchmarks/logistic_precision_ab.json), but the shared-eps
    A/B measured an acceptance cost (0.794 vs 0.837) that nets out negative
    on ESS/s (benchmarks/logistic_bwd_ab.json) — the MXU-interleaved
    accumulation appears to leave a less trajectory-correlated error
    landscape, so energy errors cancel less over a leapfrog path.
    """
    def _kernel(q_ref, qp_ref, xp_ref, xl_ref, x_ref, yw_ref, s2_ref,
                logp_ref, grad_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            logp_ref[:] = jnp.zeros_like(logp_ref)
            grad_ref[:] = jnp.zeros_like(grad_ref)

        prec = jax.lax.Precision.DEFAULT
        qp = qp_ref[:]                   # [BC, 128] bf16 packed hi|lo
        xp = xp_ref[:]                   # [BN, 128] bf16 packed hi|hi
        y = yw_ref[0, :]                 # [BN]
        w = yw_ref[1, :]                 # [BN]

        dn = (((1,), (1,)), ((), ()))
        eta = jax.lax.dot_general(qp, xp, dn, precision=prec,
                                  preferred_element_type=jnp.float32)
        eta += jax.lax.dot_general(qp, xl_ref[:], dn, precision=prec,
                                   preferred_element_type=jnp.float32)

        if ablate_trans:
            t = 0.5 * eta
            ll = y[None, :] * eta - (jnp.maximum(eta, 0.0) + t)
        else:
            t = jnp.exp(-jnp.abs(eta))
            ll = y[None, :] * eta - (jnp.maximum(eta, 0.0) + jnp.log1p(t))
        logp_ref[:] += jnp.sum(ll * w[None, :], axis=1, keepdims=True)

        inv1pt = 1.0 / (1.0 + t)
        sig = jnp.where(eta >= 0.0, inv1pt, t * inv1pt)
        resid = (y[None, :] - sig) * w[None, :]                     # [BC, BN]
        grad_ref[:] += jax.lax.dot_general(
            resid, x_ref[:], (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

        @pl.when(j == nj - 1)
        def _prior():
            q = q_ref[:]                 # [BC, 128] f32 (prior term only)
            s2 = s2_ref[0, 0]
            logp_ref[:] += -0.5 * s2 * jnp.sum(q * q, axis=1, keepdims=True)
            grad_ref[:] += -s2 * q

    return _kernel


@functools.partial(jax.jit, static_argnames=("block_c", "block_n", "interpret",
                                             "ablate_trans"))
def _logistic_value_and_grad_packed(q, qp, xp, xl, x, yw, s2, block_c: int,
                                    block_n: int, interpret: bool = False,
                                    ablate_trans: bool = False):
    cpad, dpad = q.shape
    npad = xp.shape[0]
    grid = (cpad // block_c, npad // block_n)
    logp, grad = pl.pallas_call(
        _make_packed_kernel(ablate_trans),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_c, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_c, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * cpad * npad * dpad,
            bytes_accessed=4 * cpad * dpad * 2 + 2 * grid[0] * npad * dpad * 2,
            transcendentals=2 * cpad * npad,
        ),
        interpret=interpret,
    )(q, qp, xp, xl, x, yw, s2)
    return logp[:, 0], grad


@functools.partial(jax.jit, static_argnames=("block_c", "block_n", "interpret",
                                             "grad_bf16", "ablate_trans",
                                             "fwd_precision", "bwd_precision"))
def _logistic_value_and_grad_padded(q, x, yw, s2, block_c: int, block_n: int,
                                    interpret: bool = False,
                                    grad_bf16: bool = False,
                                    ablate_trans: bool = False,
                                    fwd_precision: str = "high",
                                    bwd_precision: str = "default"):
    cpad, dpad = q.shape
    npad = x.shape[0]
    grid = (cpad // block_c, npad // block_n)
    logp, grad = pl.pallas_call(
        _make_fused_kernel(grad_bf16, ablate_trans, fwd_precision,
                           bwd_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_c, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_c, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((cpad, dpad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * cpad * npad * dpad,
            bytes_accessed=4 * (cpad * dpad * 2 + grid[0] * npad * dpad),
            transcendentals=2 * cpad * npad,
        ),
        interpret=interpret,
    )(q, x, yw, s2)
    return logp[:, 0], grad


def make_logistic_potential(x, y, inv_var: float,
                            block_c: int = 512, block_n: int = 1024,
                            interpret: bool = False,
                            grad_bf16: bool = False,
                            _ablate_trans: bool = False,
                            fwd_precision: str = "high",
                            bwd_precision: str = "default"):
    """Build a batched ``q [C, D] -> (logp [C], grad [C, D])`` potential using
    the fused kernel.  Data is padded once at build time; chains are padded
    per call.  Set ``interpret=True`` for CPU testing.

    ``grad_bf16``: run the backward (gradient) contraction with bf16 inputs
    and f32 accumulation.  Preserves exactness — energies and the log density
    stay f32, and HMC is valid for any deterministic gradient field — while
    roughly halving the MXU cost of the backward matmul."""
    # validate the precision knobs up front (a typo'd fused_opts value would
    # otherwise surface as an opaque KeyError deep in the jitted builder):
    # "high3" is the explicit alias of the default 3-pass in-kernel split
    allowed_fwd = ("default", "high", "high3", "highest", "packed")
    allowed_bwd = ("default", "high", "high3", "highest")
    if fwd_precision not in allowed_fwd:
        raise ValueError(f"fwd_precision {fwd_precision!r} not in "
                         f"{allowed_fwd}")
    if bwd_precision not in allowed_bwd:
        raise ValueError(f"bwd_precision {bwd_precision!r} not in "
                         f"{allowed_bwd}")
    if bwd_precision == "high3":
        bwd_precision = "high"
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = x.shape
    dpad = _round_up(d, 128)
    npad = _round_up(n, block_n)
    x_p = jnp.zeros((npad, dpad), jnp.float32).at[:n, :d].set(x)
    yw = jnp.zeros((2, npad), jnp.float32)
    yw = yw.at[0, :n].set(y).at[1, :n].set(1.0)
    s2 = jnp.asarray([[inv_var]], jnp.float32)

    # "packed" = 2-pass split riding the dead contraction lanes (D <= 64).
    # Same static accuracy as the 3-pass split and ~4% faster per eval, but
    # the shared-eps A/B measured a real acceptance cost (0.794 vs 0.837,
    # benchmarks/logistic_bwd_ab.json) that nets out NEGATIVE on ESS/s
    # (2.01M vs 2.13M) — the MXU-interleaved accumulation evidently leaves a
    # less trajectory-correlated error landscape, so energy errors cancel
    # less along a leapfrog path.  "high" therefore stays the 3-pass
    # in-kernel split ("high3" is its explicit alias); "packed" remains an
    # opt-in measurement arm.
    packed_ok = (d <= 64 and dpad == 128 and not grad_bf16
                 and bwd_precision == "default")
    if fwd_precision == "packed" and not packed_ok:
        # must survive `python -O`: with d > 64 the .at[:, 64:64+d] packing
        # silently clips at lane 128 and overlapping hi/lo lanes compute a
        # wrong density with no error
        raise ValueError("packed forward needs D <= 64, grad_bf16=False, "
                         "bwd_precision='default' "
                         f"(got D={d}, grad_bf16={grad_bf16}, "
                         f"bwd_precision={bwd_precision!r})")
    use_packed = fwd_precision == "packed"
    if fwd_precision == "high3":
        fwd_precision = "high"

    if use_packed:
        x_hi = x_p.astype(jnp.bfloat16)
        x_lo = (x_p - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xp = jnp.zeros((npad, dpad), jnp.bfloat16)
        xp = xp.at[:, :d].set(x_hi[:, :d]).at[:, 64:64 + d].set(x_hi[:, :d])
        xl = jnp.zeros((npad, dpad), jnp.bfloat16).at[:, :d].set(x_lo[:, :d])

        def potential(q):
            c, dq = q.shape
            assert dq == d, f"dim mismatch: {dq} != {d}"
            cpad, bc = chain_tiles(c, block_c)
            q_p = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(
                q.astype(jnp.float32))
            q_hi = q_p.astype(jnp.bfloat16)
            q_lo = (q_p - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            qp = jnp.zeros((cpad, dpad), jnp.bfloat16)
            qp = qp.at[:, :d].set(q_hi[:, :d]).at[:, 64:64 + d].set(
                q_lo[:, :d])
            logp, grad = _logistic_value_and_grad_packed(
                q_p, qp, xp, xl, x_p, yw, s2, bc, block_n, interpret,
                _ablate_trans)
            logp = logp[:c]
            grad = grad[:c, :d]
            ok = jnp.isfinite(logp)
            logp = jnp.where(ok, logp, -jnp.inf)
            grad = jnp.where(ok[:, None] & jnp.isfinite(grad), grad, 0.0)
            return logp.astype(q.dtype), grad.astype(q.dtype)

        return potential

    def potential(q):
        c, dq = q.shape
        assert dq == d, f"dim mismatch: {dq} != {d}"
        cpad, bc = chain_tiles(c, block_c)
        q_p = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :d].set(
            q.astype(jnp.float32))
        logp, grad = _logistic_value_and_grad_padded(q_p, x_p, yw, s2, bc,
                                                     block_n, interpret,
                                                     grad_bf16, _ablate_trans,
                                                     fwd_precision,
                                                     bwd_precision)
        logp = logp[:c]
        grad = grad[:c, :d]
        ok = jnp.isfinite(logp)
        logp = jnp.where(ok, logp, -jnp.inf)
        grad = jnp.where(ok[:, None] & jnp.isfinite(grad), grad, 0.0)
        return logp.astype(q.dtype), grad.astype(q.dtype)

    return potential
