"""In-repo L-BFGS for the typical-set warmup initializer.

Replaces the reference's external ``QuasiNewtonMethods.proptimize!``
(``/root/reference/src/warmup.jl:163``): limited-memory BFGS with two-loop
recursion and backtracking Armijo line search, written as pure ``lax``
control flow and vmapped over chains — every chain optimizes in lockstep.

Used only during warmup ("we don't need to find the mode ... just be in a
reasonable region", ``warmup.jl:144-148``), so robustness beats polish:
non-finite trial points shrink the step, and the curvature pair is skipped
when ``y·s`` is non-positive.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class _LBFGSCarry(NamedTuple):
    q: jnp.ndarray        # [D]
    f: jnp.ndarray        # scalar (objective = negative penalized logp)
    g: jnp.ndarray        # [D]
    s_hist: jnp.ndarray   # [M, D] position differences
    y_hist: jnp.ndarray   # [M, D] gradient differences
    rho: jnp.ndarray      # [M] 1 / (y·s); 0 marks an empty slot
    head: jnp.ndarray     # int32 ring-buffer cursor
    count: jnp.ndarray    # int32 number of valid pairs
    it: jnp.ndarray       # int32


def _two_loop(g, s_hist, y_hist, rho, head, count, memory):
    """Two-loop recursion for the search direction ``-H g``."""
    q = g

    def bwd(i, carry):
        q, alphas = carry
        idx = (head - 1 - i) % memory
        valid = i < count
        r = rho[idx]
        a = jnp.where(valid, r * jnp.dot(s_hist[idx], q), 0.0)
        q = q - a * y_hist[idx] * jnp.where(valid, 1.0, 0.0)
        alphas = alphas.at[idx].set(a)
        return q, alphas

    q, alphas = lax.fori_loop(0, memory, bwd, (q, jnp.zeros((memory,), g.dtype)))

    # initial Hessian scaling gamma = s·y / y·y of the most recent pair
    last = (head - 1) % memory
    yy = jnp.dot(y_hist[last], y_hist[last])
    # rho[last] == 0 only when count == 0, which gamma's guard excludes
    sy = 1.0 / jnp.where(rho[last] != 0, rho[last], 1.0)
    gamma = jnp.where(jnp.logical_and(count > 0, yy > 0), sy / jnp.maximum(yy, 1e-30), 1.0)
    r = gamma * q

    def fwd(i, r):
        idx = (head - count + i) % memory
        valid = i < count
        b = jnp.where(valid, rho[idx] * jnp.dot(y_hist[idx], r), 0.0)
        return r + (alphas[idx] - b) * s_hist[idx] * jnp.where(valid, 1.0, 0.0)

    r = lax.fori_loop(0, memory, fwd, r)
    return -r


def lbfgs_single(value_and_grad: Callable, q0: jnp.ndarray, iterations: int,
                 memory: int = 8, max_ls: int = 20,
                 tol: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimize for one chain; returns ``(q, f, g)``.  Designed to be vmapped."""
    d = q0.shape[0]
    dtype = q0.dtype
    f0, g0 = value_and_grad(q0)
    carry = _LBFGSCarry(
        q=q0, f=f0, g=g0,
        s_hist=jnp.zeros((memory, d), dtype),
        y_hist=jnp.zeros((memory, d), dtype),
        rho=jnp.zeros((memory,), dtype),
        head=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(s: _LBFGSCarry):
        grad_ok = jnp.max(jnp.abs(s.g)) > tol
        return jnp.logical_and(s.it < iterations,
                               jnp.logical_and(grad_ok, jnp.isfinite(s.f)))

    def body(s: _LBFGSCarry) -> _LBFGSCarry:
        direction = _two_loop(s.g, s.s_hist, s.y_hist, s.rho, s.head, s.count, memory)
        dg = jnp.dot(direction, s.g)
        # fall back to steepest descent if not a descent direction
        bad = jnp.logical_or(~jnp.isfinite(dg), dg >= 0)
        direction = jnp.where(bad, -s.g, direction)
        dg = jnp.where(bad, -jnp.dot(s.g, s.g), dg)

        def ls_body(ls):
            step, _, _, done, _, i = ls
            q_try = s.q + step * direction
            f_try, g_try = value_and_grad(q_try)
            # the GRADIENT must be finite too: a finite value with a NaN
            # autodiff gradient (where/overflow traps) would otherwise be
            # accepted into the carry, turn the next direction into NaN and
            # silently end the optimization at a garbage point instead of
            # shrinking the step
            ok = jnp.logical_and(
                jnp.logical_and(jnp.isfinite(f_try),
                                jnp.all(jnp.isfinite(g_try))),
                f_try <= s.f + 1e-4 * step * dg)
            return (jnp.where(ok, step, step * 0.5), f_try, g_try, ok,
                    jnp.where(ok, q_try, s.q), i + 1)

        # while_loop (not fori+cond): under vmap, cond lowers to select and
        # every lane would pay all max_ls trial value_and_grad calls per
        # L-BFGS iteration; the batched while_loop instead exits as soon as
        # every lane has accepted (typically 1-3 trials at step=1).
        # NOTE: this bounds the budget at max_ls trials (smallest step
        # 2^-(max_ls-1)), one fewer than the old fori formulation which ran
        # ls_body once as its init — deliberate, irrelevant to warmup use.
        def ls_cond(ls):
            return jnp.logical_and(~ls[3], ls[5] < max_ls)

        init = (jnp.asarray(1.0, dtype), s.f, s.g, jnp.asarray(False),
                s.q, jnp.asarray(0, jnp.int32))
        step, f_new, g_new, ok, q_new, _ = lax.while_loop(ls_cond, ls_body, init)

        # curvature pair update (skip when line search failed or y·s <= 0)
        s_vec = q_new - s.q
        y_vec = g_new - s.g
        ys = jnp.dot(y_vec, s_vec)
        store = jnp.logical_and(ok, ys > 1e-12)

        def do_store(args):
            sh, yh, rh, head, count = args
            sh = sh.at[head].set(s_vec)
            yh = yh.at[head].set(y_vec)
            rh = rh.at[head].set(1.0 / ys)
            return sh, yh, rh, (head + 1) % memory, jnp.minimum(count + 1, memory)

        sh, yh, rh, head, count = lax.cond(
            store, do_store, lambda a: a,
            (s.s_hist, s.y_hist, s.rho, s.head, s.count))

        # if the line search failed entirely, stop making progress (it will
        # exit via the iteration cap; warmup only needs "reasonable region")
        return _LBFGSCarry(
            q=jnp.where(ok, q_new, s.q),
            f=jnp.where(ok, f_new, s.f),
            g=jnp.where(ok, g_new, s.g),
            s_hist=sh, y_hist=yh, rho=rh, head=head, count=count,
            it=s.it + jnp.where(ok, 1, iterations).astype(jnp.int32),
        )

    out = lax.while_loop(cond, body, carry)
    return out.q, out.f, out.g


def lbfgs_batched(value_and_grad_single: Callable, q0: jnp.ndarray,
                  iterations: int, memory: int = 8):
    """vmap of :func:`lbfgs_single` over the chains axis (``q0``: [C, D])."""
    fn = lambda q: lbfgs_single(value_and_grad_single, q, iterations, memory)
    return jax.vmap(fn)(q0)
