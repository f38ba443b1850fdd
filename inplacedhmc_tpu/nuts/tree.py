"""Iterative multinomial NUTS with generalized U-turn termination.

This is the TPU-native rebuild of the reference's recursive doubling tree
(``/root/reference/src/tree.jl:321-444``) and its NUTS instantiation
(``/root/reference/src/NUTS.jl``).  XLA has no recursion and no pointers, so
the algorithm is re-derived as a **two-level lockstep loop**:

* **outer** ``lax.while_loop`` over doublings ``d`` — holds the
  trajectory-level state (endpoints, ``rho``, ``p♯`` ends, running proposal),
  which therefore generates *zero* HBM traffic while a subtree is built;
* **inner** ``lax.fori_loop`` over the ``2^d`` leaves of the subtree being
  built — every iteration performs exactly one leapfrog step for every chain
  in lockstep.  The (depth, leaf) schedule is *global*: all active chains
  build the same-shaped subtree simultaneously; only per-chain direction
  bits, terminations and masks differ.  Chains whose trajectory terminated
  idle under a mask until the loops exit (SURVEY.md §7 lockstep design).

The reference's recursive U-turn checks on every internal node
(``tree.jl:335-364``) become the checkpoint-stack scheme: leaf ``n`` closes
the ``2^k``-leaf nodes for ``k = 1..trailing_ones(n)``; the left-edge data
(cumulative momentum sum and ``p♯``) for those nodes was stored at stack slot
``popcount(l >> 1)`` when the (even) left-edge leaf ``l`` was visited.  Odd
leaves write to a dummy slot so the store is unconditional (no ``lax.cond``
in the hot loop).  This preserves the reference's O(depth·D) live storage
(``tree.jl:5-14``) — stacks are ``[C, max_depth+1, D]``, never O(2^depth).
The reference's bitmask slab allocator (``tree.jl:16-121``) is not ported:
SSA + XLA buffer aliasing in the loop carries replace pointer reuse.

Algorithmic semantics match the reference exactly:

* leaf weight ``ω = Δ = logdensity(H, z) - π₀`` (``NUTS.jl:176-191``);
* within-subtree proposal: progressive multinomial — leaf ``n`` replaces the
  running subtree proposal with probability ``exp(Δ_n - logaddexp(ω_sub, Δ_n))``,
  which has the same marginal law as the reference's pairwise unbiased
  combines (``NUTS.jl:36-45`` with ``bias=false``, ``tree.jl:261-263``);
* doubling combine is *biased* progressive sampling: the new subtree's
  proposal is taken with probability ``min(1, exp(ω_sub - ω_traj))``
  (``tree.jl:431-434``, ``NUTS.jl:36-38``);
* generalized U-turn: ``(ρ·p♯_a < 0) | (ρ·p♯_b < 0)`` with ``ρ`` the momentum
  sum over the node and ``p♯ = M⁻¹p`` at its two extreme leaves
  (``NUTS.jl:148-170``) — symmetric in the endpoints, so build order needs no
  direction fix-ups;
* divergence: ``Δ < min_Δ`` (default -1000, ``NUTS.jl:214``);
* acceptance statistic: ``logaddexp`` of ``min(Δ, 0)`` over **every** visited
  leaf, including divergent leaves and leaves of subtrees later invalidated
  (``NUTS.jl:58-86``; visited stats kept at ``tree.jl:343-347``);
* per-transition directions come from one 32-bit draw (``tree.jl:140-155``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.hamiltonian import joint_logdensity
from ..core.metric import Metric, kinetic_energy, psharp, sample_momentum
from ..core.state import EvalPoint, PhasePoint, Termination, TreeStats
from ..ops.integrator import leapfrog
from ..utils.bits import checkpoint_slot, direction_bit, trailing_ones
from ..utils.masking import bcast_where, tree_where


class _Leaf(NamedTuple):
    """One trajectory node: position cache + momentum (a flattened PhasePoint)."""

    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray


class _Proposal(NamedTuple):
    """Running proposal: position cache + its energy offset Δ from π₀.
    (Leaf positions relative to the start, ``tree.jl:306-318``, surface only
    through the termination records ``term_left``/``term_right``.)"""

    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray
    delta: jnp.ndarray


class _Inner(NamedTuple):
    """Per-leaf (hot loop) state — kept minimal: these are the only arrays
    that pay HBM round-trips on every leapfrog step."""

    key: jnp.ndarray
    alive: jnp.ndarray          # [C] active and subtree still valid
    cur: _Leaf                  # integration frontier
    s_cum: jnp.ndarray          # [C, D] momentum sum over subtree leaves so far
    ckpt_s: jnp.ndarray         # [C, MD, D] left-edge momentum-sum checkpoints
    ckpt_psharp: jnp.ndarray    # [C, MD, D] left-edge p♯ checkpoints
    sub_prop: _Proposal
    omega_sub: jnp.ndarray      # [C]
    died_div: jnp.ndarray       # [C] divergence inside this subtree
    died_turn: jnp.ndarray      # [C] sub-node U-turn inside this subtree
    die_l: jnp.ndarray          # [C] int32 InvalidTree.left analog
    die_r: jnp.ndarray          # [C] int32 InvalidTree.right analog
    log_sum_alpha: jnp.ndarray  # [C]
    steps: jnp.ndarray          # [C] int32


class _Outer(NamedTuple):
    """Per-doubling state — untouched while a subtree streams leaves."""

    key: jnp.ndarray
    d: jnp.ndarray              # scalar int32: completed doublings
    active: jnp.ndarray         # [C]
    left: _Leaf
    right: _Leaf
    psharp_left: jnp.ndarray
    psharp_right: jnp.ndarray
    i_left: jnp.ndarray
    i_right: jnp.ndarray
    rho: jnp.ndarray
    omega: jnp.ndarray
    prop: _Proposal
    ckpt_s: jnp.ndarray         # persisted storage for the inner stacks
    ckpt_psharp: jnp.ndarray
    term_type: jnp.ndarray
    term_left: jnp.ndarray
    term_right: jnp.ndarray
    depth_final: jnp.ndarray
    log_sum_alpha: jnp.ndarray
    steps: jnp.ndarray


# Levels of the within-subtree U-turn check executed branch-free every leaf
# (masked); deeper levels fall back to lax.cond.  See the comment at the check
# site for the cost model.
_STATIC_CHECK_LEVELS = 5


def _chain_dot(a, b):
    return jnp.sum(a * b, axis=-1)


def nuts_transition(
    key: jnp.ndarray,
    potential: Callable,
    metric: Metric,
    z: EvalPoint,
    eps: jnp.ndarray,
    *,
    max_depth: int = 10,
    min_delta: float = -1000.0,
    directions: Optional[jnp.ndarray] = None,
    momentum: Optional[jnp.ndarray] = None,
    step_fn: Optional[Callable] = None,
) -> Tuple[EvalPoint, TreeStats]:
    """One NUTS transition for all chains (``sample_tree``, ``NUTS.jl:251-264``).

    ``z``: the current evaluated positions ``[C, D]``; ``eps``: scalar or
    ``[C]`` step sizes; ``directions``: optional ``[C]`` uint32 direction bits
    (fixed values make the tree deterministic for testing, ``tree.jl:134-139``);
    ``momentum``: optional ``[C, D]`` override of the refreshed momentum (the
    reference's ``p`` kwarg, ``NUTS.jl:251-258``);
    ``step_fn``: optional fused integrator override with signature
    ``(q, p, grad, logp, eps_signed) -> (q', p', grad', logp', kin', psharp')``
    — used to plug the Pallas fused leapfrog (``ops/leapfrog_pallas.py``)
    while keeping the tree machinery model-agnostic.

    Returns the next evaluated positions and per-chain :class:`TreeStats`.
    """
    if not 1 <= max_depth <= 30:
        # the reference's hard cap (tree.jl:131, 32-bit direction words /
        # occupancy masks): beyond 30, direction-bit shifts and the int32
        # 2^d subtree length are undefined/overflow — silently biased
        # doublings instead of an error
        raise ValueError(f"max_depth must be in [1, 30], got {max_depth}")
    q0 = z.q
    c, dim = q0.shape
    dtype = q0.dtype
    md = max_depth
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    min_d = jnp.asarray(min_delta, dtype)

    key, k_p, k_dir = jax.random.split(key, 3)
    if momentum is None:
        p0 = sample_momentum(metric, k_p, q0.shape, dtype)
    else:
        p0 = jnp.asarray(momentum, dtype)
    if directions is None:
        directions = jax.random.bits(k_dir, (c,), jnp.uint32)
    else:
        directions = jnp.asarray(directions, jnp.uint32)
        if directions.ndim == 0:
            directions = jnp.broadcast_to(directions, (c,))

    pi0 = joint_logdensity(metric, z.logp, p0)  # [C]
    psharp0 = psharp(metric, p0)

    if step_fn is None:
        def step_fn(q, p, grad, logp, eps_signed):
            znew = leapfrog(potential, metric,
                            PhasePoint(Q=EvalPoint(q=q, logp=logp, grad=grad), p=p),
                            eps_signed)
            kin = kinetic_energy(metric, znew.p)
            return (znew.Q.q, znew.p, znew.Q.grad, znew.Q.logp, kin,
                    psharp(metric, znew.p))

    z0_leaf = _Leaf(q=q0, p=p0, grad=z.grad, logp=z.logp)
    init_prop = _Proposal(q=q0, logp=z.logp, grad=z.grad,
                          delta=jnp.zeros((c,), dtype))

    outer0 = _Outer(
        key=key,
        d=jnp.asarray(0, jnp.int32),
        active=jnp.ones((c,), bool),
        left=z0_leaf, right=z0_leaf,
        psharp_left=psharp0, psharp_right=psharp0,
        i_left=jnp.zeros((c,), jnp.int32), i_right=jnp.zeros((c,), jnp.int32),
        rho=p0,
        omega=jnp.zeros((c,), dtype),
        prop=init_prop,
        ckpt_s=jnp.zeros((c, md, dim), dtype),
        ckpt_psharp=jnp.zeros((c, md, dim), dtype),
        term_type=jnp.full((c,), Termination.MAX_DEPTH, jnp.int32),
        term_left=jnp.ones((c,), jnp.int32),   # REACHED_MAX_DEPTH sentinel (1, 0)
        term_right=jnp.zeros((c,), jnp.int32),
        depth_final=jnp.zeros((c,), jnp.int32),
        log_sum_alpha=jnp.full((c,), neg_inf),
        steps=jnp.zeros((c,), jnp.int32),
    )

    def cond_fn(s: _Outer):
        return jnp.logical_and(s.d < max_depth, jnp.any(s.active))

    def body_fn(s: _Outer) -> _Outer:
        key, k_inner, k_doub = jax.random.split(s.key, 3)
        is_fwd = direction_bit(directions, s.d)          # [C]
        sign = jnp.where(is_fwd, jnp.asarray(1, jnp.int32),
                         jnp.asarray(-1, jnp.int32))
        eps_signed = jnp.where(is_fwd, 1.0, -1.0).astype(dtype) * eps
        i_base = jnp.where(is_fwd, s.i_right, s.i_left)  # [C]
        cur0 = tree_where(is_fwd, s.right, s.left)
        subtree_len = jnp.left_shift(jnp.asarray(1, jnp.int32), s.d)

        inner0 = _Inner(
            key=k_inner,
            alive=s.active,
            cur=cur0,
            s_cum=jnp.zeros((c, dim), dtype),
            ckpt_s=s.ckpt_s, ckpt_psharp=s.ckpt_psharp,
            sub_prop=s.prop,
            omega_sub=jnp.full((c,), neg_inf),
            died_div=jnp.zeros((c,), bool),
            died_turn=jnp.zeros((c,), bool),
            die_l=jnp.zeros((c,), jnp.int32),
            die_r=jnp.zeros((c,), jnp.int32),
            log_sum_alpha=s.log_sum_alpha,
            steps=s.steps,
        )

        def inner_body(n, t: _Inner) -> _Inner:
            k_next, k_sub = jax.random.split(t.key)
            mask = t.alive

            # -- one leapfrog step from the frontier (NUTS.jl:18-21) --
            qn, pn, gn, lpn, kin, psharp_new = step_fn(
                t.cur.q, t.cur.p, t.cur.grad, t.cur.logp, eps_signed)
            leaf = _Leaf(q=qn, p=pn, grad=gn, logp=lpn)
            # joint = logp - K with the -inf guards of kinetic_energy.jl:107-112
            joint = lpn - jnp.where(jnp.isfinite(kin), kin, jnp.inf)
            joint = jnp.where(jnp.isfinite(joint), joint, -jnp.inf)
            delta = joint - pi0
            delta = jnp.where(jnp.isnan(delta), neg_inf, delta)
            divergent = delta < min_d
            i_new = i_base + (n + 1) * sign

            # -- visited statistics: every leaf counts (NUTS.jl:58-86) --
            log_sum_alpha = jnp.where(
                mask, jnp.logaddexp(t.log_sum_alpha, jnp.minimum(delta, 0.0)),
                t.log_sum_alpha)
            steps = t.steps + mask.astype(jnp.int32)

            # -- checkpoint store: even leaves are left edges; odd leaves hit
            #    the dummy slot `md-1` so the write is unconditional (real
            #    left-edge slots never exceed md-2: the largest subtree has
            #    2^(md-1) leaves, so even n <= 2^(md-1)-2 gives
            #    popcount(n>>1) <= md-2) --
            slot = jnp.where(n % 2 == 0, checkpoint_slot(n),
                             jnp.asarray(md - 1, jnp.int32))
            zero = jnp.asarray(0, jnp.int32)
            ckpt_s = lax.dynamic_update_slice(
                t.ckpt_s, t.s_cum[:, None, :], (zero, slot, zero))
            ckpt_psharp = lax.dynamic_update_slice(
                t.ckpt_psharp, psharp_new[:, None, :], (zero, slot, zero))

            s_cum = bcast_where(mask, t.s_cum + leaf.p, t.s_cum)

            # -- within-subtree U-turn checks for nodes closed by this leaf:
            #    [n-2^k+1, n] for k = 1..trailing_ones(n), innermost first
            #    (matches the reference's post-order recursion) --
            t_ones = trailing_ones(n)
            idx_max = checkpoint_slot(n)

            # Nested control flow (while_loop or a taken lax.cond) costs
            # ~300us per instance in this inner loop on TPU, so the common
            # check levels (m < _STATIC_CHECK_LEVELS, i.e. node depths
            # k <= 5, covering every leaf with trailing_ones <= 5 — 63/64 of
            # leaves) run *unconditionally* with a validity mask — two extra
            # [C, D] slice reads per level are far cheaper than a branch.
            # Deeper levels (needed on 1/2^6 of leaves) use a cond chain
            # whose amortized cost is negligible.  Check order is innermost-first, matching
            # the reference's post-order recursion.
            def run_check(m, acc):
                turning, first_left = acc
                valid = m < t_ones
                j = jnp.maximum(idx_max - m, 0)      # k = m + 1
                rho_node = s_cum - lax.dynamic_index_in_dim(
                    ckpt_s, j, axis=1, keepdims=False)
                ps_l = lax.dynamic_index_in_dim(
                    ckpt_psharp, j, axis=1, keepdims=False)
                turn = jnp.logical_and(
                    valid,
                    jnp.logical_or(_chain_dot(rho_node, ps_l) < 0,
                                   _chain_dot(rho_node, psharp_new) < 0))
                l_pos = i_base + (n - (1 << (m + 1)) + 2) * sign
                first_left = jnp.where(jnp.logical_and(turn, ~turning),
                                       l_pos, first_left)
                return jnp.logical_or(turning, turn), first_left

            acc = (jnp.zeros((c,), bool), jnp.zeros((c,), jnp.int32))
            n_static = min(_STATIC_CHECK_LEVELS, md)
            for m_level in range(n_static):
                acc = run_check(m_level, acc)
            for m_level in range(n_static, md):
                acc = lax.cond(m_level < t_ones,
                               lambda a, m=m_level: run_check(m, a),
                               lambda a: a, acc)
            turning_sub, turn_left_pos = acc
            turning_sub = jnp.logical_and(turning_sub, ~divergent)

            # -- progressive within-subtree proposal (unbiased multinomial) --
            omega_new = jnp.logaddexp(t.omega_sub, delta)
            u_sub = jax.random.uniform(k_sub, (c,), dtype)
            take_new = jnp.log(u_sub) < (delta - omega_new)
            upd = jnp.logical_and(mask, ~divergent)
            new_sub = _Proposal(q=leaf.q, logp=leaf.logp, grad=leaf.grad,
                                delta=delta)
            sub_prop = tree_where(jnp.logical_and(upd, take_new), new_sub,
                                  t.sub_prop)
            omega_sub = jnp.where(upd, omega_new, t.omega_sub)

            # -- invalid subtree => chain leaves the lockstep (tree.jl:329-358) --
            died_div = jnp.logical_and(mask, divergent)
            died_turn = jnp.logical_and(mask, turning_sub)
            died = jnp.logical_or(died_div, died_turn)
            die_l = jnp.where(died_div, i_new,
                              jnp.where(died_turn,
                                        jnp.minimum(turn_left_pos, i_new), t.die_l))
            die_r = jnp.where(died_div, i_new,
                              jnp.where(died_turn,
                                        jnp.maximum(turn_left_pos, i_new), t.die_r))

            return _Inner(
                key=k_next,
                alive=jnp.logical_and(mask, ~died),
                cur=tree_where(mask, leaf, t.cur),
                s_cum=s_cum,
                ckpt_s=ckpt_s, ckpt_psharp=ckpt_psharp,
                sub_prop=sub_prop, omega_sub=omega_sub,
                died_div=jnp.logical_or(t.died_div, died_div),
                died_turn=jnp.logical_or(t.died_turn, died_turn),
                die_l=die_l, die_r=die_r,
                log_sum_alpha=log_sum_alpha, steps=steps,
            )

        t = lax.fori_loop(0, subtree_len, inner_body, inner0)

        # ---- epilogue: merge the subtree into the trajectory (tree.jl:395-438) ----
        m = t.alive  # chains whose subtree completed validly

        # biased progressive doubling combine (NUTS.jl:36-38)
        u2 = jax.random.uniform(k_doub, (c,), dtype)
        take2 = jnp.logical_and(m, jnp.log(u2) < (t.omega_sub - s.omega))
        prop = tree_where(take2, t.sub_prop, s.prop)
        omega = jnp.where(m, jnp.logaddexp(s.omega, t.omega_sub), s.omega)

        # extend trajectory endpoints in the build direction; p♯ of the final
        # leaf is recomputed here once per subtree instead of being carried
        # through the hot loop
        psharp_end = psharp(metric, t.cur.p)
        grow_r = jnp.logical_and(m, is_fwd)
        grow_l = jnp.logical_and(m, ~is_fwd)
        i_end = i_base + subtree_len * sign
        right = tree_where(grow_r, t.cur, s.right)
        left = tree_where(grow_l, t.cur, s.left)
        psharp_right = bcast_where(grow_r, psharp_end, s.psharp_right)
        psharp_left = bcast_where(grow_l, psharp_end, s.psharp_left)
        i_right = jnp.where(grow_r, i_end, s.i_right)
        i_left = jnp.where(grow_l, i_end, s.i_left)

        rho = bcast_where(m, s.rho + t.s_cum, s.rho)
        depth_final = jnp.where(m, s.d + 1, s.depth_final)

        # top-level generalized U-turn on the doubled trajectory
        turn_top = jnp.logical_or(_chain_dot(rho, psharp_left) < 0,
                                  _chain_dot(rho, psharp_right) < 0)
        died_top = jnp.logical_and(m, turn_top)

        # merge termination records: inner deaths first, then the top-level turn
        term_type = s.term_type
        term_type = jnp.where(t.died_div, Termination.DIVERGENCE, term_type)
        term_type = jnp.where(t.died_turn, Termination.TURNING, term_type)
        term_type = jnp.where(died_top, Termination.TURNING, term_type)
        inner_died = jnp.logical_or(t.died_div, t.died_turn)
        term_left = jnp.where(inner_died, t.die_l,
                              jnp.where(died_top, i_left, s.term_left))
        term_right = jnp.where(inner_died, t.die_r,
                               jnp.where(died_top, i_right, s.term_right))

        return _Outer(
            key=key,
            d=s.d + 1,
            active=jnp.logical_and(m, ~turn_top),
            left=left, right=right,
            psharp_left=psharp_left, psharp_right=psharp_right,
            i_left=i_left, i_right=i_right,
            rho=rho, omega=omega, prop=prop,
            ckpt_s=t.ckpt_s, ckpt_psharp=t.ckpt_psharp,
            term_type=term_type, term_left=term_left, term_right=term_right,
            depth_final=depth_final,
            log_sum_alpha=t.log_sum_alpha, steps=t.steps,
        )

    out = lax.while_loop(cond_fn, body_fn, outer0)

    steps_safe = jnp.maximum(out.steps, 1)
    accept = jnp.exp(out.log_sum_alpha) / steps_safe.astype(dtype)
    accept = jnp.minimum(accept, 1.0)
    stats = TreeStats(
        energy=pi0 + out.prop.delta,
        acceptance_rate=accept,
        termination=out.term_type,
        term_left=out.term_left,
        term_right=out.term_right,
        depth=out.depth_final,
        steps=out.steps,
    )
    z_new = EvalPoint(q=out.prop.q, logp=out.prop.logp, grad=out.prop.grad)
    return z_new, stats
