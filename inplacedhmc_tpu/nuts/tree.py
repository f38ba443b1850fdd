"""Iterative multinomial NUTS with generalized U-turn termination.

This is the TPU-native rebuild of the reference's recursive doubling tree
(``/root/reference/src/tree.jl:321-444``) and its NUTS instantiation
(``/root/reference/src/NUTS.jl``).  XLA has no recursion and no pointers, so
the algorithm is re-derived as a single ``lax.while_loop`` in which **every
iteration performs exactly one leapfrog step for every chain in lockstep**:

* The doubling schedule ``(depth d, leaf n within the current 2^d-leaf
  subtree)`` is *global* — all active chains build subtree ``d`` leaf ``n``
  simultaneously; only per-chain direction bits, terminations, and masks
  differ.  Chains whose trajectory has terminated idle under a mask until the
  loop exits (the lockstep design from SURVEY.md §7).
* The reference's recursive U-turn checks on every internal node
  (``tree.jl:335-364``) become the standard checkpoint-stack scheme: leaf ``n``
  closes the ``2^k``-leaf nodes for ``k = 1..trailing_ones(n)``; the left-edge
  data (cumulative momentum sum and ``p♯``) for those nodes was stored at
  stack slot ``popcount(l >> 1)`` when the (even) left-edge leaf ``l`` was
  visited.  This preserves the reference's O(depth·D) live storage
  (``tree.jl:5-14``) — storage is ``[C, max_depth, D]``, never O(2^depth).
* The reference's bitmask slab allocator (``tree.jl:16-121``) is not ported:
  SSA + XLA buffer donation replace pointer reuse.

Algorithmic semantics match the reference exactly:

* leaf weight ``ω = Δ = logdensity(H, z) - π₀`` (``NUTS.jl:176-191``);
* within-subtree proposal: progressive multinomial — leaf ``n`` replaces the
  running subtree proposal with probability ``exp(Δ_n - logaddexp(ω_sub, Δ_n))``,
  which has the same marginal as the reference's pairwise unbiased combines
  (``NUTS.jl:36-45`` with ``bias=false``, ``tree.jl:261-263``);
* doubling combine is *biased* progressive sampling: the new subtree's
  proposal is taken with probability ``min(1, exp(ω_sub - ω_traj))``
  (``tree.jl:431-434``, ``NUTS.jl:36-38``);
* generalized U-turn: ``(ρ·p♯_a < 0) | (ρ·p♯_b < 0)`` with ``ρ`` the momentum
  sum over the node and ``p♯ = M⁻¹p`` at its two extreme leaves
  (``NUTS.jl:148-170``) — symmetric in the endpoints, so build order never
  needs direction fix-ups;
* divergence: ``Δ < min_Δ`` (default -1000, ``NUTS.jl:214``);
* acceptance statistic: ``logaddexp`` of ``min(Δ, 0)`` over **every** visited
  leaf, including divergent leaves and leaves of subtrees later invalidated
  (``NUTS.jl:58-86``, visited stats kept at ``tree.jl:343-347``);
* per-transition directions come from one 32-bit draw (``tree.jl:140-155``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.hamiltonian import joint_logdensity
from ..core.metric import Metric, psharp, sample_momentum
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

    ``i`` is the leaf's integer position relative to the initial point
    (``tree.jl:306-318``) — retained for deterministic-tree testing.
    """

    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray
    delta: jnp.ndarray
    i: jnp.ndarray


class _Carry(NamedTuple):
    key: jnp.ndarray
    d: jnp.ndarray              # scalar int32: completed doublings / current subtree depth
    n: jnp.ndarray              # scalar int32: leaf index within current subtree
    active: jnp.ndarray         # [C] bool

    # full-trajectory state
    left: _Leaf                 # temporal-left endpoint
    right: _Leaf                # temporal-right endpoint
    psharp_left: jnp.ndarray    # [C, D]
    psharp_right: jnp.ndarray   # [C, D]
    i_left: jnp.ndarray         # [C] int32 (positions relative to start, tree.jl:306-318)
    i_right: jnp.ndarray
    rho: jnp.ndarray            # [C, D] momentum sum over the whole trajectory
    omega: jnp.ndarray          # [C] log weight of the trajectory
    prop: _Proposal

    # current-subtree build state
    is_fwd: jnp.ndarray         # [C] bool
    cur: _Leaf                  # last built leaf (the integration frontier)
    s_cum: jnp.ndarray          # [C, D] momentum sum over subtree leaves built so far
    ckpt_s: jnp.ndarray         # [C, MD, D] left-edge momentum-sum checkpoints
    ckpt_psharp: jnp.ndarray    # [C, MD, D] left-edge p♯ checkpoints
    sub_prop: _Proposal
    omega_sub: jnp.ndarray      # [C]
    i_base: jnp.ndarray         # [C] position of the trajectory edge the subtree grows from

    # termination & statistics
    term_type: jnp.ndarray      # [C] int32, Termination.*
    term_left: jnp.ndarray      # [C] int32
    term_right: jnp.ndarray
    depth_final: jnp.ndarray    # [C] int32
    log_sum_alpha: jnp.ndarray  # [C]
    steps: jnp.ndarray          # [C] int32


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
) -> Tuple[EvalPoint, TreeStats]:
    """One NUTS transition for all chains (``sample_tree``, ``NUTS.jl:251-264``).

    ``z``: the current evaluated positions ``[C, D]``; ``eps``: scalar or
    ``[C]`` step sizes; ``directions``: optional ``[C]`` uint32 direction bits
    (fixed values make the tree deterministic for testing, ``tree.jl:134-139``);
    ``momentum``: optional ``[C, D]`` override of the refreshed momentum (the
    reference's ``p`` kwarg, ``NUTS.jl:251-258``).

    Returns the next evaluated positions and per-chain :class:`TreeStats`.
    """
    q0 = z.q
    c, dim = q0.shape
    dtype = q0.dtype
    md = max(1, max_depth)  # checkpoint slots; subtree depth never exceeds max_depth-1
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

    z0_leaf = _Leaf(q=q0, p=p0, grad=z.grad, logp=z.logp)
    init_prop = _Proposal(q=q0, logp=z.logp, grad=z.grad,
                          delta=jnp.zeros((c,), dtype),
                          i=jnp.zeros((c,), jnp.int32))

    is_fwd0 = direction_bit(directions, jnp.asarray(0, jnp.int32))
    carry = _Carry(
        key=key,
        d=jnp.asarray(0, jnp.int32),
        n=jnp.asarray(0, jnp.int32),
        active=jnp.ones((c,), bool),
        left=z0_leaf, right=z0_leaf,
        psharp_left=psharp0, psharp_right=psharp0,
        i_left=jnp.zeros((c,), jnp.int32), i_right=jnp.zeros((c,), jnp.int32),
        rho=p0,
        omega=jnp.zeros((c,), dtype),
        prop=init_prop,
        is_fwd=is_fwd0,
        cur=z0_leaf,
        s_cum=jnp.zeros_like(p0),
        ckpt_s=jnp.zeros((c, md, dim), dtype),
        ckpt_psharp=jnp.zeros((c, md, dim), dtype),
        sub_prop=init_prop,
        omega_sub=jnp.full((c,), neg_inf),
        i_base=jnp.zeros((c,), jnp.int32),
        term_type=jnp.full((c,), Termination.MAX_DEPTH, jnp.int32),
        term_left=jnp.ones((c,), jnp.int32),   # REACHED_MAX_DEPTH sentinel (1, 0)
        term_right=jnp.zeros((c,), jnp.int32),
        depth_final=jnp.zeros((c,), jnp.int32),
        log_sum_alpha=jnp.full((c,), neg_inf),
        steps=jnp.zeros((c,), jnp.int32),
    )

    def cond_fn(s: _Carry):
        return jnp.logical_and(s.d < max_depth, jnp.any(s.active))

    def body_fn(s: _Carry) -> _Carry:
        key, k_sub, k_doub = jax.random.split(s.key, 3)
        mask = s.active
        sign = jnp.where(s.is_fwd, jnp.asarray(1, jnp.int32), jnp.asarray(-1, jnp.int32))
        eps_signed = jnp.where(s.is_fwd, 1.0, -1.0).astype(dtype) * eps

        # ---- one leapfrog step from the frontier (NUTS.jl:18-21) ----
        znew = leapfrog(potential, metric,
                        PhasePoint(Q=EvalPoint(q=s.cur.q, logp=s.cur.logp, grad=s.cur.grad),
                                   p=s.cur.p),
                        eps_signed)
        leaf = _Leaf(q=znew.Q.q, p=znew.p, grad=znew.Q.grad, logp=znew.Q.logp)
        delta = joint_logdensity(metric, leaf.logp, leaf.p) - pi0
        delta = jnp.where(jnp.isnan(delta), neg_inf, delta)
        divergent = delta < min_d
        psharp_new = psharp(metric, leaf.p)
        i_new = s.i_base + (s.n + 1) * sign  # position of this leaf

        # ---- visited statistics: every leaf counts (NUTS.jl:58-86) ----
        log_sum_alpha = jnp.where(
            mask, jnp.logaddexp(s.log_sum_alpha, jnp.minimum(delta, 0.0)), s.log_sum_alpha)
        steps = s.steps + mask.astype(jnp.int32)

        # ---- checkpoint store (even leaves are left edges of >=2-leaf nodes) ----
        slot = checkpoint_slot(s.n)

        def store_ckpt(cs, cp):
            zero = jnp.asarray(0, slot.dtype)
            cs = lax.dynamic_update_slice(cs, s.s_cum[:, None, :], (zero, slot, zero))
            cp = lax.dynamic_update_slice(cp, psharp_new[:, None, :], (zero, slot, zero))
            return cs, cp

        ckpt_s, ckpt_psharp = lax.cond(
            s.n % 2 == 0, store_ckpt, lambda cs, cp: (cs, cp), s.ckpt_s, s.ckpt_psharp)

        s_cum = bcast_where(mask, s.s_cum + leaf.p, s.s_cum)

        # ---- within-subtree U-turn checks for all nodes closed by this leaf ----
        # Nodes [n-2^k+1, n] for k = 1..trailing_ones(n); the reference's
        # recursion checks these innermost-first (tree.jl:335-364), i.e. k
        # ascending, which we preserve for bit-identical termination reporting.
        t_ones = trailing_ones(s.n)
        idx_max = checkpoint_slot(s.n)

        def check_node(m, acc):
            turning, first_left = acc
            j = idx_max - m                      # k = m + 1
            rho_node = s_cum - lax.dynamic_index_in_dim(ckpt_s, j, axis=1, keepdims=False)
            ps_l = lax.dynamic_index_in_dim(ckpt_psharp, j, axis=1, keepdims=False)
            turn = jnp.logical_or(_chain_dot(rho_node, ps_l) < 0,
                                  _chain_dot(rho_node, psharp_new) < 0)
            node_size = jnp.left_shift(jnp.asarray(1, jnp.int32), m + 1)
            l_leaf = s.n - node_size + 1
            l_pos = s.i_base + (l_leaf + 1) * sign
            first_left = jnp.where(jnp.logical_and(turn, jnp.logical_not(turning)),
                                   l_pos, first_left)
            return jnp.logical_or(turning, turn), first_left

        turning_sub, turn_left_pos = lax.fori_loop(
            0, t_ones, check_node,
            (jnp.zeros((c,), bool), jnp.zeros((c,), jnp.int32)))
        turning_sub = jnp.logical_and(turning_sub, jnp.logical_not(divergent))

        # ---- progressive within-subtree proposal (unbiased multinomial) ----
        omega_new = jnp.logaddexp(s.omega_sub, delta)
        u_sub = jax.random.uniform(k_sub, (c,), dtype)
        take_new = jnp.log(u_sub) < (delta - omega_new)
        upd_prop = jnp.logical_and(mask, jnp.logical_not(divergent))
        new_sub = _Proposal(q=leaf.q, logp=leaf.logp, grad=leaf.grad, delta=delta,
                            i=i_new)
        sub_prop = tree_where(jnp.logical_and(upd_prop, take_new), new_sub, s.sub_prop)
        omega_sub = jnp.where(upd_prop, omega_new, s.omega_sub)

        cur = tree_where(mask, leaf, s.cur)

        # ---- invalid subtree -> chain terminates (tree.jl:329-358, 416-417) ----
        died_div = jnp.logical_and(mask, divergent)
        died_turn = jnp.logical_and(mask, turning_sub)
        died = jnp.logical_or(died_div, died_turn)
        term_type = jnp.where(died_div, Termination.DIVERGENCE,
                              jnp.where(died_turn, Termination.TURNING, s.term_type))
        tl = jnp.where(died_div, i_new, jnp.where(died_turn, jnp.minimum(turn_left_pos, i_new), s.term_left))
        tr = jnp.where(died_div, i_new, jnp.where(died_turn, jnp.maximum(turn_left_pos, i_new), s.term_right))
        active = jnp.logical_and(mask, jnp.logical_not(died))

        s = s._replace(
            key=key, active=active, s_cum=s_cum, ckpt_s=ckpt_s, ckpt_psharp=ckpt_psharp,
            sub_prop=sub_prop, omega_sub=omega_sub, cur=cur,
            term_type=term_type, term_left=tl, term_right=tr,
            log_sum_alpha=log_sum_alpha, steps=steps)

        # ---- subtree complete? combine into the trajectory (tree.jl:395-438) ----
        subtree_len = jnp.left_shift(jnp.asarray(1, jnp.int32), s.d)

        def epilogue(s: _Carry) -> _Carry:
            m = s.active
            # biased progressive doubling combine (NUTS.jl:36-38)
            u2 = jax.random.uniform(k_doub, (c,), dtype)
            take2 = jnp.logical_and(m, jnp.log(u2) < (s.omega_sub - s.omega))
            prop = tree_where(take2, s.sub_prop, s.prop)
            omega = jnp.where(m, jnp.logaddexp(s.omega, s.omega_sub), s.omega)

            # extend trajectory endpoints in the build direction
            grow_r = jnp.logical_and(m, s.is_fwd)
            grow_l = jnp.logical_and(m, jnp.logical_not(s.is_fwd))
            right = tree_where(grow_r, s.cur, s.right)
            left = tree_where(grow_l, s.cur, s.left)
            psharp_right = bcast_where(grow_r, psharp_new, s.psharp_right)
            psharp_left = bcast_where(grow_l, psharp_new, s.psharp_left)
            i_right = jnp.where(grow_r, i_new, s.i_right)
            i_left = jnp.where(grow_l, i_new, s.i_left)

            rho = bcast_where(m, s.rho + s.s_cum, s.rho)
            depth_final = jnp.where(m, s.d + 1, s.depth_final)

            # top-level generalized U-turn on the doubled trajectory
            turn_top = jnp.logical_or(_chain_dot(rho, psharp_left) < 0,
                                      _chain_dot(rho, psharp_right) < 0)
            died_top = jnp.logical_and(m, turn_top)
            term_type = jnp.where(died_top, Termination.TURNING, s.term_type)
            tl = jnp.where(died_top, i_left, s.term_left)
            tr = jnp.where(died_top, i_right, s.term_right)
            active = jnp.logical_and(m, jnp.logical_not(turn_top))

            # set up the next subtree (direction bit d+1, tree.jl:152-155)
            is_fwd = direction_bit(directions, s.d + 1)
            cur = tree_where(is_fwd, right, left)
            i_base = jnp.where(is_fwd, i_right, i_left)

            return s._replace(
                d=s.d + 1, n=jnp.asarray(0, jnp.int32), active=active,
                left=left, right=right,
                psharp_left=psharp_left, psharp_right=psharp_right,
                i_left=i_left, i_right=i_right, rho=rho, omega=omega, prop=prop,
                is_fwd=is_fwd, cur=cur,
                s_cum=jnp.zeros_like(s.s_cum),
                omega_sub=jnp.full((c,), neg_inf),
                i_base=i_base,
                term_type=term_type, term_left=tl, term_right=tr,
                depth_final=depth_final)

        def advance(s: _Carry) -> _Carry:
            return s._replace(n=s.n + 1)

        return lax.cond(s.n == subtree_len - 1, epilogue, advance, s)

    out = lax.while_loop(cond_fn, body_fn, carry)

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
