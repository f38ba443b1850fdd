"""Whole-transition Pallas NUTS kernel for diagonal-Gaussian-gradient targets.

The speed-of-light formulation of the flagship benchmark (BASELINE: leapfrog
steps/sec at 10k chains): the **entire NUTS transition** — momentum-refresh
energies, the doubling loop, leapfrog steps, checkpoint-stack U-turn checks,
progressive proposals, divergence handling, and tree statistics — runs inside
one ``pallas_call``.  Each grid program owns a tile of chains whose whole tree
state lives in VMEM; HBM is touched exactly twice (inputs in, outputs out).

Motivation (measured on v5e): the XLA ``lax.while_loop`` tree pays hundreds of
microseconds of fused-kernel-launch / nested-control-flow overhead per
lockstep leaf iteration, ~20x the leapfrog's own arithmetic.  Mosaic loops are
real hardware loops, so the per-leaf cost here is VPU arithmetic only.

Mosaic-imposed structure: the doubling loop is **statically unrolled** (one
block per depth ``d``, predicated with ``pl.when`` so finished tiles skip the
work), the within-subtree leaf loop is a static-bound ``fori_loop`` of
``2^d`` iterations, and all per-chain state lives in VMEM scratch refs — the
within-subtree U-turn check at depth ``d`` unrolls at most ``d`` levels.

Scope: any model whose log density is expressible as a pure jnp function of
the chain tile plus VMEM-resident data arrays ("tile physics") — gradients are
generated *inside the kernel* by jax.grad of the summed tile log density.
`make_gaussian_tree_transition` covers the diag-Gaussian benchmark family;
`make_tree_transition` accepts arbitrary tile physics (see
`models/eight_schools.py` for a non-trivial example).  Diagonal metric,
float32.  Semantics are identical to
``nuts/tree.py`` (same checkpoint-slot scheme, same biased/unbiased
progressive combines, same termination records, validated leaf-for-leaf
against the recursive oracle in ``tests/test_tree_pallas.py``); only the
proposal-selection RNG differs (in-kernel TPU PRNG instead of threefry).

Reference provenance: ``/root/reference/src/tree.jl:321-444`` (doubling loop),
``NUTS.jl:18-264`` (instantiation) — the reference's entire zero-allocation
machinery (arena + slab allocator + SIMD kernels) collapsed into one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import chain_tiles
from .common import round_up as _round_up


# float column indices in the colf [BC, 16] scratch.  SUM_ALPHA accumulates
# Σ exp(min(Δ, 0)) in LINEAR space (each term <= 1, <= 2^max_depth terms — no
# overflow and full f32 precision), replacing a per-leaf logaddexp (2
# transcendentals) with one exp+add; the log is taken once at kernel exit.
# TURNF is the per-leaf turn flag written inside the scalar-predicated check
# levels (see leaf_body).
(OMEGA, OMEGA_SUB, PROP_DELTA, PROP_LOGP, SUB_DELTA, SUB_LOGP, SUM_ALPHA,
 SIGN, PI0, EPS, TURNF) = range(11)
# int column indices in the coli [BC, 16] scratch
(I_LEFT, I_RIGHT, I_BASE, STEPS, TERM, TL, TR, DEPTH, ACTIVE, ALIVE,
 DIED_DIV, DIED_TURN, DIE_L, DIE_R, DIRS, TURNP) = range(16)


def _uniform_from_bits(shape):
    # prng_random_bits yields int32 bit patterns: bitcast before shifting, or
    # the arithmetic shift sign-extends and half the uniforms go negative.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical shift in uint32, then reinterpret as (non-negative) int32 —
    # Mosaic supports int32 -> f32 casts but not uint32 -> f32
    bits24 = pltpu.bitcast(jnp.right_shift(bits, jnp.uint32(8)), jnp.int32)
    return bits24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _gauss_from_bits(shape):
    """In-kernel standard normals: Box-Muller on two 24-bit uniforms.
    ``(bits24 + 0.5) * 2^-24`` keeps u strictly inside (0, 1) so the log is
    finite; tails truncate at ~5.8 sigma (same granularity class as the
    host threefry path's 23-bit mantissa)."""
    def unif(shape):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits24 = pltpu.bitcast(jnp.right_shift(bits, jnp.uint32(8)),
                               jnp.int32)
        return (bits24.astype(jnp.float32) + 0.5) * jnp.float32(1.0 / (1 << 24))
    u1 = unif(shape)
    u2 = unif(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(jnp.float32(2.0 * np.pi) * u2)


def _make_kernel(bc: int, dpad: int, max_depth: int, min_delta: float,
                 term_max_depth: int, term_div: int, term_turn: int,
                 physics=None, n_data: int = 1, use_prng: bool = True,
                 dense: bool = False, ckpt_bf16: bool = False,
                 refresh_inside: bool = False, n_sweep: int = 1,
                 ablate: frozenset = frozenset()):
    """``physics(q_tile, data_refs) -> (logp [bc,1], grad [bc,dpad])`` — the
    model's fused value+gradient on a chain tile; evaluated once per leapfrog
    step, once per subtree start (frontier grad), and once at the end.

    ``dense``: the metric ref is a full ``[dpad, dpad]`` M⁻¹ and every
    ``p♯ = M⁻¹p`` becomes one MXU matmul per leaf (the reference's dense
    kinetic energy, ``hamiltonian.jl:206-225``); otherwise a ``[1, dpad]``
    diagonal row.  ``ckpt_bf16``: store the U-turn checkpoint stacks in
    bfloat16 — halves the dominant VMEM scratch (enables bigger chain tiles);
    turn *decisions* use the rounded values consistently in both directions,
    so the termination rule stays symmetric.

    ``ablate``: INTERNAL measurement hooks (benchmarks/tree_kernel_ablate.py)
    that statically remove bookkeeping subsystems to attribute kernel time —
    the resulting kernel is NOT a correct NUTS transition.  Tokens:
    ``"turns"`` (within-subtree U-turn checks), ``"ckpt"`` (checkpoint-stack
    stores), ``"proposal"`` (progressive proposal sampling), ``"stats"``
    (visited statistics + failure records).
    """
    nbits = max(1, max_depth - 1)

    def _popcount(x):
        # scalar popcount via static bit unroll (Mosaic-safe: no table consts)
        acc = jnp.asarray(0, jnp.int32)
        for b in range(nbits):
            acc = acc + jnp.bitwise_and(jnp.right_shift(x, b), 1)
        return acc

    def _trailing_ones(x):
        y = jnp.bitwise_and(jnp.bitwise_not(x), x + 1) - 1
        return _popcount(y)

    ckpt_dtype = jnp.bfloat16 if ckpt_bf16 else jnp.float32

    assert not (refresh_inside and not use_prng), \
        "refresh_inside needs the TPU PRNG (no interpret mode)"

    n_unif_c = (1 << max_depth) - 1 + max_depth

    def kernel(q0_ref, p0_ref, eps_ref, dirs_ref, valid_ref, seed_ref,
               *rest):
        # refresh_inside: p0_ref is the momentum SCALE (sqrt-mass row [1,dpad]
        # diag / transposed mass-Cholesky [dpad,dpad] dense) and dirs_ref a
        # dummy — momentum and direction bits are generated in-kernel from
        # the TPU PRNG, so the host pays no threefry or HBM round trip
        # (measured: 1.83 ms/transition of out-of-kernel scan-body cost at
        # the flagship point, benchmarks/transition_attr.json).
        #
        # n_sweep > 1: run that many sequential NUTS transitions inside THIS
        # kernel launch (state carried in VMEM, per-transition stats written
        # to [n_sweep, ...] outputs through dynamic leading-dim stores) — the
        # out-of-kernel scan body plus per-tile setup then amortize over the
        # whole sweep instead of recurring per transition.
        #
        # interpret mode (CPU tests) has no TPU PRNG: proposal uniforms come
        # in as a per-(leaf, epilogue) stream indexed by the lockstep-global
        # counter (offset per sweep transition), so sampling stays exact (not
        # degenerate) off-TPU
        if not use_prng:
            unif_ref = rest[0]
            rest = rest[1:]
        minv_ref = rest[0]
        rest = rest[1:]

        data_refs = rest[:n_data]
        (out_q, out_logp, out_grad, out_energy, out_lsa,
         out_term, out_tl, out_tr, out_depth, out_steps,
         left_q, left_p, right_q, right_p,
         left_g, right_g,
         cur_q, cur_p, cur_g,
         ps_l, ps_r, rho, s_cum,
         prop_q, sub_q,
         ckpt_s, ckpt_ps, colf, coli) = rest[n_data:]
        i = pl.program_id(0)
        if use_prng:
            # two independent 32-bit words from the transition key + the tile
            # index: a single 31-bit word would birthday-collide across long
            # runs (~10^6 (transition, tile) pairs), replaying identical
            # proposal-uniform streams in distinct transitions
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + i)

        if dense:
            minv_mat = minv_ref[:]  # [dpad, dpad]

            # Per-leaf dense products, by exactness class (DESIGN #13/#14;
            # the package-wide f32 default would issue SIX passes each):
            #
            # * q-update + kinetic energy: f32-grade via the classic 3-pass
            #   split-bf16 (Mosaic rejects Precision.HIGH).  The q-update
            #   stays EXACT for any deterministic odd map, but a 1-pass
            #   product's ~1e-2 error is ABSOLUTE in units of the matvec's
            #   largest components — under an ill-conditioned mid-warmup
            #   metric (cond ~1e3) that lands O(1)-relative on the stiff
            #   coordinates and craters acceptance (measured: DA collapse
            #   to eps ~5e-4 in the first dense window at 10240 x 1002).
            #   K sets the multinomial weights and must match the refresh
            #   distribution — f32-grade by the same product.
            # * U-turn statistic: 1-pass bf16 — any deterministic
            #   termination criterion is valid, and the statistic compares
            #   same-scale dot products (no stiff-coordinate leakage).
            m_hi = minv_mat.astype(jnp.bfloat16)
            m_lo = (minv_mat - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def matvec3(p):
                prec = jax.lax.Precision.DEFAULT
                p_hi = p.astype(jnp.bfloat16)
                p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                mv = jnp.dot(p_hi, m_hi, precision=prec,
                             preferred_element_type=jnp.float32)
                mv += jnp.dot(p_lo, m_hi, precision=prec,
                              preferred_element_type=jnp.float32)
                mv += jnp.dot(p_hi, m_lo, precision=prec,
                              preferred_element_type=jnp.float32)
                return mv

            psharp_move = matvec3

            def psharp(p):   # turn statistic only
                return jnp.dot(p, minv_mat,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)

            def kinetic(p):
                return 0.5 * jnp.sum(p * matvec3(p), axis=1, keepdims=True)
        else:
            minv = minv_ref[0:1, :]

            def psharp(p):
                return minv * p

            psharp_move = psharp

            def kinetic(p):
                return 0.5 * jnp.sum(p * minv * p, axis=1, keepdims=True)

        neg_inf = jnp.float32(-jnp.inf)
        zf = jnp.zeros((bc, 1), jnp.float32)
        zi = jnp.zeros((bc, 1), jnp.int32)
        onei = jnp.ones((bc, 1), jnp.int32)
        valid = valid_ref[:]

        def setf(idx, v):
            colf[:, idx:idx + 1] = v

        def getf(idx):
            return colf[:, idx:idx + 1]

        def seti(idx, v):
            coli[:, idx:idx + 1] = v

        def geti(idx):
            return coli[:, idx:idx + 1]

        def make_leaf_body(d_level, _u):
            """Leaf step for a depth-``d_level`` subtree (n in [0, 2^d))."""

            def leaf_body(n, carry):
                mask = geti(ALIVE) > 0
                maskf = mask.astype(jnp.float32)
                sign = getf(SIGN)
                signi = sign.astype(jnp.int32)
                eps_signed = sign * getf(EPS)

                # leapfrog (kinetic_energy.jl:126-163 math)
                q = cur_q[:]; p = cur_p[:]; g = cur_g[:]
                half = 0.5 * eps_signed
                p_mid = p + half * g
                q_new = q + eps_signed * psharp_move(p_mid)
                logp_new, g_new = physics(q_new, data_refs)
                p_new = p_mid + half * g_new
                ps_new = psharp(p_new)
                kin_new = kinetic(p_new)
                # ANY non-finite joint density maps to -inf (= recorded
                # divergence) — the exact guard structure of the XLA tree
                # (nuts/tree.py:264-267) and kinetic_energy.jl:107-112.  An
                # isnan-only guard on delta would let delta = +inf (e.g.
                # kin -> -inf by overflow under a dense metric, or a
                # tile_logp pole) poison OMEGA for the rest of the
                # transition instead of recording DIVERGENCE.
                joint = logp_new - jnp.where(jnp.isfinite(kin_new), kin_new,
                                             jnp.inf)
                joint = jnp.where(jnp.isfinite(joint), joint, neg_inf)
                delta = joint - getf(PI0)
                delta = jnp.where(jnp.isnan(delta), neg_inf, delta)
                divergent = delta < min_delta
                # NaN containment: a non-finite model gradient (e.g. exp
                # overflow) makes q_new/p_new NaN — the leaf is divergent via
                # delta above, but the arithmetic selects below (f*a+(1-f)*b)
                # would propagate NaN even when deselected (0*NaN = NaN), so
                # replace non-finite elements with the previous point before
                # anything is stored (mirrors the XLA tree, where the -inf
                # sentinel keeps NaN out of carried state)
                q_new = jnp.where(jnp.isfinite(q_new), q_new, q)
                p_new = jnp.where(jnp.isfinite(p_new), p_new, p)
                g_new = jnp.where(jnp.isfinite(g_new), g_new, g)
                ps_new = jnp.where(jnp.isfinite(ps_new), ps_new, 0.0)
                i_new = geti(I_BASE) + (n + 1) * signi

                # visited stats (NUTS.jl:58-86) — linear-space accumulation:
                # exp(min(Δ,0)) ∈ [0,1] (Δ=-inf gives exactly 0), so the sum
                # is bounded by the leaf count and loses no precision, while
                # saving the per-leaf logaddexp transcendentals
                if "stats" not in ablate:
                    setf(SUM_ALPHA, getf(SUM_ALPHA)
                         + maskf * jnp.exp(jnp.minimum(delta, 0.0)))
                    seti(STEPS, geti(STEPS) + mask.astype(jnp.int32))

                # checkpoint store: even leaves to slot popcount(n>>1), odd
                # leaves to the dummy slot max_depth-1 (branch-free; real
                # left-edge slots never exceed max_depth-2)
                if d_level == 0:
                    slot = 0
                else:
                    slot = jnp.where(n % 2 == 0, _popcount(n >> 1),
                                     jnp.asarray(max_depth - 1, jnp.int32))
                # stacks are [md1, bc, dpad]: the dynamic slot index lands on
                # the untiled leading dim, which Mosaic allows for any dtype
                # (a dynamic index into a *tiled* dim needs packing-aligned
                # offsets and rejects bf16)
                if "ckpt" not in ablate:
                    ckpt_s[pl.ds(slot, 1)] = \
                        s_cum[:][None].astype(ckpt_dtype)
                    ckpt_ps[pl.ds(slot, 1)] = \
                        ps_new[None].astype(ckpt_dtype)
                s_cum[:] = s_cum[:] + maskf * p_new

                # within-subtree U-turn checks, innermost-first; at subtree
                # depth d only levels m < d can close.  Validity of level m
                # is m < trailing_ones(n) — a SCALAR predicate (the leaf
                # index n is lockstep-global), so each level runs under
                # pl.when: the expected number of executed levels per leaf is
                # Σ 2^-k ≈ 1 instead of d (ablation: the unconditional
                # unroll was 1.44x of kernel time at depth 7,
                # benchmarks/ablate_results.json).  Results cross leaf-level
                # pl.when scopes through the TURNF/TURNP scratch columns.
                sc = s_cum[:]
                if d_level > 0 and "turns" not in ablate:
                    t_ones = _trailing_ones(n)
                    idx_max = _popcount(n >> 1)
                    setf(TURNF, zf)
                    seti(TURNP, zi)
                    for m in range(d_level):
                        @pl.when(m < t_ones)
                        def _chk(m=m):
                            # m < t_ones(n) implies n odd, so
                            # idx_max = popcount(n) - 1 >= t_ones(n) - 1 >= m
                            # and the slot index is never negative
                            j = idx_max - m
                            rho_node = sc - ckpt_s[pl.ds(j, 1)][0] \
                                .astype(jnp.float32)
                            psl = ckpt_ps[pl.ds(j, 1)][0] \
                                .astype(jnp.float32)
                            t = jnp.logical_or(
                                jnp.sum(rho_node * psl, axis=1,
                                        keepdims=True) < 0,
                                jnp.sum(rho_node * ps_new, axis=1,
                                        keepdims=True) < 0)
                            l_pos = geti(I_BASE) \
                                + (n - (1 << (m + 1)) + 2) * signi
                            fresh = jnp.logical_and(t, getf(TURNF) <= 0.0)
                            seti(TURNP, jnp.where(fresh, l_pos, geti(TURNP)))
                            setf(TURNF, jnp.where(t, 1.0, getf(TURNF)))
                    turning = getf(TURNF) > 0.0
                    turn_pos = geti(TURNP)
                else:
                    turning = jnp.zeros((bc, 1), jnp.bool_)
                    turn_pos = zi
                turning = jnp.logical_and(turning, ~divergent)

                # progressive subtree proposal (unbiased multinomial)
                if "proposal" not in ablate:
                    omega_new = jnp.logaddexp(getf(OMEGA_SUB), delta)
                    u = _u((1 << d_level) - 1 + n)
                    take = jnp.log(u) < (delta - omega_new)
                    upd = jnp.logical_and(mask, ~divergent)
                    takeb = jnp.logical_and(upd, take)
                    takef = takeb.astype(jnp.float32)
                    sub_q[:] = takef * q_new + (1.0 - takef) * sub_q[:]
                    setf(SUB_DELTA, jnp.where(takeb, delta, getf(SUB_DELTA)))
                    setf(SUB_LOGP, jnp.where(takeb, logp_new, getf(SUB_LOGP)))
                    setf(OMEGA_SUB, jnp.where(upd, omega_new, getf(OMEGA_SUB)))

                # frontier + failure records
                cur_q[:] = maskf * q_new + (1.0 - maskf) * q
                cur_p[:] = maskf * p_new + (1.0 - maskf) * p
                cur_g[:] = maskf * g_new + (1.0 - maskf) * g
                died_div = jnp.logical_and(mask, divergent)
                died_turn = jnp.logical_and(mask, turning)
                died = jnp.logical_or(died_div, died_turn)

                # failure records fire at most once per chain per subtree;
                # skip all five column read-modify-writes on quiet leaves
                # (one scalar reduce per leaf buys ~4 vector column ops)
                @pl.when(jnp.sum(died.astype(jnp.int32)) > 0)
                def _record_deaths():
                    if "stats" not in ablate:
                        seti(DIE_L, jnp.where(
                            died_div, i_new,
                            jnp.where(died_turn,
                                      jnp.minimum(turn_pos, i_new),
                                      geti(DIE_L))))
                        seti(DIE_R, jnp.where(
                            died_div, i_new,
                            jnp.where(died_turn,
                                      jnp.maximum(turn_pos, i_new),
                                      geti(DIE_R))))
                    seti(DIED_DIV, geti(DIED_DIV) | died_div.astype(jnp.int32))
                    seti(DIED_TURN,
                         geti(DIED_TURN) | died_turn.astype(jnp.int32))
                    seti(ALIVE, jnp.where(died, 0, geti(ALIVE)))
                return 0

            return leaf_body

        def doubling_block(d, _u):
            # subtree setup (tree.jl:395-408)
            dirs = geti(DIRS)
            isf = jnp.bitwise_and(jnp.right_shift(dirs, d), 1) == 1
            isff = isf.astype(jnp.float32)
            sign = 2.0 * isff - 1.0
            cur_q[:] = isff * right_q[:] + (1.0 - isff) * left_q[:]
            cur_p[:] = isff * right_p[:] + (1.0 - isff) * left_p[:]
            # frontier gradient from the endpoint cache — one physics call
            # per doubling block saved (bit-identical: physics is a
            # deterministic function of position)
            cur_g[:] = isff * right_g[:] + (1.0 - isff) * left_g[:]
            s_cum[:] = jnp.zeros((bc, dpad), jnp.float32)
            setf(SIGN, sign)
            setf(OMEGA_SUB, jnp.full((bc, 1), neg_inf))
            seti(I_BASE, jnp.where(isf, geti(I_RIGHT), geti(I_LEFT)))
            seti(ALIVE, geti(ACTIVE))
            seti(DIED_DIV, zi)
            seti(DIED_TURN, zi)

            if d == 0:
                make_leaf_body(0, _u)(0, 0)
            else:
                # leaf-level early exit: once every row in the tile has died
                # inside this subtree (divergence / inner U-turn), the
                # remaining static iterations carry no live work — skip the
                # physics + bookkeeping body (one scalar reduce per leaf).
                leaf = make_leaf_body(d, _u)

                def guarded_leaf(n, carry, leaf=leaf):
                    @pl.when(jnp.sum(coli[:, ALIVE]) > 0)
                    def _():
                        leaf(n, 0)
                    return carry

                lax.fori_loop(0, 1 << d, guarded_leaf, 0)

            # epilogue (tree.jl:416-438)
            m = geti(ALIVE) > 0
            mf = m.astype(jnp.float32)
            if "proposal" not in ablate:
                u2 = _u((1 << max_depth) - 1 + d)
                take2 = jnp.logical_and(
                    m, jnp.log(u2) < (getf(OMEGA_SUB) - getf(OMEGA)))
                t2f = take2.astype(jnp.float32)
                prop_q[:] = t2f * sub_q[:] + (1.0 - t2f) * prop_q[:]
                setf(PROP_DELTA, jnp.where(take2, getf(SUB_DELTA),
                                           getf(PROP_DELTA)))
                setf(PROP_LOGP, jnp.where(take2, getf(SUB_LOGP),
                                          getf(PROP_LOGP)))
                setf(OMEGA, jnp.where(m, jnp.logaddexp(getf(OMEGA),
                                                       getf(OMEGA_SUB)),
                                      getf(OMEGA)))

            sign = getf(SIGN)
            isf2 = sign > 0
            ps_end = psharp(cur_p[:])
            grow_r = jnp.logical_and(m, isf2)
            grow_l = jnp.logical_and(m, ~isf2)
            grf = grow_r.astype(jnp.float32)
            glf = grow_l.astype(jnp.float32)
            i_end = geti(I_BASE) + (1 << d) * sign.astype(jnp.int32)
            right_q[:] = grf * cur_q[:] + (1.0 - grf) * right_q[:]
            right_p[:] = grf * cur_p[:] + (1.0 - grf) * right_p[:]
            right_g[:] = grf * cur_g[:] + (1.0 - grf) * right_g[:]
            left_q[:] = glf * cur_q[:] + (1.0 - glf) * left_q[:]
            left_p[:] = glf * cur_p[:] + (1.0 - glf) * left_p[:]
            left_g[:] = glf * cur_g[:] + (1.0 - glf) * left_g[:]
            ps_r[:] = grf * ps_end + (1.0 - grf) * ps_r[:]
            ps_l[:] = glf * ps_end + (1.0 - glf) * ps_l[:]
            seti(I_RIGHT, jnp.where(grow_r, i_end, geti(I_RIGHT)))
            seti(I_LEFT, jnp.where(grow_l, i_end, geti(I_LEFT)))

            rho[:] = rho[:] + mf * s_cum[:]
            seti(DEPTH, jnp.where(m, d + 1, geti(DEPTH)))

            turn_top = jnp.logical_or(
                jnp.sum(rho[:] * ps_l[:], axis=1, keepdims=True) < 0,
                jnp.sum(rho[:] * ps_r[:], axis=1, keepdims=True) < 0)
            died_top = jnp.logical_and(m, turn_top)

            term = geti(TERM)
            dd = geti(DIED_DIV) > 0
            dt = geti(DIED_TURN) > 0
            term = jnp.where(dd, term_div, term)
            term = jnp.where(dt, term_turn, term)
            term = jnp.where(died_top, term_turn, term)
            seti(TERM, term)
            inner_died = jnp.logical_or(dd, dt)
            seti(TL, jnp.where(inner_died, geti(DIE_L),
                               jnp.where(died_top, geti(I_LEFT), geti(TL))))
            seti(TR, jnp.where(inner_died, geti(DIE_R),
                               jnp.where(died_top, geti(I_RIGHT), geti(TR))))
            seti(ACTIVE, jnp.where(jnp.logical_and(m, ~turn_top), 1, 0))

        def run_transition(s):
            """One full NUTS transition starting from the sweep carry in
            ``prop_q`` (seeded from ``q0_ref`` before the dispatch below).
            ``s`` is the sweep index: the static 0 when ``n_sweep == 1``,
            the ``fori_loop`` counter otherwise."""
            if use_prng:
                def _u(idx):
                    return _uniform_from_bits((bc, 1))
            else:
                def _u(idx):
                    return unif_ref[s * n_unif_c + idx, :].reshape(bc, 1)

            q0 = prop_q[:]
            if refresh_inside:
                xi = _gauss_from_bits((bc, dpad))
                if dense:
                    # p0 = xi @ chol(M)^T — scale ref holds the transposed
                    # Cholesky padded with zero dead lanes, so p0 is 0
                    # there.  HIGHEST: the refresh distribution must match
                    # exp(-K) (once per transition — cost is negligible)
                    p0 = jnp.dot(xi, p0_ref[:],
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
                else:
                    p0 = p0_ref[0:1, :] * xi   # sqrt-mass row, 0 on dead lanes
            elif n_sweep > 1:
                # per-transition momentum stack (interpret-mode test path)
                p0 = p0_ref[pl.ds(s, 1)][0]
            else:
                p0 = p0_ref[:]

            logp0, g0 = physics(q0, data_refs)
            ps0 = psharp(p0)
            kin0 = kinetic(p0)   # same f32-grade K as every leaf (PI0 must
            pi0 = logp0 - kin0   # be measured with the leaves' energy fn)

            # trajectory init: the single initial leaf.  Only the frontier's
            # gradient is stored (cur_g); endpoint/proposal grads are
            # recomputed by one physics call per subtree / per transition,
            # keeping VMEM at 13 [BC, D] buffers.
            left_q[:] = q0; left_p[:] = p0
            right_q[:] = q0; right_p[:] = p0
            left_g[:] = g0; right_g[:] = g0
            cur_g[:] = g0
            ps_l[:] = ps0; ps_r[:] = ps0
            rho[:] = p0
            sub_q[:] = q0   # prop_q already holds q0 (it IS the carry)

            setf(OMEGA, zf); setf(OMEGA_SUB, zf + neg_inf)
            setf(PROP_DELTA, zf); setf(PROP_LOGP, logp0)
            setf(SUB_DELTA, zf); setf(SUB_LOGP, logp0)
            setf(SUM_ALPHA, zf); setf(SIGN, zf + 1.0)
            setf(PI0, pi0); setf(EPS, eps_ref[:])
            seti(I_LEFT, zi); seti(I_RIGHT, zi); seti(I_BASE, zi)
            seti(STEPS, zi); seti(TERM, zi + term_max_depth)
            seti(TL, onei); seti(TR, zi)  # REACHED_MAX_DEPTH sentinel (1, 0)
            seti(DEPTH, zi)
            # padded chain rows start inactive so tiles with padding
            # terminate with the real chains instead of running all
            # 2^max_depth iterations
            seti(ACTIVE, valid); seti(ALIVE, valid)
            seti(DIED_DIV, zi); seti(DIED_TURN, zi)
            seti(DIE_L, zi); seti(DIE_R, zi)
            if refresh_inside:
                seti(DIRS, pltpu.bitcast(pltpu.prng_random_bits((bc, 1)),
                                         jnp.int32))
            elif n_sweep > 1:
                seti(DIRS, dirs_ref[pl.ds(s, 1)][0])
            else:
                seti(DIRS, dirs_ref[:])

            # statically unrolled doubling loop, predicated per tile
            for d in range(max_depth):
                @pl.when(jnp.sum(coli[:, ACTIVE]) > 0)
                def _run(d=d):
                    doubling_block(d, _u)

            if n_sweep == 1:
                out_q[:] = prop_q[:]
                _, g_out = physics(prop_q[:], data_refs)
                out_grad[:] = g_out
                out_logp[:] = getf(PROP_LOGP)
                out_energy[:] = getf(PROP_DELTA) + getf(PI0)
                # back to log space once per transition (0 -> -inf, matching
                # the logaddexp formulation's neg-inf init)
                out_lsa[:] = jnp.log(getf(SUM_ALPHA))
                out_term[:] = geti(TERM)
                out_tl[:] = geti(TL)
                out_tr[:] = geti(TR)
                out_depth[:] = geti(DEPTH)
                out_steps[:] = geti(STEPS)
            else:
                # dynamic leading-dim stores into [n_sweep, bc, X] blocks
                # (same untiled-leading-dim pattern as the checkpoint
                # stacks); the final gradient is written once after the
                # sweep loop — intermediate transitions recompute it from
                # the carried position at their own init physics call
                out_q[pl.ds(s, 1)] = prop_q[:][None]
                out_logp[pl.ds(s, 1)] = getf(PROP_LOGP)[None]
                out_energy[pl.ds(s, 1)] = (getf(PROP_DELTA) + getf(PI0))[None]
                out_lsa[pl.ds(s, 1)] = jnp.log(getf(SUM_ALPHA))[None]
                out_term[pl.ds(s, 1)] = geti(TERM)[None]
                out_tl[pl.ds(s, 1)] = geti(TL)[None]
                out_tr[pl.ds(s, 1)] = geti(TR)[None]
                out_depth[pl.ds(s, 1)] = geti(DEPTH)[None]
                out_steps[pl.ds(s, 1)] = geti(STEPS)[None]

        # the proposal buffer doubles as the sweep carry: transition s starts
        # from the proposal of s-1 (a fully-rejected transition leaves it at
        # the start point — exactly the NUTS semantics), so n_sweep
        # transitions pay ONE kernel launch, one tile setup, and one
        # out-of-kernel scan iteration between them instead of n_sweep
        # (measured 1.83 ms/transition of scan-body cost at the flagship
        # point, benchmarks/transition_attr.json)
        prop_q[:] = q0_ref[:]
        if n_sweep == 1:
            run_transition(0)
        else:
            def sweep_body(s, carry):
                run_transition(s)
                return carry

            lax.fori_loop(0, n_sweep, sweep_body, 0)
            _, g_out = physics(prop_q[:], data_refs)
            out_grad[:] = g_out

    return kernel


def _build_transition_padded(physics, data_arrays, max_depth: int,
                             min_delta: float, block_c: int, interpret: bool,
                             dense: bool = False, ckpt_bf16: bool = False,
                             refresh_inside: bool = False, n_sweep: int = 1,
                             ablate: frozenset = frozenset()):
    """Construct the jitted padded-transition function for one physics/data
    configuration.  ``data_arrays``: tuple of 2-D f32 arrays passed whole into
    VMEM (model data: design matrices, observations, masks...).

    ``n_sweep > 1``: the kernel runs that many sequential NUTS transitions
    per launch (state carried in VMEM); outputs other than the gradient gain
    a leading ``n_sweep`` axis, and the momentum/direction/uniform inputs are
    per-transition stacks in interpret mode (in-kernel PRNG on TPU)."""
    from ..core.state import Termination

    n_data = len(data_arrays)
    md1 = max_depth  # stack slots: real left edges <= md-2, dummy md-1
    f32 = jnp.float32
    i32 = jnp.int32
    ckpt_dtype = jnp.bfloat16 if ckpt_bf16 else f32

    n_unif = ((1 << max_depth) - 1 + max_depth) * n_sweep

    @jax.jit
    def run(q0, p0, eps, dirs, valid, seed, unif, minv, *data):
        cpad, dpad = q0.shape
        # fewer chains than the configured tile: shrink the tile to the
        # (8-aligned) input rather than launching a zero-size grid
        bc = min(block_c, cpad)
        grid = (cpad // bc,)
        vec = pl.BlockSpec((bc, dpad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        # diag metric: one [1, dpad] row; dense: the whole [dpad, dpad] M^-1
        mspec = (pl.BlockSpec(memory_space=pltpu.VMEM) if dense
                 else pl.BlockSpec((1, dpad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))
        smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
        data_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in data]
        # refresh_inside: the p0 slot carries the momentum scale (sqrt-mass
        # row / transposed mass-Cholesky) instead of per-chain momenta;
        # n_sweep > 1 without refresh_inside (interpret tests): per-sweep
        # momentum/direction stacks with an untiled leading sweep dim
        svec = pl.BlockSpec((n_sweep, bc, dpad), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        scol = pl.BlockSpec((n_sweep, bc, 1), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        if refresh_inside:
            pspec = (pl.BlockSpec(memory_space=pltpu.VMEM) if dense
                     else pl.BlockSpec((1, dpad), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM))
        else:
            pspec = vec if n_sweep == 1 else svec
        dirspec = col if (n_sweep == 1 or refresh_inside) else scol

        # the kernel closes over bc but reads dpad from ref shapes; a
        # fresh _make_kernel per (bc, dpad) keeps the unrolled code exact
        k = _make_kernel(bc, dpad, max_depth, min_delta,
                         Termination.MAX_DEPTH, Termination.DIVERGENCE,
                         Termination.TURNING, physics=physics, n_data=n_data,
                         use_prng=not interpret, dense=dense,
                         ckpt_bf16=ckpt_bf16, refresh_inside=refresh_inside,
                         n_sweep=n_sweep, ablate=ablate)
        if interpret:
            uspec = pl.BlockSpec((n_unif, bc), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            in_specs = [vec, pspec, col, dirspec, col, smem1, uspec, mspec,
                        *data_specs]
            inputs = (q0, p0, eps, dirs, valid, seed, unif, minv, *data)
        else:
            in_specs = [vec, pspec, col, dirspec, col, smem1, mspec,
                        *data_specs]
            inputs = (q0, p0, eps, dirs, valid, seed, minv, *data)
        if n_sweep == 1:
            out_specs = [vec, col, vec, col, col, col, col, col, col, col]
            out_shape = [
                jax.ShapeDtypeStruct((cpad, dpad), f32),   # q
                jax.ShapeDtypeStruct((cpad, 1), f32),      # logp
                jax.ShapeDtypeStruct((cpad, dpad), f32),   # grad
                jax.ShapeDtypeStruct((cpad, 1), f32),      # energy
                jax.ShapeDtypeStruct((cpad, 1), f32),      # log_sum_alpha
                jax.ShapeDtypeStruct((cpad, 1), i32),      # term
                jax.ShapeDtypeStruct((cpad, 1), i32),      # tl
                jax.ShapeDtypeStruct((cpad, 1), i32),      # tr
                jax.ShapeDtypeStruct((cpad, 1), i32),      # depth
                jax.ShapeDtypeStruct((cpad, 1), i32),      # steps
            ]
        else:
            # grad is final-state-only ([cpad, dpad]); everything else is
            # per-transition with a leading sweep axis
            out_specs = [svec, scol, vec, scol, scol,
                         scol, scol, scol, scol, scol]
            out_shape = [
                jax.ShapeDtypeStruct((n_sweep, cpad, dpad), f32),  # q draws
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), f32),     # logp
                jax.ShapeDtypeStruct((cpad, dpad), f32),           # grad
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), f32),     # energy
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), f32),     # lsa
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), i32),     # term
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), i32),     # tl
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), i32),     # tr
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), i32),     # depth
                jax.ShapeDtypeStruct((n_sweep, cpad, 1), i32),     # steps
            ]
        return pl.pallas_call(
            k,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                *[pltpu.VMEM((bc, dpad), f32) for _ in range(15)],
                pltpu.VMEM((md1, bc, dpad), ckpt_dtype),
                pltpu.VMEM((md1, bc, dpad), ckpt_dtype),
                pltpu.VMEM((bc, 16), f32),
                pltpu.VMEM((bc, 16), i32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*inputs)

    return run


_RUN_CACHE: dict = {}
_CACHE_CAP = 16


def _cache_get(cache: dict, key, builder):
    """Insertion-ordered LRU with a small cap: these module caches exist so a
    metric re-estimate between warmup windows reuses the compiled kernel —
    not to retain every (physics, shape, config) runner a parameter sweep
    ever builds for the process lifetime."""
    if key in cache:
        cache[key] = cache.pop(key)  # refresh recency
        return cache[key]
    if len(cache) >= _CACHE_CAP:
        cache.pop(next(iter(cache)))
    val = builder()
    cache[key] = val
    return val


def make_tree_transition(tile_logp, data, dim: int, metric_inv, *,
                         max_depth: int = 10, min_delta: float = -1000.0,
                         block_c: int = 256, interpret: bool = False,
                         ckpt_bf16: bool = False,
                         tile_value_grad=None,
                         refresh_inside: bool = False,
                         padded_io: bool = False,
                         n_sweep: int = 1,
                         _ablate: frozenset = frozenset()):
    """Whole-transition kernel for **arbitrary tile physics**.

    ``tile_logp(q_tile [BC, dpad], data: dict[str, Ref]) -> logp [BC, 1]``
    must be a pure jnp function; the gradient is generated inside the kernel
    via ``jax.grad`` of the summed tile log density (per-chain densities are
    independent, so the grad of the sum is the per-chain gradient).  ``data``
    maps names to 2-D f32 arrays (auto-padded to (8k, 128k) tiles; zeros in
    the pad).  Lane hygiene is automatic: ``q`` is masked to the real ``dim``
    lanes before ``tile_logp`` and the generated gradient is masked after, so
    padded lanes can never contaminate the dynamics.

    ``tile_value_grad(q_tile, data: dict[str, Ref]) -> (logp [BC, 1],
    grad [BC, dpad])``: optional hand-fused value+gradient physics that
    bypasses the in-kernel autodiff — use when the vjp would materialize
    large per-leaf intermediates (e.g. a ``[BC, N]`` linear response) that a
    streaming formulation avoids.  ``tile_logp`` is still required (it keys
    the build cache and documents the density); masking works as above.

    ``metric_inv``: a ``[D]`` diagonal M⁻¹, a ``[D, D]`` dense M⁻¹, or a
    :class:`~inplacedhmc_tpu.core.metric.DiagMetric`/:class:`DenseMetric`.
    The dense path runs one ``[BC, dpad] @ [dpad, dpad]`` MXU matmul per
    ``p♯`` (the reference's dense kinetic energy, ``hamiltonian.jl:206-225``).

    Returns ``transition(key, z, eps, *, directions=None, momentum=None)``
    with :func:`inplacedhmc_tpu.nuts.tree.nuts_transition` semantics.

    ``refresh_inside`` (TPU only): generate the momentum refresh (Box-Muller)
    and the 32 direction bits from the in-kernel TPU PRNG instead of host
    threefry — removes the per-transition threefry dispatch and the [C, D]
    momentum HBM round trip (measured 1.83 ms/transition of out-of-kernel
    scan-body cost at 10,240x100, ``benchmarks/transition_attr.json``).
    Explicit ``directions=``/``momentum=`` are rejected in this mode.

    ``padded_io``: return ``(transition, run_padded)`` where
    ``run_padded(key, q_pad, eps_col, valid_col) -> (q_pad', logp_col,
    grad_pad, stats_padded)`` operates directly on the ``[cpad, dpad]``
    layout — a scan loop carries the padded state and pays the pad/unpad
    once per block instead of per transition.  Padded rows of ``stats`` are
    zeros (``valid`` starts them inactive).  Requires ``refresh_inside``.

    ``n_sweep > 1``: run that many sequential NUTS transitions per kernel
    launch, carrying the chain state in VMEM — one launch, one tile setup,
    and one host scan iteration amortize over the whole sweep (the measured
    1.83 ms/transition of out-of-kernel scan-body cost plus ~25 µs/tile,
    ``benchmarks/transition_attr.json``).  On TPU this requires
    ``refresh_inside`` (+ ``padded_io`` for the driver loop);
    ``run_padded`` then returns ``(q_draws [n_sweep, cpad, dpad],
    logp [n_sweep, cpad], grad_pad, stats)`` with a leading sweep axis on
    every stat — the scan carry is ``q_draws[-1]``.  In interpret mode the
    momentum/directions become per-transition stacks
    (``[n_sweep, c, dim]`` / ``[n_sweep, c]``) and ``transition`` returns
    ``(z_final, q_draws [n_sweep, c, dim], stats)`` — the CPU test path
    proving the sweep is bit-identical to sequential single-transition
    launches.
    """
    from ..core.metric import DenseMetric, DiagMetric, dense_metric
    from ..core.state import EvalPoint, TreeStats

    dpad = _round_up(dim, 128)
    if isinstance(metric_inv, DiagMetric):
        metric_inv = metric_inv.inv
    elif isinstance(metric_inv, DenseMetric):
        metric_inv = metric_inv.inv
    metric_arr = jnp.asarray(metric_inv, jnp.float32)
    dense = metric_arr.ndim == 2
    if dense:
        met = dense_metric(metric_arr)  # mass_chol for momentum draws
        minv = jnp.zeros((dpad, dpad), jnp.float32) \
            .at[:dim, :dim].set(metric_arr)
        mass_chol = met.mass_chol
        sqrt_mass = None
    else:
        minv = jnp.zeros((1, dpad), jnp.float32).at[0, :dim].set(metric_arr)
        sqrt_mass = 1.0 / jnp.sqrt(metric_arr)
        mass_chol = None
    lane_mask = jnp.zeros((1, dpad), jnp.float32).at[0, :dim].set(1.0)

    names = sorted(data)
    padded = []
    for name in names:
        arr = jnp.asarray(data[name], jnp.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        assert arr.ndim == 2, f"data[{name!r}] must be 1-D or 2-D"
        r = _round_up(max(arr.shape[0], 1), 8)
        cpd = _round_up(arr.shape[1], 128)
        padded.append(jnp.zeros((r, cpd), jnp.float32)
                      .at[:arr.shape[0], :arr.shape[1]].set(arr))
    padded = tuple(padded)
    n_data = len(padded) + 1  # + lane mask (always the last data ref)

    # cache the built (and later jit-compiled) runner by static config so a
    # metric re-estimate between warmup stages does not trigger a recompile:
    # the metric is a runtime argument of `run`
    if refresh_inside and interpret:
        raise ValueError("refresh_inside needs the TPU PRNG "
                         "(incompatible with interpret mode)")
    if n_sweep > 1 and not (refresh_inside or interpret):
        raise ValueError("n_sweep > 1 needs refresh_inside (TPU) or "
                         "interpret mode (explicit per-sweep stacks)")
    if padded_io and not (refresh_inside or interpret):
        raise ValueError("padded_io requires refresh_inside (TPU) or "
                         "interpret mode (host-drawn stacks)")
    cache_key = (tile_logp, tile_value_grad, tuple(names),
                 tuple(a.shape for a in padded),
                 dim, max_depth, float(min_delta), block_c, interpret,
                 dense, ckpt_bf16, refresh_inside, n_sweep, _ablate)

    def _build_run():
        def physics(q, data_refs):
            refs = {name: data_refs[k] for k, name in enumerate(names)}
            mask = data_refs[-1][0:1, :]
            q_eff = q * mask
            if tile_value_grad is not None:
                logp, grad = tile_value_grad(q_eff, refs)
                return logp, grad * mask
            # vjp shares the forward pass between value and gradient: for
            # matmul-dominated physics (logistic: eta = q Xᵀ) this is 2 MXU
            # matmuls per leaf instead of the 3 that a separate
            # jax.grad(total) call costs (its forward recomputes eta)
            logp, vjp_fn = jax.vjp(lambda qq: tile_logp(qq, refs), q_eff)
            grad = vjp_fn(jnp.ones_like(logp))[0] * mask
            return logp, grad

        return _build_transition_padded(physics, padded + (lane_mask,),
                                        max_depth, min_delta, block_c,
                                        interpret, dense=dense,
                                        ckpt_bf16=ckpt_bf16,
                                        refresh_inside=refresh_inside,
                                        n_sweep=n_sweep, ablate=_ablate)

    run = _cache_get(_RUN_CACHE, cache_key, _build_run)

    if refresh_inside or (padded_io and interpret):
        # momentum-scale array riding in the p0 input slot (in-kernel
        # Box-Muller on TPU; host-side draws in the interpret fallback)
        scale_arr = (jnp.zeros((dpad, dpad), jnp.float32)
                     .at[:dim, :dim].set(mass_chol.T) if dense else
                     jnp.zeros((1, dpad), jnp.float32)
                     .at[0, :dim].set(sqrt_mass))

    n_unif_1 = (1 << max_depth) - 1 + max_depth

    def _run_padded(key, q0, epsc, validc):
        cpad = q0.shape[0]
        if refresh_inside:
            k_seed, _ = jax.random.split(key)
            seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)
            dirsc = jnp.zeros((cpad, 1), jnp.int32)   # drawn in-kernel
            unif = jnp.zeros((1, 1), jnp.float32)
            p_arg = scale_arr
        else:
            # interpret-mode fallback (CPU tests of the padded/sweep driver
            # loop): momentum, direction bits and proposal uniforms are
            # host-drawn per-transition stacks — same kernel semantics,
            # different (threefry) stream than the TPU PRNG
            k_p, k_dir, k_seed, k_u = jax.random.split(key, 4)
            xi = jax.random.normal(k_p, (n_sweep, cpad, dpad), jnp.float32)
            if dense:
                # xi @ chol(M)^T, matching the in-kernel dense refresh
                p_stack = jnp.einsum("scd,de->sce", xi, scale_arr)
            else:
                p_stack = scale_arr[0] * xi
            dir_stack = jax.random.bits(
                k_dir, (n_sweep, cpad, 1), jnp.uint32).astype(jnp.int32)
            if n_sweep == 1:
                p_arg, dirsc = p_stack[0], dir_stack[0]
            else:
                p_arg, dirsc = p_stack, dir_stack
            seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)
            unif = jax.random.uniform(k_u, (n_sweep * n_unif_1, cpad),
                                      jnp.float32)
        (q, logp, grad, energy, lsa, term, tl, tr, depth, steps) = run(
            q0, p_arg, epsc, dirsc, validc, seed, unif, minv,
            *padded, lane_mask)
        # n_sweep == 1: [cpad, X] outputs; n_sweep > 1: leading sweep axis
        # on everything except grad (final state only) — `...` handles both
        steps_p = steps[..., 0]
        accept = jnp.minimum(
            jnp.exp(lsa[..., 0]) / jnp.maximum(steps_p, 1).astype(jnp.float32),
            1.0)
        stats = TreeStats(
            energy=energy[..., 0], acceptance_rate=accept,
            termination=term[..., 0],
            term_left=tl[..., 0], term_right=tr[..., 0],
            depth=depth[..., 0], steps=steps_p)
        return q, logp, grad, stats

    def transition(key, z, eps, *, directions=None, momentum=None,
                   _unif=None):
        c = z.q.shape[0]
        assert z.q.shape[1] == dim
        cpad, bc = chain_tiles(c, block_c)
        assert bc == block_c or cpad == bc, "n_chains must fill the tile"

        key, k_p, k_dir, k_seed = jax.random.split(key, 4)
        if refresh_inside:
            assert directions is None and momentum is None, (
                "refresh_inside draws momentum/directions in-kernel; the "
                "explicit test hooks need a refresh_inside=False build")
            q0 = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :dim].set(z.q)
            epsc = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
                jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (c,)))
            validc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(1)
            q, logp, grad, stats = _run_padded(k_seed, q0, epsc, validc)
            if n_sweep > 1:
                z_new = EvalPoint(q=q[-1, :c, :dim], logp=logp[-1, :c, 0],
                                  grad=grad[:c, :dim])
                return (z_new, q[:, :c, :dim],
                        jax.tree_util.tree_map(lambda x: x[:, :c], stats))
            z_new = EvalPoint(q=q[:c, :dim], logp=logp[:c, 0],
                              grad=grad[:c, :dim])
            return z_new, jax.tree_util.tree_map(lambda x: x[:c], stats)

        n_unif1 = (1 << max_depth) - 1 + max_depth
        if n_sweep > 1:
            # interpret-only sweep path with explicit per-transition stacks —
            # the bit-exactness test bed (vs sequential n_sweep=1 launches)
            assert momentum is not None and directions is not None, (
                "n_sweep > 1 without refresh_inside requires explicit "
                "momentum [n_sweep, c, dim] and directions [n_sweep, c]")
            assert momentum.shape == (n_sweep, c, dim)
            assert directions.shape == (n_sweep, c)
            q0 = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :dim].set(z.q)
            p0 = jnp.zeros((n_sweep, cpad, dpad), jnp.float32) \
                .at[:, :c, :dim].set(momentum)
            dirsc = jnp.zeros((n_sweep, cpad, 1), jnp.int32) \
                .at[:, :c, 0].set(directions.astype(jnp.int32))
            epsc = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
                jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (c,)))
            validc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(1)
            seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)
            unif = _unif if _unif is not None else jax.random.uniform(
                k_seed, (n_sweep * n_unif1, cpad), jnp.float32)
            (q, logp, grad, energy, lsa, term, tl, tr, depth, steps) = run(
                q0, p0, epsc, dirsc, validc, seed, unif, minv,
                *padded, lane_mask)
            steps_s = steps[:, :c, 0]
            accept = jnp.minimum(
                jnp.exp(lsa[:, :c, 0])
                / jnp.maximum(steps_s, 1).astype(jnp.float32), 1.0)
            stats = TreeStats(
                energy=energy[:, :c, 0], acceptance_rate=accept,
                termination=term[:, :c, 0],
                term_left=tl[:, :c, 0], term_right=tr[:, :c, 0],
                depth=depth[:, :c, 0], steps=steps_s)
            z_new = EvalPoint(q=q[-1, :c, :dim], logp=logp[-1, :c, 0],
                              grad=grad[:c, :dim])
            return z_new, q[:, :c, :dim], stats

        if momentum is None:
            xi = jax.random.normal(k_p, (c, dim), jnp.float32)
            momentum = xi @ mass_chol.T if dense else sqrt_mass * xi
        if directions is None:
            directions = jax.random.bits(k_dir, (c,), jnp.uint32)
        seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)
        if interpret:
            unif = _unif if _unif is not None else jax.random.uniform(
                k_seed, (n_unif1, cpad), jnp.float32)
        else:
            unif = jnp.zeros((1, 1), jnp.float32)

        q0 = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :dim].set(z.q)
        p0 = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :dim].set(momentum)
        epsc = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
            jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (c,)))
        dirsc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(
            directions.astype(jnp.int32))
        validc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(1)

        (q, logp, grad, energy, lsa, term, tl, tr, depth, steps) = run(
            q0, p0, epsc, dirsc, validc, seed, unif, minv, *padded, lane_mask)

        steps_c = steps[:c, 0]
        accept = jnp.minimum(
            jnp.exp(lsa[:c, 0]) / jnp.maximum(steps_c, 1).astype(jnp.float32),
            1.0)
        stats = TreeStats(
            energy=energy[:c, 0], acceptance_rate=accept,
            termination=term[:c, 0], term_left=tl[:c, 0], term_right=tr[:c, 0],
            depth=depth[:c, 0], steps=steps_c)
        z_new = EvalPoint(q=q[:c, :dim], logp=logp[:c, 0], grad=grad[:c, :dim])
        return z_new, stats

    if padded_io:
        # metadata the sampling driver needs to build the padded state
        # (adapt.warmup.SweepRunner)
        _run_padded.block_c = block_c
        _run_padded.n_sweep = n_sweep
        _run_padded.dim = dim
        return transition, _run_padded
    return transition


def _gaussian_tile_logp(q, refs):
    lam = refs["lam"][0:1, :]
    return -0.5 * jnp.sum(lam * q * q, axis=1, keepdims=True)


def make_gaussian_tree_transition(precision, metric_inv, *, max_depth: int = 10,
                                  min_delta: float = -1000.0,
                                  block_c: int = 512, interpret: bool = False,
                                  ckpt_bf16: bool = False,
                                  refresh_inside: bool = False,
                                  padded_io: bool = False,
                                  n_sweep: int = 1,
                                  _ablate: frozenset = frozenset()):
    """Whole-transition kernel for ``grad = -precision * q`` targets — the
    flagship benchmark configuration, built on :func:`make_tree_transition`.
    The module-level ``_gaussian_tile_logp`` keeps the build cache shared
    across metric updates."""
    precision = jnp.asarray(precision, jnp.float32)
    d = precision.shape[0]
    return make_tree_transition(_gaussian_tile_logp, {"lam": precision}, d,
                                metric_inv, max_depth=max_depth,
                                min_delta=min_delta, block_c=block_c,
                                interpret=interpret, ckpt_bf16=ckpt_bf16,
                                refresh_inside=refresh_inside,
                                padded_io=padded_io, n_sweep=n_sweep,
                                _ablate=_ablate)


def _dense_gaussian_tile_logp(q, refs):
    g = -jax.lax.dot_general(q, refs["prec"][:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return 0.5 * jnp.sum(g * q, axis=1, keepdims=True)


def _dense_gaussian_tile_vg(q, refs):
    # symmetric precision: grad = -P q is ONE MXU matmul; the log density
    # 0.5 * q . grad falls out of the same product (NUTS.jl:159-169 ethos)
    g = -jax.lax.dot_general(q, refs["prec"][:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return 0.5 * jnp.sum(g * q, axis=1, keepdims=True), g


def make_dense_gaussian_tree_transition(precision, metric_inv, *,
                                        max_depth: int = 10,
                                        min_delta: float = -1000.0,
                                        block_c: int = 256,
                                        interpret: bool = False,
                                        ckpt_bf16: bool = False,
                                        refresh_inside: bool = False,
                                        padded_io: bool = False,
                                        n_sweep: int = 1,
                                        _ablate: frozenset = frozenset()):
    """Whole-transition kernel for dense-precision Gaussian targets
    (``models/gaussian.py::mvn``): ``grad = -P q`` is one ``[BC, dpad] @
    [dpad, dpad]`` MXU matmul per leaf (the hand-fused value+gradient shares
    it).  ``precision`` must be symmetric.  Pads ``P`` with an identity block
    on the dead lanes' diagonal — harmless (q lanes are masked) but keeps the
    padded quadratic form non-degenerate for the in-kernel energies."""
    precision = jnp.asarray(precision, jnp.float32)
    d = precision.shape[0]
    dpad = _round_up(d, 128)
    prec_pad = jnp.eye(dpad, dtype=jnp.float32).at[:d, :d].set(precision)
    return make_tree_transition(_dense_gaussian_tile_logp, {"prec": prec_pad},
                                d, metric_inv, max_depth=max_depth,
                                min_delta=min_delta, block_c=block_c,
                                interpret=interpret, ckpt_bf16=ckpt_bf16,
                                tile_value_grad=_dense_gaussian_tile_vg,
                                refresh_inside=refresh_inside,
                                padded_io=padded_io, n_sweep=n_sweep,
                                _ablate=_ablate)


_LOGISTIC_TILE_CACHE: dict = {}


def make_logistic_tree_transition(x, y, inv_var, metric_inv, *,
                                  max_depth: int = 10,
                                  min_delta: float = -1000.0,
                                  block_c: int = 128, interpret: bool = False,
                                  ckpt_bf16: bool = False,
                                  refresh_inside: bool = False,
                                  padded_io: bool = False,
                                  n_sweep: int = 1,
                                  physics_mode: str = "chunked",
                                  grad_bf16: bool = False,
                                  block_n: int = 2048):
    """Whole-transition kernel for Bayesian logistic regression — the primary
    ESS/s benchmark target (BASELINE config 3).

    ``physics_mode="chunked"`` (default): hand-fused value+gradient physics
    mirroring :mod:`~inplacedhmc_tpu.ops.logistic_pallas` — the design matrix
    stays resident in VMEM **obs-major** (``[N_pad, dpad]``, ~5 MB at
    10k x 50) and each leapfrog leaf streams it in ``[block_n, dpad]`` slices:
    per slice one forward MXU contraction (``eta``), one shared
    ``exp(-|eta|)`` serving both the stable ``log1p`` and the sigmoid
    residual, and one backward MXU contraction accumulating the gradient.
    The ``[BC, N]`` response never exists; peak extra VMEM per leaf is
    ``O(BC x block_n)``.  ``grad_bf16`` runs the backward contraction with
    bf16 inputs / f32 accumulation (exactness-preserving: HMC is valid for
    any deterministic gradient field; the log density stays f32).

    ``physics_mode="vjp"``: the original formulation (``Xᵀ`` resident, leaf
    gradient via in-kernel autodiff, full ``[BC, N]`` intermediates) — kept
    for A/B measurement.

    Works with diagonal *and* dense metrics (the benchmark config mandates
    dense, ``BASELINE.json:8``; reference dense path
    ``hamiltonian.jl:206-225``).  Tile physics are cached per
    ``(inv_var, mode, grad_bf16, block_n)`` so metric re-estimates between
    warmup windows reuse the compiled kernel (the metric is a runtime
    argument).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n_obs, d = x.shape
    pk = float(inv_var)
    dpad = _round_up(d, 128)

    if physics_mode == "vjp":
        key = (pk, "vjp")
        def _build_vjp_tile():
            def tile_logp(q, refs):
                xt = refs["xt"][:]            # [dpad, npad]
                yrow = refs["yobs"][0:1, :]   # [1, npad]
                obs = refs["obsmask"][0:1, :]
                eta = jnp.dot(q, xt, preferred_element_type=jnp.float32)
                # y*eta - log(1+exp(eta)), padded observations masked out
                ll = jnp.sum(obs * (yrow * eta - jnp.logaddexp(0.0, eta)),
                             axis=1, keepdims=True)
                return ll - 0.5 * pk * jnp.sum(q * q, axis=1, keepdims=True)

            return tile_logp, None

        tile_logp, tile_vg = _cache_get(_LOGISTIC_TILE_CACHE, key,
                                        _build_vjp_tile)
        # Xᵀ rows must align with the q tile's padded lane count (the generic
        # padder only rounds to (8, 128) tiles)
        xt = jnp.zeros((dpad, n_obs), jnp.float32).at[:d, :].set(x.T)
        data = {"xt": xt, "yobs": y,
                "obsmask": jnp.ones((n_obs,), jnp.float32)}
    elif physics_mode == "chunked":
        key = (pk, "chunked", bool(grad_bf16), int(block_n))
        def _build_chunked_tile():
            bn = int(block_n)
            bf16 = bool(grad_bf16)

            def tile_logp(q, refs):
                # reference density for the chunked data layout (cache key /
                # documentation; runtime uses tile_vg below)
                xo = refs["xobs"][:]          # [npad, dpad]
                yrow = refs["yw"][0:1, :]     # [1, npad]
                w = refs["yw"][1:2, :]
                eta = jax.lax.dot_general(q, xo, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                ll = jnp.sum(w * (yrow * eta - jnp.logaddexp(0.0, eta)),
                             axis=1, keepdims=True)
                return ll - 0.5 * pk * jnp.sum(q * q, axis=1, keepdims=True)

            def tile_vg(q, refs):
                xr, ywr = refs["xobs"], refs["yw"]
                npad = xr.shape[0]
                logp = -0.5 * pk * jnp.sum(q * q, axis=1, keepdims=True)
                grad = -pk * q
                for j in range(npad // bn):
                    xs = xr[j * bn:(j + 1) * bn, :]       # [bn, dpad]
                    ys = ywr[0:1, j * bn:(j + 1) * bn]    # [1, bn]
                    ws = ywr[1:2, j * bn:(j + 1) * bn]
                    # forward eta stays f32: the log density must match the
                    # XLA potential (energies drive accept/reject)
                    eta = jax.lax.dot_general(
                        q, xs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [BC, bn]
                    # t = e^{-|eta|} serves the stable log(1+e^eta) AND the
                    # sigmoid (logistic_pallas.py:53-63 — one transcendental
                    # pair per element)
                    t = jnp.exp(-jnp.abs(eta))
                    ll = ys * eta - (jnp.maximum(eta, 0.0) + jnp.log1p(t))
                    logp = logp + jnp.sum(ll * ws, axis=1, keepdims=True)
                    inv1pt = 1.0 / (1.0 + t)
                    sig = jnp.where(eta >= 0.0, inv1pt, t * inv1pt)
                    resid = (ys - sig) * ws
                    if bf16:
                        # backward contraction only: bf16 inputs, f32
                        # accumulate (logistic_pallas.py:65-76 semantics —
                        # a deterministic perturbed gradient keeps HMC exact;
                        # logp is NOT touched)
                        resid = resid.astype(jnp.bfloat16)
                        xs = xs.astype(jnp.bfloat16)
                    grad = grad + jax.lax.dot_general(
                        resid, xs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return logp, grad

            return tile_logp, tile_vg

        tile_logp, tile_vg = _cache_get(_LOGISTIC_TILE_CACHE, key,
                                        _build_chunked_tile)
        npad = _round_up(n_obs, block_n)
        xo = jnp.zeros((npad, dpad), jnp.float32).at[:n_obs, :d].set(x)
        yw = jnp.zeros((2, npad), jnp.float32)
        yw = yw.at[0, :n_obs].set(y).at[1, :n_obs].set(1.0)
        data = {"xobs": xo, "yw": yw}
    else:
        raise ValueError(f"unknown physics_mode {physics_mode!r}")

    return make_tree_transition(tile_logp, data, d, metric_inv,
                                max_depth=max_depth, min_delta=min_delta,
                                block_c=block_c, interpret=interpret,
                                ckpt_bf16=ckpt_bf16, tile_value_grad=tile_vg,
                                refresh_inside=refresh_inside,
                                padded_io=padded_io, n_sweep=n_sweep)
