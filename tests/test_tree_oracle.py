"""Deterministic-tree validation: iterative lockstep tree vs recursive oracle.

The reference keeps ``Directions`` constructible from a fixed ``UInt32``
explicitly for this kind of test (``tree.jl:134-139``).  With (q0, p0, eps,
direction bits) fixed, everything except proposal selection is deterministic;
we compare the iterative ``lax.while_loop`` implementation against the slow
recursive numpy oracle on many random configurations (SURVEY.md §4.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad
from inplacedhmc_tpu.core.metric import diag_metric
from inplacedhmc_tpu.core.state import EvalPoint, Termination
from inplacedhmc_tpu.nuts.tree import nuts_transition

from _oracle import oracle_trajectory

TERM_NAME = {Termination.MAX_DEPTH: "max_depth",
             Termination.DIVERGENCE: "divergence",
             Termination.TURNING: "turning"}


def _quadratic_model(d, seed):
    rng = np.random.default_rng(seed)
    prec = rng.gamma(2.0, size=d) + 0.1

    def logp_np(q):
        return -0.5 * float(q @ (prec * q)), -prec * q

    def logp_jax(q):
        return -0.5 * jnp.sum(q * (jnp.asarray(prec) * q))

    return logp_np, logp_jax, prec


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("eps", [0.05, 0.3, 0.9, 2.5])
def test_tree_matches_oracle(seed, eps):
    d = 5
    c = 16
    max_depth = 6
    logp_np, logp_jax, _ = _quadratic_model(d, seed)
    rng = np.random.default_rng(100 + seed)
    q0 = rng.normal(size=(c, d)) * 1.5
    p0 = rng.normal(size=(c, d))
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)
    inv = rng.gamma(2.0, size=d) + 0.2

    pot = batched_logdensity_and_grad(logp_jax)
    metric = diag_metric(jnp.asarray(inv))
    logp, grad = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=logp, grad=grad)

    z_new, stats = nuts_transition(
        jax.random.PRNGKey(seed), pot, metric, z, jnp.asarray(eps),
        max_depth=max_depth, directions=jnp.asarray(dirs),
        momentum=jnp.asarray(p0))

    for i in range(c):
        want = oracle_trajectory(logp_np, inv, q0[i], p0[i], eps, int(dirs[i]),
                                 max_depth=max_depth)
        tag = f"chain {i} seed {seed} eps {eps}"
        assert TERM_NAME[int(stats.termination[i])] == want["termination"], tag
        assert int(stats.depth[i]) == want["depth"], tag
        assert int(stats.steps[i]) == want["steps"], tag
        if want["termination"] != "max_depth":
            assert int(stats.term_left[i]) == want["term_left"], tag
            assert int(stats.term_right[i]) == want["term_right"], tag
        np.testing.assert_allclose(float(stats.acceptance_rate[i]),
                                   want["accept"], atol=1e-8, err_msg=tag)
        # the proposal must be one of the final trajectory's leaves, with the
        # recorded position matching the recorded energy offset
        # (stats.energy = pi0 + delta of proposal)
        leaves = want["leaves"]
        pos = None
        delta_got = float(stats.energy[i]) - want["pi0"]
        for p_i, w in leaves.items():
            if abs(w - delta_got) < 1e-8:
                pos = p_i
                break
        assert pos is not None, f"{tag}: proposal delta {delta_got} not among leaf weights"


def test_divergent_first_step_returns_initial_point():
    """A hugely divergent first leaf must terminate with the initial point as
    the proposal (tree.jl:416-417: invalid adjacent tree keeps current ζ)."""
    d = 3

    def logp_jax(q):
        return -0.5 * jnp.sum(q * q) * 1e6  # extreme curvature

    pot = batched_logdensity_and_grad(logp_jax)
    metric = diag_metric(jnp.ones(d))
    q0 = jnp.ones((4, d))
    logp, grad = pot(q0)
    z = EvalPoint(q=q0, logp=logp, grad=grad)
    z_new, stats = nuts_transition(jax.random.PRNGKey(0), pot, metric, z,
                                   jnp.asarray(10.0), max_depth=5)
    assert np.all(np.asarray(stats.termination) == Termination.DIVERGENCE)
    assert np.all(np.asarray(stats.depth) == 0)
    assert np.all(np.asarray(stats.steps) == 1)
    np.testing.assert_array_equal(np.asarray(z_new.q), np.asarray(q0))
    # divergence positions are +-1, left == right (InvalidTree, tree.jl:278-285)
    np.testing.assert_array_equal(np.asarray(stats.term_left),
                                  np.asarray(stats.term_right))
    assert set(np.asarray(stats.term_left).tolist()) <= {-1, 1}


def test_max_depth_sentinel():
    """Fine step size on a flat-ish target: trees reach max depth and report
    the (1, 0) sentinel (tree.jl:299-300)."""
    d = 2

    def logp_jax(q):
        return -0.5 * jnp.sum(q * q) * 1e-4

    pot = batched_logdensity_and_grad(logp_jax)
    metric = diag_metric(jnp.ones(d))
    q0 = jnp.zeros((3, d))
    logp, grad = pot(q0)
    z = EvalPoint(q=q0, logp=logp, grad=grad)
    _, stats = nuts_transition(jax.random.PRNGKey(1), pot, metric, z,
                               jnp.asarray(0.01), max_depth=4)
    assert np.all(np.asarray(stats.termination) == Termination.MAX_DEPTH)
    assert np.all(np.asarray(stats.depth) == 4)
    assert np.all(np.asarray(stats.steps) == 15)  # 1+2+4+8
    np.testing.assert_array_equal(np.asarray(stats.term_left), 1)
    np.testing.assert_array_equal(np.asarray(stats.term_right), 0)


def test_max_depth_cap_enforced():
    """max_depth > 30 would silently bias doubling directions (32-bit
    direction words, int32 2^d — the reference's hard cap, tree.jl:131);
    the transition must reject it loudly."""
    from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad, evaluate
    from inplacedhmc_tpu.core.metric import identity_metric
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.nuts.tree import nuts_transition

    model = std_normal(2)
    pot = batched_logdensity_and_grad(model.logp)
    z = evaluate(pot, jnp.zeros((2, 2), jnp.float32))
    with pytest.raises(ValueError):
        nuts_transition(jax.random.PRNGKey(0), pot, identity_metric(2, jnp.float32),
                        z, jnp.asarray(0.5, jnp.float32), max_depth=31)
