"""Diagnostics tests: EBFMI, summaries, R-hat, ESS (SURVEY.md C16 + north-star)."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.core.state import Termination, TreeStats
from inplacedhmc_tpu.models import std_normal


def test_ebfmi_iid_energies_near_two():
    """For iid energies, E[diff^2] = 2 var -> EBFMI ~ 2."""
    rng = np.random.default_rng(0)
    e = rng.normal(size=(5000, 3))
    val = np.asarray(diag.ebfmi(jnp.asarray(e)))
    np.testing.assert_allclose(val, 2.0, atol=0.15)


def test_rhat_iid_chains_near_one():
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(500, 8, 4))
    r = np.asarray(diag.split_rhat(jnp.asarray(draws)))
    np.testing.assert_allclose(r, 1.0, atol=0.03)


def test_rhat_detects_disjoint_chains():
    rng = np.random.default_rng(2)
    draws = rng.normal(size=(500, 8, 2))
    draws[:, :4, 0] += 5.0  # half the chains offset in dim 0
    r = np.asarray(diag.split_rhat(jnp.asarray(draws)))
    assert r[0] > 1.5, r
    assert abs(r[1] - 1.0) < 0.05, r


def test_rhat_detects_within_chain_drift():
    rng = np.random.default_rng(3)
    draws = rng.normal(size=(600, 4, 1))
    draws[:, :, 0] += np.linspace(0, 4, 600)[:, None]  # trend: split-Rhat catches it
    r = np.asarray(diag.split_rhat(jnp.asarray(draws)))
    assert r[0] > 1.2, r


def test_ess_iid_near_total():
    rng = np.random.default_rng(4)
    n, c, d = 400, 8, 3
    draws = rng.normal(size=(n, c, d))
    ess = np.asarray(diag.ess_bulk(jnp.asarray(draws)))
    total = (n // 2) * 2 * c
    assert np.all(ess > 0.5 * total), (ess, total)


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient phi has tau = (1+phi)/(1-phi)."""
    rng = np.random.default_rng(5)
    phi = 0.9
    n, c = 4000, 8
    x = np.zeros((n, c, 1))
    noise = rng.normal(size=(n, c, 1)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + noise[t]
    ess = float(np.asarray(diag.ess_bulk(jnp.asarray(x)))[0])
    total = (n // 2) * 2 * c
    tau_true = (1 + phi) / (1 - phi)  # = 19
    assert 0.5 * total / tau_true < ess < 2.0 * total / tau_true, (ess, total / tau_true)


def test_summarize_tree_statistics():
    c = 100
    stats = TreeStats(
        energy=jnp.zeros(c),
        acceptance_rate=jnp.linspace(0, 1, c),
        termination=jnp.asarray([Termination.MAX_DEPTH] * 50 +
                                [Termination.DIVERGENCE] * 20 +
                                [Termination.TURNING] * 30),
        term_left=jnp.zeros(c, jnp.int32), term_right=jnp.zeros(c, jnp.int32),
        depth=jnp.asarray([3] * 60 + [5] * 40, jnp.int32),
        steps=jnp.full(c, 7, jnp.int32))
    s = diag.summarize_tree_statistics(stats)
    assert s.n == 100
    assert s.termination_counts == {"max_depth": 50, "divergence": 20, "turning": 30}
    assert s.depth_counts == {3: 60, 5: 40}
    assert "acceptance rate" in str(s)
    assert diag.divergence_fraction(stats) == 0.2


def test_explore_log_acceptance_ratios_and_trajectory():
    model = std_normal(4)
    grid = diag.explore_log_acceptance_ratios(model, np.zeros(4), [-3, -1, 0, 1],
                                              key=jax.random.PRNGKey(0))
    assert grid.shape == (4, 20)
    # smaller steps -> better acceptance (less negative log ratios)
    assert float(jnp.mean(grid[0])) > float(jnp.mean(grid[3])) - 1e-9

    pts = diag.leapfrog_trajectory(model, np.zeros(4), 0.3, range(-5, 6),
                                   key=jax.random.PRNGKey(1))
    assert [p.position for p in pts] == list(range(-5, 6))
    assert pts[5].delta == 0.0
    assert all(np.isfinite(p.delta) for p in pts)


def test_rank_normalized_rhat_and_tail_ess():
    rng = np.random.default_rng(7)
    good = jnp.asarray(rng.normal(size=(400, 8, 2)))
    r = np.asarray(diag.rhat_rank(good))
    np.testing.assert_allclose(r, 1.0, atol=0.05)
    # heavy-tailed draws: plain moments unstable but rank-rhat still ~1
    heavy = jnp.asarray(rng.standard_t(df=1.5, size=(400, 8, 2)))
    r2 = np.asarray(diag.rhat_rank(heavy))
    np.testing.assert_allclose(r2, 1.0, atol=0.08)
    # disjoint chains flagged
    bad = np.asarray(good).copy()
    bad[:, :4, 0] += 4.0
    r3 = np.asarray(diag.rhat_rank(jnp.asarray(bad)))
    assert r3[0] > 1.3

    te = np.asarray(diag.ess_tail(good))
    total = 400 * 8
    assert np.all(te > 0.3 * total), te


def test_lockstep_utilization():
    c = 4
    stats = TreeStats(
        energy=jnp.zeros(c), acceptance_rate=jnp.ones(c) * 0.8,
        termination=jnp.full(c, Termination.TURNING, jnp.int32),
        term_left=jnp.zeros(c, jnp.int32), term_right=jnp.ones(c, jnp.int32),
        depth=jnp.asarray([3, 3, 3, 3], jnp.int32),
        steps=jnp.asarray([15, 15, 15, 15], jnp.int32))
    # all chains at depth 3 -> d_exit 4 -> executed 15; full utilization
    assert abs(diag.lockstep_utilization(stats) - 1.0) < 1e-9
    # one straggler at depth 6 -> executed 127, others still use 15
    stats2 = stats._replace(depth=jnp.asarray([3, 3, 3, 6], jnp.int32),
                            steps=jnp.asarray([15, 15, 15, 127], jnp.int32))
    u = diag.lockstep_utilization(stats2)
    assert 0.3 < u < 0.5, u


def test_tiled_lockstep_utilization():
    c = 4
    base = TreeStats(
        energy=jnp.zeros(c), acceptance_rate=jnp.ones(c) * 0.8,
        termination=jnp.full(c, Termination.TURNING, jnp.int32),
        term_left=jnp.zeros(c, jnp.int32), term_right=jnp.ones(c, jnp.int32),
        depth=jnp.asarray([3, 3, 3, 6], jnp.int32),
        steps=jnp.asarray([15, 15, 15, 127], jnp.int32))
    # whole batch in one tile == the global lockstep number
    u_all = diag.tiled_lockstep_utilization(base, block_c=4)
    assert abs(u_all - diag.lockstep_utilization(base)) < 1e-9
    # tiles of 2: [3,3] executes 15, [3,6] executes 127 -> tiling isolates
    # the straggler and utilization improves
    u2 = diag.tiled_lockstep_utilization(base, block_c=2)
    expected = (15 + 15 + 15 + 127) / ((15 + 127) * 2)
    assert abs(u2 - expected) < 1e-9
    assert u2 > u_all
    # padding counts as waste: 3 chains in tiles of 2 pads one dead row
    pad = TreeStats(
        energy=jnp.zeros(3), acceptance_rate=jnp.ones(3) * 0.8,
        termination=jnp.full(3, Termination.TURNING, jnp.int32),
        term_left=jnp.zeros(3, jnp.int32), term_right=jnp.ones(3, jnp.int32),
        depth=jnp.asarray([3, 3, 3], jnp.int32),
        steps=jnp.asarray([15, 15, 15], jnp.int32))
    u3 = diag.tiled_lockstep_utilization(pad, block_c=2)
    assert abs(u3 - 45 / 60) < 1e-9


def test_tiled_vs_plain_utilization_multi_transition():
    """Over N>1 transitions the two utilization functions aggregate
    differently by design: lockstep_utilization averages per-transition
    ratios, tiled_lockstep_utilization is the work-weighted global
    sum(used)/sum(executed) — they diverge when exit depth varies across
    transitions (ADVICE r2)."""
    c = 2
    mk = lambda depth, steps: TreeStats(
        energy=jnp.zeros((2, c)), acceptance_rate=jnp.ones((2, c)) * 0.8,
        termination=jnp.full((2, c), Termination.TURNING, jnp.int32),
        term_left=jnp.zeros((2, c), jnp.int32),
        term_right=jnp.ones((2, c), jnp.int32),
        depth=jnp.asarray(depth, jnp.int32),
        steps=jnp.asarray(steps, jnp.int32))
    # transition 0: both chains depth 3 (executed 15, used 30)
    # transition 1: one straggler depth 6 (executed 127, used 30)
    stats = mk([[3, 3], [3, 6]], [[15, 15], [15, 15]])
    plain = diag.lockstep_utilization(stats)
    tiled = diag.tiled_lockstep_utilization(stats, block_c=2)
    # per-transition ratios: 1.0 and 30/254 -> mean 0.559
    assert abs(plain - 0.5 * (1.0 + 30 / 254)) < 1e-9
    # work-weighted: (30 + 30) / (30 + 254) = 0.211
    assert abs(tiled - 60 / 284) < 1e-9
    assert tiled < plain
