"""End-to-end statistical integration tests (SURVEY.md §4.3, BASELINE configs).

Moment checks follow the correctness bar: posterior moments within Monte-Carlo
error of the truth.  Sizes are scaled down for CI speed; the full-size configs
run in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import inplacedhmc_tpu as ih
from inplacedhmc_tpu.models import eight_schools, funnel, mvn, std_normal
from inplacedhmc_tpu.sample import mcmc_with_warmup, threaded_mcmc
from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.config import default_warmup_stages, DualAveraging


def short_stages(metric="diag", delta=0.8):
    return default_warmup_stages(
        stepsize_adaptation=DualAveraging(delta=delta),
        init_steps=40, middle_steps=25, doubling_stages=3, terminating_steps=25,
        metric=metric)


def test_std_normal_moments_single_chainish():
    """BASELINE config 1 (shrunk): std normal posterior moments + acceptance
    near the dual-averaging target delta=0.8."""
    model = std_normal(20)
    res = mcmc_with_warmup(jax.random.PRNGKey(0), model, n_draws=800,
                           n_chains=8, warmup_stages=short_stages(),
                           dtype=jnp.float64)
    draws = np.asarray(res.draws)  # [N, C, D]
    flat = draws.reshape(-1, 20)
    se = 1.0 / np.sqrt(diag.ess_bulk(res.draws).min())
    assert np.abs(flat.mean(0)).max() < 5 * max(float(se), 0.02), flat.mean(0)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.15)
    acc = np.asarray(res.stats.acceptance_rate).mean()
    assert 0.6 < acc < 0.99, acc
    # adapted diagonal metric must be ~ posterior variance (all ones)
    np.testing.assert_allclose(np.asarray(res.warmup_state.metric.inv), 1.0, atol=0.35)


def test_ill_conditioned_gaussian_metric_adaptation():
    """Diag metric adaptation must equalize scales spanning 4 orders."""
    from inplacedhmc_tpu.models import diag_normal
    variances = np.array([100.0, 1.0, 0.01, 10.0, 0.1])
    model = diag_normal(variances)
    res = mcmc_with_warmup(jax.random.PRNGKey(1), model, n_draws=600,
                           n_chains=8, warmup_stages=short_stages(),
                           dtype=jnp.float64)
    inv = np.asarray(res.warmup_state.metric.inv)
    np.testing.assert_allclose(inv, variances, rtol=0.5)
    flat = np.asarray(res.draws).reshape(-1, 5)
    np.testing.assert_allclose(flat.var(0), variances, rtol=0.35)


def test_dense_metric_on_correlated_gaussian():
    """BASELINE config 3 capability (dense / Symmetric metric path)."""
    rng = np.random.default_rng(2)
    a = rng.normal(size=(6, 6)) * 0.5
    cov = a @ a.T + 0.2 * np.eye(6)
    model = mvn(cov)
    res = mcmc_with_warmup(jax.random.PRNGKey(2), model, n_draws=800,
                           n_chains=8, warmup_stages=short_stages(metric="dense"),
                           dtype=jnp.float64)
    # adapted dense inverse mass must approximate the covariance
    inv = np.asarray(res.warmup_state.metric.inv)
    assert inv.shape == (6, 6)
    np.testing.assert_allclose(inv, cov, atol=0.4 * np.abs(cov).max())
    flat = np.asarray(res.draws).reshape(-1, 6)
    emp = np.cov(flat.T)
    np.testing.assert_allclose(emp, cov, atol=0.35 * np.abs(cov).max())


def test_funnel_adapts_down_and_reports_divergences():
    """BASELINE config 2: the funnel forces small eps; divergences are
    reported, not fatal (kinetic_energy.jl:80-84 semantics).

    Local optimization is disabled: the funnel's density mode sits at
    v = -4.5*(dim-1), deep in the pathological neck, so mode-finding is
    counterproductive — the reference supports exactly this configuration
    (``local_optimization = nothing``, mcmc.jl:77-80)."""
    model = funnel(8)
    stages = default_warmup_stages(
        local_optimization=None,
        stepsize_adaptation=DualAveraging(delta=0.9),
        init_steps=40, middle_steps=25, doubling_stages=3, terminating_steps=25)
    res = mcmc_with_warmup(jax.random.PRNGKey(3), model, n_draws=400,
                           n_chains=16, warmup_stages=stages,
                           dtype=jnp.float64)
    eps = float(np.exp(np.asarray(res.warmup_state.log_eps)).mean())
    assert eps < 0.6, eps  # must adapt well below the O(1) initial guess
    assert np.all(np.isfinite(np.asarray(res.draws)))
    # v scale ~ N(0,9): check spread at least partially explored
    v = np.asarray(res.draws)[..., 0].ravel()
    assert v.std() > 1.5, v.std()


def test_eight_schools_pooled_chains_rhat():
    """BASELINE config 4 (shrunk): vmapped chains, pooled adaptation,
    R-hat < 1.05 and reasonable tau posterior."""
    model = eight_schools()
    res = mcmc_with_warmup(jax.random.PRNGKey(4), model, n_draws=800,
                           n_chains=32, warmup_stages=short_stages(),
                           dtype=jnp.float64)
    rhat = np.asarray(diag.split_rhat(res.draws))
    # log_tau mixes slowest (the funnel-like dimension); 1.1 at this short
    # test length, the full-length config reaches < 1.01
    assert rhat.max() < 1.1, rhat
    post = model.constrain(res.draws)
    mu = np.asarray(post["mu"]).ravel()
    assert 2.0 < mu.mean() < 14.0, mu.mean()  # classic mu posterior ~ 8


def test_threaded_mcmc_independent_adaptation():
    """The reference's per-chain adaptation path (mcmc.jl:130-159): each chain
    gets its own eps and metric ([C] / [C, D] shapes)."""
    model = std_normal(5)
    res = threaded_mcmc(jax.random.PRNGKey(5), model, n_draws=200, n_chains=4,
                        warmup_stages=short_stages(), dtype=jnp.float64)
    assert np.asarray(res.warmup_state.log_eps).shape == (4,)
    assert np.asarray(res.warmup_state.metric.inv).shape == (4, 5)
    flat = np.asarray(res.draws).reshape(-1, 5)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.25)


def test_fixed_stepsize_warmup():
    """fixed_stepsize_warmup_stages requires eps in init (warmup.jl:383-389)."""
    from inplacedhmc_tpu.config import fixed_stepsize_warmup_stages
    model = std_normal(5)
    stages = fixed_stepsize_warmup_stages(middle_steps=25, doubling_stages=2)
    res = mcmc_with_warmup(jax.random.PRNGKey(6), model, n_draws=200,
                           n_chains=4, warmup_stages=stages, eps=0.7,
                           dtype=jnp.float64)
    np.testing.assert_allclose(np.exp(np.asarray(res.warmup_state.log_eps)), 0.7)
    flat = np.asarray(res.draws).reshape(-1, 5)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.3)


def test_warmup_stats_collected():
    model = std_normal(3)
    res = mcmc_with_warmup(jax.random.PRNGKey(7), model, n_draws=50, n_chains=2,
                           warmup_stages=short_stages(), dtype=jnp.float64)
    # short_stages: 40 + 25 + 50 + 100 + 25 tuning transitions
    assert np.asarray(res.warmup_stats.acceptance_rate).shape[0] == 240


def test_thinned_sampling():
    """thin=k runs k transitions per recorded draw (warmup.jl:316-332 loop,
    extended): same posterior, fewer stored draws, lower autocorrelation."""
    model = std_normal(4)
    res = mcmc_with_warmup(jax.random.PRNGKey(8), model, n_draws=150,
                           n_chains=4, warmup_stages=short_stages(),
                           dtype=jnp.float64, thin=3)
    assert res.draws.shape == (150, 4, 4)
    flat = np.asarray(res.draws).reshape(-1, 4)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.3)


def test_result_invariants_validate():
    """Sanitizer-analog invariant checks (utils/validate.py) on a real run."""
    from inplacedhmc_tpu.utils.validate import validate_result
    model = std_normal(6)
    res = mcmc_with_warmup(jax.random.PRNGKey(9), model, n_draws=100,
                           n_chains=8, warmup_stages=short_stages(),
                           dtype=jnp.float64)
    assert validate_result(res) == []
    # corrupt a record -> violation detected
    bad_stats = res.stats._replace(
        depth=np.asarray(res.stats.depth).copy() * 0 + 99)
    from inplacedhmc_tpu.utils.validate import validate_tree_stats
    assert validate_tree_stats(bad_stats) != []


def test_draw_block_chunked_sampling_matches_shapes():
    """draw_block splits sampling into bounded device calls; draws stitch to
    the same [N, C, D] result and the chain state threads through blocks."""
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.config import NUTS as NUTSConfig
    model = std_normal(4)
    kern = _kernel(model, NUTSConfig(), True, None, use_pallas="off")
    res = kern.run(jax.random.PRNGKey(11), n_draws=90, n_chains=4,
                   warmup_stages=short_stages(), dtype=jnp.float64,
                   draw_block=40)
    assert res.draws.shape == (90, 4, 4)
    flat = np.asarray(res.draws).reshape(-1, 4)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.35)
    # consecutive blocks must not restart from the same state
    assert not np.allclose(np.asarray(res.draws)[39], np.asarray(res.draws)[40])


def test_tuning_chunk_warmup_progress():
    """Chunked tuning windows: dual-averaging carries across device calls,
    the metric still comes from the whole window, and the reporter ticks
    inside the stage (reporting.jl:90-109 parity)."""
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.sample import mcmc_with_warmup
    from inplacedhmc_tpu.config import default_warmup_stages

    model = std_normal(5)
    stages = default_warmup_stages(init_steps=40, middle_steps=30,
                                   doubling_stages=1, terminating_steps=30)

    class TickCounter:
        def __init__(self):
            self.ticks = []
            self.stages = []

        def start_stage(self, desc, n=None):
            self.stages.append(desc)

        def step(self, done):
            self.ticks.append(done)

        def end_stage(self, **kw):
            pass

    rep = TickCounter()
    out = mcmc_with_warmup(jax.random.PRNGKey(0), model, 100, 16,
                           warmup_stages=stages, tuning_chunk=16, reporter=rep)
    # the 40-step window ticks at 16/32/40, the 30-step ones at 16/30
    assert 16 in rep.ticks and 32 in rep.ticks and 40 in rep.ticks
    acc = float(jnp.mean(out.stats.acceptance_rate))
    assert 0.6 < acc < 0.98
    q = np.asarray(out.draws).reshape(-1, 5)
    assert abs(q.mean()) < 0.2 and abs(q.var() - 1) < 0.4
    # adapted diag metric came from the window draws
    assert np.asarray(out.warmup_state.metric.inv).shape == (5,)
    assert np.all(np.asarray(out.warmup_state.metric.inv) > 0.2)


def test_streaming_warmup_matches_stored_draws():
    """stream=True adapts the metric from O(D) running moments instead of the
    stored [N, C, D] window — same posterior, same metric quality, and it
    composes with tuning_chunk (the moment carry threads across chunks)."""
    model = mvn(jnp.diag(jnp.asarray([9.0, 4.0, 1.0, 0.25])))
    k = jax.random.PRNGKey(3)
    base = dict(stepsize_adaptation=DualAveraging(), init_steps=40,
                middle_steps=25, doubling_stages=3, terminating_steps=25)
    out_stream = mcmc_with_warmup(
        k, model, 200, 32,
        warmup_stages=default_warmup_stages(stream=True, **base),
        tuning_chunk=20, dtype=jnp.float64)
    out_stored = mcmc_with_warmup(
        k, model, 200, 32, warmup_stages=default_warmup_stages(**base),
        dtype=jnp.float64)
    m_stream = np.asarray(out_stream.warmup_state.metric.inv)
    m_stored = np.asarray(out_stored.warmup_state.metric.inv)
    # both recover the target variances (M^-1 ≈ diag of cov)
    np.testing.assert_allclose(m_stream, [9.0, 4.0, 1.0, 0.25], rtol=0.5)
    np.testing.assert_allclose(m_stream, m_stored, rtol=0.5)
    q = np.asarray(out_stream.draws).reshape(-1, 4)
    np.testing.assert_allclose(q.var(0), [9.0, 4.0, 1.0, 0.25], rtol=0.35)


def test_streaming_dense_and_low_rank_warmup():
    """Streamed Gram accumulation feeds the dense and low-rank estimators."""
    cov = jnp.asarray([[2.0, 1.2, 0.0], [1.2, 1.5, 0.3], [0.0, 0.3, 1.0]])
    model = mvn(cov)
    base = dict(stepsize_adaptation=DualAveraging(), init_steps=40,
                middle_steps=25, doubling_stages=3, terminating_steps=25)
    for metric in ("dense", "low_rank"):
        out = mcmc_with_warmup(
            jax.random.PRNGKey(5), model, 150, 32,
            warmup_stages=default_warmup_stages(metric=metric, stream=True,
                                                **base),
            dtype=jnp.float64)
        q = np.asarray(out.draws).reshape(-1, 3)
        np.testing.assert_allclose(q.var(0), np.diag(cov), rtol=0.4)
        acc = float(jnp.mean(out.stats.acceptance_rate))
        assert 0.6 < acc < 0.99, metric


def test_keep_dims_and_streaming_moments():
    """Memory-bounded sampling: keep_dims records a column subset of the same
    chains, and streaming split-moments give bit-identical split-R-hat to the
    stored-draws statistic (the 10k-chain x 1k-dim mode where draws are never
    stored)."""
    model = mvn(np.diag([4.0, 1.0, 0.25, 9.0]))
    stages = default_warmup_stages(stepsize_adaptation=DualAveraging(),
                                   init_steps=40, middle_steps=25,
                                   doubling_stages=2, terminating_steps=25)
    kw = dict(warmup_stages=stages, dtype=jnp.float64)
    k = jax.random.PRNGKey(0)
    full = mcmc_with_warmup(k, model, 300, 16, **kw)
    mom = mcmc_with_warmup(k, model, 300, 16, collect_moments=True,
                           keep_dims=(0, 2), **kw)
    assert mom.draws.shape == (300, 16, 2)
    np.testing.assert_allclose(np.asarray(mom.draws),
                               np.asarray(full.draws)[:, :, [0, 2]])
    r_full = np.asarray(diag.split_rhat(full.draws))
    r_mom = np.asarray(diag.split_rhat_from_moments(mom.sample_moments))
    np.testing.assert_allclose(r_mom, r_full, rtol=1e-9)


def test_streaming_moments_across_draw_blocks():
    """The moment carry threads across draw_block device calls: R-hat from
    the accumulated moments equals R-hat from that run's own recorded draws
    (the blocked RNG stream differs from the monolithic one by design)."""
    model = mvn(np.diag([2.0, 1.0, 0.5]))
    stages = default_warmup_stages(stepsize_adaptation=DualAveraging(),
                                   init_steps=40, middle_steps=25,
                                   doubling_stages=2, terminating_steps=25)
    out = mcmc_with_warmup(jax.random.PRNGKey(1), model, 300, 16,
                           warmup_stages=stages, dtype=jnp.float64,
                           collect_moments=True, draw_block=130)
    r_mom = np.asarray(diag.split_rhat_from_moments(out.sample_moments))
    r_drw = np.asarray(diag.split_rhat(out.draws))
    np.testing.assert_allclose(r_mom, r_drw, rtol=1e-9)


def test_eps_collapse_guard_unit():
    """_check_eps_sane raises on collapsed/blown/non-finite eps and passes
    sane values (reference assertion, warmup.jl:289-296)."""
    from inplacedhmc_tpu.config import StepsizeCollapseError
    from inplacedhmc_tpu.sample import _check_eps_sane

    _check_eps_sane(jnp.log(jnp.asarray([0.5, 1.0])), "ok")
    for bad in [1e-12, 1e12, float("nan")]:
        with pytest.raises(StepsizeCollapseError):
            _check_eps_sane(jnp.log(jnp.asarray([0.5, bad])), "bad")


def test_eps_collapse_guard_pathological_target():
    """A target whose every transition diverges drives dual averaging to
    eps ~ e^-100; the warmup driver must abort with StepsizeCollapseError
    (carrying the window's acceptance stats) instead of silently sampling at
    eps ~ 0 (VERDICT r2 missing #3; reference warmup.jl:289-296)."""
    from inplacedhmc_tpu.config import (StepsizeCollapseError, TuningNUTS,
                                        InitialStepsizeSearch)
    from inplacedhmc_tpu.models.base import Model

    def logp(q):
        # -inf everywhere: every leaf is divergent at ANY eps, so acceptance
        # is pinned at 0 and dual averaging drives log_eps off a cliff —
        # the scenario the reference's assertion exists for
        return 0.0 * jnp.sum(q * q) - jnp.inf

    model = Model(name="void", dim=4, logp=logp, structure=None)
    stages = [TuningNUTS(75, metric=None)]
    with pytest.raises(StepsizeCollapseError) as ei:
        mcmc_with_warmup(jax.random.PRNGKey(0), model, 10, 8,
                         warmup_stages=stages, eps=1.0, use_pallas="off")
    assert "acceptance" in str(ei.value)


def test_precompile_counts_executables():
    """precompile AOT-lowers every stage (precompile.jl:1-3 equivalent);
    the chunked/moments configuration compiles the chunk bodies (+ remainder),
    the finalizer, and the per-block sampling executables (VERDICT r2 weak #6)."""
    from inplacedhmc_tpu.config import (InitialStepsizeSearch, NUTS,
                                        TuningNUTS)
    from inplacedhmc_tpu.sample import NUTSKernel

    model = std_normal(6)
    kern = NUTSKernel(model, NUTS(max_depth=4), use_pallas="off")
    stages = [InitialStepsizeSearch(), TuningNUTS(25, metric="diag")]

    # plain: search + one tuning window + one sampling executable
    n_plain = kern.precompile(8, stages, n_draws=10)
    assert n_plain == 3

    # chunked tuning (25 = 2x10 + 5 remainder => 2 chunk fns + finalizer),
    # blockwise moments sampling (10 = 7 + 3 => 2 executables)
    kern2 = NUTSKernel(model, NUTS(max_depth=4), use_pallas="off")
    n_chunked = kern2.precompile(8, stages, n_draws=10, tuning_chunk=10,
                                 draw_block=7, collect_moments=True)
    assert n_chunked == 1 + (2 + 1) + 2

    # the real chunked run then hits only cached executables: run with the
    # same config and confirm the jit cache gained no new sampling entries
    n_keys = len(kern2._jit_cache)
    res = kern2.run(jax.random.PRNGKey(0), 10, 8, warmup_stages=stages,
                    tuning_chunk=10, draw_block=7, collect_moments=True)
    assert len(kern2._jit_cache) == n_keys
    assert res.draws.shape[0] == 10


def test_work_sorted_schedule_correctness():
    """schedule='work_sorted' permutes chains by a work EMA before each
    transition and inverts it after: draws stay in original chain
    coordinates and the posterior is untouched (chains are exchangeable,
    the permutation is past-measurable).  Funnel-like heterogeneous target:
    moments and per-chain time-series coherence must match the unscheduled
    run statistically."""
    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.models import funnel

    from inplacedhmc_tpu.config import (DualAveraging,
                                        default_warmup_stages)

    model = funnel(6)
    # no FindLocalOptimum: on the funnel the (penalized) optimum sits ~6
    # sigma deep in the neck and a chain can fail to escape it for any RNG
    # pairing — initializing U[-2,2] keeps this a test of scheduling, not of
    # neck-escape luck
    stages = default_warmup_stages(
        local_optimization=None, stepsize_adaptation=DualAveraging(delta=0.9))
    kw = dict(n_draws=600, n_chains=32, use_pallas="off",
              warmup_stages=stages)
    res = mcmc_with_warmup(jax.random.PRNGKey(7), model,
                           schedule="work_sorted", **kw)
    base = mcmc_with_warmup(jax.random.PRNGKey(7), model, **kw)
    d_s = np.asarray(res.draws)
    d_b = np.asarray(base.draws)
    # funnel scale coordinate: mean 0, sd 3 (q0 ~ N(0, 9))
    assert abs(d_s[:, :, 0].mean()) < 0.6
    assert abs(d_s[:, :, 0].std() - 3.0) < 0.8
    # same posterior as the unscheduled run (different RNG pairing is fine)
    assert abs(d_s[:, :, 0].mean() - d_b[:, :, 0].mean()) < 0.8
    # per-chain series stay coherent: split-rhat is computable and sane
    r = np.asarray(diag.split_rhat(jnp.asarray(d_s)))
    assert np.isfinite(r).all() and r.max() < 1.35, r


def test_work_sorted_schedule_identity_when_homogeneous():
    """With an all-equal work EMA the argsort permutation is the identity
    (stable sort), so the first transition of a scheduled run is
    BIT-IDENTICAL to the unscheduled one."""
    model = std_normal(8)
    kw = dict(n_draws=1, n_chains=16, use_pallas="off", eps=0.4,
              warmup_stages=[])
    a = mcmc_with_warmup(jax.random.PRNGKey(3), model,
                         schedule="work_sorted", **kw)
    b = mcmc_with_warmup(jax.random.PRNGKey(3), model, **kw)
    np.testing.assert_array_equal(np.asarray(a.draws[0]),
                                  np.asarray(b.draws[0]))


def test_schedule_rejects_unknown():
    # (mesh composition is now supported — tests/test_parallel.py
    # test_sharded_work_sorted_schedule)
    from inplacedhmc_tpu.sample import NUTSKernel
    from inplacedhmc_tpu.config import NUTS as NUTSCfg

    model = std_normal(4)
    with pytest.raises(ValueError):
        NUTSKernel(model, NUTSCfg(), schedule="bogus")


def test_scheduled_transition_exactness_property():
    """_scheduled_transition == unpermute(_one_transition(permute(z))) with
    the SAME key: the wrapper adds nothing but the (inverse-applied)
    permutation, and the EMA update uses the un-permuted steps."""
    import functools
    from inplacedhmc_tpu.adapt.warmup import (_one_transition,
                                              _scheduled_transition,
                                              _SCHED_DECAY)
    import inplacedhmc_tpu as ih

    model = funnel(5)
    pot = ih.batched_logdensity_and_grad(model.logp)
    metric = ih.identity_metric(5, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(0), (12, 5), jnp.float32)
    z = ih.evaluate(pot, q)
    ema = jnp.asarray(np.random.default_rng(1).permutation(12), jnp.float32)
    kw = dict(metric=metric, potential=pot,
              algorithm=__import__("inplacedhmc_tpu.config",
                                   fromlist=["NUTS"]).NUTS(max_depth=6),
              fused_trans=None, fused_step=None, post_step=None)
    eps = jnp.asarray(0.3, jnp.float32)
    k = jax.random.PRNGKey(5)
    z2, stats, ema2 = _scheduled_transition(k, z, ema, eps, **kw)

    perm = np.argsort(np.asarray(ema), kind="stable")
    inv = np.argsort(perm)
    z_p = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[perm]), z)
    z2_ref, stats_ref = _one_transition(k, z_p, eps, **kw)
    np.testing.assert_array_equal(np.asarray(z2.q),
                                  np.asarray(z2_ref.q)[inv])
    np.testing.assert_array_equal(np.asarray(stats.steps),
                                  np.asarray(stats_ref.steps)[inv])
    np.testing.assert_allclose(
        np.asarray(ema2),
        _SCHED_DECAY * np.asarray(ema)
        + (1 - _SCHED_DECAY) * np.asarray(stats_ref.steps)[inv], rtol=1e-6)


def test_keep_dims_respected_in_plain_block_path():
    """keep_dims must narrow result.draws in the blockwise path WITHOUT
    collect_moments/collect_sketch too (regression: the plain block loop
    dropped kd and returned full-D draws — found OOMing a 1002-dim
    diagnostic at 10k chains)."""
    model = std_normal(12)
    res = mcmc_with_warmup(jax.random.PRNGKey(0), model, 10, 8,
                           warmup_stages=[], eps=0.3, use_pallas="off",
                           draw_block=4, keep_dims=(0, 5))
    assert res.draws.shape == (10, 8, 2), res.draws.shape


def test_f64_model_constants_with_f32_state():
    """A model holding f64 constants (the natural numpy default under x64
    mode) must not leak f64 into the f32 sampler state: the potential
    wrapper pins logp/grad to q's dtype, else the tree's while_loop carries
    type-mismatch (regression: mcmc_with_warmup(mvn(np.array(...))) under
    jax_enable_x64)."""
    import numpy as np
    from inplacedhmc_tpu.models import mvn
    from inplacedhmc_tpu.sample import mcmc_with_warmup

    cov = np.array([[2.0, 1.2], [1.2, 1.5]])  # f64 constants inside logp
    res = mcmc_with_warmup(jax.random.PRNGKey(0), mvn(cov), 200, n_chains=32,
                           dtype=jnp.float32)
    assert res.draws.dtype == jnp.float32
    emp = np.cov(np.asarray(res.draws).reshape(-1, 2).T)
    assert np.abs(emp - cov).max() < 0.5


def test_warmup_chunk_hook_dispatch_level():
    """chunk_hook composes an extra kernel BETWEEN tuning chunks at the
    dispatch level (the warmup-side analog of the split-program ASIS
    driver): it must be called once per chunk (and once per unchunked
    tuning window), see concrete (non-traced) states, and leave the
    warmup product sane."""
    from inplacedhmc_tpu.config import NUTS, TuningNUTS
    from inplacedhmc_tpu.sample import _kernel
    import inplacedhmc_tpu.adapt.warmup as W

    model = std_normal(4)
    kern = _kernel(model, NUTS(), True, None, use_pallas="off")
    state = W.init_warmup_state(jax.random.PRNGKey(0), kern.potential, 4, 16,
                                jnp.float64, eps=0.5)
    calls = []

    def hook(key, z):
        # np.asarray succeeds only on concrete (dispatch-level) arrays —
        # a traced z here would mean the hook got fused into the jit
        calls.append(np.asarray(z.q).copy())
        return z

    stages = [TuningNUTS(n=20, metric="diag"), TuningNUTS(n=7, metric=None)]
    out, _ = kern.warmup(jax.random.PRNGKey(1), state, stages,
                         tuning_chunk=8, chunk_hook=hook)
    # 20-window -> chunks of 8+8+4 = 3 hooks; 7-window unchunked -> 1 hook
    assert len(calls) == 4
    assert all(np.isfinite(c).all() for c in calls)
    assert np.isfinite(np.asarray(out.metric.inv)).all()
    # the hook's OUTPUT state threads into the next chunk: a hook that
    # shifts q must change the final state vs the identity-hook run
    out2, _ = kern.warmup(jax.random.PRNGKey(1), state, stages,
                          tuning_chunk=8,
                          chunk_hook=lambda k, z: W.evaluate(
                              kern.potential, z.q + 1e-3))
    assert not np.allclose(np.asarray(out.z.q), np.asarray(out2.z.q))


def test_funnel_nc_matches_centered_marginals():
    """The non-centered funnel's constrained draws must reproduce the
    centered funnel's analytic marginals: v ~ N(0, 3^2) exactly (v = 3 z_0
    with z ~ N(0,I) posterior), x_i | v ~ N(0, e^v)."""
    from inplacedhmc_tpu.models import funnel_nc

    model = funnel_nc(5)
    res = mcmc_with_warmup(jax.random.PRNGKey(3), model, 800, 32,
                           use_pallas="off")
    post = model.constrain(res.draws)
    v = np.asarray(post["v"]).ravel()
    x = np.asarray(post["x"])
    assert abs(v.std() - 3.0) < 0.25, v.std()
    assert abs(v.mean()) < 0.4
    # conditional scale: x / e^{v/2} is standard normal
    z = x / np.exp(0.5 * np.asarray(post["v"]))[..., None]
    assert abs(z.std() - 1.0) < 0.1
    # the unconstrained chain must be iid-normal-grade mixed
    rhat = np.asarray(diag.split_rhat(res.draws))
    assert rhat.max() < 1.02, rhat.max()
