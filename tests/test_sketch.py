"""Streaming diagnostic sketches vs the stored-draw estimators.

The sketches must reproduce the exact estimators up to (a) histogram binning
for rank-R-hat and (b) the finite lag window + O(lag/n) mean-correction bias
for ESS — both driven to tolerance here on synthetic AR(1) chains whose
correlation structure is known.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.sketch import (SketchConfig, StreamESS, ess_from_sketch,
                                    init_stream_sketch, rank_rhat_from_sketch,
                                    update_stream_sketch)


def _ar1_draws(key, n, c, d, rho=0.5, chain_shift=0.0, dtype=jnp.float64):
    """AR(1) chains: x_t = rho x_{t-1} + sqrt(1-rho^2) e_t, optional
    per-chain mean offsets to force R-hat > 1."""
    ks = jax.random.split(key, 2)
    e = jax.random.normal(ks[0], (n, c, d), dtype)

    def step(x, en):
        x = rho * x + jnp.sqrt(1.0 - rho ** 2) * en
        return x, x

    x0 = jax.random.normal(ks[1], (c, d), dtype)
    _, xs = jax.lax.scan(step, x0, e)
    if chain_shift:
        shifts = chain_shift * jnp.linspace(-1.0, 1.0, c)[None, :, None]
        xs = xs + shifts
    return xs


def _run_sketch(draws, config, n_blocks=4):
    n, c, d = draws.shape
    sk = init_stream_sketch(draws[0], config)
    step = n // n_blocks
    off = 0
    for i in range(n_blocks):
        blk = draws[off:off + step] if i < n_blocks - 1 else draws[off:]
        sk = update_stream_sketch(sk, blk, off, n)
        off += blk.shape[0]
    return sk


class TestRankRhat:
    def test_matches_exact_on_mixed_chains(self):
        draws = _ar1_draws(jax.random.PRNGKey(0), 512, 8, 3, rho=0.3)
        sk = _run_sketch(draws, SketchConfig(bins=128, max_lag=16))
        exact = np.asarray(diag.rhat_rank(draws))
        sketched = np.asarray(rank_rhat_from_sketch(sk.rank))
        np.testing.assert_allclose(sketched, exact, atol=0.01)
        assert np.all(sketched < 1.02)

    def test_detects_nonmixing_chains(self):
        draws = _ar1_draws(jax.random.PRNGKey(1), 256, 8, 2, rho=0.3,
                           chain_shift=2.0)
        sk = _run_sketch(draws, SketchConfig(bins=128, max_lag=16))
        exact = np.asarray(diag.rhat_rank(draws))
        sketched = np.asarray(rank_rhat_from_sketch(sk.rank))
        assert np.all(sketched > 1.2)
        np.testing.assert_allclose(sketched, exact, rtol=0.05)

    def test_tail_component_detects_variance_mismatch(self):
        # equal means, unequal variances: bulk (mean-based) R-hat misses it,
        # the folded/tail component must catch it
        key = jax.random.PRNGKey(2)
        n, c, d = 512, 8, 1
        e = jax.random.normal(key, (n, c, d), jnp.float64)
        scales = jnp.linspace(0.5, 2.0, c)[None, :, None]
        draws = e * scales
        sk = _run_sketch(draws, SketchConfig(bins=128, max_lag=16))
        sketched = np.asarray(rank_rhat_from_sketch(sk.rank))
        assert np.all(sketched > 1.05)

    def test_blockwise_equals_oneshot(self):
        draws = _ar1_draws(jax.random.PRNGKey(3), 128, 4, 2)
        cfg = SketchConfig(bins=64, max_lag=8)
        sk_a = _run_sketch(draws, cfg, n_blocks=1)
        sk_b = _run_sketch(draws, cfg, n_blocks=5)
        np.testing.assert_array_equal(np.asarray(sk_a.rank.counts),
                                      np.asarray(sk_b.rank.counts))
        np.testing.assert_allclose(np.asarray(sk_a.acov.lag),
                                   np.asarray(sk_b.acov.lag), rtol=1e-10)


class TestStreamESS:
    @pytest.mark.parametrize("rho", [0.0, 0.5, 0.8])
    def test_matches_fft_ess(self, rho):
        n, c, d = 1024, 8, 3
        draws = _ar1_draws(jax.random.PRNGKey(4), n, c, d, rho=rho)
        sk = _run_sketch(draws, SketchConfig(bins=16, max_lag=64))
        exact = np.asarray(diag.ess_bulk(draws, cap=False))
        out = ess_from_sketch(sk.acov, c, cap=False)
        assert isinstance(out, StreamESS)
        assert not np.any(np.asarray(out.truncated))
        np.testing.assert_allclose(np.asarray(out.ess), exact, rtol=0.12)
        # tau should track the analytic AR(1) value (1+rho)/(1-rho)
        tau_true = (1 + rho) / (1 - rho)
        assert np.all(np.abs(np.asarray(out.tau) / tau_true - 1.0) < 0.5)

    def test_truncation_flagged_for_slow_chain(self):
        draws = _ar1_draws(jax.random.PRNGKey(5), 2048, 4, 1, rho=0.95)
        sk = _run_sketch(draws, SketchConfig(bins=16, max_lag=8))
        out = ess_from_sketch(sk.acov, 4)
        assert bool(np.asarray(out.truncated)[0])

    def test_cap(self):
        draws = _ar1_draws(jax.random.PRNGKey(6), 256, 4, 1, rho=0.0)
        sk = _run_sketch(draws, SketchConfig(bins=16, max_lag=16))
        out = ess_from_sketch(sk.acov, 4, cap=True)
        assert float(out.ess[0]) <= 256 * 4 + 1e-6

    def test_jittable(self):
        draws = _ar1_draws(jax.random.PRNGKey(7), 64, 4, 2)
        cfg = SketchConfig(bins=16, max_lag=8)
        sk = init_stream_sketch(draws[0], cfg)
        upd = jax.jit(update_stream_sketch, static_argnums=(2, 3))
        sk = upd(sk, draws, 0, 64)
        r = jax.jit(rank_rhat_from_sketch)(sk.rank)
        e = jax.jit(ess_from_sketch, static_argnums=(1, 2))(sk.acov, 4, True)
        assert np.all(np.isfinite(np.asarray(r)))
        assert np.all(np.isfinite(np.asarray(e.ess)))


class TestDriverIntegration:
    def test_store_draws_false_blockwise(self):
        """collect_sketch + store_draws=False: draws dropped, sketch-based
        diagnostics finite and matching a stored-draw run with the same key."""
        import inplacedhmc_tpu.sample as S
        from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
        from inplacedhmc_tpu.models import std_normal

        model = std_normal(4)
        stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(), init_steps=30,
            middle_steps=25, doubling_stages=1, terminating_steps=20)
        cfg = SketchConfig(bins=64, max_lag=32)
        kw = dict(warmup_stages=stages, dtype=jnp.float64, draw_block=64,
                  collect_sketch=cfg, collect_moments=True)
        key = jax.random.PRNGKey(42)
        lean = S.mcmc_with_warmup(key, model, 256, 16, store_draws=False, **kw)
        full = S.mcmc_with_warmup(key, model, 256, 16, **kw)

        assert lean.draws is None
        assert full.draws.shape == (256, 16, 4)
        # same RNG stream => identical sketches
        np.testing.assert_array_equal(
            np.asarray(lean.sample_sketch.rank.counts),
            np.asarray(full.sample_sketch.rank.counts))
        # stats still collected in lean mode
        assert lean.stats.steps.shape == (256, 16)

        r_sketch = np.asarray(rank_rhat_from_sketch(lean.sample_sketch.rank))
        r_exact = np.asarray(diag.rhat_rank(full.draws))
        np.testing.assert_allclose(r_sketch, r_exact, atol=0.02)
        ess = ess_from_sketch(lean.sample_sketch.acov, 16)
        ess_exact = np.asarray(diag.ess_bulk(full.draws))
        ratio = np.asarray(ess.ess) / ess_exact
        assert np.all(ratio > 0.6) and np.all(ratio < 1.7)

    def test_single_call_path(self):
        import inplacedhmc_tpu.sample as S
        from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
        from inplacedhmc_tpu.models import std_normal

        stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(), init_steps=20,
            middle_steps=20, doubling_stages=1, terminating_steps=15)
        out = S.mcmc_with_warmup(
            jax.random.PRNGKey(0), std_normal(3), 128, 8,
            warmup_stages=stages, dtype=jnp.float64,
            collect_sketch=SketchConfig(bins=32, max_lag=16))
        assert out.draws.shape == (128, 8, 3)
        r = rank_rhat_from_sketch(out.sample_sketch.rank)
        assert np.all(np.isfinite(np.asarray(r)))

    def test_store_draws_requires_collector(self):
        import inplacedhmc_tpu.sample as S
        from inplacedhmc_tpu.models import std_normal
        with pytest.raises(ValueError, match="store_draws"):
            S.mcmc_with_warmup(jax.random.PRNGKey(0), std_normal(2), 8, 2,
                               store_draws=False)


class TestPosteriorSummary:
    def test_stored_vs_streamed_agree(self):
        draws = _ar1_draws(jax.random.PRNGKey(11), 512, 8, 3, rho=0.4)
        sk = _run_sketch(draws, SketchConfig(bins=256, max_lag=64))
        s_full = diag.posterior_summary(draws, names=["a", "b", "c"])
        s_lean = diag.posterior_summary_streamed(sk, 8, names=["a", "b", "c"])
        np.testing.assert_allclose(s_lean.mean, s_full.mean, atol=0.05)
        np.testing.assert_allclose(s_lean.sd, s_full.sd, rtol=0.05)
        np.testing.assert_allclose(s_lean.q5, s_full.q5, atol=0.08)
        np.testing.assert_allclose(s_lean.q50, s_full.q50, atol=0.08)
        np.testing.assert_allclose(s_lean.q95, s_full.q95, atol=0.08)
        np.testing.assert_allclose(s_lean.rhat, s_full.rhat, atol=0.01)
        assert s_lean.ess_tail is None
        # both render
        assert "ess_bulk" in str(s_full) and "a" in str(s_lean)
        assert len(str(s_full).splitlines()) == 4


class TestTailESS:
    def test_matches_stored_tail_ess(self):
        from inplacedhmc_tpu.sketch import activate_tail, ess_tail_from_sketch
        n, c, d = 1024, 8, 3
        draws = _ar1_draws(jax.random.PRNGKey(21), n, c, d, rho=0.5)
        cfg = SketchConfig(bins=256, max_lag=64)
        sk = init_stream_sketch(draws[0], cfg)
        # phase 1: first half builds the histogram
        sk = update_stream_sketch(sk, draws[: n // 2], 0, n)
        sk = activate_tail(sk, cfg, n // 2)
        # phase 2: indicators stream over the second half, blockwise
        for off in range(n // 2, n, 128):
            sk = update_stream_sketch(sk, draws[off:off + 128], off, n)
        out = ess_tail_from_sketch(sk.tail, c)
        # reference: exact tail ESS on the second half only (the phase the
        # streamed estimate covers)
        exact = np.asarray(diag.ess_tail(draws[n // 2:]))
        ratio = np.asarray(out.ess) / exact
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio
        # thresholds from the first-half histogram track the pooled quantiles
        flat = np.asarray(draws[: n // 2]).reshape(-1, d)
        np.testing.assert_allclose(np.asarray(sk.tail.q05),
                                   np.percentile(flat, 5, axis=0), atol=0.1)

    def test_driver_activates_tail(self):
        import inplacedhmc_tpu.sample as S
        from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
        from inplacedhmc_tpu.models import std_normal
        from inplacedhmc_tpu.sketch import ess_tail_from_sketch

        stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(), init_steps=25,
            middle_steps=20, doubling_stages=1, terminating_steps=15)
        out = S.mcmc_with_warmup(
            jax.random.PRNGKey(8), std_normal(3), 256, 8,
            warmup_stages=stages, dtype=jnp.float64, draw_block=64,
            collect_sketch=SketchConfig(bins=64, max_lag=32),
            store_draws=False)
        assert out.sample_sketch.tail is not None
        assert int(out.sample_sketch.tail.start) == 128
        te = ess_tail_from_sketch(out.sample_sketch.tail, 8)
        assert np.all(np.isfinite(np.asarray(te.ess)))
        assert np.all(np.asarray(te.ess) > 50)
        s = diag.posterior_summary_streamed(out.sample_sketch, 8)
        assert s.ess_tail is not None and "ess_tail" in str(s)


class TestLeanCheckpoint:
    def test_resume_matches_uninterrupted(self, tmp_path):
        """Interrupt a lean (store_draws=False) run after 2 of 4 blocks; the
        resumed run's final sketch/moments/stats must equal the uninterrupted
        run's exactly (same RNG stream)."""
        import inplacedhmc_tpu.sample as S
        from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
        from inplacedhmc_tpu.models import std_normal
        from inplacedhmc_tpu.report import NoProgressReport

        model = std_normal(3)
        stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(), init_steps=20,
            middle_steps=20, doubling_stages=1, terminating_steps=15)
        cfg = SketchConfig(bins=32, max_lag=16)
        kw = dict(warmup_stages=stages, dtype=jnp.float64, draw_block=32,
                  collect_sketch=cfg, collect_moments=True, store_draws=False)
        key = jax.random.PRNGKey(7)

        full = S.mcmc_with_warmup(key, model, 128, 8, **kw)

        # interrupted run: a reporter that raises after the 2nd block
        class Stop(Exception):
            pass

        class Interrupter(NoProgressReport):
            def __init__(self):
                self.ticks = 0

            def step(self, done):
                self.ticks += 1
                if self.ticks == 2:
                    raise Stop()

        ckpt = str(tmp_path / "lean.npz")
        with pytest.raises(Stop):
            S.mcmc_with_warmup(key, model, 128, 8,
                               sample_checkpoint_path=ckpt,
                               reporter=Interrupter(), **kw)
        assert jnp.load is not None  # file written before the raise
        import os
        assert os.path.exists(ckpt)

        resumed = S.mcmc_with_warmup(key, model, 128, 8,
                                     sample_checkpoint_path=ckpt, **kw)
        np.testing.assert_array_equal(
            np.asarray(resumed.sample_sketch.rank.counts),
            np.asarray(full.sample_sketch.rank.counts))
        np.testing.assert_allclose(np.asarray(resumed.sample_sketch.acov.lag),
                                   np.asarray(full.sample_sketch.acov.lag),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(resumed.sample_moments.s2),
                                   np.asarray(full.sample_moments.s2),
                                   rtol=1e-12)
        assert resumed.stats.steps.shape == full.stats.steps.shape
        assert resumed.sample_sketch.tail is not None


class TestSketchRobustness:
    def test_far_outliers_land_in_end_bins(self):
        """Values far outside the histogram support must clip into the END
        bins, not overflow the float->int32 cast (implementation-defined in
        XLA: large positives can come back INT_MIN and land in bin 0)."""
        q0 = jnp.zeros((4, 2), jnp.float32)
        # tiny support: width floored at 1e-12, so ordinary draws are ~1e13
        # bin-widths away — exactly the overflow regime
        sk = init_stream_sketch(q0, SketchConfig(bins=8, tail=False))
        draws = jnp.concatenate([
            jnp.full((2, 4, 2), 1e6, jnp.float32),
            jnp.full((2, 4, 2), -1e6, jnp.float32)], axis=0)
        sk = update_stream_sketch(sk, draws, 0, 4)
        counts = np.asarray(jnp.sum(sk.rank.counts, axis=(0, 1)))  # [D, B]
        assert counts[:, -1].sum() == 2 * 4 * 2  # positives -> top bin
        assert counts[:, 0].sum() == 2 * 4 * 2   # negatives -> bottom bin
        assert counts[:, 1:-1].sum() == 0

    def test_empty_histogram_quantiles_are_nan(self):
        from inplacedhmc_tpu.sketch import quantiles_from_hist
        sk = init_stream_sketch(jnp.zeros((4, 3), jnp.float32),
                                SketchConfig(bins=8, tail=False))
        qs = np.asarray(quantiles_from_hist(sk.rank, [0.05, 0.95]))
        assert np.isnan(qs).all()

    def test_config_validation(self):
        q0 = jnp.zeros((4, 2), jnp.float32)
        with pytest.raises(ValueError):
            init_stream_sketch(q0, SketchConfig(bins=1))
        with pytest.raises(ValueError):
            init_stream_sketch(q0, SketchConfig(max_lag=0))
        with pytest.raises(ValueError):
            init_stream_sketch(q0, SketchConfig(tail_after=1.5))

    def test_folded_ranks_are_mirror_symmetric(self):
        """Chains occupying mirror-image bins around the pooled median must
        fold onto identical rank-z scores: asymmetric tie-breaking would
        inflate the folded R-hat component with sign information the fold is
        supposed to remove."""
        key = jax.random.PRNGKey(0)
        base = jax.random.normal(key, (512, 8, 1), jnp.float64)
        # chains 0-3 see +x, chains 4-7 see -x: identical after folding
        flip = jnp.where(jnp.arange(8)[None, :, None] < 4, 1.0, -1.0)
        draws = base * flip
        sk = _run_sketch(draws, SketchConfig(bins=64, tail=False))
        r_mirror = float(rank_rhat_from_sketch(sk.rank)[0])
        sk2 = _run_sketch(base, SketchConfig(bins=64, tail=False))
        r_same = float(rank_rhat_from_sketch(sk2.rank)[0])
        # folding removes the sign: the mirrored ensemble should look no
        # worse than the unflipped one (up to binning noise)
        assert abs(r_mirror - r_same) < 0.05, (r_mirror, r_same)
