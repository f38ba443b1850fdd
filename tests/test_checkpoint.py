"""Checkpoint/resume tests (SURVEY.md §5 'checkpoint / resume')."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu.config import NUTS, default_warmup_stages
from inplacedhmc_tpu.core.metric import dense_metric, diag_metric
from inplacedhmc_tpu.core.state import EvalPoint, WarmupState
from inplacedhmc_tpu.models import std_normal
from inplacedhmc_tpu.sample import NUTSKernel
from inplacedhmc_tpu.utils.checkpoint import (load_warmup_checkpoint,
                                              save_warmup_checkpoint,
                                              warmup_with_checkpoints)


def _state(metric):
    rng = np.random.default_rng(0)
    ev = EvalPoint(q=jnp.asarray(rng.normal(size=(4, 3))),
                   logp=jnp.asarray(rng.normal(size=4)),
                   grad=jnp.asarray(rng.normal(size=(4, 3))))
    return WarmupState(z=ev, metric=metric, log_eps=jnp.asarray(-1.5))


def test_roundtrip_diag_and_dense(tmp_path):
    for metric in (diag_metric(jnp.asarray([1.0, 2.0, 3.0])),
                   dense_metric(jnp.eye(3) + 0.1)):
        st = _state(metric)
        key = jax.random.PRNGKey(7)
        p = str(tmp_path / "ck.npz")
        save_warmup_checkpoint(p, st, key, 3)
        st2, key2, idx = load_warmup_checkpoint(p)
        assert idx == 3
        np.testing.assert_array_equal(np.asarray(key), np.asarray(key2))
        for a, b in zip(jax.tree_util.tree_leaves(st),
                        jax.tree_util.tree_leaves(st2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert type(st2.metric) is type(st.metric)


def test_resume_skips_completed_stages(tmp_path):
    """Interrupt after stage k; resuming must produce the same final state as
    an uninterrupted run (stage RNG is derived from the checkpointed key)."""
    model = std_normal(4)
    kern = NUTSKernel(model, NUTS(), pooled=True, use_pallas="off")
    stages = default_warmup_stages(init_steps=10, middle_steps=10,
                                   doubling_stages=1, terminating_steps=10)
    import inplacedhmc_tpu.adapt.warmup as W
    key = jax.random.PRNGKey(0)
    state0 = W.init_warmup_state(jax.random.PRNGKey(1), kern.potential, 4, 4,
                                 jnp.float64)

    p_full = str(tmp_path / "full.npz")
    s_full, _ = warmup_with_checkpoints(kern, key, state0, stages, p_full)

    # interrupted run: first 2 stages, then "crash", then resume
    p_part = str(tmp_path / "part.npz")
    s_mid, _ = warmup_with_checkpoints(kern, key, state0, stages[:2], p_part)
    # patch the stage counter as if the same schedule continued
    s_resumed, _ = warmup_with_checkpoints(kern, key, state0, stages, p_part)

    np.testing.assert_allclose(np.asarray(s_full.z.q), np.asarray(s_resumed.z.q))
    np.testing.assert_allclose(np.asarray(s_full.log_eps),
                               np.asarray(s_resumed.log_eps))


def _run_logistic(key, path=None, n_draws=60, draw_block=20,
                  checkpoint_throttle_s=0.0, **kw):
    from inplacedhmc_tpu.models import mvn
    from inplacedhmc_tpu.sample import mcmc_with_warmup
    model = mvn(np.array([[1.5, 0.4], [0.4, 1.0]]))
    return mcmc_with_warmup(key, model, n_draws, n_chains=8,
                            draw_block=draw_block, sample_checkpoint_path=path,
                            checkpoint_throttle_s=checkpoint_throttle_s,
                            dtype=jnp.float64, **kw)


def test_fresh_run_clears_stale_blocks(tmp_path):
    """Deleting the state file to restart must not resurrect the previous
    run's block files: a fresh run clears <path>.blocks/ or the next resume
    would silently return the OLD run's draws."""
    import os
    p = str(tmp_path / "s.npz")
    r_a = _run_logistic(jax.random.PRNGKey(3), p)
    os.remove(p)  # "restart fresh", blocks dir left behind
    r_b = _run_logistic(jax.random.PRNGKey(99), p)
    r_b_resumed = _run_logistic(jax.random.PRNGKey(99), p)
    np.testing.assert_array_equal(np.asarray(r_b_resumed.draws),
                                  np.asarray(r_b.draws))
    assert not np.allclose(np.asarray(r_b.draws), np.asarray(r_a.draws))


def test_resume_with_different_draw_block(tmp_path):
    """Blocks appended after the last state save use the crashed run's block
    size; a resume with a DIFFERENT draw_block must replay cleanly (stale
    future blocks deleted) and still match the uninterrupted run's draws."""
    from inplacedhmc_tpu.report import NoProgressReport

    class Boom(Exception):
        pass

    class CrashReporter(NoProgressReport):
        def __init__(self):
            self.k = 0

        def step(self, done):
            self.k += 1
            if self.k == 3:
                raise Boom()

    p = str(tmp_path / "s.npz")
    ref = _run_logistic(jax.random.PRNGKey(5), None, draw_block=20)
    try:
        # blocks at 0/20/40 exist, state says done=20 (throttle blocks the
        # 2nd/3rd state save)
        _run_logistic(jax.random.PRNGKey(5), p, draw_block=20,
                      checkpoint_throttle_s=9999.0, reporter=CrashReporter())
    except Boom:
        pass
    r1 = _run_logistic(jax.random.PRNGKey(5), p, draw_block=15)
    r2 = _run_logistic(jax.random.PRNGKey(5), p, draw_block=15)  # resume again
    assert np.asarray(r1.draws).shape == np.asarray(ref.draws).shape
    np.testing.assert_array_equal(np.asarray(r2.draws), np.asarray(r1.draws))
