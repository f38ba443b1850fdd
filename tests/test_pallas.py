"""A/B correctness of the fused Pallas kernels (interpreter mode on CPU).

The fused paths must be algebraically identical to the jnp reference
implementations — same trees, same proposals, same statistics (f32 tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad
from inplacedhmc_tpu.core.metric import diag_metric, kinetic_energy, psharp
from inplacedhmc_tpu.core.state import EvalPoint, PhasePoint
from inplacedhmc_tpu.models.gaussian import diag_normal
from inplacedhmc_tpu.models.logistic import logistic_regression, synthetic_data
from inplacedhmc_tpu.nuts.tree import nuts_transition
from inplacedhmc_tpu.ops.integrator import leapfrog
from inplacedhmc_tpu.ops.leapfrog_pallas import make_fused_gaussian_leapfrog
from inplacedhmc_tpu.ops.logistic_pallas import make_logistic_potential


def test_logistic_kernel_matches_autodiff():
    key = jax.random.PRNGKey(0)
    x, y, _ = synthetic_data(key, n_obs=700, n_features=23, dtype=jnp.float32)
    model = logistic_regression(x, y)
    pot_ref = batched_logdensity_and_grad(model.logp)
    pot_pallas = make_logistic_potential(x, y, model.structure["inv_var"],
                                         block_c=64, block_n=256, interpret=True)
    q = jax.random.normal(jax.random.PRNGKey(1), (40, 23), jnp.float32) * 0.3
    lp_ref, g_ref = pot_ref(q)
    lp_p, g_p = pot_pallas(q)
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-3)
    # the default kernel's GRADIENT contract is bf16-contraction class on
    # hardware (~1e-3 relative; deterministic-field argument, DESIGN §13);
    # logp above is the exactness-critical output and stays tight
    gscale = np.abs(np.asarray(g_ref)).max()
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref),
                               atol=2e-3 * gscale)
    # all-exact arms must match autodiff tightly — pins the kernel math
    pot_exact = make_logistic_potential(x, y, model.structure["inv_var"],
                                        block_c=64, block_n=256,
                                        interpret=True,
                                        fwd_precision="highest",
                                        bwd_precision="highest")
    lp_e, g_e = pot_exact(q)
    np.testing.assert_allclose(np.asarray(lp_e), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_gaussian_leapfrog_matches_reference():
    d, c = 37, 24
    rng = np.random.default_rng(0)
    prec = jnp.asarray(rng.gamma(2.0, size=d) + 0.2, jnp.float32)
    minv = jnp.asarray(rng.gamma(2.0, size=d) + 0.3, jnp.float32)
    model = diag_normal(1.0 / prec)
    pot = batched_logdensity_and_grad(model.logp)
    metric = diag_metric(minv)

    q = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    eps = jnp.asarray(rng.uniform(0.05, 0.4, size=c) *
                      rng.choice([-1, 1], size=c), jnp.float32)

    lp0, g0 = pot(q)
    z_ref = leapfrog(pot, metric, PhasePoint(Q=EvalPoint(q, lp0, g0), p=p), eps)

    fused = make_fused_gaussian_leapfrog(prec, minv, block_c=8, interpret=True)
    qn, pn, gn, lpn, kin, ps = fused(q, p, eps)

    np.testing.assert_allclose(np.asarray(qn), np.asarray(z_ref.Q.q), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pn), np.asarray(z_ref.p), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(z_ref.Q.grad), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lpn), np.asarray(z_ref.Q.logp), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kin), np.asarray(kinetic_energy(metric, z_ref.p)),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(psharp(metric, z_ref.p)),
                               rtol=2e-5, atol=2e-5)


def test_full_transition_ab_fused_vs_reference():
    """Same keys, same directions, same momentum: the fused-step tree must
    produce the same trajectories and statistics as the jnp-step tree."""
    d, c = 16, 12
    rng = np.random.default_rng(2)
    prec = jnp.asarray(rng.gamma(2.0, size=d) + 0.5, jnp.float32)
    minv = jnp.asarray(np.ones(d), jnp.float32)
    model = diag_normal(1.0 / prec)
    pot = batched_logdensity_and_grad(model.logp)
    metric = diag_metric(minv)

    q = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    dirs = jnp.asarray(rng.integers(0, 2**32, size=c, dtype=np.uint32))
    lp0, g0 = pot(q)
    z0 = EvalPoint(q=q, logp=lp0, grad=g0)
    eps = jnp.asarray(0.25, jnp.float32)

    fused = make_fused_gaussian_leapfrog(prec, minv, block_c=8, interpret=True)
    step_fn = lambda qq, pp, gg, ll, ee: fused(qq, pp, ee)

    key = jax.random.PRNGKey(5)
    z_ref, st_ref = nuts_transition(key, pot, metric, z0, eps, max_depth=6,
                                    directions=dirs, momentum=p)
    z_fus, st_fus = nuts_transition(key, pot, metric, z0, eps, max_depth=6,
                                    directions=dirs, momentum=p, step_fn=step_fn)

    np.testing.assert_array_equal(np.asarray(st_fus.termination),
                                  np.asarray(st_ref.termination))
    np.testing.assert_array_equal(np.asarray(st_fus.depth), np.asarray(st_ref.depth))
    np.testing.assert_array_equal(np.asarray(st_fus.steps), np.asarray(st_ref.steps))
    np.testing.assert_allclose(np.asarray(st_fus.acceptance_rate),
                               np.asarray(st_ref.acceptance_rate), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_fus.q), np.asarray(z_ref.q),
                               rtol=1e-4, atol=1e-4)


def test_sampler_with_interpret_pallas_end_to_end():
    """Full mcmc_with_warmup with use_pallas='interpret' on the diag-gaussian
    fused path: posterior must still be correct."""
    from inplacedhmc_tpu.config import default_warmup_stages
    from inplacedhmc_tpu.sample import NUTSKernel
    from inplacedhmc_tpu.config import NUTS as NUTSConfig

    variances = np.array([4.0, 1.0, 0.25, 1.0], np.float32)
    model = diag_normal(variances)
    kern = NUTSKernel(model, NUTSConfig(), pooled=True, use_pallas="interpret")
    assert kern.step_factory is not None
    stages = default_warmup_stages(init_steps=30, middle_steps=25,
                                   doubling_stages=2, terminating_steps=20)
    res = kern.run(jax.random.PRNGKey(0), n_draws=400, n_chains=16,
                   warmup_stages=stages, dtype=jnp.float32)
    flat = np.asarray(res.draws).reshape(-1, 4)
    np.testing.assert_allclose(flat.var(0), variances, rtol=0.3)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.25)


def test_multi_step_leapfrog_matches_chained_single_steps():
    """k dependent steps in one launch == k chained single-step kernels."""
    from inplacedhmc_tpu.ops.leapfrog_pallas import (_fused_leapfrog_padded,
                                                     multi_step_leapfrog)

    c, dpad, k = 16, 128, 7
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(c, dpad)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(c, dpad)), jnp.float32)
    eps = jnp.full((c, 1), 0.05, jnp.float32)
    lam = jnp.asarray(rng.gamma(2.0, size=(1, dpad)) + 0.3, jnp.float32)
    minv = jnp.asarray(rng.gamma(2.0, size=(1, dpad)) + 0.3, jnp.float32)

    qk, pk = multi_step_leapfrog(q, p, eps, lam, minv, k, block_c=16,
                                 interpret=True)
    qs, ps = q, p
    for _ in range(k):
        qs, ps, *_ = _fused_leapfrog_padded(qs, ps, eps, lam, minv, 16,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(qk), np.asarray(qs), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(ps), rtol=2e-5,
                               atol=1e-5)


def test_logistic_kernel_grad_bf16_mode():
    """grad_bf16: logp must stay bit-identical to the f32 kernel (exactness
    of energies/multinomial weights); the gradient is a bf16-contraction
    approximation of the f32 one (~1e-2 relative)."""
    key = jax.random.PRNGKey(3)
    x, y, _ = synthetic_data(key, n_obs=700, n_features=23, dtype=jnp.float32)
    model = logistic_regression(x, y)
    pot_f32 = make_logistic_potential(x, y, model.structure["inv_var"],
                                      block_c=64, block_n=256, interpret=True)
    pot_bf16 = make_logistic_potential(x, y, model.structure["inv_var"],
                                       block_c=64, block_n=256, interpret=True,
                                       grad_bf16=True)
    q = jax.random.normal(jax.random.PRNGKey(4), (40, 23), jnp.float32) * 0.3
    lp32, g32 = pot_f32(q)
    lp16, g16 = pot_bf16(q)
    np.testing.assert_array_equal(np.asarray(lp16), np.asarray(lp32))
    scale = np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=2e-2 * scale)


def test_matmul_precision_is_f32_by_default():
    """Importing the package must flip jax's default matmul precision to full
    f32: the TPU DEFAULT (one bf16 pass) puts O(1) ABSOLUTE error into any
    log-density/energy that sums ~1e4 matmul-derived terms — a deterministic
    warp of the stationary distribution (measured on hardware:
    benchmarks/logistic_precision_ab.json)."""
    import inplacedhmc_tpu  # noqa: F401
    assert str(jax.config.jax_default_matmul_precision) == "float32"


def test_split_bf16_dot3_is_f32_grade():
    """The hand-rolled 3-pass bf16 split (``fwd_precision="high"``) must
    reconstruct f32-grade products: dropping only the lo*lo term leaves
    ~2^-17 relative error."""
    from inplacedhmc_tpu.ops.logistic_pallas import _dot3
    rng = np.random.default_rng(11)
    a64 = rng.normal(size=(96, 160))
    b64 = rng.normal(size=(160, 224))
    ref = a64 @ b64
    got = np.asarray(_dot3(jnp.asarray(a64, jnp.float32),
                           jnp.asarray(b64, jnp.float32),
                           (((1,), (0,)), ((), ()))))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-5, rel


def test_logistic_kernel_fwd_precision_modes_agree():
    """In interpret mode every precision mode computes with f32 jnp ops, so
    "high" (split-bf16 3-pass) must agree with "highest" to split-trick
    accuracy — this pins the _dot3 wiring inside the kernel (sign/order of
    the partial products), not MXU behavior."""
    key = jax.random.PRNGKey(5)
    x, y, _ = synthetic_data(key, n_obs=500, n_features=19, dtype=jnp.float32)
    model = logistic_regression(x, y)
    mk = lambda prec: make_logistic_potential(
        x, y, model.structure["inv_var"], block_c=64, block_n=256,
        interpret=True, fwd_precision=prec)
    q = jax.random.normal(jax.random.PRNGKey(6), (40, 19), jnp.float32) * 0.3
    lp_hi, g_hi = mk("highest")(q)
    scale = np.abs(np.asarray(g_hi)).max()
    # "high"=="high3" (3-pass split, the default); "packed" is the opt-in
    # 2-pass lane-packed arm — all must agree with 6-pass "highest"
    for prec in ("high", "high3", "packed"):
        lp_p, g_p = mk(prec)(q)
        np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_hi),
                                   rtol=0, atol=5e-3, err_msg=prec)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_hi),
                                   atol=2e-3 * scale, err_msg=prec)
