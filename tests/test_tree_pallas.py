"""Whole-transition Pallas tree kernel vs the recursive oracle.

All RNG-free observables (termination kind/positions, depth, steps, acceptance
statistic) must match the oracle exactly for fixed (q0, p0, eps, directions);
the proposal must be a leaf of the final trajectory.  Runs the kernel in
interpreter mode on CPU (proposal uniforms fixed at 0.5 there — they do not
affect any compared quantity except which leaf is proposed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad
from inplacedhmc_tpu.core.state import EvalPoint, Termination
from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

from _oracle import oracle_trajectory

TERM_NAME = {Termination.MAX_DEPTH: "max_depth",
             Termination.DIVERGENCE: "divergence",
             Termination.TURNING: "turning"}


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("eps", [0.1, 0.4, 1.1])
def test_pallas_tree_matches_oracle(seed, eps):
    d, c, max_depth = 7, 16, 5
    rng = np.random.default_rng(seed)
    prec = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)
    minv = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)

    def logp_np(q):
        return -0.5 * float(q @ (prec * q)), -prec * q

    def logp_jax(q):
        return -0.5 * jnp.sum(q * (jnp.asarray(prec) * q))

    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)

    pot = batched_logdensity_and_grad(logp_jax)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    tr = make_gaussian_tree_transition(jnp.asarray(prec), jnp.asarray(minv),
                                       max_depth=max_depth, block_c=16,
                                       interpret=True)
    z2, st = tr(jax.random.PRNGKey(seed), z, eps,
                directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))

    for i in range(c):
        want = oracle_trajectory(logp_np, minv, q0[i], p0[i], eps, int(dirs[i]),
                                 max_depth=max_depth)
        tag = f"chain {i} seed {seed} eps {eps}"
        assert TERM_NAME[int(st.termination[i])] == want["termination"], tag
        assert int(st.depth[i]) == want["depth"], tag
        assert int(st.steps[i]) == want["steps"], tag
        if want["termination"] != "max_depth":
            assert int(st.term_left[i]) == want["term_left"], tag
            assert int(st.term_right[i]) == want["term_right"], tag
        np.testing.assert_allclose(float(st.acceptance_rate[i]), want["accept"],
                                   atol=2e-4, err_msg=tag)
        # proposal must be a leaf of the final trajectory
        delta_got = float(st.energy[i]) - want["pi0"]
        leaf_deltas = np.array(list(want["leaves"].values()))
        assert np.min(np.abs(leaf_deltas - delta_got)) < 5e-3, tag


def test_pallas_tree_with_metric():
    """Non-identity diagonal metric: energies use M^-1, momenta stay raw."""
    d, c = 5, 8
    rng = np.random.default_rng(9)
    prec = np.full(d, 2.0, np.float32)
    minv = (rng.gamma(3.0, size=d)).astype(np.float32)

    def logp_np(q):
        return -0.5 * float(q @ (prec * q)), -prec * q

    def logp_jax(q):
        return -0.5 * jnp.sum(q * (jnp.asarray(prec) * q))

    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)
    pot = batched_logdensity_and_grad(logp_jax)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)
    tr = make_gaussian_tree_transition(jnp.asarray(prec), jnp.asarray(minv),
                                       max_depth=5, block_c=8, interpret=True)
    z2, st = tr(jax.random.PRNGKey(0), z, 0.3,
                directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))
    for i in range(c):
        want = oracle_trajectory(logp_np, minv, q0[i], p0[i], 0.3, int(dirs[i]),
                                 max_depth=5)
        assert int(st.steps[i]) == want["steps"], i
        assert int(st.depth[i]) == want["depth"], i
        assert TERM_NAME[int(st.termination[i])] == want["termination"], i


def test_eight_schools_tile_physics_matches_xla_tree():
    """General tile-physics path (in-kernel autodiff) vs the XLA tree on the
    eight-schools model: same momentum/directions => identical deterministic
    fields (cross-validates both implementations on a non-Gaussian target)."""
    from inplacedhmc_tpu.models import eight_schools
    from inplacedhmc_tpu.ops.tree_pallas import make_tree_transition
    from inplacedhmc_tpu.core.metric import diag_metric

    model = eight_schools()
    st = model.structure
    c, d = 16, model.dim
    rng = np.random.default_rng(3)
    q0 = rng.normal(size=(c, d)).astype(np.float32) * 0.5
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)
    minv = (rng.gamma(3.0, size=d) * 0.5 + 0.5).astype(np.float32)

    pot = batched_logdensity_and_grad(model.logp)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    # sanity: the tile physics agrees with the reference logp/grad
    dpad = 128
    qpad = jnp.zeros((c, dpad), jnp.float32).at[:, :d].set(q0)
    refs = {k: jnp.zeros((8, dpad), jnp.float32).at[:1, :d].set(v)
            for k, v in st["data"].items()}
    tl = st["tile_logp"](qpad, refs)
    np.testing.assert_allclose(np.asarray(tl[:, 0]), np.asarray(lp),
                               rtol=1e-5, atol=1e-4)

    from inplacedhmc_tpu.nuts.tree import nuts_transition
    metric = diag_metric(jnp.asarray(minv))
    z_ref, st_ref = nuts_transition(jax.random.PRNGKey(0), pot, metric, z,
                                    jnp.asarray(0.4, jnp.float32), max_depth=5,
                                    directions=jnp.asarray(dirs),
                                    momentum=jnp.asarray(p0))
    tr = make_tree_transition(st["tile_logp"], st["data"], d,
                              jnp.asarray(minv), max_depth=5, block_c=16,
                              interpret=True)
    z_pal, st_pal = tr(jax.random.PRNGKey(0), z, 0.4,
                       directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))

    np.testing.assert_array_equal(np.asarray(st_pal.termination),
                                  np.asarray(st_ref.termination))
    np.testing.assert_array_equal(np.asarray(st_pal.depth),
                                  np.asarray(st_ref.depth))
    np.testing.assert_array_equal(np.asarray(st_pal.steps),
                                  np.asarray(st_ref.steps))
    np.testing.assert_allclose(np.asarray(st_pal.acceptance_rate),
                               np.asarray(st_ref.acceptance_rate), atol=5e-4)


def test_pallas_tree_dense_metric_matches_oracle():
    """Dense M^-1: every p-sharp is a [bc, dpad] @ [dpad, dpad] matmul in the
    kernel (reference dense kinetic energy, hamiltonian.jl:206-225).  Also
    exercises the padded-row valid mask: c=10 chains in a block_c=16 tile."""
    d, c = 6, 10
    rng = np.random.default_rng(17)
    prec = (rng.gamma(2.0, size=d) + 0.5).astype(np.float32)
    a = rng.normal(size=(d, d)).astype(np.float32)
    minv = (a @ a.T / d + np.eye(d, dtype=np.float32)).astype(np.float32)

    def logp_np(q):
        return -0.5 * float(q @ (prec * q)), -prec * q

    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)

    lp = jnp.asarray([logp_np(q)[0] for q in q0], jnp.float32)
    g = jnp.asarray(np.stack([logp_np(q)[1] for q in q0]))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    tr = make_gaussian_tree_transition(jnp.asarray(prec), jnp.asarray(minv),
                                       max_depth=5, block_c=16, interpret=True)
    z2, st = tr(jax.random.PRNGKey(1), z, 0.25,
                directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))
    for i in range(c):
        want = oracle_trajectory(logp_np, minv, q0[i], p0[i], 0.25,
                                 int(dirs[i]), max_depth=5)
        tag = f"dense chain {i}"
        assert TERM_NAME[int(st.termination[i])] == want["termination"], tag
        assert int(st.depth[i]) == want["depth"], tag
        assert int(st.steps[i]) == want["steps"], tag
        np.testing.assert_allclose(float(st.acceptance_rate[i]),
                                   want["accept"], atol=5e-4, err_msg=tag)


@pytest.mark.parametrize("physics_mode,block_n", [
    ("chunked", 2048),   # one chunk, mostly padded observations
    ("chunked", 128),    # several chunks exercise the streamed accumulation
    ("vjp", 2048),       # original autodiff physics
])
def test_logistic_tree_kernel_matches_xla_tree(physics_mode, block_n):
    """Logistic tree kernel (X resident in VMEM, MXU matmuls per leaf) vs the
    XLA tree on the same model, dense metric — the primary benchmark path.
    Covers both the hand-fused chunked physics and the vjp formulation."""
    from inplacedhmc_tpu.core.metric import dense_metric
    from inplacedhmc_tpu.models.logistic import logistic_regression, synthetic_data
    from inplacedhmc_tpu.nuts.tree import nuts_transition
    from inplacedhmc_tpu.ops.tree_pallas import make_logistic_tree_transition

    x, y, _ = synthetic_data(jax.random.PRNGKey(0), n_obs=200, n_features=5)
    model = logistic_regression(x, y)
    st_m = model.structure
    c, d = 8, model.dim
    rng = np.random.default_rng(11)
    q0 = rng.normal(size=(c, d)).astype(np.float32) * 0.1
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)
    a = rng.normal(size=(d, d)).astype(np.float32)
    minv = (a @ a.T / d + np.eye(d, dtype=np.float32)) * 0.05
    metric = dense_metric(jnp.asarray(minv))

    pot = batched_logdensity_and_grad(model.logp)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    z_ref, st_ref = nuts_transition(jax.random.PRNGKey(0), pot, metric, z,
                                    jnp.asarray(0.3, jnp.float32), max_depth=5,
                                    directions=jnp.asarray(dirs),
                                    momentum=jnp.asarray(p0))
    tr = make_logistic_tree_transition(st_m["x"], st_m["y"], st_m["inv_var"],
                                       metric, max_depth=5, block_c=8,
                                       interpret=True,
                                       physics_mode=physics_mode,
                                       block_n=block_n)
    z_pal, st_pal = tr(jax.random.PRNGKey(0), z, 0.3,
                       directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))
    np.testing.assert_array_equal(np.asarray(st_pal.termination),
                                  np.asarray(st_ref.termination))
    np.testing.assert_array_equal(np.asarray(st_pal.depth),
                                  np.asarray(st_ref.depth))
    np.testing.assert_array_equal(np.asarray(st_pal.steps),
                                  np.asarray(st_ref.steps))
    np.testing.assert_allclose(np.asarray(st_pal.acceptance_rate),
                               np.asarray(st_ref.acceptance_rate), atol=1e-3)


def test_logistic_chunked_physics_value_and_grad():
    """The hand-fused chunked value+grad equals autodiff of the model logp
    (same math as logistic_pallas: shared exp(-|eta|), streamed backward)."""
    from inplacedhmc_tpu.core.metric import diag_metric
    from inplacedhmc_tpu.models.logistic import logistic_regression, synthetic_data
    from inplacedhmc_tpu.ops.tree_pallas import make_logistic_tree_transition

    x, y, _ = synthetic_data(jax.random.PRNGKey(3), n_obs=300, n_features=7)
    model = logistic_regression(x, y)
    st_m = model.structure
    pot = batched_logdensity_and_grad(model.logp)
    c, d = 8, model.dim
    q0 = np.random.default_rng(5).normal(size=(c, d)).astype(np.float32) * 0.2
    lp_ref, g_ref = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp_ref, grad=g_ref)
    metric = diag_metric(jnp.ones(d))
    for grad_bf16 in (False, True):
        tr = make_logistic_tree_transition(
            st_m["x"], st_m["y"], st_m["inv_var"], metric, max_depth=2,
            block_c=8, interpret=True, physics_mode="chunked", block_n=128,
            grad_bf16=grad_bf16)
        # a zero-step transition is impossible; instead check the returned
        # proposal's logp/grad are self-consistent with the XLA potential
        z2, _ = tr(jax.random.PRNGKey(1), z, 0.05)
        lp2, g2 = pot(z2.q)
        tol = 5e-2 if grad_bf16 else 2e-3
        np.testing.assert_allclose(np.asarray(z2.logp), np.asarray(lp2),
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(z2.grad), np.asarray(g2),
                                   rtol=tol, atol=tol)


def test_bf16_checkpoint_stacks_agree():
    """bf16 U-turn checkpoint stacks halve the dominant VMEM scratch; turn
    decisions change only for knife-edge trajectories, so on a generic seed
    every observable should match the f32-stack kernel exactly."""
    d, c = 7, 16
    rng = np.random.default_rng(23)
    prec = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)
    minv = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)
    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)

    def run(bf16):
        def logp_jax(q):
            return -0.5 * jnp.sum(q * (jnp.asarray(prec) * q))
        pot = batched_logdensity_and_grad(logp_jax)
        lp, g = pot(jnp.asarray(q0))
        z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)
        tr = make_gaussian_tree_transition(
            jnp.asarray(prec), jnp.asarray(minv), max_depth=5, block_c=16,
            interpret=True, ckpt_bf16=bf16)
        return tr(jax.random.PRNGKey(5), z, 0.35,
                  directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))

    (_, st32), (_, st16) = run(False), run(True)
    agree = np.mean(np.asarray(st32.termination) == np.asarray(st16.termination))
    assert agree >= 0.9, agree
    same = np.asarray(st32.termination) == np.asarray(st16.termination)
    np.testing.assert_allclose(np.asarray(st16.acceptance_rate)[same],
                               np.asarray(st32.acceptance_rate)[same],
                               atol=2e-2)


def test_tree_kernel_nan_gradient_containment():
    """A model whose gradient overflows outside a region (exp overflow) must
    never leak NaN into kernel outputs: the offending leaf is divergent, the
    proposal stays at a finite point (mirrors the XLA tree's -inf sentinel
    semantics; regression for the 0*NaN=NaN select bug)."""
    import numpy as np
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad
    from inplacedhmc_tpu.ops.tree_pallas import make_tree_transition

    def tile_logp(q, refs):
        # exp(60*q) overflows f32 once q moves past ~2: non-finite grad/logp
        return jnp.sum(-q * q - jnp.exp(60.0 * (q - 2.0)),
                       axis=1, keepdims=True)

    def logp(q):
        return jnp.sum(-q * q - jnp.exp(60.0 * (q - 2.0)))

    dim = 5
    trans = make_tree_transition(tile_logp, {}, dim, jnp.ones(dim),
                                 max_depth=6, interpret=True)
    pot = batched_logdensity_and_grad(logp)
    # start near the cliff with a big step so leaves land past it
    q0 = jnp.full((16, dim), 1.9, jnp.float32)
    z = ih.evaluate(pot, q0)
    z2, stats = trans(jax.random.PRNGKey(0), z, jnp.asarray(0.8, jnp.float32))
    assert bool(jnp.all(jnp.isfinite(z2.q))), np.asarray(z2.q)
    assert bool(jnp.all(jnp.isfinite(z2.grad)))
    # at least one chain must have recorded a divergence
    from inplacedhmc_tpu.core.state import Termination
    assert int(jnp.sum(stats.termination == Termination.DIVERGENCE)) > 0


def test_funnel_tile_physics_matches_logp():
    import numpy as np
    from inplacedhmc_tpu.models import funnel
    from inplacedhmc_tpu.ops.tree_pallas import _round_up

    model = funnel(10)
    st = model.structure
    c, dim = 12, model.dim
    dpad = _round_up(dim, 128)
    q = jax.random.normal(jax.random.PRNGKey(0), (c, dim), jnp.float32)
    q_p = jnp.zeros((c, dpad), jnp.float32).at[:, :dim].set(q)
    refs = {}
    for name, arr in st["data"].items():
        a = jnp.asarray(arr, jnp.float32)
        refs[name] = jnp.zeros((a.shape[0], dpad), jnp.float32) \
            .at[:, :a.shape[1]].set(a)
    got = np.asarray(st["tile_logp"](q_p, refs))[:, 0]
    want = np.asarray(jax.vmap(model.logp)(q))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_funnel_tree_kernel_divergences_survive():
    """The funnel on the whole-tree kernel: big eps must produce divergences
    (reported, not fatal) and finite states — config 2's semantics on the
    fused path."""
    import numpy as np
    from inplacedhmc_tpu.core.state import Termination
    from inplacedhmc_tpu.models import funnel
    from inplacedhmc_tpu.sample import mcmc_with_warmup
    from inplacedhmc_tpu.config import default_warmup_stages, DualAveraging

    model = funnel(8)
    # local optimization disabled: the funnel's density mode sits at
    # v = -4.5*(dim-1), deep in the neck (see test_sampling.py's funnel test)
    stages = default_warmup_stages(
        local_optimization=None,
        stepsize_adaptation=DualAveraging(delta=0.9), init_steps=40,
        middle_steps=25, doubling_stages=2, terminating_steps=25)
    res = mcmc_with_warmup(jax.random.PRNGKey(0), model, 400, 16,
                           warmup_stages=stages, use_pallas="tree")
    d = np.asarray(res.draws)
    assert np.isfinite(d).all()
    v = d[..., 0]
    assert abs(v.mean()) < 1.5 and 1.2 < v.std() < 4.0


def test_dense_gaussian_tree_kernel_matches_xla_tree():
    """mvn (dense-precision Gaussian) on the whole-tree kernel: grad = -P q is
    one MXU matmul per leaf (make_dense_gaussian_tree_transition).  Same
    momentum/directions as the XLA tree => identical deterministic fields.
    Closes VERDICT r2 'dead structure kind dense_gaussian'."""
    from inplacedhmc_tpu.core.metric import diag_metric
    from inplacedhmc_tpu.models import mvn
    from inplacedhmc_tpu.nuts.tree import nuts_transition
    from inplacedhmc_tpu.ops.tree_pallas import \
        make_dense_gaussian_tree_transition

    d, c = 6, 12
    rng = np.random.default_rng(23)
    a = rng.normal(size=(d, d)).astype(np.float32)
    cov = (a @ a.T / d + np.eye(d, dtype=np.float32))
    model = mvn(jnp.asarray(cov))
    prec = model.structure["precision"]
    minv = (rng.gamma(3.0, size=d) * 0.5 + 0.5).astype(np.float32)

    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p0 = rng.normal(size=(c, d)).astype(np.float32)
    dirs = rng.integers(0, 2**32, size=c, dtype=np.uint32)

    pot = batched_logdensity_and_grad(model.logp)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    metric = diag_metric(jnp.asarray(minv))
    z_ref, st_ref = nuts_transition(jax.random.PRNGKey(0), pot, metric, z,
                                    jnp.asarray(0.3, jnp.float32), max_depth=5,
                                    directions=jnp.asarray(dirs),
                                    momentum=jnp.asarray(p0))
    tr = make_dense_gaussian_tree_transition(prec, jnp.asarray(minv),
                                             max_depth=5, block_c=16,
                                             interpret=True)
    z_pal, st_pal = tr(jax.random.PRNGKey(0), z, 0.3,
                       directions=jnp.asarray(dirs), momentum=jnp.asarray(p0))

    np.testing.assert_array_equal(np.asarray(st_pal.termination),
                                  np.asarray(st_ref.termination))
    np.testing.assert_array_equal(np.asarray(st_pal.depth),
                                  np.asarray(st_ref.depth))
    np.testing.assert_array_equal(np.asarray(st_pal.steps),
                                  np.asarray(st_ref.steps))
    np.testing.assert_allclose(np.asarray(st_pal.acceptance_rate),
                               np.asarray(st_ref.acceptance_rate), atol=5e-4)
    # the fused tile physics agrees with the model density at the proposal
    lp_pal = np.asarray(z_pal.logp)
    lp_want = np.asarray(jax.vmap(model.logp)(z_pal.q))
    np.testing.assert_allclose(lp_pal, lp_want, rtol=2e-5, atol=2e-4)


def test_mvn_auto_selects_dense_gaussian_kernel():
    """NUTSKernel 'tree' mode builds a transition factory for the
    dense_gaussian structure (previously silently ignored)."""
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.core.metric import identity_metric
    from inplacedhmc_tpu.models import mvn
    from inplacedhmc_tpu.sample import NUTSKernel

    cov = np.eye(4, dtype=np.float32) + 0.3
    kern = NUTSKernel(mvn(jnp.asarray(cov)), NUTS(), use_pallas="tree")
    assert kern.transition_factory is not None
    trans = kern.transition_factory(identity_metric(4, jnp.float32), 16)
    assert trans is not None


def test_sweep_kernel_bit_identical_to_sequential():
    """n_sweep=K (K transitions per kernel launch, state carried in VMEM)
    must be BIT-identical to K sequential n_sweep=1 launches when fed the
    same momenta, direction bits, and proposal-uniform streams — the sweep
    changes the launch structure, not one float of the algorithm."""
    d, c, max_depth, K = 7, 16, 5, 3
    rng = np.random.default_rng(3)
    prec = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)
    minv = (rng.gamma(2.0, size=d) + 0.3).astype(np.float32)

    def logp_jax(q):
        return -0.5 * jnp.sum(q * (jnp.asarray(prec) * q))

    q0 = rng.normal(size=(c, d)).astype(np.float32)
    p_all = rng.normal(size=(K, c, d)).astype(np.float32)
    dirs_all = rng.integers(0, 2**32, size=(K, c), dtype=np.uint32)
    n_unif1 = (1 << max_depth) - 1 + max_depth
    cpad = 16
    u_all = rng.uniform(size=(K, n_unif1, cpad)).astype(np.float32)

    pot = batched_logdensity_and_grad(logp_jax)
    lp, g = pot(jnp.asarray(q0))
    z = EvalPoint(q=jnp.asarray(q0), logp=lp, grad=g)

    # sequential arm: K single-transition launches
    tr1 = make_gaussian_tree_transition(jnp.asarray(prec), jnp.asarray(minv),
                                        max_depth=max_depth, block_c=16,
                                        interpret=True)
    zs, seq_q, seq_stats = z, [], []
    for k in range(K):
        zs, st = tr1(jax.random.PRNGKey(11 + k), zs, 0.3,
                     directions=jnp.asarray(dirs_all[k]),
                     momentum=jnp.asarray(p_all[k]),
                     _unif=jnp.asarray(u_all[k]))
        seq_q.append(np.asarray(zs.q))
        seq_stats.append(st)

    # sweep arm: one K-transition launch
    trK = make_gaussian_tree_transition(jnp.asarray(prec), jnp.asarray(minv),
                                        max_depth=max_depth, block_c=16,
                                        interpret=True, n_sweep=K)
    zf, draws, st_sweep = trK(jax.random.PRNGKey(99), z, 0.3,
                              directions=jnp.asarray(dirs_all),
                              momentum=jnp.asarray(p_all),
                              _unif=jnp.asarray(
                                  u_all.reshape(K * n_unif1, cpad)))

    assert draws.shape == (K, c, d)
    for k in range(K):
        np.testing.assert_array_equal(np.asarray(draws[k]), seq_q[k])
        for field in ("energy", "acceptance_rate", "termination",
                      "term_left", "term_right", "depth", "steps"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_sweep, field)[k]),
                np.asarray(getattr(seq_stats[k], field)), err_msg=field)
    np.testing.assert_array_equal(np.asarray(zf.q), seq_q[-1])
    np.testing.assert_array_equal(np.asarray(zf.logp), np.asarray(zs.logp))
    np.testing.assert_array_equal(np.asarray(zf.grad), np.asarray(zs.grad))


def test_swept_run_sampling_matches_manual_padded_loop():
    """The production sweep path (run_sampling via SweepRunner) is exactly
    the hand loop over run_padded with the same key splits: pins the scan
    bookkeeping — thin-selection of draws/stats, keep_dims, the streaming
    split-moment half assignment, and the final-state recompute."""
    import inplacedhmc_tpu.adapt.warmup as W
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.sample import _kernel

    model = std_normal(6)
    K, thin, n_draws, c = 4, 2, 8, 24
    kern = _kernel(model, NUTS(max_depth=5), True, None, use_pallas="tree",
                   tree_opts={"block_c": 8, "n_sweep": K, "padded_io": True})
    state = W.init_warmup_state(jax.random.PRNGKey(0), kern.potential, 6, c,
                                jnp.float32, eps=0.45)
    trans = kern.transition_factory(state.metric, c)
    sweep = trans._sweep
    assert sweep.n_sweep == K

    key = jax.random.PRNGKey(42)
    res = W.run_sampling(key, kern.potential, NUTS(max_depth=5), state,
                         n_draws, transition_factory=kern.transition_factory,
                         thin=thin, keep_dims=(0, 2),
                         moments0=W.init_split_moments(state.z.q),
                         moment_offset=0, moment_total=n_draws)
    assert res.draws.shape == (n_draws, c, 2)

    # manual loop: identical key splits, raw run_padded calls
    from inplacedhmc_tpu.ops.common import chain_tiles, round_up
    cpad, _ = chain_tiles(c, sweep.block_c)
    dpad = round_up(6, 128)
    epsc = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(0.45)
    validc = jnp.zeros((cpad, 1), jnp.int32).at[:c, 0].set(1)
    qp = jnp.zeros((cpad, dpad), jnp.float32).at[:c, :6].set(state.z.q)
    n_launch = n_draws * thin // K
    keys = jax.random.split(key, n_launch)
    rec, steps_rec = [], []
    mom_manual = []          # recorded full draws, for the moment check
    for i in range(n_launch):
        q_draws, logp, grad, st = sweep.run_padded(keys[i], qp, epsc, validc)
        rec.append(np.asarray(q_draws[thin - 1::thin, :c, :6]))
        steps_rec.append(np.asarray(st.steps[thin - 1::thin, :c]))
        qp = q_draws[-1]
    rec = np.concatenate(rec, 0)                      # [n_draws, c, 6]
    np.testing.assert_array_equal(np.asarray(res.draws),
                                  rec[:, :, [0, 2]])
    np.testing.assert_array_equal(np.asarray(res.stats.steps),
                                  np.concatenate(steps_rec, 0))
    np.testing.assert_allclose(np.asarray(res.z.q), rec[-1], rtol=0, atol=0)

    # split moments: manual two-pass over the recorded full draws
    half = n_draws // 2
    qref = np.asarray(state.z.q)
    for h, sl in ((0, slice(0, half)), (1, slice(half, None))):
        cdev = rec[sl] - qref[None]
        np.testing.assert_allclose(np.asarray(res.moments.s1[h]),
                                   cdev.sum(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.moments.s2[h]),
                                   (cdev * cdev).sum(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.moments.cnt), [half, half])


def test_swept_padded_io_statistical_correctness():
    """padded_io + n_sweep through the full driver (mcmc_with_warmup):
    posterior moments of a 6-D std normal are exact; stats shapes match the
    per-transition path."""
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.sample import mcmc_with_warmup

    model = std_normal(6)
    res = mcmc_with_warmup(jax.random.PRNGKey(8), model, 512, 64,
                           use_pallas="tree", eps=0.5, warmup_stages=[],
                           tree_opts={"block_c": 32, "n_sweep": 8,
                                      "padded_io": True})
    d = np.asarray(res.draws)
    assert d.shape == (512, 64, 6)
    assert abs(d.mean()) < 0.05
    assert abs(d.var() - 1.0) < 0.1
    assert np.asarray(res.stats.steps).shape == (512, 64)
    assert float(np.mean(np.asarray(res.stats.acceptance_rate))) > 0.5
