"""Performance-regression guards (SURVEY.md §4.5): static shapes mean no
retracing across calls, and tree storage stays O(depth), not O(2^depth)."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu.config import NUTS
from inplacedhmc_tpu.core.hamiltonian import batched_logdensity_and_grad, evaluate
from inplacedhmc_tpu.core.metric import identity_metric
from inplacedhmc_tpu.models import std_normal
from inplacedhmc_tpu.nuts.tree import nuts_transition
from inplacedhmc_tpu.sample import NUTSKernel


def test_no_retracing_across_transitions():
    model = std_normal(8)
    traces = {"n": 0}
    base = batched_logdensity_and_grad(model.logp)

    def counting_potential(q):
        traces["n"] += 1
        return base(q)

    metric = identity_metric(8, jnp.float32)
    fn = jax.jit(lambda k, z: nuts_transition(k, counting_potential, metric, z,
                                              jnp.asarray(0.5, jnp.float32)))
    q = jnp.zeros((16, 8), jnp.float32)
    z = evaluate(base, q)
    fn(jax.random.PRNGKey(0), z)
    n_after_first = traces["n"]
    for i in range(5):
        z, = (fn(jax.random.PRNGKey(i + 1), z)[0],)
    assert traces["n"] == n_after_first, "re-tracing detected across transitions"


def test_tree_memory_is_odepth_not_exponential():
    """The compiled transition must allocate checkpoint stacks [C, max_depth, D]
    — never 2^max_depth buffers (the reference's core in-place guarantee,
    tree.jl:5-14, preserved via the checkpoint-stack formulation)."""
    model = std_normal(8)
    pot = batched_logdensity_and_grad(model.logp)
    metric = identity_metric(8, jnp.float32)
    c, d, max_depth = 4, 8, 16

    def step(k, z):
        return nuts_transition(k, pot, metric, z, jnp.asarray(0.3, jnp.float32),
                               max_depth=max_depth)

    z = evaluate(pot, jnp.zeros((c, d), jnp.float32))
    jaxpr = jax.make_jaxpr(step)(jax.random.PRNGKey(0), z)
    # largest intermediate must be the [C, max_depth, D] stacks, far below
    # 2^16 — scan every aval in the jaxpr (inputs, outputs, all equation
    # outvars, and recursively the sub-jaxprs of while/scan/cond params)
    biggest = 0

    def scan_jaxpr(jx):
        nonlocal biggest
        for av in list(jx.invars) + list(jx.outvars) + list(jx.constvars):
            aval = getattr(av, "aval", None)
            if aval is not None and hasattr(aval, "shape"):
                biggest = max(biggest, int(np.prod(aval.shape)) if aval.shape else 1)
        for eqn in jx.eqns:
            for av in eqn.outvars:
                aval = getattr(av, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    biggest = max(biggest,
                                  int(np.prod(aval.shape)) if aval.shape else 1)
            for p in eqn.params.values():
                for sub in jax.tree_util.tree_leaves(
                        p, is_leaf=lambda x: hasattr(x, "jaxpr") or hasattr(x, "eqns")):
                    inner = getattr(sub, "jaxpr", sub)
                    if hasattr(inner, "eqns"):
                        scan_jaxpr(inner)

    scan_jaxpr(jaxpr.jaxpr)
    assert biggest <= c * (max_depth + 2) * d * 4, biggest


def test_kernel_jit_cache_reused():
    model = std_normal(4)
    kern = NUTSKernel(model, NUTS(), use_pallas="off")
    f1 = kern._sampling_fn(25)
    f2 = kern._sampling_fn(25)
    assert f1 is f2
    f3 = kern._sampling_fn(50)
    assert f3 is not f1


def test_logistic_chunked_physics_streams_obs():
    """The hand-fused logistic tile physics must never materialize the full
    [BC, N] linear response — observations stream through [BC, block_n]
    slices (the VMEM-bounding property the chunked formulation exists for)."""
    from inplacedhmc_tpu.ops.tree_pallas import (_LOGISTIC_TILE_CACHE,
                                                 make_logistic_tree_transition,
                                                 _round_up)
    from inplacedhmc_tpu.core.metric import diag_metric

    n_obs, d, bc, bn = 10_000, 50, 128, 2048
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_obs, d)).astype(np.float32)
    y = (rng.uniform(size=n_obs) < 0.5).astype(np.float32)
    make_logistic_tree_transition(x, y, 0.1, diag_metric(jnp.ones(d)),
                                  interpret=True, block_n=bn)
    _, tile_vg = _LOGISTIC_TILE_CACHE[(0.1, "chunked", False, bn)]
    dpad = _round_up(d, 128)
    npad = _round_up(n_obs, bn)
    refs = {"xobs": jnp.zeros((npad, dpad), jnp.float32),
            "yw": jnp.zeros((2, npad), jnp.float32)}
    jaxpr = jax.make_jaxpr(lambda q: tile_vg(q, refs))(
        jnp.zeros((bc, dpad), jnp.float32))
    biggest = 0
    for eqn in jaxpr.jaxpr.eqns:
        for av in eqn.outvars:
            aval = getattr(av, "aval", None)
            if aval is not None and hasattr(aval, "shape") and aval.shape:
                biggest = max(biggest, int(np.prod(aval.shape)))
    assert biggest < bc * npad, (
        f"chunked physics materialized a {biggest}-element intermediate "
        f"(>= the [BC, N] response it must avoid)")
